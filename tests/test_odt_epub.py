"""ODT + EPUB codecs (operators/odt.py, operators/epub.py): round
trips, container-spec structure, ordering semantics, hardening, and
the Spark operators."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import epub, odt


class TestOdtRoundTrip:
    @pytest.mark.parametrize(
        "paras",
        [
            ["one paragraph"],
            ["first", "second", "third"],
            ["", ""],
            ["xml specials & < > stay intact"],
            ["  leading and trailing  "],
            ["x" * 45, "y" * 7],
        ],
    )
    def test_paragraphs_survive(self, paras):
        assert odt.decode_odt_text(odt.synth_odt(paras)) == paras

    def test_mimetype_member_is_first_and_stored(self):
        # ODF 1.2 §3.3 — magic sniffers read bytes 30..38
        blob = odt.synth_odt(["x"])
        info = zipfile.ZipFile(io.BytesIO(blob)).infolist()[0]
        assert info.filename == "mimetype"
        assert info.compress_type == zipfile.ZIP_STORED
        assert blob[30:38] == b"mimetype"

    def test_whitespace_model(self):
        ns_o = odt._OFFICE
        ns_t = odt._TEXT
        content = (
            f'<office:document-content xmlns:office="{ns_o}" '
            f'xmlns:text="{ns_t}"><office:body><office:text>'
            '<text:p>a<text:tab/>b<text:line-break/>c'
            '<text:s text:c="3"/>d</text:p>'
            "<text:p><text:span>nested <text:span>deep</text:span>"
            " span</text:span> tail</text:p>"
            "</office:text></office:body></office:document-content>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(
                zipfile.ZipInfo("mimetype"), odt.MIMETYPE, zipfile.ZIP_STORED
            )
            z.writestr("content.xml", content)
        assert odt.decode_odt_text(buf.getvalue()) == [
            "a\tb\nc   d", "nested deep span tail",
        ]

    def test_foreign_mimetype_rejected(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(zipfile.ZipInfo("mimetype"), "application/zip")
            z.writestr("content.xml", "<x/>")
        with pytest.raises(ValueError, match="foreign mimetype"):
            odt.decode_odt_text(buf.getvalue())

    def test_doctype_rejected(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("content.xml", '<!DOCTYPE x [<!ENTITY a "a">]><x/>')
        with pytest.raises(ValueError, match="DTD"):
            odt.decode_odt_text(buf.getvalue())


class TestEpubRoundTrip:
    @pytest.mark.parametrize(
        "chapters",
        [
            ["one chapter"],
            ["first", "second", "third"],
            ["", ""],
            ["xml specials & < > stay intact"],
            ["x" * 55, "y" * 13],
        ],
    )
    def test_chapters_survive(self, chapters):
        assert epub.decode_epub_text(epub.synth_epub(chapters)) == chapters

    def test_reading_order_comes_from_spine_not_zip_order(self):
        blob = epub.synth_epub(["first", "second", "third"])
        names = [
            n
            for n in zipfile.ZipFile(io.BytesIO(blob)).namelist()
            if "/text/" in n
        ]
        assert names == [
            "OEBPS/text/ch3.xhtml", "OEBPS/text/ch2.xhtml",
            "OEBPS/text/ch1.xhtml",
        ]
        assert epub.decode_epub_text(blob) == ["first", "second", "third"]

    def test_style_and_script_subtrees_dropped(self):
        out = epub.decode_epub_text(epub.synth_epub(["visible text"]))
        assert out == ["visible text"]  # <style> content absent

    def test_bare_doctype_allowed_subset_rejected(self):
        blob = epub.synth_epub(["ok"])  # carries <!DOCTYPE html>
        assert epub.decode_epub_text(blob) == ["ok"]
        buf = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w"
        ) as zout:
            for item in zin.infolist():
                data = zin.read(item)
                if item.filename.endswith("ch1.xhtml"):
                    data = data.replace(
                        b"<!DOCTYPE html>",
                        b'<!DOCTYPE html [<!ENTITY a "aa">]>',
                    )
                zout.writestr(item.filename, data)
        with pytest.raises(ValueError, match="DTD"):
            epub.decode_epub_text(buf.getvalue())

    def test_unresolved_spine_idref(self):
        blob = epub.synth_epub(["a"])
        buf = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w"
        ) as zout:
            for item in zin.infolist():
                data = zin.read(item)
                if item.filename.endswith("content.opf"):
                    data = data.replace(b'idref="c0"', b'idref="zz"')
                zout.writestr(item.filename, data)
        with pytest.raises(ValueError, match="unresolved"):
            epub.decode_epub_text(buf.getvalue())

    def test_not_a_zip(self):
        with pytest.raises(ValueError):
            epub.decode_epub_text(b"nope")


class TestOperators:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, f"doc {i} " + "word soup " * 30) for i in range(10)],
            "doc_id long, text string",
        )

    def test_odt_rows_and_corrupt_policy(self, spark, docs):
        payloads = odt.with_synthetic_odt_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 3, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        rows = odt.odt_text_paragraphs(broken).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [(r.para_idx, r.ok) for r in by_doc[3]] == [(-1, False)]
        texts = {r.doc_id: r.text for r in docs.collect()}
        for d, rs in by_doc.items():
            if d == 3:
                continue
            assert len(rs) == 1 + d % 4
            for r in rs:
                assert r.para_text == texts[d][45 * r.para_idx : 45 * (r.para_idx + 1)]

    def test_epub_rows_and_corrupt_policy(self, spark, docs):
        payloads = epub.with_synthetic_epub_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 5, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        rows = epub.epub_chapter_texts(broken).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [(r.chapter_idx, r.ok) for r in by_doc[5]] == [(-1, False)]
        texts = {r.doc_id: r.text for r in docs.collect()}
        for d, rs in by_doc.items():
            if d == 5:
                continue
            assert len(rs) == 1 + d % 3
            for r in rs:
                assert (
                    r.chapter_text
                    == texts[d][55 * r.chapter_idx : 55 * (r.chapter_idx + 1)]
                )
