"""DOCX codec (operators/docx.py): round trips, OPC structure,
malformed-input policy, and the Spark per-paragraph operator."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import docx


class TestRoundTrip:
    @pytest.mark.parametrize(
        "paras",
        [
            ["one paragraph"],
            ["first", "second", "third"],
            ["", "", ""],
            ["xml specials & < > stay intact"],
            ["  leading and trailing spaces  "],
            ["x" * 40, "y" * 40, "z" * 7],
        ],
    )
    def test_paragraphs_survive(self, paras):
        assert docx.decode_docx_text(docx.synth_docx(paras)) == paras

    def test_runs_concatenate_and_formatting_skipped(self):
        # the synthesizer splits every paragraph across a bold run and
        # a plain run — text must come back whole, without artifacts
        t = "abcdefghijklmnopqrstuvwxyz0123456789"
        assert docx.decode_docx_text(docx.synth_docx([t])) == [t]

    def test_tab_and_br_elements_map_to_whitespace(self):
        w = docx._W
        document = (
            f'<w:document xmlns:w="{w}"><w:body>'
            "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
            "<w:t>c</w:t></w:r></w:p>"
            "</w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", document)
        assert docx.decode_docx_text(buf.getvalue()) == ["a\tb\nc"]


class TestStructure:
    def test_package_is_a_real_opc_zip(self):
        blob = docx.synth_docx(["hello"])
        z = zipfile.ZipFile(io.BytesIO(blob))
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "word/document.xml"} <= names

    @pytest.mark.parametrize(
        "payload",
        [
            b"not a zip",
            b"PK\x03\x04 truncated",
        ],
    )
    def test_malformed_raises(self, payload):
        with pytest.raises(ValueError):
            docx.decode_docx_text(payload)

    def test_zip_without_document_xml_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="no word/document.xml"):
            docx.decode_docx_text(buf.getvalue())

    def test_oversized_document_xml_rejected_before_inflate(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("word/document.xml", "x" * (docx.MAX_DOCUMENT_XML + 1))
        with pytest.raises(ValueError, match="exceeds cap"):
            docx.decode_docx_text(buf.getvalue())

    def test_bad_xml_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", "<w:document>unclosed")
        with pytest.raises(ValueError, match="bad document.xml"):
            docx.decode_docx_text(buf.getvalue())

    def test_doctype_rejected_before_parse(self):
        # ADVICE r10: the size cap bounds zip inflation, not entity
        # expansion — a DTD in document.xml is rejected outright
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(
                "word/document.xml",
                '<!DOCTYPE x [<!ENTITY a "aaaa"><!ENTITY b "&a;&a;&a;">]>'
                "<w:document>&b;</w:document>",
            )
        with pytest.raises(ValueError, match="DTD"):
            docx.decode_docx_text(buf.getvalue())


class TestOperator:
    def test_per_paragraph_rows_and_corrupt_policy(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i} " + "word " * 35) for i in range(8)],
            "doc_id long, text string",
        )
        payloads = docx.with_synthetic_docx_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 2, F.lit(b"PK garbage")).otherwise(
                F.col("payload")
            ),
        )
        rows = docx.docx_text_paragraphs(broken).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [(r.para_idx, r.ok) for r in by_doc[2]] == [(-1, False)]
        for d, rs in by_doc.items():
            if d == 2:
                continue
            assert len(rs) == 1 + d % 4
            full = "".join(
                r.para_text for r in sorted(rs, key=lambda r: r.para_idx)
            )
            src = f"doc {d} " + "word " * 35
            assert full == src[: 40 * len(rs)]
