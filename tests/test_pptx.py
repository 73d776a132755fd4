"""PPTX codec (operators/pptx.py): round trips, deck ordering from
sldIdLst, OPC structure, hardening, and the Spark per-shape operator."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import pptx


class TestRoundTrip:
    @pytest.mark.parametrize(
        "slides",
        [
            [("title", "body")],
            [("one", "1"), ("two", "2"), ("three", "3")],
            [("", "")],
            [("xml specials & < >", "stay intact")],
            [("  leading spaces", "trailing  ")],
            [("x" * 25, "y" * 25)],
        ],
    )
    def test_slides_survive(self, slides):
        assert pptx.decode_pptx_text(pptx.synth_pptx(slides)) == [
            [t, b] for t, b in slides
        ]

    def test_deck_order_comes_from_sldidlst_not_zip_order(self):
        # synth writes slide parts to the zip REVERSED on purpose
        blob = pptx.synth_pptx([("first", "f"), ("second", "s"), ("third", "t")])
        names = zipfile.ZipFile(io.BytesIO(blob)).namelist()
        slide_names = [n for n in names if n.startswith("ppt/slides/")]
        assert slide_names == [
            "ppt/slides/slide3.xml", "ppt/slides/slide2.xml",
            "ppt/slides/slide1.xml",
        ]
        assert [s[0] for s in pptx.decode_pptx_text(blob)] == [
            "first", "second", "third",
        ]

    def test_runs_concatenate_and_formatting_skipped(self):
        # every shape is split across a bold and a plain run
        long = "a" * 11 + "B" * 9  # crosses the run split at 11
        assert pptx.decode_pptx_text(pptx.synth_pptx([(long, "x")]))[0][0] == long

    def test_package_is_a_real_opc_zip(self):
        z = zipfile.ZipFile(io.BytesIO(pptx.synth_pptx([("a", "b")])))
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "ppt/presentation.xml" in names
        assert "ppt/_rels/presentation.xml.rels" in names


class TestHardening:
    def test_not_a_zip(self):
        with pytest.raises(ValueError):
            pptx.decode_pptx_text(b"nope")

    def test_missing_presentation(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="no ppt/presentation.xml"):
            pptx.decode_pptx_text(buf.getvalue())

    def test_doctype_rejected(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(
                "ppt/presentation.xml",
                '<!DOCTYPE x [<!ENTITY a "aa">]><p:presentation/>',
            )
        with pytest.raises(ValueError, match="DTD"):
            pptx.decode_pptx_text(buf.getvalue())

    def test_unresolved_slide_rel(self):
        blob = pptx.synth_pptx([("a", "b")])
        buf = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w"
        ) as zout:
            for item in zin.infolist():
                data = zin.read(item)
                if item.filename == "ppt/_rels/presentation.xml.rels":
                    data = data.replace(b'Id="rId1"', b'Id="rId9"')
                zout.writestr(item.filename, data)
        with pytest.raises(ValueError, match="unresolved"):
            pptx.decode_pptx_text(buf.getvalue())


class TestOperator:
    def test_per_shape_rows_and_corrupt_policy(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i} " + "word " * 40) for i in range(9)],
            "doc_id long, text string",
        )
        payloads = pptx.with_synthetic_pptx_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 4, F.lit(b"PK garbage")).otherwise(
                F.col("payload")
            ),
        )
        rows = pptx.pptx_slide_texts(broken).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [(r.slide_idx, r.ok) for r in by_doc[4]] == [(-1, False)]
        texts = {r.doc_id: r.text for r in docs.collect()}
        for d, rs in by_doc.items():
            if d == 4:
                continue
            assert len(rs) == 2 * (1 + d % 3)
            for r in sorted(rs, key=lambda r: (r.slide_idx, r.shape_idx)):
                start = 50 * r.slide_idx + 25 * r.shape_idx
                assert r.shape_text == texts[d][start : start + 25]
