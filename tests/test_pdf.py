"""PDF codec (operators/pdf.py): encode->decode round trips, spec
structure, malformed-input policy, and the Spark per-page operator."""

import re
import zlib

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import pdf


class TestRoundTrip:
    @pytest.mark.parametrize(
        "texts",
        [
            ["plain page"],
            ["two", "pages"],
            ["", "", ""],
            ["parens (nested (deep)) stay intact"],
            ["back\\slash and \\(escaped\\) literals"],
            ["tab\there newline\nhere"],
            ["x" * 60, "y" * 60, "z" * 13],
        ],
    )
    def test_texts_survive(self, texts):
        assert pdf.decode_pdf_text(pdf.synth_pdf(texts)) == texts

    def test_page_order_is_page_tree_order(self):
        texts = [f"page {i}" for i in range(7)]
        assert pdf.decode_pdf_text(pdf.synth_pdf(texts)) == texts

    def test_octal_escapes_decode(self):
        # hand-build a content stream with \101\102 ('AB') — the
        # encoder never emits octal, so pin the decoder path directly
        content = rb"BT (\101\102) Tj ET"
        assert pdf._content_text(content) == "AB"

    def test_strings_without_show_operator_are_dropped(self):
        # (x) consumed by a non-text operator must not leak into text
        content = rb"BT (dropped) Td (kept) Tj ET"
        assert pdf._content_text(content) == "kept"


class TestStructure:
    def test_output_is_structurally_valid(self):
        blob = pdf.synth_pdf(["hello", "world"])
        assert blob.startswith(b"%PDF-1.4")
        assert blob.rstrip().endswith(b"%%EOF")
        # xref offsets must point at their objects exactly
        offs = pdf._xref_offsets(blob)
        for num, off in offs.items():
            assert re.match(
                rf"{num} 0 obj".encode(), blob[off : off + 20]
            ), num
        # content streams really are zlib (FlateDecode), not stored
        m = re.search(rb"stream\r?\n", blob)
        assert zlib.decompress(blob[m.end() : m.end() + 200]) is not None

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"not a pdf at all",
            lambda b: b[:-40],                         # truncated tail
            lambda b: b.replace(b"xref", b"xrEf", 1),  # broken xref kw
            lambda b: b.replace(b"/Root", b"/Rooo", 1),
            lambda b: b.replace(b"stream\n", b"strean\n", 1),
        ],
    )
    def test_malformed_raises_valueerror(self, mutate):
        blob = pdf.synth_pdf(["some text here"])
        with pytest.raises(ValueError):
            pdf.decode_pdf_text(mutate(blob))

    def test_stream_bytes_containing_endobj_do_not_truncate(self):
        # ADVICE r10: FlateDecode bytes are arbitrary and can contain
        # the 6-byte sequence "endobj" — the object body must be
        # bounded by the declared /Length, not a byte scan
        raw = b"XXX" + b"endobj" + b"YYY"
        comp = zlib.compress(raw, 0)  # level 0: stored literals
        assert b"endobj" in comp
        buf = (
            b"7 0 obj\n"
            + f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
            + comp
            + b"\nendstream\nendobj\n"
        )
        body = pdf._obj_body(buf, 0, 7)
        assert pdf._stream_data(body, pdf._dict_of(body)) == raw

    def test_uncompressed_stream_with_endobj_in_data(self):
        data = b"BT (endobj) Tj ET" + b" endobj padding"
        buf = (
            b"3 0 obj\n"
            + f"<< /Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream\nendobj\n"
        )
        body = pdf._obj_body(buf, 0, 3)
        assert pdf._stream_data(body, pdf._dict_of(body)) == data


class TestOperator:
    def test_per_page_rows_and_corrupt_policy(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i} " + "word " * 30) for i in range(9)],
            "doc_id long, text string",
        )
        payloads = pdf.with_synthetic_pdf_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 4, F.lit(b"%PDF-1.4 garbage")).otherwise(
                F.col("payload")
            ),
        )
        rows = pdf.pdf_text_pages(broken).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # corrupt doc: exactly one ok=False sentinel row
        assert [(r.page_idx, r.ok) for r in by_doc[4]] == [(-1, False)]
        # healthy docs: 1 + doc_id % 3 pages, text = 60-char slices
        for d, rs in by_doc.items():
            if d == 4:
                continue
            assert len(rs) == 1 + d % 3
            full = "".join(r.page_text for r in sorted(rs, key=lambda r: r.page_idx))
            src = f"doc {d} " + "word " * 30
            assert full == src[: 60 * len(rs)]
