"""Email (EML/MBOX) and RTF codecs (operators/eml.py, operators/rtf.py):
round trips, wire-format structure, hardening, and the Spark operators."""

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import eml, rtf


class TestEmlRoundTrip:
    @pytest.mark.parametrize(
        "subject,plain,html",
        [
            ("hello", "plain body", "html body"),
            ("", "", ""),
            ("subject with spaces  ", "body  with  doubles", "x"),
            ("s", "x " * 60, "y" * 100),  # QP soft breaks, b64 folding
            ("utf-8 snowman ☃", "café body", "nested ü text"),
            ("a&b <c>", "specials & < > intact", "amp & lt < text"),
        ],
    )
    def test_parts_survive(self, subject, plain, html):
        got_subj, parts = eml.decode_eml(
            eml.synth_eml(subject, plain, html, 3)
        )
        assert got_subj == subject
        assert parts == [("text/plain", plain), ("text/html", html)]

    def test_subject_is_rfc2047_encoded_on_the_wire(self):
        raw = eml.synth_eml("secret subject", "b", "h")
        assert b"secret subject" not in raw  # encoded-word, not plaintext
        assert b"=?utf-8?B?" in raw

    def test_plain_part_is_quoted_printable_html_is_base64(self):
        raw = eml.synth_eml("s", "body", "html")
        assert b"Content-Transfer-Encoding: quoted-printable" in raw
        assert b"Content-Transfer-Encoding: base64" in raw

    def test_html_tags_and_style_are_stripped(self):
        _, parts = eml.decode_eml(eml.synth_eml("s", "p", "flat me"))
        assert parts[1] == ("text/html", "flat me")

    @pytest.mark.parametrize(
        "blob", [b"", b"not an email at all\x00\xff"]
    )
    def test_malformed_rejected(self, blob):
        with pytest.raises(ValueError):
            eml.decode_eml(blob)

    def test_headers_only_message_is_one_empty_plain_part(self):
        # RFC 5322 allows an empty body; that is a valid message, not
        # a decode failure
        subj, parts = eml.decode_eml(b"Subject: only\r\n\r\n")
        assert subj == "only"
        assert parts == [("text/plain", "")]

    def test_oversize_rejected(self):
        big = b"From: a@corp.test\r\n\r\n" + b"x" * (eml.MAX_MESSAGE + 1)
        with pytest.raises(ValueError, match="exceeds cap"):
            eml.decode_eml(big)


class TestMbox:
    def test_round_trip_with_from_quoting(self):
        m1 = eml.synth_eml("a", "From the start of line", "h", 1)
        m2 = eml.synth_eml("b", ">From quoted already", "", 2)
        m3 = eml.synth_eml("c", "plain", "", 3)
        back = eml.split_mbox(eml.mbox_bytes([m1, m2, m3]))
        assert len(back) == 3
        for orig, got in zip([m1, m2, m3], back):
            assert eml.decode_eml(orig) == eml.decode_eml(got)

    def test_separator_lines_survive_in_bodies(self):
        # a body whose QP-encoded form contains "From " at line start
        # must not split the mailbox
        m = eml.synth_eml("s", "From here to there", "", 9)
        blob = eml.mbox_bytes([m, m])
        assert len(eml.split_mbox(blob)) == 2

    def test_not_an_mbox_rejected(self):
        with pytest.raises(ValueError, match="From"):
            eml.split_mbox(b"Subject: x\n\nbody")


class TestRtfRoundTrip:
    @pytest.mark.parametrize(
        "paras",
        [
            ["one paragraph"],
            ["first", "second", "third"],
            ["", ""],
            ["back\\slash {curly} braces"],
            ["unicode é中 ok", "high byte ÿ"],
            ["tab\there", "x" * 40],
        ],
    )
    def test_paragraphs_survive(self, paras):
        assert rtf.decode_rtf_text(rtf.synth_rtf(paras)) == paras

    def test_escapes_actually_on_the_wire(self):
        raw = rtf.synth_rtf(["abcdefghijklmnopqrstuvwxyz"])
        assert b"\\'" in raw  # hex escapes exercised
        assert b"\\u" in raw  # unicode escapes exercised
        assert b"{\\b" in raw  # group nesting exercised

    def test_font_and_color_tables_not_leaked(self):
        got = rtf.decode_rtf_text(rtf.synth_rtf(["body only"]))
        assert got == ["body only"]
        assert not any("Times" in p or "Arial" in p for p in got)

    def test_ignorable_destination_skipped(self):
        blob = (
            b"{\\rtf1\\ansi {\\*\\mystery hidden stuff}visible\\par}"
        )
        assert rtf.decode_rtf_text(blob) == ["visible"]

    def test_bin_skip(self):
        blob = b"{\\rtf1\\ansi \\bin5 \x00\x01{}}abc\\par}"
        # \bin5 swallows 5 raw bytes including braces
        assert rtf.decode_rtf_text(blob) == ["abc"]

    def test_uc_fallback_skip(self):
        blob = b"{\\rtf1\\ansi \\uc2\\u9731 ??after\\par}"
        assert rtf.decode_rtf_text(blob) == ["☃after"]

    def test_negative_unicode_wraparound(self):
        # \u-256 encodes U+FF00 per the 16-bit signed convention
        blob = b"{\\rtf1\\ansi \\u-256?x\\par}"
        assert rtf.decode_rtf_text(blob) == ["＀x"]

    def test_line_control_is_newline(self):
        blob = b"{\\rtf1\\ansi a\\line b\\par}"
        assert rtf.decode_rtf_text(blob) == ["a\nb"]

    def test_raw_crlf_ignored(self):
        blob = b"{\\rtf1\\ansi a\r\nb\\par}"
        assert rtf.decode_rtf_text(blob) == ["ab"]

    @pytest.mark.parametrize(
        "blob,msg",
        [
            (b"plain text", "header"),
            (b"{\\rtf1 unbalanced", "unbalanced"),
            (b"{\\rtf1\\'zz}", "hex"),
            (b"{\\rtf1 too}many}closes}", "unbalanced"),
        ],
    )
    def test_malformed_rejected(self, blob, msg):
        with pytest.raises(ValueError, match=msg):
            rtf.decode_rtf_text(blob)


class TestSparkOperators:
    def test_eml_rows(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
        docs.createOrReplaceTempView("documents")
        payloads = eml.with_synthetic_eml_payload(docs)
        rows = eml.eml_part_texts(payloads).orderBy("doc_id", "part_idx").collect()
        assert all(r.ok for r in rows)
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        texts = {r[0]: r[1] for r in docs.select("doc_id", "text").collect()}
        for d, rs in by_doc.items():
            assert [r.mime_type for r in rs] == ["text/plain", "text/html"]
            assert rs[0].subject == texts[d][:20]
            assert rs[0].part_text == texts[d][20:80]
            assert rs[1].part_text == texts[d][80:140]

    def test_mbox_rows(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
        payloads = eml.with_synthetic_mbox_payload(docs)
        rows = eml.mbox_messages(payloads).collect()
        assert all(r.ok for r in rows)
        n_by_doc = {}
        for r in rows:
            n_by_doc[r.doc_id] = n_by_doc.get(r.doc_id, 0) + 1
        for d, n in n_by_doc.items():
            assert n == 1 + d % 2

    def test_rtf_rows_corrupt_degrades(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
        payloads = rtf.with_synthetic_rtf_payload(docs)
        # corrupt one payload worker-side
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 0, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        rows = rtf.rtf_paragraphs(broken).collect()
        bad = [r for r in rows if not r.ok]
        assert len(bad) == 1 and bad[0].doc_id == 0 and bad[0].para_idx == -1
        good = [r for r in rows if r.ok]
        assert all(r.doc_id != 0 for r in good)


class TestAttachments:
    def test_round_trip(self):
        import numpy as np

        from flumedb_spark.operators import mmcodec

        arr = np.full((5, 9, 3), (7, 8, 9), np.uint8)
        raw = eml.synth_eml_with_attachment(
            "subj", "body", mmcodec.encode_bmp(arr), 3
        )
        atts = eml.decode_eml_attachments(raw)
        assert len(atts) == 1
        fn, mt, blob = atts[0]
        assert (fn, mt) == ("scan.bmp", "image/bmp")
        assert np.array_equal(mmcodec.decode_bmp(blob), arr)
        # the text part still decodes through the normal path
        subj, parts = eml.decode_eml(raw)
        assert subj == "subj" and parts == [("text/plain", "body")]

    def test_text_only_message_has_no_attachments(self):
        raw = eml.synth_eml("s", "p", "h")
        assert eml.decode_eml_attachments(raw) == []

    def test_operator_corrupt_degrades(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
        payloads = eml.with_synthetic_eml_attachment_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 1, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        rows = {r.doc_id: r for r in eml.eml_attachment_stats(broken).collect()}
        assert not rows[1].ok
        for d, r in rows.items():
            if d == 1:
                continue
            w, h, rgb = eml.attachment_dims_for(d)
            assert r.ok and (r.width, r.height) == (w, h)
            assert r.pixel_sum == w * h * sum(rgb)
