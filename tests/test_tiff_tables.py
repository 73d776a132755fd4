"""TIFF codec (operators/tiffcodec.py) and HTML table extraction
(operators/html.html_tables)."""

import numpy as np
import pytest
from pyspark.sql import Row

from flumedb_spark.operators import html as html_mod
from flumedb_spark.operators import tiffcodec as tc


class TestPackBits:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"x",
            b"a" * 300,  # runs past the 128 cap
            b"ab" * 100,  # worst-case alternation
            bytes(range(256)),
            b"aab" * 50,  # 2-runs stay literal
            b"\x00" * 128 + b"\x01",
        ],
    )
    def test_round_trip(self, data):
        assert tc.packbits_decode(tc.packbits_encode(data), len(data)) == data

    def test_compresses_constant_runs(self):
        assert len(tc.packbits_encode(b"z" * 1000)) < 20

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            tc.packbits_decode(b"\x05ab", 6)  # literal claims 6, has 2
        with pytest.raises(ValueError):
            tc.packbits_decode(b"\xfe", 3)  # repeat without byte

    def test_noop_byte_skipped(self):
        assert tc.packbits_decode(b"\x80\x00a", 1) == b"a"


class TestTiffRoundTrip:
    @pytest.mark.parametrize("big_endian", [False, True])
    @pytest.mark.parametrize(
        "compression", [tc.COMPRESSION_NONE, tc.COMPRESSION_PACKBITS]
    )
    @pytest.mark.parametrize("dims", [(1, 1), (8, 16), (23, 47), (5, 3)])
    def test_pixels_survive(self, big_endian, compression, dims):
        h, w = dims
        rng = np.random.RandomState(h * 100 + w)
        arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        back, meta = tc.decode_tiff(
            tc.encode_tiff(arr, big_endian=big_endian, compression=compression)
        )
        assert np.array_equal(arr, back)
        assert meta["endianness"] == ("big" if big_endian else "little")
        assert meta["compression"] == compression
        assert meta["n_strips"] == (h + tc.ROWS_PER_STRIP - 1) // tc.ROWS_PER_STRIP

    def test_both_byte_orders_on_the_wire(self):
        a = np.zeros((2, 2, 3), np.uint8)
        assert tc.encode_tiff(a, big_endian=False)[:2] == b"II"
        assert tc.encode_tiff(a, big_endian=True)[:2] == b"MM"

    def test_inline_value_rule_big_endian(self):
        # a big-endian SHORT count=1 value must live in the FIRST two
        # bytes of the value field; a reader that unpacks the whole
        # 4-byte field as LONG decodes compression 65536+c and fails
        a = np.full((3, 5, 3), 9, np.uint8)
        back, meta = tc.decode_tiff(
            tc.encode_tiff(a, big_endian=True, compression=tc.COMPRESSION_PACKBITS)
        )
        assert meta["compression"] == tc.COMPRESSION_PACKBITS
        assert np.array_equal(a, back)

    @pytest.mark.parametrize(
        "blob",
        [
            b"",
            b"XX\x2a\x00\x08\x00\x00\x00",  # bad byte-order mark
            b"II\x2b\x00\x08\x00\x00\x00",  # bad magic
            b"II\x2a\x00\xff\xff\xff\x0f",  # IFD offset past EOF
        ],
    )
    def test_malformed_rejected(self, blob):
        with pytest.raises(ValueError):
            tc.decode_tiff(blob)

    def test_implausible_dims_rejected(self):
        a = np.zeros((1, 1, 3), np.uint8)
        blob = bytearray(tc.encode_tiff(a))
        # widen ImageWidth to a decompression-bomb size in place
        i = blob.find(b"\x00\x01\x04\x00")  # tag 256, type LONG (LE)
        assert i > 0
        blob[i + 8 : i + 12] = (2**30).to_bytes(4, "little")
        with pytest.raises(ValueError, match="implausible|mismatch"):
            tc.decode_tiff(bytes(blob))


class TestTiffOperator:
    def test_stats_match_params(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
        rows = tc.tiff_decode_stats(
            tc.with_synthetic_tiff_payload(docs)
        ).collect()
        assert all(r.ok for r in rows)
        for r in rows:
            w, h, rgb, big, comp = tc.synth_tiff_params(r.doc_id)
            assert (r.width, r.height) == (w, h)
            assert r.endianness == ("big" if big else "little")
            assert r.compression == comp
            assert r.pixel_sum == w * h * sum(rgb)


class TestHtmlTables:
    def _cells(self, spark, page):
        df = spark.createDataFrame([Row(doc_id=1, html=page)])
        return html_mod.html_tables(df).collect()

    def test_basic_grid(self, spark):
        rows = self._cells(
            spark,
            "<table><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td>a</td><td>b</td></tr></table>",
        )
        got = {(r.row_idx, r.col_idx): (r.cell_text, r.is_header) for r in rows}
        assert got == {
            (0, 0): ("h1", True), (0, 1): ("h2", True),
            (1, 0): ("a", False), (1, 1): ("b", False),
        }

    def test_inline_tags_and_entities_flattened(self, spark):
        rows = self._cells(
            spark, "<table><tr><td>a <b>bold</b> &amp; done</td></tr></table>"
        )
        assert rows[0].cell_text == "a bold & done"

    def test_nested_table_cells_do_not_leak(self, spark):
        rows = self._cells(
            spark,
            "<table><tr><td>outer"
            "<table><tr><td>inner</td></tr></table>"
            "</td></tr></table>",
        )
        by_table = {}
        for r in rows:
            by_table.setdefault(r.table_idx, []).append(r.cell_text)
        assert by_table[0] == ["outer"]
        assert by_table[1] == ["inner"]

    def test_multiple_tables_indexed(self, spark):
        rows = self._cells(
            spark,
            "<table><tr><td>t0</td></tr></table>"
            "<p>between</p>"
            "<table><tr><td>t1</td></tr></table>",
        )
        assert [(r.table_idx, r.cell_text) for r in rows] == [(0, "t0"), (1, "t1")]

    def test_text_outside_cells_ignored(self, spark):
        rows = self._cells(
            spark,
            "<p>prose</p><table>stray<tr>stray2<td>only</td></tr></table>",
        )
        assert [r.cell_text for r in rows] == ["only"]

    def test_corrupt_page_degrades(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, html=None), Row(doc_id=2, html="<table><tr><td>x")]
        )
        rows = {r.doc_id: r for r in html_mod.html_tables(df).collect()}
        assert not rows[1].ok and rows[1].table_idx == -1
        # unclosed markup still parses best-effort (html.parser is
        # forgiving); the cell is captured
        assert rows[2].ok and rows[2].cell_text == "x"
