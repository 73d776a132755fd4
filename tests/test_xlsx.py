"""XLSX cell extraction (operators/xlsx.py): SpreadsheetML roundtrip,
cell-type resolution, reference decoding, hardening, and the Spark
operator contract."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import xlsx


class TestRefs:
    def test_single_and_multi_letter(self):
        assert xlsx.ref_to_row_col("A1") == (1, 1)
        assert xlsx.ref_to_row_col("Z9") == (9, 26)
        assert xlsx.ref_to_row_col("AA10") == (10, 27)
        assert xlsx.ref_to_row_col("AB3") == (3, 28)
        assert xlsx.col_letters(1) == "A"
        assert xlsx.col_letters(26) == "Z"
        assert xlsx.col_letters(27) == "AA"
        assert xlsx.col_letters(702) == "ZZ"

    def test_bad_ref_raises(self):
        with pytest.raises(ValueError):
            xlsx.ref_to_row_col("1A")


class TestRoundtrip:
    def test_all_four_cell_types(self):
        blob = xlsx.synth_xlsx("S2", ["hello world", "second row"], 7)
        cells = xlsx.decode_xlsx_cells(blob)
        by_ref = {c[1]: c for c in cells}
        assert by_ref["A1"] == ("S2", "A1", 1, 1, "s", "hello world")
        assert by_ref["B1"] == ("S2", "B1", 1, 2, "n", "217")  # 7*31
        # boolean wire value (doc_id + r) % 2: doc 7 row 0 -> 1 -> TRUE
        assert by_ref["C1"] == ("S2", "C1", 1, 3, "b", "TRUE")
        assert by_ref["C2"][5] == "FALSE"
        assert by_ref["D1"] == ("S2", "D1", 1, 4, "n", "434")  # cached 2*217

    def test_shared_strings_dereferenced_with_spaces(self):
        blob = xlsx.synth_xlsx("S0", ["  leading and trailing  "], 0)
        cells = xlsx.decode_xlsx_cells(blob)
        a1 = next(c for c in cells if c[1] == "A1")
        assert a1[5] == "  leading and trailing  "

    def test_xml_escaping(self):
        blob = xlsx.synth_xlsx("S1", ["a<b>&amp;\"c\""], 1)
        a1 = next(c for c in xlsx.decode_xlsx_cells(blob) if c[1] == "A1")
        assert a1[5] == "a<b>&amp;\"c\""

    def test_inline_string_cells(self):
        # hand-build a sheet with t="inlineStr" (synth uses shared
        # strings; real workbooks mix both)
        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        blob = xlsx.synth_xlsx("S0", ["x"], 0)
        buf = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w"
        ) as zout:
            for item in zin.infolist():
                data = zin.read(item)
                if item.filename == "xl/worksheets/sheet1.xml":
                    data = (
                        f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
                        '<c r="A1" t="inlineStr"><is><t>inline!</t></is></c>'
                        "</row></sheetData></worksheet>"
                    ).encode()
                zout.writestr(item.filename, data)
        cells = xlsx.decode_xlsx_cells(buf.getvalue())
        assert cells == [("S0", "A1", 1, 1, "s", "inline!")]


class TestHardening:
    def test_not_a_zip(self):
        with pytest.raises(ValueError):
            xlsx.decode_xlsx_cells(b"definitely not a zip")

    def test_missing_workbook(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("something.txt", "x")
        with pytest.raises(ValueError, match="no xl/workbook.xml"):
            xlsx.decode_xlsx_cells(buf.getvalue())

    def test_doctype_rejected(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(
                "xl/workbook.xml",
                '<!DOCTYPE x [<!ENTITY a "aaaa">]><workbook>&a;</workbook>',
            )
        with pytest.raises(ValueError, match="DTD"):
            xlsx.decode_xlsx_cells(buf.getvalue())

    def test_oob_shared_string_index_rejected(self):
        blob = xlsx.synth_xlsx("S0", ["x"], 0)
        buf = io.BytesIO()
        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        with zipfile.ZipFile(io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w"
        ) as zout:
            for item in zin.infolist():
                data = zin.read(item)
                if item.filename == "xl/worksheets/sheet1.xml":
                    data = (
                        f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
                        '<c r="A1" t="s"><v>99</v></c>'
                        "</row></sheetData></worksheet>"
                    ).encode()
                zout.writestr(item.filename, data)
        with pytest.raises(ValueError, match="OOB"):
            xlsx.decode_xlsx_cells(buf.getvalue())


class TestOperator:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(d, f"doc {d} " + "lorem ipsum dolor sit amet " * 4)
             for d in range(12)],
            "doc_id long, text string",
        )

    def test_cells_match_synth_formulas(self, spark, docs):
        payloads = xlsx.with_synthetic_xlsx_payload(docs)
        out = xlsx.xlsx_cells(payloads).collect()
        texts = {r.doc_id: r.text for r in docs.collect()}
        expect_n = sum(4 * xlsx.n_rows_for(d) for d in texts)
        assert len(out) == expect_n
        for r in out:
            assert r.ok and r.sheet == f"S{r.doc_id % 5}"
            if r.col_num == 1:
                t = texts[r.doc_id]
                assert r.value == t[30 * (r.row_num - 1) : 30 * r.row_num]
            elif r.col_num == 2:
                assert r.value == str(r.doc_id * 31 + (r.row_num - 1) * 7)

    def test_corrupt_blob_sentinel_row(self, spark, docs):
        payloads = xlsx.with_synthetic_xlsx_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 2, F.lit(b"junk")).otherwise(
                F.col("payload")
            ),
        )
        out = xlsx.xlsx_cells(broken).collect()
        bad = [r for r in out if not r.ok]
        assert len(bad) == 1 and bad[0].doc_id == 2 and bad[0].row_num == -1
