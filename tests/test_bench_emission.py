"""The driver tail-captures bench.py stdout and parses the LAST line as
JSON; round 3's single giant line overflowed that capture and the round
recorded no machine-readable bench at all (BENCH_r03 "parsed": null).
Pin the emission contract: the final line is the compact summary and it
stays far inside the capture window."""

import json

import bench


def _fake_out(n_headline: int = 25, n_tpch: int = 14) -> dict:
    qs = {f"q{i}_some_longish_query_name_{i}": round(0.1234 + i, 4) for i in range(n_headline)}
    sec = lambda names: {  # noqa: E731
        "queries": {n: 0.5 for n in names},
        "duckdb_queries": {n: 0.1 for n in names},
        "total_sec": 12.3456,
        "paired_subset_sec": {"spark": 12.3, "duckdb": 4.56},
        "spark_vs_duckdb_ratio": 2.698,
    }
    return {
        "metric": "headline_queries_total_sec",
        "value": 7.8901,
        "unit": "sec",
        "queries": qs,
        "load_sec": 30.12,
        "sf": 0.1,
        "cpus": 32,
        "duckdb_queries": {n: 0.1 for n in qs},
        "paired_subset_sec": {"spark": 7.8, "duckdb": 1.6},
        "spark_vs_duckdb_ratio": 4.875,
        "tpch": sec([f"q{i}_tpch" for i in range(n_tpch)]),
        "northstar_extras": sec([f"ns_extra_{i}" for i in range(8)]),
        "sf1": {
            **sec([f"q{i}" for i in range(n_headline + n_tpch)]),
            "scaling_x_vs_primary": {f"q{i}": 2.0 for i in range(n_headline + n_tpch)},
        },
    }


def test_compact_line_fits_tail_capture():
    out = _fake_out()
    line = json.dumps(bench.compact_summary(out, "/root/repo/bench_full.json"))
    # r3's captured tail was ~2.6 KB of a much longer line; keep the
    # whole compact line comfortably under half that window
    assert len(line) < 1800, len(line)
    parsed = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed, k
    assert parsed["paired_ratio_sf1"] == 2.698
    assert parsed["paired_ratio_primary_sf"] == 4.875
    assert parsed["n_queries"] == 25


def test_compact_line_survives_missing_sections():
    out = _fake_out()
    out["tpch"] = {"error": "boom"}
    del out["sf1"]
    del out["northstar_extras"]
    parsed = json.loads(json.dumps(bench.compact_summary(out)))
    assert parsed["paired_ratio_tpch"] is None
    assert parsed["paired_ratio_sf1"] is None
    assert parsed["sf1_total_sec"] is None


def test_headline_set_has_no_duplicates_and_compact_covers_it():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    out = _fake_out(n_headline=len(bench.HEADLINE))
    line = json.dumps(bench.compact_summary(out, "bench_full.json"))
    assert len(line) < 1800, len(line)


def test_compact_line_carries_self_adjudication_fields():
    """r7 (VERDICT-r6 #1a): the driver-parsed line must carry the
    interleaved per-pass ratios and the calib probe so host noise is
    adjudicable from the artifact alone — and still fit the capture."""
    out = _fake_out(n_headline=len(bench.HEADLINE))
    out["batched_passes"] = {
        "spark": [2.1, 2.2, 2.05, 2.3, 2.15],
        "duckdb": [1.4, 1.5, 1.38, 1.52, 1.41],
        "ratio": [1.5, 1.467, 1.486, 1.513, 1.525],
        "batched_sec": 2.05,
        "duck_sec": 1.38,
        "ratio_median": 1.5,
    }
    out["calib"] = {"ref": bench.CALIB_REF, "start": 0.101, "mid": 0.15, "end": 0.103}
    out["batched_headline_sec"] = 2.05
    out["batched_vs_duckdb_ratio"] = 1.5
    line = json.dumps(bench.compact_summary(out, "bench_full.json"))
    assert len(line) < 2100, len(line)
    parsed = json.loads(line)
    assert parsed["batched_ratio_passes"] == [1.5, 1.467, 1.486, 1.513, 1.525]
    assert parsed["calib"]["ref"] == bench.CALIB_REF
    assert parsed["primary_ratio_metric"] == "jobgroup_interleaved_median"


def test_median_rule():
    assert bench._median([]) is None
    assert bench._median([3.0]) == 3.0
    assert bench._median([1.0, 9.0, 2.0]) == 2.0
    assert bench._median([1.0, 2.0, 3.0, 10.0]) == 2.5
