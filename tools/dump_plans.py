"""Capture `.explain("formatted")` for catalog queries into text files.

Optimization-round evidence tool (guide §1 / §7.2): writes one
`<query>_<tag>.txt` per query under plans/r10/ so plan claims
("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are checkable
without running Spark.

Usage:
    python tools/dump_plans.py <tag> [query ...]
        tag: suffix, e.g. `before` or `after`
        queries: catalog names (default: the optimization target set)

Environment mirrors bench.py's benched-SF serving state (sf0.1 tables
cached, AQE off at sf<=0.2, sequential width 8) so the captured plan is
the one the bench actually times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DEFAULT_TARGETS = [
    "ns_lsh_ann_topk_md5",
    "ns_ivf_ann_topk_seeded",
    "ns_pq_ann_topk_seeded",
    "ns_minhash_lsh_candidates",
    "ns_semantic_dedup",
    "q21_waiting_suppliers",
    "q5_region_revenue",
    "q3_top_revenue_orders",
    "q10_returned_items",
    "q1_pricing_summary",
    "window_top3_per_customer",
    "ns_pagerank",
    "ns_ppr_topk",
    "ns_label_prop",
    "ns_host_graph",
    "ns_url_resolve",
    "ns_dsir_weights",
    "ns_kmv_set_ops",
    "ns_image_decode_meta",
    "ns_quality_classifier",
    "ns_lm_perplexity",
    "ns_anchor_text_index",
    "ns_lang_id",
    "ns_simhash_md5",
    "ns_line_dedup",
    "ns_substring_dedup",
    "ns_dedup_exact",
    "ns_text_stats",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1")

    from flumedb_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("flumedb_spark_plandump", cpus=cpus)
    # benched-SF serving state (bench.py): AQE off at tiny SFs,
    # sequential width 8, tables cached
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    qs = entry.queries()
    qs["o7_since"](spark, sf_dir).collect()
    from flumedb_spark.catalog import TABLES

    for t in TABLES:
        spark.catalog.cacheTable(t)
        spark.table(t).count()

    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR", os.path.join(_REPO, "plans", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"ERROR constructing/explaining {name}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "CartesianProduct",
                "BroadcastNestedLoopJoin",
            )
            if j in text
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
            if p in text
        ]
        print(f"{name}: Exchange x{n_ex} joins={joins or '-'} python={py or '-'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
