"""The driver executes only the first 50 entries of ``queries()`` — pin
what that window must contain so a registry edit can't silently push a
component out of driver validation (the round-1 failure mode: all 18
north-star ops sat at positions 50+ and got zero CORRECTNESS rows).
"""

import __spark_entry__ as entry
from flumedb_spark import catalog

WINDOW = 50


def _window_names():
    return list(entry.queries())[:WINDOW]


def test_window_is_exactly_the_curated_list():
    assert _window_names() == catalog.DRIVER_WINDOW
    assert len(catalog.DRIVER_WINDOW) == WINDOW
    assert len(set(catalog.DRIVER_WINDOW)) == WINDOW


def test_all_northstar_ops_in_window():
    names = set(_window_names())
    ns = {n for n in entry.queries() if n.startswith("ns_")}
    # serving-path variants (e.g. ns_similarity_topk_np) duplicate an
    # oracle-checked op already in the window; they don't need a slot
    ns -= {n for n in ns if n.endswith("_np")}
    # rotated out after a driver-green round (freshness is executable:
    # tests/test_full_gate.py re-runs the whole catalog vs DuckDB each
    # suite run — see catalog.DRIVER_WINDOW's rotation policy):
    ns -= {
        # r3 rotations (r2-green, entry text unchanged since)
        "ns_text_quality", "ns_fingerprint", "ns_deterministic_sample",
        "ns_dataset_split_counts", "ns_stratified_sample",
        "ns_multimodal_meta", "ns_dedup_exact", "ns_text_stats",
        # no_oracle rows-only row; its oracle-checked md5 parity twin
        # (ns_simhash_md5) holds the in-window slot for the SimHash path
        "ns_simhash64",
        # rotated out r4 (VERDICT r3 "What's wrong" #4): no_oracle
        # rows-only rows whose oracle-checked parity twins
        # (ns_lsh_ann_topk_md5 / ns_ivf_ann_topk_seeded + recall twins)
        # are in-window and r3-green
        "ns_lsh_ann_topk", "ns_ivf_ann_topk",
        # r5 rotations: r4-green, code frozen this round — their slots
        # went to the six core-O entries rotated back in (VERDICT r4 #4)
        # and (histogram_quantiles) to the new ns_media_meta row
        "ns_image_decode_meta", "ns_decontamination",
        "ns_repetition_ratio", "ns_semantic_dedup", "ns_pii_redaction",
        "ns_chunk_dedup", "ns_histogram_quantiles",
        # late-r5 rotation for ns_archive_listing (dedup family keeps
        # five other in-window rows)
        "ns_url_dedup",
        # r6 rotations: r5-driver-green, code frozen this round; slots
        # went to the new stream_dedup_watermark / ns_avi_frames rows
        # (ns_scd2_history keeps the storage-layout family in-window;
        # ns_jpeg_decode + ns_media_meta keep image/codec coverage)
        "ns_zorder_morton",
        "ns_image_resize_meta",
        # late-r6 rotation for the new ns_avro_records row (skew.py
        # frozen this round; ns_salted_join keeps the family in-window)
        "ns_salted_distinct_count",
        # late-r6 rotation for the new src_orc_roundtrip row (text.py
        # frozen this round; lang_id/rare_token/bpe keep the family)
        "ns_tfidf_topterms",
        # late-r6 rotation for the new ns_parquet_records row
        # (sketches.py frozen; countmin keeps the sketch family)
        "ns_hll_user_estimate",
        # late-r6 rotation for the new stream_session_counts row
        # (chunking frozen; ns_sequence_packing keeps the family)
        "ns_doc_chunks",
        # late-r6 rotation for the new scoring/sketch family
        # (similarity.py frozen this round; the np parity twin + five
        # other ANN rows keep the family in-window)
        "ns_similarity_topk",
        # late-r6 rotations for the two new PQ-ADC rows (both
        # r5-driver-green; dedup family keeps five in-window rows, wav
        # decode stays covered by ns_media_meta + the live gate)
        "ns_embedding_neardup",
        "ns_audio_decode_meta",
        # late-r6 rotation for the new stream_hll_window row (r5-green;
        # sketch family stays in-window via ns_kmv_set_ops + the
        # streaming HLL itself)
        "ns_countmin_event_counts",
        # late-r6 rotation for the new ns_neardup_canonical row
        # (r5-green, path untouched; text family stays in-window via
        # rare_token/bpe + the new gopher/LM rows)
        "ns_lang_id",
        # late-r6 rotations for family #2 (bm25 / dsir / bloom-xdedup /
        # star components): all four r5-driver-green with their modules
        # (bpe.py, skew.py, cdc.py, the rare-token text path) frozen
        # this round; every rotated-out path re-runs vs DuckDB each
        # suite run via tests/test_full_gate.py
        "ns_bpe_tokens",
        "ns_rare_token_share",
        "ns_salted_join",
        "ns_scd2_history",
        # late-r6 rotation for the new src_tar_roundtrip row (r5-green,
        # sampling path untouched; ns_source_mixture keeps the family
        # in-window)
        "ns_weighted_sample",
        # late-r6 rotations for the funnel/retention event-analytics
        # rows (both r5-green, computation paths untouched this round)
        "ns_sequence_packing",
        "ns_pipeline_filter_dedup_join",
        # late-r6 rotation for ns_setsim_join_prefix — the full-corpus
        # exact successor whose brute-force oracle subsumes the subset
        # row's semantics (r5-green, path untouched)
        "ns_ngram_jaccard_pairs",
        # late-r6 rotations for the new ns_pagerank / ts_gapfill_locf
        # rows: both recall twins r5-driver-green, similarity.py frozen
        # this round; their topk rows keep each ANN leg in-window
        "ns_lsh_ann_recall10",
        "ns_ivf_ann_recall10",
        # late-r6 rotation for the new cdc_snapshot_diff row
        # (r5-driver-green; this round's dedup.py changes are all NEW
        # functions — the SimHash path is untouched and live-gated)
        "ns_simhash_md5",
        # r7 rotations for the new ns_ppr_topk / ns_html_text /
        # stream_mad_outliers rows: all three r6-driver-green with
        # their paths frozen this round (graph.py's BFS, timeseries.py's
        # rank_quantile, sketches.py); ns_weighted_paths,
        # ts_gapfill_locf/ts_mad_outliers, and stream_hll_window keep
        # each family in-window, and every rotated-out path re-runs vs
        # DuckDB each suite run via tests/test_full_gate.py
        "ns_shortest_paths",
        "ns_quantile_clip",
        "ns_kmv_set_ops",
        # late-r7 rotation for the new ns_html_links crawl-graph row
        # (r6-driver-green, sampling.py frozen this round)
        "ns_source_mixture",
        # r8 rotations for the new classifier/URL/interval-join rows:
        # all r7-driver-green with graph.py / text.py frozen this round
        # (ns_pagerank + ns_triangle_count keep the graph family
        # in-window; ns_lm_perplexity + the classifier rows keep the
        # scoring family; every rotated-out path re-runs vs DuckDB each
        # suite run via tests/test_full_gate.py)
        "ns_weighted_paths",
        "ns_ppr_topk",
        "ns_script_profile",
        "ns_gopher_quality",
        "ns_curriculum_deciles",
        "ns_lm_perplexity",
        # late-r8 rotations for the new stream_interval_join_left and
        # ns_robots_decisions rows (both r7-driver-green, html.py
        # frozen this round; ns_host_graph chains the html_links kernel
        # at driver level and the crawl-pipeline test chains html_text
        # every suite run)
        "ns_html_text",
        "ns_html_links",
        # late-r8 extension rotations for the new ns_line_dedup /
        # ns_blocklist_filter / ns_mixture_capped rows: both
        # r7-driver-green with dedup.py / profile.py frozen this round
        # (minhash/substring/neardup keep the dedup family in-window;
        # column profiling re-runs vs DuckDB every suite via the live
        # gate)
        "ns_setsim_join_prefix",
        "ns_profile_columns",
        # late-r8 extension rotation for the new ns_label_prop row
        # (r7-driver-green, archives.py frozen; ns_warc_bodies
        # subsumes the enumeration path at driver level)
        "ns_warc_listing",
        # late-r8 extension rotation for the new
        # ns_minhash_decontamination row (r7-driver-green,
        # multimodal.py frozen; ns_media_meta + ns_avi_frames keep the
        # container/codec family in-window)
        "ns_video_meta",
        # late-r8 extension rotation for the new ns_anchor_text_index
        # row (r7-driver-green, archives.py frozen; ns_archive_extract
        # chains the same central-directory listing path)
        "ns_archive_listing",
    }
    assert ns, "north-star ops missing from registry entirely"
    assert ns <= names, f"ns_* outside driver window: {sorted(ns - names)}"


def test_changed_or_new_rows_in_window():
    # window policy: every entry whose implementation or SQL changed
    # this round, and every new entry, must occupy a driver slot; rows
    # green in a prior round with unchanged text keep that attestation
    # (r1-red math_functions/array_agg_sorted went green in r2 and
    # rotated out in r3). Round-3 changed/new set:
    for n in (
        "ns_minhash_lsh_candidates",  # impl changed (band materialization)
        # (o2_bulk_append rotated out late r6 for ns_quantile_clip —
        #  r5-driver-green; the delete_seqs addition does not touch the
        #  bulk-append path, covered by test_bulk_append.py + live gate)
        "ns_lsh_ann_topk_md5",
        # (ns_lsh_ann_recall10 / ns_ivf_ann_recall10 rotated out late
        #  r6 for ns_pagerank / ts_gapfill_locf — r5-driver-green,
        #  similarity.py frozen this round)
        "ns_ivf_ann_topk_seeded",
        "ns_neardup_clusters",        # new: candidates -> dedup decisions
        # new late-round-3: the TPC-H sweep + trained BPE + interval join
        # (q4/q7/q8/q9/q12/q13 rotated out r4 after going driver-green in
        # r3 — catalog_tpch.py untouched in r4, live full gate re-checks)
        # (q11/q16/q17 rotated out late r6 — r5-driver-green,
        #  catalog_tpch.py frozen — for the scoring/sketch family)
        # (q2/q15/q21 rotated out late r6 for ts_mad_outliers /
        #  ns_triangle_count / scd2_point_in_time — all r5-driver-green,
        #  catalog_tpch.py frozen this round; the family stays
        #  live-gated every suite run)
        # (q20/q22 rotated out late r6 for the two src_* loop rows)
        # (ns_bpe_tokens rotated out late r6 — r5-driver-green, bpe.py
        #  frozen — for the new ns_dsir_weights row)
        # (interval_join_events rotated out late r5 for ns_warc_listing;
        #  ns_hll_user_estimate rotated out late r6 for ns_parquet_records)
        # (ns_histogram_quantiles also rotated out r5 for ns_media_meta;
        #  fuzzy_match_names / window_distribution rotated out r5:
        # r4-driver-green, frozen — their slots went to the new
        # ns_video_meta / ns_jpeg_decode rows)
        # (ns_countmin_event_counts rotated out late r6 for
        #  stream_hll_window; ns_weighted_sample rotated out late r6
        #  for src_tar_roundtrip — r5-green, path untouched)
        # (ns_doc_chunks rotated out late r6 for stream_session_counts;
        #  ns_sequence_packing and ns_pipeline_filter_dedup_join rotated
        #  out late r6 for the funnel/retention event-analytics rows —
        #  r5-green, computation paths untouched)
        # (ns_tfidf_topterms rotated out late r6 for src_orc_roundtrip)
        # real multimodal decode (pure-stdlib codecs, mmcodec.py)
        # (ns_image_resize_meta rotated out r6 for ns_avi_frames;
        #  ns_audio_decode_meta rotated out late r6 for
        #  ns_pq_ann_recall10)
        # r5 new: real ISO BMFF container-metadata parse + pure-Python
        # baseline JPEG decode (exact constant-color oracle)
        # (ns_video_meta rotated out late r8 for the new
        #  ns_minhash_decontamination row — r7-driver-green,
        #  multimodal.py frozen; ns_media_meta + ns_avi_frames keep
        #  the family)
        "ns_jpeg_decode",
        "ns_media_meta",
        # (ns_archive_listing rotated out late r8 for the new
        #  ns_anchor_text_index row — r7-driver-green, archives.py
        #  frozen; ns_archive_extract chains the same listing path)
        # (ns_warc_listing rotated out late r8 for ns_label_prop —
        #  r7-driver-green, archives.py frozen this round;
        #  ns_warc_bodies' enumeration path subsumes the listing)
        # (ns_rare_token_share — corpus-frequency rarity signal —
        #  rotated out late r6 for ns_bm25_topk: r5-driver-green, its
        #  text.py path untouched this round)
        # (ns_histogram_quantiles rotated out r5 for ns_media_meta —
        #  hll + countmin keep the sketch family in-window)
        # (ns_lang_id — re-entered r4 for the adjacent-marker fix,
        #  rotated out late r6 for ns_neardup_canonical)
        # round-4 new/changed rows: the streaming-surface oracle row, the
        # BLAS path's new exact-int oracle mode, and the four operator-
        # family oracle rows (skew/CDC/Z-order)
        # (stream_windowed_counts rotated out late r7 for
        #  ns_script_profile — r6-driver-green, windowed path frozen)
        "stream_stateful_key_stats",
        # (ns_similarity_topk_np rotated out late r6 for
        #  ns_profile_columns — r5-driver-green, similarity.py frozen)
        # (ns_salted_distinct_count rotated out late r6 for
        #  ns_avro_records; ns_salted_join and ns_scd2_history rotated
        #  out late r6 for ns_bloom_cross_dedup / ns_neardup_components
        #  — r5-driver-green, skew.py/cdc.py frozen this round)
        # (ns_zorder_morton rotated out r6 for stream_dedup_watermark)
        # (ns_url_dedup rotated out late r5 for ns_archive_listing)
        # r5: the six core-O entries rotated BACK IN (VERDICT r4 #4 —
        # driver sf0.01 re-attestation after r1/r2 rotation); r6:
        # o1/o5/o7/o15 rotate back OUT (freshly r5-green at sf0.01,
        # live-gated every suite run) to free slots for the new r6 rows
        # (o3_get_point / o4_stream_reverse_topk rotated out late r6
        #  for ns_shortest_paths / ns_weighted_paths — the core-O family
        #  was freshly r5-driver-green at sf0.01 and its read paths are
        #  untouched by this round's engine/log additions; live-gated)
        # r6 new rows: extraction stage (VERDICT-r5 #2), datafile-meta
        # promotion (#1), exact-substring dedup (#5)
        "ns_warc_bodies", "ns_archive_extract",
        "ns_datafile_meta", "ns_substring_dedup",
        # r6 new: streaming dedup-within-watermark (ns_zorder_morton
        # rotated out: r5-driver-green, frozen)
        "stream_dedup_watermark",
        # r6 new: pure MJPEG-AVI frame decode (ns_image_resize_meta
        # rotated out: r5-driver-green, frozen)
        "ns_avi_frames",
        # late-r6 new: Avro OCF record decoding — the load stage after
        # ns_datafile_meta triage (ns_salted_distinct_count rotated out)
        "ns_avro_records",
        # late-r6 new: ORC round-trip source attestation
        # (ns_tfidf_topterms rotated out)
        "src_orc_roundtrip",
        # late-r6 new: parquet payload record decoding
        # (ns_hll_user_estimate rotated out)
        "ns_parquet_records",
        # late-r6 new: streaming session windows (ns_doc_chunks rotated
        # out)
        "stream_session_counts",
        # late-r6 new: the Avro sink+source loop and the Delta+Iceberg
        # export+reader loop (q20/q22 rotated out)
        "src_avro_roundtrip", "src_lakehouse_roundtrip",
        # late-r6 new: the pre-training scoring/sketching family
        # (q11/q16/q17 + ns_similarity_topk rotated out — all
        # r5-driver-green with frozen implementations)
        # (ns_gopher_quality and ns_lm_perplexity rotated out r8 for
        #  ns_host_graph / ns_matryoshka_recall10 — both r7-driver-green,
        #  text.py frozen this round; the scoring family keeps the two
        #  classifier rows + dsir + bm25 in-window)
        # (ns_source_mixture rotated out late r7 for ns_html_links —
        #  r6-driver-green, sampling.py frozen this round)
        # (ns_kmv_set_ops rotated out r7 for stream_mad_outliers —
        #  r6-driver-green, sketches.py frozen this round)
        # late-r6 new: PQ-ADC ANN + its recall-vs-exact-L2 twin
        # (ns_embedding_neardup / ns_audio_decode_meta rotated out)
        "ns_pq_ann_topk_seeded", "ns_pq_ann_recall10",
        # late-r6 new: streaming HLL per window — windowed max IS the
        # mergeable sketch (ns_countmin_event_counts rotated out)
        "stream_hll_window",
        # late-r6 new: quality-aware canonical keeper (ns_lang_id
        # rotated out)
        "ns_neardup_canonical",
        # late-r6 family #2: ranked retrieval, data selection,
        # cross-corpus decontamination, exact star components
        # (ns_bpe_tokens / ns_rare_token_share / ns_salted_join /
        # ns_scd2_history rotated out — r5-green, modules frozen)
        "ns_bm25_topk",
        "ns_dsir_weights",
        "ns_bloom_cross_dedup",
        "ns_neardup_components",
        # late-r6 new: WebDataset-style tar-shard sink loop
        # (ns_weighted_sample rotated out — r5-green, path untouched)
        "src_tar_roundtrip",
        # late-r6 new: exact-integer PageRank (iterative-graph
        # centrality), time-series gap-fill/LOCF + MAD outliers, and
        # single-pass column profiling
        "ns_pagerank",
        # (ts_gapfill_locf rotated out late r7 for the new
        #  event_type_transitions row — r6-green, timeseries.py frozen;
        #  ts_mad_outliers and event_type_transitions rotated out r8 —
        #  r7-driver-green, paths frozen; stream_mad_outliers keeps the
        #  anomaly family AND must re-attest: stateful.py changed)
        # (ns_profile_columns rotated out late r8 for the new
        #  ns_blocklist_filter row — r7-driver-green, profile.py frozen
        #  this round; ns_setsim_join_prefix rotated out late r8 for
        #  ns_line_dedup — r7-driver-green, dedup.py's existing paths
        #  untouched (the late-r8 cross-decontamination addition is
        #  new surface with its own in-window row);
        #  funnel_view_click_purchase rotated out late r8 for
        #  ns_mixture_capped — r7-driver-green, its shared-SQL text
        #  frozen; retention_weekly_cohorts keeps the family)
        "ns_triangle_count",
        # (v1_reduce_stats rotated out late r6 for stream_locf_grid —
        #  r5-driver-green, views/reduce.py untouched all round)
        "stream_locf_grid",
        # (scd2_point_in_time rotated out late r7 for the new
        #  ns_curriculum_deciles row — r6-driver-green, cdc.py frozen;
        #  ns_weighted_paths and ns_ppr_topk rotated out r8 — both
        #  r7-driver-green, graph.py's BFS/PPR paths untouched this
        #  round — the late-r8 label_propagation addition is new
        #  surface attested by its own in-window ns_label_prop row)
        # (cdc_snapshot_diff rotated out late r8 for ns_sitemap_urls —
        #  r7-driver-green, cdc.py frozen this round)
        # r7 new rows (VERDICT-r6 #3/#4/#5) — take the slots of
        # ns_quantile_clip / ns_kmv_set_ops / ns_shortest_paths
        # (r6-driver-green, paths frozen this round):
        "stream_mad_outliers",
        # (ns_html_links rotated out late r8 for ns_robots_decisions —
        #  r7-driver-green, html.py frozen; ns_host_graph chains the
        #  same kernel at driver level)
        # (ns_curriculum_deciles rotated out late r8 for the new
        #  stream_static_enrich row — r7-driver-green, selection.py
        #  frozen; ns_dsir_weights keeps the global_ntile path and the
        #  crawl-pipeline test chains its terciles every suite run)
        # (ns_script_profile and event_type_transitions rotated out r8
        #  — both r7-driver-green, paths frozen this round)
        # r7 changed paths: DSIR's quartile assignment was rewritten
        # (distributed rank, selection.py) — its row must re-attest
        "ns_dsir_weights",
        # r8 new rows (VERDICT-r7 #1/#2/#4): supervised quality
        # classifiers (NB closed-form + unrolled-trajectory LR), the
        # stream-stream interval join, and the URL canonical/resolve/
        # host-graph family
        "ns_quality_classifier",
        "ns_quality_clf_lr",
        "stream_interval_join",
        "stream_interval_join_left",
        "ns_url_canonical",
        "ns_url_resolve",
        "ns_host_graph",
        "ns_robots_decisions",
        "stream_static_enrich",
        "ns_sitemap_urls",
        "ns_matryoshka_recall10",
        # r8 changed paths that must re-attest in the driver window:
        # streaming/stateful.py (drained-state removal) -> the MAD
        # stream row; avro_sink.py (DST policy) -> the avro loop;
        # delta_export.py (hoisted gapped-log guard) -> the lakehouse
        # loop
        "stream_mad_outliers",
        "src_avro_roundtrip",
        "src_lakehouse_roundtrip",
        # late-r8 extension rows: CCNet boilerplate removal with
        # reassembly, the C4 blocklist gate, and epoch-capped
        # water-filling (the allocation stage of a data recipe)
        "ns_line_dedup",
        "ns_blocklist_filter",
        "ns_mixture_capped",
        "ns_label_prop",
        "ns_minhash_decontamination",
        "ns_anchor_text_index",
    ):
        assert n in _window_names(), n


def test_reorder_drops_nothing():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(catalog.QUERIES)
    assert set(osql) == set(catalog.ORACLES)
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)


def test_window_names_all_registered():
    assert not [n for n in catalog.DRIVER_WINDOW if n not in catalog.QUERIES]
