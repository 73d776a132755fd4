"""Live log tails and always-on view maintenance (O6, SURVEY §2.A).

The reference's live feed is ``stream({gt: upto, live: true})`` — emit
the existing suffix, then keep emitting new appends in seq order
(`index.js:39`, `README.md:133`). Structured Streaming gives the same
semantics over the ParquetLog for free:

- **source**: ``readStream`` with the file source over the log's data
  dir. The appender writes one new file per commit named by commit
  index, so discovery order == seq order; the checkpointed file list is
  exactly the reference's ``since`` resume point (`index.js:39`
  ``opts.gt = upto`` ≙ checkpoint recovery — SURVEY §4 calls this the
  most load-bearing mapping in the design).
- **sink**: ``foreachBatch`` folding each micro-batch into a
  :class:`~flumedb_spark.views.base.FlumeView`. The view's atomic
  (state, since) commit makes redelivered batches idempotent — the
  crash-retry path re-runs a batch, ``fold`` sees ``seq <= since`` rows
  filtered out, nothing double-counts (exactly-once, SURVEY §7.4.2).

At scale the file source becomes a real log bus (Kafka/Delta CDF) with
the identical contract: ordered offsets + checkpointed resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..log import LOG_SCHEMA, ParquetLog

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DEFAULT_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, enabled: bool = True) -> None:
    """Route streaming state to the RocksDB provider.

    At 100 TB of keyed state (windowed aggs, applyInPandasWithState
    accumulators, stream-stream join buffers) the default
    HDFSBackedStateStoreProvider keeps every version in executor JVM
    heap — an OOM ceiling; RocksDB keeps state off-heap on local disk
    with incremental changelog checkpointing. The provider is read when
    a query STARTS, so call this before ``writeStream.start()`` /
    ``LiveViewRunner.start()``. Verified available in this build
    (tests/test_streaming.py::test_rocksdb_state_store_stateful_agg).
    """
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        ROCKSDB_PROVIDER if enabled else DEFAULT_PROVIDER,
    )


def stream_log(
    spark: SparkSession,
    log: ParquetLog,
    gt: int | None = None,
    max_files_per_trigger: int | None = None,
    with_provenance: bool = False,
) -> DataFrame:
    """Unbounded ``(seq, ts, value)`` stream over the log (O6).

    ``gt`` bounds the start like the reference's ``{gt: upto}``; new
    appends keep flowing until the query stops. ``with_provenance``
    appends a ``_src_file`` column (source file basename) so folds can
    gate on manifest-committed files (``committed_file_filter``).
    """
    # compaction-safe: compact() deletes per-commit files AFTER staging
    # compacted replacements that contain every row, so a file that
    # vanishes between discovery and read can be skipped — its rows
    # arrive via the (new-to-the-source) compacted file and the fold's
    # fresh-seq filter dedupes. Writes are flock-serialized, so no
    # discovery snapshot can contain a post-compaction append without
    # also containing the compacted files (no gap-loss interleaving).
    reader = spark.readStream.schema(LOG_SCHEMA).option("ignoreMissingFiles", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # carry the source file per row: the fold gate below admits only
    # rows from MANIFEST-COMMITTED files. The file source discovers the
    # data dir directly, which can surface files no committed manifest
    # references — a torn append (file written, crash before the meta
    # commit) or an OCC loser's replayed stage — holding the same seqs
    # a later commit assigns to DIFFERENT values. Folding those would
    # advance view.since past seqs whose committed records then look
    # stale and are dropped forever.
    df = reader.parquet(log.data_dir)
    if with_provenance:
        df = df.select(
            "*",
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "_src_file"
            ),
        )
    if gt is not None:
        df = df.where(F.col("seq") > F.lit(int(gt)))
    return df


def resolve_committed_files(
    log: ParquetLog, present: set, grace_seconds: float = 5.0
) -> set:
    """Grace-poll the committed manifest until it covers ``present``.

    A discovered-but-uncommitted file is normally just an in-flight
    append (the writer commits the same file name moments later), so
    unknown names get a short grace poll before being treated as
    orphans — a crashed append's retry and an OCC loser's replay both
    re-write under a fresh uuid name, so a name that never becomes
    committed never will be. Returns the final committed-file set.

    Runs lock-free (pure manifest reads + sleeps) so callers can poll
    BEFORE taking the engine lock — the in-flight-append case must not
    stall gated reads for the grace window."""
    import time as _time

    deadline = _time.monotonic() + grace_seconds
    while True:
        log.refresh_since()
        committed = set(log._meta.get("files", []))
        # tombstoned (compacted-away) files are KNOWN non-manifest names:
        # their rows live on in the committed compacted files, so drop
        # them immediately — only genuinely unknown names get the grace
        # poll (they are usually an append whose commit is in flight)
        tombstoned = {t.get("file") for t in log._meta.get("tombstones", [])}
        unknown = present - committed - tombstoned
        if not unknown or _time.monotonic() >= deadline:
            return committed
        _time.sleep(0.05)


def committed_file_filter(
    log: ParquetLog,
    batch: DataFrame,
    grace_seconds: float = 5.0,
    committed: set | None = None,
    present: set | None = None,
) -> DataFrame:
    """Admit only rows whose source file the COMMITTED manifest lists.

    Pass ``present`` AND ``committed`` (from a prior collect +
    ``resolve_committed_files``) to make this a pure plan rewrite — the
    lock-held fold path pre-resolves both lock-free so no Spark job
    runs under the engine lock."""
    if "_src_file" not in batch.columns:
        return batch  # source without file provenance (custom datasource reads committed-only)
    if present is None:
        present = {
            r.f
            for r in batch.select(F.col("_src_file").alias("f")).distinct().collect()
        }
    if committed is None:
        committed = resolve_committed_files(log, present, grace_seconds)
    drop = present - committed
    out = batch
    if drop:
        out = out.where(~F.col("_src_file").isin(*drop))
    return out.drop("_src_file")


class LiveViewRunner:
    """Always-on maintenance for a registered view: the streaming form of
    the engine's read-time catch-up loop (O9).

    ``start()`` launches a foreachBatch query resuming from the view's
    persisted ``since``; each micro-batch folds the new seq range and
    commits atomically. Reads through the engine's gate stay correct
    whether maintenance is read-driven or stream-driven.
    """

    def __init__(
        self,
        engine,
        name: str,
        checkpoint_dir: str | None = None,
        source: str = "files",
    ):
        self.engine = engine
        self.view = engine._views[name]
        self.checkpoint_dir = checkpoint_dir or f"{engine.dir}/checkpoints/{name}"
        self.source = source  # "files" | "datasource" (flumelog custom source)
        self.query = None

    def _fold_batch(self, batch: DataFrame, epoch_id: int) -> None:
        view = self.view
        # Resolve the committed-file set BEFORE taking the engine lock:
        # the grace poll (up to 5s when a batch carries a not-yet-
        # committed in-flight append) must not stall every gated read
        # and fold for the window.
        committed = present = None
        if "_src_file" in batch.columns:
            present = {
                r.f
                for r in batch.select(F.col("_src_file").alias("f"))
                .distinct()
                .collect()
            }
            committed = resolve_committed_files(self.engine.log, present)
            # Post-grace triage of still-unknown files (r4 review): a
            # slow same-name commit (>grace window: GC pause, disk
            # stall) must NOT be silently dropped — the checkpointed
            # file source never redelivers, so the view would advance
            # past those seqs forever. Distinguish by seq: rows whose
            # seqs exceed the committed head can only come from an
            # in-flight append → FAIL the batch (checkpoint does not
            # advance; the supervisor restarts and redelivers after the
            # commit lands). Rows whose seqs are all <= head are a torn
            # append / OCC-loser orphan whose authoritative rows live in
            # committed files → safe to drop.
            tomb = {
                t.get("file")
                for t in self.engine.log._meta.get("tombstones", [])
            }
            unknown = present - committed - tomb
            if unknown:
                head = self.engine.log.refresh_since()
                # Re-snapshot AFTER the refresh (r4 ADVICE): if the slow
                # commit landed between resolve's last manifest read and
                # this refresh, `head` now covers the file's seqs but the
                # stale `committed` set still excludes the file — the
                # mx <= head branch would let committed_file_filter
                # silently drop rows of a now-committed file the
                # checkpointed source never redelivers. Recomputing
                # committed/tomb/unknown from the refreshed meta makes
                # the drop decision and the head check read ONE snapshot.
                committed = set(self.engine.log._meta.get("files", []))
                tomb = {
                    t.get("file")
                    for t in self.engine.log._meta.get("tombstones", [])
                }
                unknown = present - committed - tomb
            if unknown:
                mx = (
                    batch.where(F.col("_src_file").isin(*unknown))
                    .agg(F.max("seq").alias("m"))
                    .collect()[0]
                    .m
                )
                if mx is not None and int(mx) > head:
                    raise RuntimeError(
                        "micro-batch carries uncommitted file(s) past the "
                        f"grace window: {sorted(unknown)[:3]} (max seq {mx} "
                        f"> committed head {head}); failing the batch so "
                        "the checkpoint does not advance — the supervisor "
                        "restart redelivers it once the commit lands"
                    )
        # Serialize with the engine's read-driven catch-up: Flume._gate ->
        # _catch_up folds under engine._lock, and without taking the same
        # lock here both paths can fold overlapping seq ranges — for
        # append-style views (Level/Search/Bloom) that double-indexes the
        # range. view.since is (re-)read only after acquiring, so a range
        # the reader already folded shrinks to a no-op.
        with self.engine._lock:
            # admit only manifest-committed source files first (orphans
            # from torn appends / OCC-loser replays can carry committed
            # seqs with DIFFERENT values — see committed_file_filter)
            batch = committed_file_filter(
                self.engine.log, batch, committed=committed, present=present
            )
            # restrict to genuinely-new records: redelivered batches after
            # a crash re-run with seq <= view.since and fold to a no-op.
            # dropDuplicates(seq): one discovery snapshot can briefly hold
            # a per-commit file AND the compacted file that replaces it
            # (same rows twice) — same seq is always the same record, so
            # per-batch seq dedup is exact, not lossy.
            fresh = batch.where(F.col("seq") > F.lit(view.since)).dropDuplicates(
                ["seq"]
            )
            # persist before the max-seq agg: the agg and the view's own
            # fold action would otherwise EACH re-run the source scan +
            # filters + any Python mapper stage, doubling the Spark work
            # done while this lock blocks every gated read
            fresh = fresh.persist()
            try:
                row = fresh.agg(F.max("seq").alias("m")).collect()[0]
                if row.m is None:
                    return
                mapped = self.engine._mapped(fresh.select("seq", "ts", "value"))
                view.fold(mapped, int(row.m))
            finally:
                fresh.unpersist()

    def start(self, trigger_seconds: float | None = None):
        if self.source == "datasource":
            from ..sources.flumelog_source import stream_log_custom
            from pyspark.sql import functions as F

            src = stream_log_custom(self.engine.spark, self.engine.log).where(
                F.col("seq") > F.lit(self.view.since)
            )
        else:
            src = stream_log(
                self.engine.spark,
                self.engine.log,
                gt=self.view.since,
                with_provenance=True,
            )
        writer = (
            src.writeStream.option("checkpointLocation", self.checkpoint_dir)
            .foreachBatch(self._fold_batch)
            .outputMode("append")
        )
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        self.query = writer.start()
        return self.query

    def process_all_available(self) -> None:
        """Synchronous catch-up barrier (the streaming ``ready()``)."""
        self.query.processAllAvailable()

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed counts with late-data watermarking — the
    standard tumbling/sliding aggregation over a log-derived stream
    (extension beyond reference parity; SURVEY §2.C streaming row)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), F.col("w.end").alias("win_end"), "n")
    )


def sessionized_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-based sessionization per key (``session_window``
    + watermark, append mode): dynamic-size windows that merge while
    events keep arriving within ``gap`` and emit once the watermark
    passes the session end (last event + gap). The streaming twin of
    the batch ``sessionize_30min`` row. State is one open session per
    active key — bounded by key cardinality, evicted on emission."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count("*").alias("n"))
        .select(
            key,
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n",
        )
    )


def dedup_within_watermark(
    events_stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the streaming twin of
    ns_dedup_exact, and the op a live ingest pipeline actually runs:
    ``dropDuplicates([*keys, ts_col])`` under a watermark keeps one
    state entry per distinct (key, event-time) and evicts entries once
    the watermark passes their event time, so state is O(arrival skew),
    not O(stream length). A duplicate arriving while its twin's state
    is live is dropped; one arriving after eviction is either dropped
    by the late-event filter or (inside the filter/eviction lag window)
    re-emitted — semantics empirically pinned in
    tests/test_streaming.py::test_stream_dedup_watermark_semantics."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*keys, ts_col]
    )


def windowed_hll_registers(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming HLL distinct sketch per event-time window: the
    deterministic register formulation (md5-derived 60-bit hash,
    bucket = hv % 256, rho = leading-zero rank — the exact arithmetic
    of the batch `ns_hll_user_estimate` row) expressed as a windowed
    ``max`` aggregate. Because register update is max() — associative,
    commutative — Spark's incremental streaming state IS the mergeable
    sketch: each micro-batch folds its rows into at most 256 register
    rows per open window, so state is O(windows x 256) regardless of
    stream rate, and append mode emits a window's registers exactly
    once when the watermark passes its end. Finalize emitted registers
    with :func:`hll_finalize_registers` (a batch-side 256-row-per-
    window reduction). The streaming twin of the batch HLL row — and
    the general recipe: ANY sketch whose update is a commutative
    monoid (count-min, KMV min-k) streams the same way."""
    hashed = events_stream.selectExpr(
        ts_col,
        f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) AS hv",
    ).selectExpr(
        ts_col,
        "hv % 256 AS bucket",
        "CASE WHEN hv DIV 256 = 0 THEN 53"
        " ELSE 53 - length(bin(hv DIV 256)) END AS rho",
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("bucket"))
        .agg(F.max("rho").alias("rho"))
        .select(F.col("w.start").alias("win_start"), "bucket", "rho")
    )


def hll_finalize_registers(registers: DataFrame) -> DataFrame:
    """Turn emitted (win_start, bucket, rho) register rows into the
    per-window estimate, with the same constants and small-range
    linear-counting branch as the batch HLL row (bit-identical
    arithmetic: the branch threshold is a precomputed double literal,
    all register sums are exact BIGINTs)."""
    per = registers.groupBy("win_start").agg(
        F.expr("CAST(sum(shiftleft(CAST(1 AS BIGINT), 53 - rho)) AS BIGINT)")
        .alias("s_present"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_present"),
    )
    return per.selectExpr(
        "win_start",
        "CAST(s_present + (256 - n_present) * 9007199254740992 AS BIGINT) AS s53",
        "CAST(256 - n_present AS BIGINT) AS v_zero",
    ).selectExpr(
        "win_start",
        "s53",
        "v_zero",
        "CASE WHEN CAST(s53 AS DOUBLE) >= 6.624895351417025e+17 AND v_zero > 0"
        " THEN round(256.0 * ln(256.0 / v_zero), 4)"
        " ELSE round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0"
        " * 9007199254740992.0 / CAST(s53 AS DOUBLE), 4) END AS hll_estimate",
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream watermarked INTERVAL join (the one major
    Structured Streaming capability the family lacked, VERDICT-r7 #2):
    match every left-stream row (e.g. purchase) to all right-stream
    rows (e.g. clicks) satisfying ``on`` with ``right_ts`` in
    ``(left_ts - lookback, left_ts]`` — the streaming twin of the batch
    ``interval_join_events`` row, inner join, append mode (the only
    mode stream-stream joins support).

    Both sides carry watermarks and the join condition bounds event
    time on both sides, so Spark derives state-cleanup thresholds for
    BOTH buffers: a right row is evicted once the watermark passes
    ``right_ts + lookback`` (no future left row surviving the late
    filter can match it), a left row once it passes ``left_ts`` — state
    is O(arrival rate x (lookback + lateness)), never O(stream length).
    At 100 TB this runs on the RocksDB state store
    (:func:`use_rocksdb_state_store`) partitioned by the join key.

    Late-data semantics inherit the pinned global-watermark rules
    (multipleWatermarkPolicy = min across the two sources; the
    late-event filter in batch N uses the watermark through batch N-2
    — probe-pinned in tests/test_streaming.py::
    test_stream_interval_join_semantics).

    ``how="left_outer"`` additionally emits every unmatched left row
    null-extended once it is provably unmatchable. Empirically pinned
    null-emission rule (probe: test_stream_interval_join_left_boundary):
    eviction in batch N uses the GLOBAL watermark at batch start (min
    across both sources of floor-to-ms(max event time seen) - delay),
    and an unmatched left row emits iff left_ts <= wm - 1ms — a row AT
    the watermark millisecond is held, anything below emits. The final
    cumulative threshold is the all-data global watermark - 1ms."""
    cond = F.expr(
        f"{on} AND {right_ts} <= {left_ts}"
        f" AND {right_ts} > {left_ts} - INTERVAL {lookback}"
    )
    return (
        left.withWatermark(left_ts, watermark)
        .join(right.withWatermark(right_ts, watermark), cond, how)
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC enrichment join — the third join capability the
    streaming family exercises (windowed aggs, stream-stream interval
    joins, and now the dimension lookup every live ingest runs before
    anything else). The static side is broadcast-hinted: a dimension
    table joined per micro-batch must never shuffle the stream; at
    100 TB the dim is either broadcastable (the normal case) or the
    join key pre-partitions the stream once. Stateless — no watermark,
    no state store: every stream row passes through exactly once with
    its enrichment, so append mode needs no late-data semantics at
    all (the oracle is a plain batch join)."""
    return stream.join(F.broadcast(dim), on, how)
