"""Perceptual VIDEO near-duplicate detection: keyframe dHash + band LSH
+ temporal-offset alignment (VERDICT-r9 #2 — the first of the two
remaining multimodal dedup gaps).

Shape — the image pipeline lifted one level:

1. **Keyframe signatures** (:func:`video_keyframe_signatures`): REAL
   MJPEG-AVI decode (``mmcodec.decode_avi_mjpeg_frames`` — RIFF movi
   walk, Annex-K Huffman injection, the pure T.81 entropy decode) with
   ``every_n_frames`` keyframe sampling, then the r9 dHash kernel
   (``imagededup._dhash_bands_of``) per sampled frame: one row
   (doc_id, frame_idx, b0..b3) per keyframe, four 16-bit Hamming-LSH
   bands each.
2. **Banding** (:func:`video_neardup_candidates`): a self-equi-join on
   (band_idx, band_value) over ALL keyframes of all videos — two
   near-dup videos share at least one unperturbed band on some frame
   pair. Candidates are FRAME pairs, never all-pairs over videos or
   frames.
3. **Temporal-overlap verify**: exact Hamming over the stored bands
   (``bit_count(xor)``, pure JVM math) keeps close frame pairs; the
   per-video-pair histogram of ``frame_b - frame_a`` offsets then
   scores ALIGNMENT — a trimmed/shifted copy matches many frames at
   ONE consistent offset, while coincidental single-frame collisions
   scatter. The best offset (max aligned frames, smallest offset on
   ties) must cover ``min_aligned`` frames.

Scale shape (100 TB of video): decode+hash is one Arrow-batched
``mapInPandas`` pass, linear in total video bytes, no shuffle; the
signature table is 5 longs per KEYFRAME (at 1 keyframe/s of 100 TB of
video that is ~0.1% of input size); the band join shuffles on uniform
16-bit keys; the offset histogram is a groupBy over verified close
pairs only. Nothing is all-pairs, nothing folds through the driver.
Real-corpus caveat shared with the image operator: degenerate bands
(solid-color frames -> 0/65535) skew buckets — drop them before the
join or let AQE split the skew.

Synthetic fixtures: 3-frame 64x72 grayscale MJPEG AVIs whose 8x8
blocks are constant md5-derived EVEN values — evenness + quality 50
makes every block's lossy JPEG round-trip EXACTLY the identity (the
``with_synthetic_jpeg_payload`` DC-only device, per block), and the
64x72 geometry makes the dHash 9x8 floor-NN grid sample exactly one
pixel per block, so g[y][x] IS the block value. The DuckDB oracle
replays block value -> bit -> band -> join -> Hamming -> offset
histogram closed-form. Groups of 4 variants per ``doc_id // 4``:
variant 0 is the base clip, variants 1-2 perturb one block of frame
0/1 (+128, even-preserving — Hamming <= 2 on that frame), variant 3 is
the clip SHIFTED one frame (drops frame 0, appends a new frame 3) and
must surface at offset -1 with 2 aligned frames.

Reference scope: north-star dedup family per BASELINE.json (the
reference engine has no video operators; this extends SURVEY.md §2.C
dedup semantics to video columns).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .imagededup import N_BANDS, _dhash_bands_of, _md5_byte_sql

__all__ = [
    "synth_neardup_video_frames",
    "with_synthetic_neardup_video_payload",
    "with_synthetic_frame_image_payload",
    "video_keyframe_signatures",
    "video_neardup_candidates",
    "video_image_matches",
    "video_signatures_oracle_sql",
    "video_neardup_oracle_sql",
    "video_image_matches_oracle_sql",
]

# frame geometry: 8x9 grid of 8x8 constant blocks -> the dHash 9x8
# floor-NN sample grid hits exactly one pixel per block
_BLK = 8
_GRID_W, _GRID_H = 9, 8  # dHash geometry (imagededup)
_FRAME_W, _FRAME_H = _BLK * _GRID_W, _BLK * _GRID_H  # 72 x 64
N_FRAMES = 3  # synthetic clip length


def _h8(key: str) -> int:
    return hashlib.md5(key.encode()).digest()[0]


def _content_frame(doc_id: int, f: int) -> int:
    """Variant 3 is the one-frame-shifted clip: its local frame f shows
    the group's content frame f+1."""
    return f + 1 if doc_id % 4 == 3 else f


def synth_neardup_video_frames(doc_id: int) -> list[np.ndarray]:
    """Deterministic 3-frame (64, 72) grayscale clip for ``doc_id``.

    Block (y, x) of content frame cf in group g carries the EVEN value
    ``md5("v{g}|{cf}|{y}|{x}")[0] & ~1`` (evenness = exact JPEG
    round-trip at quality 50, per block). Variants 1/2 add 128 (mod
    256, even-preserving) to ONE md5-chosen block of local frame
    variant-1; variant 3 shifts content by one frame.
    """
    d = int(doc_id)
    group, variant = d // 4, d % 4
    py, px = _h8(f"vy{d}") % _GRID_H, _h8(f"vx{d}") % _GRID_W
    frames = []
    for f in range(N_FRAMES):
        cf = _content_frame(d, f)
        arr = np.empty((_FRAME_H, _FRAME_W), dtype=np.uint8)
        for y in range(_GRID_H):
            for x in range(_GRID_W):
                b = _h8(f"v{group}|{cf}|{y}|{x}")
                v = b - (b % 2)
                if variant in (1, 2) and f == variant - 1 and y == py and x == px:
                    v = (v + 128) % 256
                arr[
                    _BLK * y : _BLK * (y + 1), _BLK * x : _BLK * (x + 1)
                ] = v
        frames.append(arr)
    return frames


def with_synthetic_neardup_video_payload(docs: DataFrame) -> DataFrame:
    """doc_id -> real MJPEG-AVI bytes of
    :func:`synth_neardup_video_frames` (worker-side, Arrow batches).
    Odd doc_ids strip per-frame DHT segments (the table-less MJPG
    convention), so the signatures also attest the Annex-K injection
    path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flumedb_spark.operators import mmcodec

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        mmcodec.encode_avi_mjpeg(
                            synth_neardup_video_frames(int(d)),
                            quality=50,
                            strip_dht=bool(int(d) % 2),
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


VIDEO_SIG_SCHEMA = (
    "doc_id long, frame_idx int, b0 long, b1 long, b2 long, b3 long"
)


def video_keyframe_signatures(
    payloads: DataFrame, max_frames: int = 8, every_n_frames: int = 1
) -> DataFrame:
    """REAL AVI decode -> one dHash signature row per sampled keyframe:
    (doc_id, frame_idx, b0..b3). ``frame_idx`` indexes the SAMPLED
    sequence (the offset histogram then measures keyframe-grid shifts).
    Corrupt/non-MJPEG blobs drop their rows, never the partition; one
    Arrow-batched pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flumedb_spark.operators import mmcodec

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [],
                "b0": [], "b1": [], "b2": [], "b3": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames = mmcodec.decode_avi_mjpeg_frames(
                        bytes(p),
                        max_frames=max_frames,
                        every_n_frames=every_n_frames,
                    )
                except ValueError:
                    continue  # corrupt blob: drop rows, keep the task
                for j, fr in enumerate(frames):
                    bands = _dhash_bands_of(mmcodec.to_rgb(fr))
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(j)
                    for k in range(N_BANDS):
                        out[f"b{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, VIDEO_SIG_SCHEMA)


def video_neardup_candidates(
    payloads: DataFrame,
    max_hamming: int = 8,
    min_aligned: int = 2,
    max_frames: int = 8,
    every_n_frames: int = 1,
) -> DataFrame:
    """Full video near-dup pipeline: keyframe signatures -> band-LSH
    candidate FRAME pairs -> exact Hamming verify -> temporal-offset
    alignment. Output (doc_a, doc_b, frame_offset, aligned_frames)
    with doc_a < doc_b: the offset (frame_b - frame_a) matching the
    most frame pairs at Hamming <= max_hamming (smallest offset on
    ties), kept when it aligns >= min_aligned frames.

    The signature table is materialized once (localCheckpoint — the
    minhash band-table lesson: a lazy plan would re-run the video
    decode for the probe side and both verify branches); everything
    downstream is equi-joins and a groupBy."""
    sig = video_keyframe_signatures(
        payloads, max_frames=max_frames, every_n_frames=every_n_frames
    ).localCheckpoint(eager=True)
    bands = sig.select(
        "doc_id",
        "frame_idx",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"), F.col(f"b{k}").alias("bval")
                )
                for k in range(N_BANDS)
            ])
        ).alias("e"),
    ).select("doc_id", "frame_idx", "e.band", "e.bval")
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("frame_idx").alias("fa"),
        "band", "bval",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("frame_idx").alias("fb"),
        "band", "bval",
    )
    cand = (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "fa", "doc_b", "fb")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("frame_idx").alias("fa"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(N_BANDS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("frame_idx").alias("fb"),
        *[F.col(f"b{k}").alias(f"b_{k}") for k in range(N_BANDS)],
    )
    ham = F.expr(
        " + ".join(f"bit_count(a{k} ^ b_{k})" for k in range(N_BANDS))
    ).cast("long")
    close = (
        cand.join(sa, ["doc_a", "fa"])
        .join(sb, ["doc_b", "fb"])
        .select("doc_a", "doc_b", "fa", "fb", ham.alias("hamming"))
        .where(F.col("hamming") <= int(max_hamming))
    )
    offsets = close.groupBy(
        "doc_a",
        "doc_b",
        (F.col("fb") - F.col("fa")).cast("int").alias("frame_offset"),
    ).agg(F.count(F.lit(1)).alias("aligned_frames"))
    w = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("aligned_frames"), F.asc("frame_offset")
    )
    return (
        offsets.withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") == 1)
            & (F.col("aligned_frames") >= int(min_aligned))
        )
        .select("doc_a", "doc_b", "frame_offset", "aligned_frames")
        .orderBy("doc_a", "doc_b")
    )


def _base_frame_image(group: int, cf: int) -> np.ndarray:
    """The UNPERTURBED (64, 72) grayscale content frame ``cf`` of video
    ``group`` — the still a known-image registry would hold."""
    arr = np.empty((_FRAME_H, _FRAME_W), dtype=np.uint8)
    for y in range(_GRID_H):
        for x in range(_GRID_W):
            b = _h8(f"v{group}|{cf}|{y}|{x}")
            arr[_BLK * y : _BLK * (y + 1), _BLK * x : _BLK * (x + 1)] = (
                b - (b % 2)
            )
    return arr


def with_synthetic_frame_image_payload(docs: DataFrame) -> DataFrame:
    """doc_id -> real BMP bytes of the base content frame
    ``doc_id % 4`` of video group ``doc_id // 4`` — a still-image
    registry whose entries genuinely appear inside the synthetic video
    corpus (pixel-identical: BMP is lossless and the video frames'
    JPEG round-trip is exactly the identity)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flumedb_spark.operators import mmcodec

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        mmcodec.encode_bmp(
                            np.repeat(
                                _base_frame_image(
                                    int(d) // 4, int(d) % 4
                                )[:, :, None],
                                3,
                                axis=2,
                            )
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


def video_image_matches(
    video_payloads: DataFrame,
    image_payloads: DataFrame,
    max_hamming: int = 8,
    max_frames: int = 8,
    every_n_frames: int = 1,
) -> DataFrame:
    """CROSS-MODAL containment search: which videos contain which known
    still images (watermark / known-content registry scanning). Both
    modalities hash through the SAME dHash kernel, so the probe is a
    band equi-join between the image signature table and the keyframe
    signature table — never all-pairs across the corpus — followed by
    exact ``bit_count(xor)`` verify. Output (image_doc, video_doc,
    frame_idx, hamming), ordered.

    Scale shape: the image registry side is typically small (broadcast
    its 4-band table); the video side is the keyframe signature table
    already produced for near-dup — at 100 TB this probe is a join
    between two signature tables, no re-decode of either corpus."""
    from .imagededup import image_dhash_bands

    vsig = video_keyframe_signatures(
        video_payloads, max_frames=max_frames, every_n_frames=every_n_frames
    ).localCheckpoint(eager=True)
    isig = image_dhash_bands(image_payloads).localCheckpoint(eager=True)
    vbands = vsig.select(
        F.col("doc_id").alias("video_doc"),
        F.col("frame_idx").alias("frame_idx"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"), F.col(f"b{k}").alias("bval")
                )
                for k in range(N_BANDS)
            ])
        ).alias("e"),
    ).select("video_doc", "frame_idx", "e.band", "e.bval")
    ibands = isig.select(
        F.col("doc_id").alias("image_doc"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"), F.col(f"b{k}").alias("bval")
                )
                for k in range(N_BANDS)
            ])
        ).alias("e"),
    ).select("image_doc", "e.band", "e.bval")
    cand = (
        ibands.join(vbands, ["band", "bval"])
        .select("image_doc", "video_doc", "frame_idx")
        .distinct()
    )
    si = isig.select(
        F.col("doc_id").alias("image_doc"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(N_BANDS)],
    )
    sv = vsig.select(
        F.col("doc_id").alias("video_doc"),
        "frame_idx",
        *[F.col(f"b{k}").alias(f"b_{k}") for k in range(N_BANDS)],
    )
    ham = F.expr(
        " + ".join(f"bit_count(a{k} ^ b_{k})" for k in range(N_BANDS))
    ).cast("long")
    return (
        cand.join(si, "image_doc")
        .join(sv, ["video_doc", "frame_idx"])
        .select("image_doc", "video_doc", "frame_idx", ham.alias("hamming"))
        .where(F.col("hamming") <= int(max_hamming))
        .orderBy("image_doc", "video_doc", "frame_idx")
    )


# ---------------------------------------------------------------------
# DuckDB oracle replay — block value -> bit -> band -> join -> Hamming
# -> offset histogram, all closed-form over the synthetic md5 formulas
# ---------------------------------------------------------------------


def _sig_cte(table: str = "documents") -> str:
    """CTE chain ending in ``bands(doc_id, f, band, bval)`` +
    ``sig(doc_id, f, b0..b3)`` replaying the synthetic per-keyframe
    dHash (the imagededup._bands_cte device, lifted per frame)."""
    cf = f"(CASE WHEN d.doc_id % 4 = 3 THEN fr.f + 1 ELSE fr.f END)"
    base = _md5_byte_sql(
        f"concat('v', CAST(d.doc_id // 4 AS VARCHAR), '|', "
        f"CAST({cf} AS VARCHAR), '|', "
        "CAST(dy.y AS VARCHAR), '|', CAST(dx.x AS VARCHAR))"
    )
    py = _md5_byte_sql("concat('vy', CAST(d.doc_id AS VARCHAR))")
    px = _md5_byte_sql("concat('vx', CAST(d.doc_id AS VARCHAR))")
    return f"""
    g AS (
      SELECT d.doc_id, fr.f, dy.y, dx.x,
        CASE WHEN d.doc_id % 4 IN (1, 2) AND fr.f = d.doc_id % 4 - 1
              AND dy.y = ({py}) % {_GRID_H}
              AND dx.x = ({px}) % {_GRID_W}
             THEN (({base} - ({base}) % 2) + 128) % 256
             ELSE ({base} - ({base}) % 2) END AS v
      FROM {table} d,
           generate_series(0, {N_FRAMES - 1}) fr(f),
           generate_series(0, {_GRID_H - 1}) dy(y),
           generate_series(0, {_GRID_W - 1}) dx(x)
    ),
    bits AS (
      SELECT a.doc_id, a.f, a.y, a.x,
        CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.f = a.f
                       AND b.y = a.y AND b.x = a.x + 1
    ),
    bands AS (
      SELECT doc_id, f, y // 2 AS band,
        CAST(sum(bit * (1 << ((y % 2) * 8 + x))) AS BIGINT) AS bval
      FROM bits GROUP BY doc_id, f, y // 2
    ),
    sig AS (
      SELECT doc_id, f,
        max(CASE WHEN band = 0 THEN bval END) AS b0,
        max(CASE WHEN band = 1 THEN bval END) AS b1,
        max(CASE WHEN band = 2 THEN bval END) AS b2,
        max(CASE WHEN band = 3 THEN bval END) AS b3
      FROM bands GROUP BY doc_id, f
    )"""


def video_signatures_oracle_sql(table: str = "documents") -> str:
    """Replay of synth -> AVI decode ->
    :func:`video_keyframe_signatures`."""
    return f"""
    WITH {_sig_cte(table)}
    SELECT doc_id, CAST(f AS INT) AS frame_idx, b0, b1, b2, b3
    FROM sig ORDER BY doc_id, frame_idx
    """


def video_image_matches_oracle_sql(
    table: str = "documents", max_hamming: int = 8
) -> str:
    """Replay of :func:`video_image_matches` over the synthetic video
    corpus and the frame-image registry (image doc d = base content
    frame d%4 of group d//4, unperturbed)."""
    ibase = _md5_byte_sql(
        "concat('v', CAST(d.doc_id // 4 AS VARCHAR), '|', "
        "CAST(d.doc_id % 4 AS VARCHAR), '|', "
        "CAST(dy.y AS VARCHAR), '|', CAST(dx.x AS VARCHAR))"
    )
    return f"""
    WITH {_sig_cte(table)},
    ig AS (
      SELECT d.doc_id, dy.y, dx.x,
        ({ibase} - ({ibase}) % 2) AS v
      FROM {table} d,
           generate_series(0, {_GRID_H - 1}) dy(y),
           generate_series(0, {_GRID_W - 1}) dx(x)
    ),
    ibits AS (
      SELECT a.doc_id, a.y, a.x,
        CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM ig a JOIN ig b ON b.doc_id = a.doc_id AND b.y = a.y
                         AND b.x = a.x + 1
    ),
    ibands AS (
      SELECT doc_id, y // 2 AS band,
        CAST(sum(bit * (1 << ((y % 2) * 8 + x))) AS BIGINT) AS bval
      FROM ibits GROUP BY doc_id, y // 2
    ),
    isig AS (
      SELECT doc_id,
        max(CASE WHEN band = 0 THEN bval END) AS b0,
        max(CASE WHEN band = 1 THEN bval END) AS b1,
        max(CASE WHEN band = 2 THEN bval END) AS b2,
        max(CASE WHEN band = 3 THEN bval END) AS b3
      FROM ibands GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT i.doc_id AS image_doc, v.doc_id AS video_doc,
                      v.f AS frame_idx
      FROM ibands i JOIN bands v
        ON i.band = v.band AND i.bval = v.bval
    ),
    scored AS (
      SELECT c.image_doc, c.video_doc, CAST(c.frame_idx AS INT) AS frame_idx,
        CAST(bit_count(xor(si.b0, sv.b0)) + bit_count(xor(si.b1, sv.b1))
           + bit_count(xor(si.b2, sv.b2)) + bit_count(xor(si.b3, sv.b3))
           AS BIGINT) AS hamming
      FROM cand c
      JOIN isig si ON si.doc_id = c.image_doc
      JOIN sig sv ON sv.doc_id = c.video_doc AND sv.f = c.frame_idx
    )
    SELECT image_doc, video_doc, frame_idx, hamming FROM scored
    WHERE hamming <= {int(max_hamming)}
    ORDER BY image_doc, video_doc, frame_idx
    """


def video_neardup_oracle_sql(
    table: str = "documents", max_hamming: int = 8, min_aligned: int = 2
) -> str:
    """Replay of the full :func:`video_neardup_candidates` chain."""
    return f"""
    WITH {_sig_cte(table)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.f AS fa,
                      b.doc_id AS doc_b, b.f AS fb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    ),
    close AS (
      SELECT c.doc_a, c.doc_b, c.fa, c.fb
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a AND sa.f = c.fa
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.f = c.fb
      WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
          + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
          <= {int(max_hamming)}
    ),
    offsets AS (
      SELECT doc_a, doc_b, CAST(fb - fa AS INT) AS frame_offset,
             count(*) AS aligned_frames
      FROM close GROUP BY doc_a, doc_b, fb - fa
    ),
    best AS (
      SELECT doc_a, doc_b, frame_offset, aligned_frames,
        row_number() OVER (
          PARTITION BY doc_a, doc_b
          ORDER BY aligned_frames DESC, frame_offset ASC
        ) AS rn
      FROM offsets
    )
    SELECT doc_a, doc_b, frame_offset, aligned_frames
    FROM best WHERE rn = 1 AND aligned_frames >= {int(min_aligned)}
    ORDER BY doc_a, doc_b
    """
