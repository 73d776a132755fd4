"""Perceptual image near-duplicate detection: dHash + Hamming-band LSH.

The image-side counterpart of the text MinHash pipeline (VERDICT-r8 #2
— the one first-class LLM-pipeline family the engine lacked). Shape:

1. **dHash** (:func:`image_dhash_bands`): REAL decode (any format
   ``mmcodec.decode_image_pure`` reads — BMP/PNG/GIF/PPM) → integer
   luma → nearest-neighbor downsample to a 9×8 grid → 64
   difference bits (``g[y][x] > g[y][x+1]``, the classic dHash of
   Krawetz's "Kind of Like That") emitted as FOUR 16-bit row-pair
   bands. Bands, not one int64: band values stay in [0, 65535], so
   every sum/shift is sign-safe and bit-for-bit replayable by a DuckDB
   oracle (the SUM(1<<63) wrap divergence never arises), and the four
   bands ARE the LSH keys — no second hashing step.
2. **Banding** (:func:`image_neardup_candidates`): two near-dup images
   differ in a handful of dHash bits, so at least one 16-bit band is
   usually identical (≤2 perturbed cells touch ≤2 of 4 bands). A
   self-equi-join on (band_idx, band_value) yields candidates WITHOUT
   an all-pairs comparison — the ``dedup.lsh_bands`` device over
   Hamming space instead of Jaccard space.
3. **Verify**: exact Hamming distance over the four stored bands
   (``bit_count(a XOR b)`` — pure JVM column math, no re-decode), kept
   when ``<= max_hamming``.

Scale shape (100 TB): the decode+hash kernel is one Arrow-batched
``mapInPandas`` pass (per-blob work, linear, no shuffle); the
signature table is 5 longs/doc; the band join shuffles on uniform
16-bit keys ×4 bands. Real-corpus caveat: flat images (solid color →
band 0/65535) skew those buckets — at scale, drop the
degenerate all-zero/all-one bands before the join or let AQE split
the skewed partitions; the verify join touches only candidate pairs
and kilobyte rows. Nothing is all-pairs, nothing folds through the
driver.

Synthetic fixtures (:func:`synth_neardup_image` /
``with_synthetic_neardup_payload``): per-group base images whose
sampled pixels are md5-derived (cross-engine replayable, no
mod-2^k periodicity, so unrelated groups land ~32 bits apart), with
variants perturbing ONE sampled cell by +128 — near-dups at Hamming
≤ 4. The DuckDB oracle replays pixel → bit → band → join → Hamming
arithmetically (the ``ns_minhash_lsh_candidates`` device), so a
resample/bit-order/banding bug breaks the hash match.

Reference scope: north-star dedup family per BASELINE.json (the
reference engine has no image operators; this extends the dedup
semantics of SURVEY.md §2.C to binary columns).
"""

from __future__ import annotations

import functools
import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "synth_neardup_image",
    "with_synthetic_neardup_payload",
    "image_dhash_bands",
    "image_neardup_candidates",
    "dhash_bands_oracle_sql",
    "neardup_oracle_sql",
]

# dHash geometry: 9 columns × 8 rows of luma samples → 8×8 bits.
_GRID_W, _GRID_H = 9, 8
# synthetic source images are exactly 2× the grid, so the floor NN
# mapping src = (dst * src) // dst samples the even coordinates — the
# oracle's closed form (real inputs can be any size; the kernel's
# resize handles them identically to mmcodec.resize_nn)
_SYN_W, _SYN_H = 18, 16
N_BANDS = 4  # 16 bits per band: rows (2k, 2k+1)


def _h8(key: str) -> int:
    """First byte of md5(key) — the cross-engine uniform byte (the
    sampling._bucket_expr device, one byte wide)."""
    return hashlib.md5(key.encode()).digest()[0]


@functools.lru_cache(maxsize=8192)
def _synth_base_bytes(group: int) -> bytes:
    """Base (16, 18) gray pattern of a group, as immutable bytes: the
    4 docs of a group share it, so the 288 per-pixel md5 calls run once
    per group per worker instead of once per doc (bounded LRU — batch
    doc_ids are group-local, and the cap keeps worker memory flat at
    any corpus size)."""
    arr = np.empty((_SYN_H, _SYN_W), dtype=np.uint8)
    for y in range(_SYN_H):
        for x in range(_SYN_W):
            arr[y, x] = _h8(f"g{group}|{y}|{x}")
    return arr.tobytes()


def synth_neardup_image(doc_id: int) -> np.ndarray:
    """Deterministic (16, 18, 3) gray-as-RGB image for ``doc_id``.

    ``group = doc_id // 4`` picks the base pattern (every pixel an
    independent md5 byte of ``"g{group}|{y}|{x}"``); variants
    ``doc_id % 4 > 0`` add 128 (mod 256) to ONE sampled cell chosen by
    md5 of the doc_id — so the 4 docs of a group are pairwise near-dups
    (dHash Hamming ≤ 4) while distinct groups differ by ~32 bits.
    """
    group, variant = int(doc_id) // 4, int(doc_id) % 4
    arr = (
        np.frombuffer(_synth_base_bytes(group), dtype=np.uint8)
        .reshape(_SYN_H, _SYN_W)
        .copy()  # the cached base is shared — never mutate it
    )
    if variant:
        ys = 2 * (_h8(f"py{doc_id}") % _GRID_H)
        xs = 2 * (_h8(f"px{doc_id}") % _GRID_W)
        arr[ys, xs] = (int(arr[ys, xs]) + 128) % 256
    return np.repeat(arr[:, :, None], 3, axis=2)


def with_synthetic_neardup_payload(docs: DataFrame) -> DataFrame:
    """doc_id -> real BMP bytes of :func:`synth_neardup_image`
    (worker-side, Arrow batches — the with_synthetic_image_payload
    pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flumedb_spark.operators import mmcodec

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        mmcodec.encode_bmp(synth_neardup_image(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, "doc_id long, payload binary")


def _dhash_bands_of(arr: np.ndarray) -> list[int]:
    """(H, W, 3) uint8 -> four 16-bit dHash bands (integer luma,
    floor-NN downsample to 9×8, row-wise neighbor comparison)."""
    from flumedb_spark.operators import mmcodec

    # integer BT.601-style luma: exact, and the identity on gray pixels
    luma = (
        299 * arr[:, :, 0].astype(np.int64)
        + 587 * arr[:, :, 1].astype(np.int64)
        + 114 * arr[:, :, 2].astype(np.int64)
    ) // 1000
    g = mmcodec.resize_nn(luma, _GRID_W, _GRID_H)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.int64)  # (8, 8)
    bands = []
    for k in range(N_BANDS):
        val = 0
        for dy in range(2):
            for x in range(_GRID_W - 1):
                val |= int(bits[2 * k + dy, x]) << (dy * 8 + x)
        bands.append(val)
    return bands


def image_dhash_bands(payloads: DataFrame) -> DataFrame:
    """REAL decode -> per-image dHash signature: (doc_id, b0..b3,
    dhash_hex). Corrupt blobs drop their row, never the partition
    (the image_decode_stats contract); one Arrow-batched pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flumedb_spark.operators import mmcodec

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "b0": [], "b1": [], "b2": [], "b3": [],
                "dhash_hex": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr, _fmt = mmcodec.decode_image_pure(bytes(p))
                except ValueError:
                    continue  # corrupt blob: drop the row, keep the task
                bands = _dhash_bands_of(mmcodec.to_rgb(arr))
                out["doc_id"].append(doc_id)
                for k in range(N_BANDS):
                    out[f"b{k}"].append(bands[k])
                out["dhash_hex"].append("".join(f"{b:04x}" for b in bands))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        "doc_id long, b0 long, b1 long, b2 long, b3 long, dhash_hex string",
    )


def image_neardup_candidates(
    payloads: DataFrame, max_hamming: int = 8
) -> DataFrame:
    """Full perceptual-near-dup pipeline: signatures -> Hamming-band
    LSH candidates -> exact Hamming verify. Output (doc_a, doc_b,
    hamming) with doc_a < doc_b, ordered.

    The signature table is materialized ONCE (localCheckpoint — the
    minhash band-table lesson: a lazy plan would re-run the decode
    kernel for the probe side AND both verify branches); the band join
    is an equi-join on (band, value) — never all-pairs — and verify is
    pure JVM ``bit_count(xor)`` over the four stored bands.
    """
    sig = image_dhash_bands(payloads).localCheckpoint(eager=True)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"), F.col(f"b{k}").alias("bval")
                )
                for k in range(N_BANDS)
            ])
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bval")
    left = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "bval"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "bval"
    )
    cand = (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(N_BANDS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"b_{k}") for k in range(N_BANDS)],
    )
    ham = F.expr(
        " + ".join(f"bit_count(a{k} ^ b_{k})" for k in range(N_BANDS))
    ).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= int(max_hamming))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------
# DuckDB oracle replay — pixel -> bit -> band -> join -> Hamming, all
# closed-form arithmetic over the synthetic md5 formulas
# ---------------------------------------------------------------------


def _md5_byte_sql(key_expr: str) -> str:
    """First byte of md5(key_expr) as an integer 0..255 (the
    sampling._bucket_expr digit-parse device, two hex digits)."""
    alphabet = "0123456789abcdef"
    return (
        f"((position(substr(md5({key_expr}), 1, 1) IN '{alphabet}') - 1) * 16"
        f" + (position(substr(md5({key_expr}), 2, 1) IN '{alphabet}') - 1))"
    )


def _bands_cte(table: str = "documents") -> str:
    """CTE chain ending in ``bands(doc_id, band, bval)`` +
    ``sig(doc_id, b0..b3)`` replaying the synthetic dHash."""
    base = _md5_byte_sql(
        "concat('g', CAST(d.doc_id // 4 AS VARCHAR), '|', "
        "CAST(2*dy.y AS VARCHAR), '|', CAST(2*dx.x AS VARCHAR))"
    )
    py = _md5_byte_sql("concat('py', CAST(d.doc_id AS VARCHAR))")
    px = _md5_byte_sql("concat('px', CAST(d.doc_id AS VARCHAR))")
    return f"""
    g AS (
      SELECT d.doc_id, dy.y, dx.x,
        CASE WHEN d.doc_id % 4 > 0
              AND dy.y = ({py}) % {_GRID_H}
              AND dx.x = ({px}) % {_GRID_W}
             THEN ({base} + 128) % 256 ELSE {base} END AS v
      FROM {table} d,
           generate_series(0, {_GRID_H - 1}) dy(y),
           generate_series(0, {_GRID_W - 1}) dx(x)
    ),
    bits AS (
      SELECT a.doc_id, a.y, a.x,
        CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
      FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.y = a.y
                       AND b.x = a.x + 1
    ),
    bands AS (
      SELECT doc_id, y // 2 AS band,
        CAST(sum(bit * (1 << ((y % 2) * 8 + x))) AS BIGINT) AS bval
      FROM bits GROUP BY doc_id, y // 2
    ),
    sig AS (
      SELECT doc_id,
        max(CASE WHEN band = 0 THEN bval END) AS b0,
        max(CASE WHEN band = 1 THEN bval END) AS b1,
        max(CASE WHEN band = 2 THEN bval END) AS b2,
        max(CASE WHEN band = 3 THEN bval END) AS b3
      FROM bands GROUP BY doc_id
    )"""


def dhash_bands_oracle_sql(table: str = "documents") -> str:
    """Replay of synth -> decode -> :func:`image_dhash_bands`."""
    return f"""
    WITH {_bands_cte(table)}
    SELECT doc_id, b0, b1, b2, b3,
      concat(printf('%04x', b0), printf('%04x', b1),
             printf('%04x', b2), printf('%04x', b3)) AS dhash_hex
    FROM sig ORDER BY doc_id
    """


def neardup_oracle_sql(
    table: str = "documents", max_hamming: int = 8
) -> str:
    """Replay of the full :func:`image_neardup_candidates` chain."""
    return f"""
    WITH {_bands_cte(table)},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
        CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
           + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
           AS BIGINT) AS hamming
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, hamming FROM scored
    WHERE hamming <= {int(max_hamming)}
    ORDER BY doc_a, doc_b
    """
