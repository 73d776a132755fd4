"""Mixed-media triage pipeline — the composed form of the round-5
multimodal operators, in the order a 100 TB media corpus runs them:

    raw blobs (mixed mp4/webm/avi/flac/mp3 + jpeg images)
      -> container triage            (extract_media_meta: magic-sniff ->
                                      real parser per format, ONE pass,
                                      no decode)
      -> metadata filtering          (duration/dims gates — cheap columns
                                      decided BEFORE any expensive decode)
      -> image decode stats          (pure-Python JPEG path via
                                      image_decode_stats)
      -> durable manifest            (engine log append + Delta-log export
                                      so external readers see the keepers)

Every stage is a DataFrame -> DataFrame transform; the triage/decode
stages are Arrow-batched mapInPandas kernels (stateless, partition-
parallel), so the same program scales with partition count. Corrupt
blobs become ok=False rows, never task failures.

Run: PYTHONPATH=/root/repo python examples/media_triage_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flumedb_spark import Flume
from flumedb_spark.operators import multimodal
from flumedb_spark.session import get_spark
from flumedb_spark.sources import read_delta_snapshot

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("media_triage", cpus=8)
    from flumedb_spark.catalog import register_tables

    register_tables(spark, SF_DIR)
    docs = spark.table("documents")

    # 1) mixed container corpus -> one-pass metadata triage
    media = multimodal.with_synthetic_media_payload(docs)
    meta = multimodal.extract_media_meta(media)

    # 2) metadata gates BEFORE any decode: playable video of sane size,
    # audio above a minimum duration
    keep_video = (F.col("kind") == "video") & (F.col("width") >= 320) & (
        F.col("duration_ms") >= 2000
    )
    # container-only formats (ogg id page, webp header) carry no
    # duration; gate those on their own metadata instead
    keep_audio = (F.col("kind") == "audio") & (
        (F.col("duration_ms") >= 10) | (F.col("sample_rate") >= 44100)
    )
    keep_image = (F.col("kind") == "image") & (F.col("width") >= 128)
    kept = meta.where(F.col("ok") & (keep_video | keep_audio | keep_image))

    # 3) the image side: real JPEG decode stats (pure-Python T.81 path)
    jpegs = multimodal.with_synthetic_jpeg_payload(docs.limit(200))
    img_stats = multimodal.image_decode_stats(jpegs)

    # 3b) perceptual dedup over the kept images (r9): dHash signatures
    # -> Hamming-band LSH candidates -> exact bit_count verify; one
    # decode pass, equi-joins only (operators/imagededup.py)
    from flumedb_spark.operators import imagededup

    images = imagededup.with_synthetic_neardup_payload(docs.limit(200))
    dup_pairs = imagededup.image_neardup_candidates(images, max_hamming=8)

    # 3c) VIDEO near-dup over kept clips (r10): per-keyframe dHash ->
    # band LSH frame pairs -> temporal-offset alignment — catches
    # re-encodes AND trimmed/shifted copies (operators/videodedup.py)
    from flumedb_spark.operators import audiodedup, videodedup

    clips = videodedup.with_synthetic_neardup_video_payload(docs.limit(120))
    video_dups = videodedup.video_neardup_candidates(
        clips, max_hamming=8, min_aligned=2
    )

    # 3d) AUDIO near-dup (r10): energy-delta fingerprints -> band LSH
    # -> exact Hamming verify (operators/audiodedup.py)
    tracks = audiodedup.with_synthetic_neardup_audio_payload(docs.limit(200))
    audio_dups = audiodedup.audio_neardup_candidates(tracks, max_hamming=8)

    counts = (
        kept.groupBy("kind", "format")
        .agg(F.count("*").alias("n"), F.sum("duration_ms").alias("total_ms"))
        .orderBy("kind", "format")
    )
    print("kept media by format:")
    for r in counts.collect():
        print(f"  {r.kind}/{r.format}: n={r.n} total_ms={r.total_ms}")
    n_img = img_stats.count()
    print(f"decoded jpeg images: {n_img}")
    n_dup = dup_pairs.count()
    print(f"perceptual near-dup image pairs (hamming<=8): {n_dup}")
    n_vdup = video_dups.count()
    print(f"video near-dup pairs (>=2 aligned keyframes): {n_vdup}")
    n_adup = audio_dups.count()
    print(f"audio near-dup pairs (fingerprint hamming<=8): {n_adup}")

    # 4) durable manifest: append keeper doc_ids to an engine log and
    # export a real Delta transaction log for external readers
    root = tempfile.mkdtemp(prefix="media_triage_")
    db = Flume(os.path.join(root, "manifest"), spark=spark)
    keeper_ids = [r.doc_id for r in kept.select("doc_id").limit(1000).collect()]
    db.append([{"doc_id": int(d), "stage": "kept"} for d in keeper_ids])
    out = db.maintain(export_delta=True)
    snap = read_delta_snapshot(db.log.path)
    print(
        f"manifest: {len(keeper_ids)} keepers at delta version "
        f"{out['delta_version']} ({len(snap['files'])} data files)"
    )
    db.close()


if __name__ == "__main__":
    main()
