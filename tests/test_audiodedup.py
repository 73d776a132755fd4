"""Audio fingerprint near-dup (operators/audiodedup.py): WAV roundtrip
exactness, energy-delta bit semantics, corrupt/short-clip policy, and
the band-LSH candidate/verify chain."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import audiodedup, mmcodec


def _fp_of(doc_id):
    """Fingerprint through the REAL encode->decode path."""
    wav = mmcodec.encode_wav(
        audiodedup.synth_neardup_audio(doc_id), audiodedup.SAMPLE_RATE
    )
    samples, rate = mmcodec.decode_wav(wav)
    assert rate == audiodedup.SAMPLE_RATE
    return audiodedup._fingerprint_bands_of(samples)


class TestFingerprint:
    def test_wav_roundtrip_is_identity(self):
        x = audiodedup.synth_neardup_audio(7)
        samples, _ = mmcodec.decode_wav(
            mmcodec.encode_wav(x, audiodedup.SAMPLE_RATE)
        )
        assert np.array_equal(samples, x)

    def test_variant_flips_at_most_two_bits_in_one_band(self):
        # a variant replaces ONE 8-sample sub-block of one frame: only
        # that band's two adjacent transition bits can flip
        for d in (9, 10, 11, 201, 202):
            base, var = _fp_of((d // 4) * 4), _fp_of(d)
            per_band = [bin(a ^ b).count("1") for a, b in zip(base, var)]
            assert sum(per_band) <= 2
            assert sum(1 for h in per_band if h) <= 1

    def test_bands_are_16_bit(self):
        for d in range(8):
            for b in _fp_of(d):
                assert 0 <= b <= 0xFFFF

    def test_distinct_groups_far_apart(self):
        a, b = _fp_of(0), _fp_of(400)
        assert sum(bin(x ^ y).count("1") for x, y in zip(a, b)) > 8

    def test_short_clip_yields_none(self):
        assert audiodedup._fingerprint_bands_of(np.zeros(10, np.int16)) is None

    def test_stereo_uses_first_channel(self):
        mono = audiodedup.synth_neardup_audio(3)
        stereo = np.stack([mono, np.zeros_like(mono)], axis=1)
        assert audiodedup._fingerprint_bands_of(
            stereo
        ) == audiodedup._fingerprint_bands_of(mono)


class TestPipeline:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.range(0, 24).withColumnRenamed("id", "doc_id")

    def test_within_group_pairs_all_surface(self, spark, docs):
        payloads = audiodedup.with_synthetic_neardup_audio_payload(docs)
        out = audiodedup.audio_neardup_candidates(payloads).collect()
        assert len(out) == 36  # 6 groups x C(4,2)
        assert all(r.doc_a // 4 == r.doc_b // 4 for r in out)
        assert all(r.hamming <= 4 for r in out)

    def test_corrupt_blob_drops_row_not_partition(self, spark, docs):
        payloads = audiodedup.with_synthetic_neardup_audio_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 5, F.lit(b"not audio")).otherwise(
                F.col("payload")
            ),
        )
        sig = audiodedup.audio_fingerprint_bands(broken).collect()
        ids = {r.doc_id for r in sig}
        assert 5 not in ids and len(ids) == 23

    def test_fp_hex_matches_bands(self, spark, docs):
        row = (
            audiodedup.audio_fingerprint_bands(
                audiodedup.with_synthetic_neardup_audio_payload(docs)
            )
            .where(F.col("doc_id") == 7)
            .collect()[0]
        )
        assert row.fp_hex == "".join(
            f"{b:04x}" for b in (row.b0, row.b1, row.b2, row.b3)
        )

    def test_clip_search_offsets_and_tolerance(self, spark, docs):
        tracks = audiodedup.with_synthetic_track_payload(docs)
        clips = audiodedup.with_synthetic_clip_payload(docs)
        out = audiodedup.audio_clip_search(tracks, clips).collect()
        hits = {r.clip_doc: r for r in out}
        assert len(out) == len(hits)  # one window per matching clip
        for d in range(24):
            exp_off = (0, 8, 4)[d % 3]
            if exp_off == 4:  # off the hop grid: must NOT match
                assert d not in hits, hits.get(d)
            else:
                r = hits[d]
                assert r.track_doc == d and r.window_start == exp_off
                # perturbed clips (d%5==0) still match within tolerance
                assert r.hamming <= (2 if d % 5 == 0 else 0)

    def test_window_signatures_cover_hop_grid(self, spark, docs):
        tracks = audiodedup.with_synthetic_track_payload(docs)
        sig = audiodedup.track_window_signatures(tracks).collect()
        per_doc = {}
        for r in sig:
            per_doc.setdefault(r.doc_id, []).append(r.window_start)
        assert all(sorted(v) == [0, 8, 16, 24] for v in per_doc.values())

    def test_candidate_join_plan_no_cartesian_no_python(self, spark, docs):
        payloads = audiodedup.with_synthetic_neardup_audio_payload(docs)
        plan = (
            audiodedup.audio_neardup_candidates(payloads)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "MapInPandas" not in plan
