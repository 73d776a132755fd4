"""Perceptual video near-dup (operators/videodedup.py): block-constant
JPEG exactness, keyframe signature semantics, corrupt-blob policy, and
the band-LSH + temporal-offset chain."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import mmcodec, videodedup
from flumedb_spark.operators.imagededup import _dhash_bands_of


def _sig_of(doc_id):
    """Signatures through the REAL encode->mux->demux->decode path."""
    avi = mmcodec.encode_avi_mjpeg(
        videodedup.synth_neardup_video_frames(doc_id),
        quality=50,
        strip_dht=bool(doc_id % 2),
    )
    return [
        _dhash_bands_of(mmcodec.to_rgb(f))
        for f in mmcodec.decode_avi_mjpeg_frames(avi)
    ]


class TestSynthExactness:
    def test_jpeg_roundtrip_is_identity_on_block_constant_frames(self):
        # the whole oracle strategy rests on this: even block values at
        # quality 50 survive the lossy codec bit-for-bit
        for d in (0, 1, 7, 42):
            frames = videodedup.synth_neardup_video_frames(d)
            avi = mmcodec.encode_avi_mjpeg(
                frames, quality=50, strip_dht=bool(d % 2)
            )
            out = mmcodec.decode_avi_mjpeg_frames(avi)
            assert len(out) == videodedup.N_FRAMES
            for orig, dec in zip(frames, out):
                rgb = np.repeat(orig[:, :, None], 3, axis=2)
                assert np.array_equal(dec, rgb), d

    def test_dhash_grid_samples_block_values(self):
        # 64x72 geometry: g[y][x] == block (y, x) value exactly
        arr = videodedup.synth_neardup_video_frames(4)[0]
        g = mmcodec.resize_nn(arr.astype(np.int64), 9, 8)
        expect = arr[::8, ::8]
        assert np.array_equal(g, expect)

    def test_block_values_are_even(self):
        for f in videodedup.synth_neardup_video_frames(5):
            assert (f % 2 == 0).all()


class TestSignatures:
    def test_variant_perturbs_one_frame_by_at_most_two_bits(self):
        for d in (9, 10, 201, 202):
            base, var = _sig_of((d // 4) * 4), _sig_of(d)
            v = d % 4
            hams = [
                sum(bin(a ^ b).count("1") for a, b in zip(fb, fv))
                for fb, fv in zip(base, var)
            ]
            # only local frame v-1 differs, by <= 2 bits (one block ->
            # two neighbor comparisons in one row)
            assert hams[v - 1] <= 2 and hams[v - 1] >= 0
            assert all(h == 0 for i, h in enumerate(hams) if i != v - 1)

    def test_shifted_variant_matches_at_offset_minus_one(self):
        base, shifted = _sig_of(8), _sig_of(11)  # group 2: base, variant 3
        assert base[1] == shifted[0] and base[2] == shifted[1]
        # and its new tail frame is unrelated to base frame 0
        ham = sum(bin(a ^ b).count("1") for a, b in zip(base[0], shifted[2]))
        assert ham > 8

    def test_distinct_groups_far_apart(self):
        a, b = _sig_of(0)[0], _sig_of(400)[0]
        assert sum(bin(x ^ y).count("1") for x, y in zip(a, b)) > 8


class TestPipeline:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.range(0, 24).withColumnRenamed("id", "doc_id")

    def test_signature_rows(self, spark, docs):
        payloads = videodedup.with_synthetic_neardup_video_payload(docs)
        sig = videodedup.video_keyframe_signatures(payloads).collect()
        assert len(sig) == 24 * videodedup.N_FRAMES
        assert all(0 <= r[f"b{k}"] <= 0xFFFF for r in sig for k in range(4))

    def test_neardup_pairs_and_offsets(self, spark, docs):
        payloads = videodedup.with_synthetic_neardup_video_payload(docs)
        out = videodedup.video_neardup_candidates(payloads).collect()
        # 6 groups x C(4,2) pairs, all intra-group
        assert len(out) == 36
        by_pair = {(r.doc_a, r.doc_b): r for r in out}
        for (a, b), r in by_pair.items():
            assert a // 4 == b // 4
            if b % 4 == 3:  # shifted variant: offset -1, 2 aligned
                assert (r.frame_offset, r.aligned_frames) == (-1, 2), r
            else:  # unshifted variants: offset 0, all 3 frames align
                assert (r.frame_offset, r.aligned_frames) == (0, 3), r

    def test_corrupt_blob_drops_rows_not_partition(self, spark, docs):
        payloads = videodedup.with_synthetic_neardup_video_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 3, F.lit(b"not a video")).otherwise(
                F.col("payload")
            ),
        )
        sig = videodedup.video_keyframe_signatures(broken).collect()
        ids = {r.doc_id for r in sig}
        assert 3 not in ids and len(ids) == 23

    def test_keyframe_stride_subsamples(self, spark, docs):
        payloads = videodedup.with_synthetic_neardup_video_payload(docs)
        sig = videodedup.video_keyframe_signatures(
            payloads, every_n_frames=2
        ).collect()
        # frames 0 and 2 of each 3-frame clip
        assert {r.frame_idx for r in sig} == {0, 1}
        assert len(sig) == 24 * 2

    def test_cross_modal_image_matches(self, spark, docs):
        videos = videodedup.with_synthetic_neardup_video_payload(docs)
        images = videodedup.with_synthetic_frame_image_payload(docs)
        out = videodedup.video_image_matches(videos, images).collect()
        assert out, "no cross-modal matches found"
        for r in out:
            # every match is intra-group (md5-random cross-group frames
            # sit ~32 bits apart)
            assert r.image_doc // 4 == r.video_doc // 4
            # image content frame cf=3 exists ONLY in shifted variant-3
            # clips, at their final keyframe
            if r.image_doc % 4 == 3:
                assert r.video_doc % 4 == 3 and r.frame_idx == 2
        # the registry still of an UNPERTURBED base frame matches its
        # own video exactly
        exact = [r for r in out if r.hamming == 0]
        assert exact

    def test_candidate_join_plan_no_cartesian_no_python(self, spark, docs):
        payloads = videodedup.with_synthetic_neardup_video_payload(docs)
        plan = (
            videodedup.video_neardup_candidates(payloads)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        # signature table is checkpointed: the decode kernel never
        # re-runs per join branch
        assert "MapInPandas" not in plan
