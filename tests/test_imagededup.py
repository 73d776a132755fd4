"""Perceptual image near-dup (operators/imagededup.py): dHash bit
semantics, format independence, corrupt-blob policy, and the band-LSH
candidate/verify chain."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import imagededup, mmcodec


def _bands(arr):
    return imagededup._dhash_bands_of(arr)


class TestDhash:
    def test_identical_images_hash_equal(self):
        a = imagededup.synth_neardup_image(8)   # variant 0 (base)
        assert _bands(a) == _bands(a.copy())

    def test_single_cell_perturbation_flips_at_most_two_bits(self):
        # variants perturb ONE sampled cell -> the two difference bits
        # that touch it are the only ones that can flip
        for doc in (9, 10, 11, 201, 202):
            base = _bands(imagededup.synth_neardup_image((doc // 4) * 4))
            var = _bands(imagededup.synth_neardup_image(doc))
            ham = sum(bin(a ^ b).count("1") for a, b in zip(base, var))
            assert ham <= 2, (doc, ham)

    def test_band_values_are_16_bit(self):
        for doc in range(12):
            for b in _bands(imagededup.synth_neardup_image(doc)):
                assert 0 <= b <= 0xFFFF

    def test_distinct_groups_far_apart(self):
        a = _bands(imagededup.synth_neardup_image(0))     # group 0
        b = _bands(imagededup.synth_neardup_image(400))   # group 100
        ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert ham > 8  # md5-random patterns: expected ~32

    def test_format_independence_bmp_vs_png(self):
        # the dHash is a function of PIXELS, not container bytes
        arr = imagededup.synth_neardup_image(5)
        via_bmp, _ = mmcodec.decode_image_pure(mmcodec.encode_bmp(arr))
        via_png, _ = mmcodec.decode_image_pure(mmcodec.encode_png(arr))
        assert _bands(mmcodec.to_rgb(via_bmp)) == _bands(
            mmcodec.to_rgb(via_png)
        )

    def test_luma_identity_on_gray(self):
        # gray pixels: integer BT.601 luma reduces to the pixel value,
        # which is what the closed-form oracle relies on
        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
        luma = (
            299 * rgb[:, :, 0].astype(np.int64)
            + 587 * rgb[:, :, 1].astype(np.int64)
            + 114 * rgb[:, :, 2].astype(np.int64)
        ) // 1000
        assert (luma == g).all()


class TestPipeline:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.range(0, 24).withColumnRenamed("id", "doc_id")

    def test_within_group_pairs_all_surface(self, spark, docs):
        payloads = imagededup.with_synthetic_neardup_payload(docs)
        out = imagededup.image_neardup_candidates(payloads).collect()
        # 6 groups of 4 docs -> C(4,2)=6 pairs each, nothing else
        assert len(out) == 36
        assert all(r.doc_a // 4 == r.doc_b // 4 for r in out)
        assert all(r.hamming <= 4 for r in out)

    def test_corrupt_blob_drops_row_not_partition(self, spark, docs):
        payloads = imagededup.with_synthetic_neardup_payload(docs)
        broken = payloads.withColumn(
            "payload",
            F.when(F.col("doc_id") == 3, F.lit(b"not an image")).otherwise(
                F.col("payload")
            ),
        )
        sig = imagededup.image_dhash_bands(broken).collect()
        ids = {r.doc_id for r in sig}
        assert 3 not in ids and len(ids) == 23

    def test_dhash_hex_matches_bands(self, spark, docs):
        row = (
            imagededup.image_dhash_bands(
                imagededup.with_synthetic_neardup_payload(docs)
            )
            .where(F.col("doc_id") == 7)
            .collect()[0]
        )
        assert row.dhash_hex == "".join(
            f"{b:04x}" for b in (row.b0, row.b1, row.b2, row.b3)
        )

    def test_candidate_join_plan_no_cartesian(self, spark, docs):
        payloads = imagededup.with_synthetic_neardup_payload(docs)
        plan = (
            imagededup.image_neardup_candidates(payloads)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        # signature table is checkpointed: the decode kernel never
        # re-runs per join branch (zero Python stages in the plan)
        assert "MapInPandas" not in plan
