"""Behavioral tests for dedup.minhash_cross_decontaminate — the
near-dup cross-corpus decontamination stage. Corpus-scale cross-engine
parity is ns_minhash_decontamination's job (re-run vs DuckDB every
suite via tests/test_full_gate.py)."""

from pyspark.sql import functions as F

from flumedb_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = "the quick brown fox jumps over the lazy dog again and again today"
LONG_B = "completely different words about spark catalyst shuffles and joins"


class TestMinhashCrossDecontaminate:
    def test_exact_copy_is_contaminated_at_1000(self, spark):
        train = _df(spark, [(1, LONG_A), (2, LONG_B)])
        ev = _df(spark, [(100, LONG_A)])
        out = {
            r.doc_id: r
            for r in dedup.minhash_cross_decontaminate(train, ev).collect()
        }
        assert out[1].contaminated is True
        assert out[1].best_eval_id == 100
        assert out[1].best_agree_milli == 1000
        assert out[2].contaminated is False
        assert out[2].best_eval_id == -1
        assert out[2].best_agree_milli == -1
        assert out[2].n_eval_candidates == 0

    def test_every_train_doc_gets_a_row(self, spark):
        train = _df(spark, [(i, f"unique text number {i} with padding") for i in range(5)])
        ev = _df(spark, [(100, LONG_A)])
        out = dedup.minhash_cross_decontaminate(train, ev)
        assert out.count() == 5

    def test_near_copy_scores_between_0_and_1000(self, spark):
        # one word substituted: most shingles survive, agreement is
        # high but the threshold decision stays deterministic
        near = LONG_A.replace("lazy", "sleepy")
        train = _df(spark, [(1, near)])
        ev = _df(spark, [(100, LONG_A)])
        r = dedup.minhash_cross_decontaminate(train, ev).collect()[0]
        assert r.n_eval_candidates >= 1          # still band-collides
        assert 0 <= r.best_agree_milli <= 1000

    def test_threshold_milli_gates_the_flag(self, spark):
        train = _df(spark, [(1, LONG_A)])
        ev = _df(spark, [(100, LONG_A)])
        strict = dedup.minhash_cross_decontaminate(
            train, ev, threshold_milli=1000
        ).collect()[0]
        assert strict.contaminated is True  # exact copy agrees at 1000
        impossible = dedup.minhash_cross_decontaminate(
            train, ev, threshold_milli=1001
        ).collect()[0]
        assert impossible.contaminated is False

    def test_eval_side_never_reported(self, spark):
        # output covers the TRAIN corpus only
        train = _df(spark, [(1, LONG_B)])
        ev = _df(spark, [(100, LONG_A), (101, LONG_B)])
        ids = [r.doc_id for r in dedup.minhash_cross_decontaminate(train, ev).collect()]
        assert ids == [1]
