"""Property-based tests (hypothesis) — what the reference suite lacks
(SURVEY §5.6). Kept example counts low: every example runs Spark jobs.

Properties:
- any (gt, gte, lt, lte, reverse, limit) combination over the log equals
  the Python list-slice oracle (O4's full parameter lattice, not just
  the handful of cases the reference tests);
- the reduce accumulator is invariant to how appends are batched
  (fold(batch-splits) == fold(whole)) — the incremental-maintenance
  correctness core;
- the gate invariant: after any append pattern, a gated read reflects
  exactly the appended prefix.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flumedb_spark import Flume, Reduce

N = 30  # log size for the scan-lattice property


@pytest.fixture(scope="module")
def scan_db(spark, tmp_path_factory):
    db = Flume(str(tmp_path_factory.mktemp("prop") / "db"), spark=spark)
    db.append([{"v": i * 10} for i in range(N)])
    yield db
    db.close()


bound = st.one_of(st.none(), st.integers(min_value=-2, max_value=N + 2))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gt=bound,
    gte=bound,
    lt=bound,
    lte=bound,
    reverse=st.booleans(),
    limit=st.one_of(st.none(), st.integers(min_value=0, max_value=N + 2)),
)
def test_stream_equals_python_oracle(scan_db, gt, gte, lt, lte, reverse, limit):
    seqs = list(range(N))
    if gt is not None:
        seqs = [s for s in seqs if s > gt]
    if gte is not None:
        seqs = [s for s in seqs if s >= gte]
    if lt is not None:
        seqs = [s for s in seqs if s < lt]
    if lte is not None:
        seqs = [s for s in seqs if s <= lte]
    if reverse:
        seqs = seqs[::-1]
    if limit is not None:
        seqs = seqs[:limit]  # limit applies AFTER reverse
    got = scan_db.stream(
        gt=gt, gte=gte, lt=lt, lte=lte, reverse=reverse, limit=limit, values=False
    )
    assert got == seqs


@settings(max_examples=5, deadline=None)
@given(
    values=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=12),
    data=st.data(),
)
def test_fold_invariant_under_batching(spark, tmp_path_factory, values, data):
    # split `values` into random contiguous batches; appending batchwise
    # with interleaved gated reads must equal one-shot python fold
    db = Flume(str(tmp_path_factory.mktemp("fold") / "db"), spark=spark)
    db.use("sum", Reduce(1, lambda acc, item: (acc or 0) + item["v"]))
    i = 0
    while i < len(values):
        size = data.draw(st.integers(min_value=1, max_value=len(values) - i))
        db.append([{"v": v} for v in values[i : i + size]])
        if data.draw(st.booleans()):
            assert db.sum.get() == sum(values[: i + size])
        i += size
    assert db.sum.get() == sum(values)
    db.close()
