"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for per-key state machines that windowed aggregates
can't express (SURVEY §2.C: the engine's "bring your own function"
surface, streaming form).

``running_key_stats`` keeps an arbitrary-lifetime per-key accumulator
(count / sum / last seq) across micro-batches — the streaming analog of
the Hashtable + NativeStats views, but with state owned by the
streaming runtime (checkpointed, recoverable) instead of the view
commit protocol. At scale, state lives in the state store (RocksDB
provider), partitioned by key.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n long, total double, last_seq long"
STATE_SCHEMA = "n long, total double, last_seq long"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_seq = state.get
    else:
        n, total, last_seq = 0, 0.0, -1
    for pdf in pdfs:
        # n counts VALUED events (rows whose value parsed non-null), so
        # n and total always describe the same row set and total/n is a
        # true mean; last_seq still advances over every delivered row
        n += int(pdf["value"].notna().sum())
        total += float(pdf["value"].sum())
        if len(pdf):
            last_seq = max(last_seq, int(pdf["seq"].max()))
    state.update((n, total, last_seq))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [total], "last_seq": [last_seq]}
    )


def running_key_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last_seq) over a stream of
    ``(seq, user_id, value)`` rows; emits the updated accumulator for
    every key touched in each micro-batch."""
    return (
        events_stream.select("seq", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def parsed_log_stream(stream_df: DataFrame) -> DataFrame:
    """Project a raw log stream's JSON values into (seq, user_id, value)
    for the stateful operator — JVM-side json path extraction."""
    return stream_df.select(
        "seq",
        F.get_json_object("value", "$.user_id").cast("long").alias("user_id"),
        F.get_json_object("value", "$.value").cast("double").alias("value"),
    )
