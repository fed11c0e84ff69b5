"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all; these are the engine-native stateful
building blocks a continuous ingest pipeline needs:

- ``streaming_dedup``: exactly-once-per-key emission across micro-batches —
  the streaming analogue of the batch exact-dedup operator (and of the
  reference's uniqueness check, vector_database.py:59-60).  State per key
  is one boolean; a processing-time timeout bounds state size for unbounded
  key spaces.
- ``running_counts``: per-key running aggregates maintained in state —
  the pattern behind continuously-maintained quality/popularity signals.

State lives in the state store (checkpointed, partitioned by key), so at
scale the operator shards horizontally like any keyed aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_dedup(
    stream_df: DataFrame,
    key_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit each key's FIRST row only, across all micro-batches.

    Output schema: (key string, n_dropped bigint) per key per batch where
    the key was seen; n_dropped counts suppressed duplicates in that batch.
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("first_seen_batch_rows", LongType()),
            StructField("n_dropped", LongType()),
        ]
    )
    state_schema = StructType([StructField("seen", LongType())])

    def dedup_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # timeout firing: the key went state_ttl_ms without a new row —
        # evict silently (emitting here would fabricate a (key, 0, 0) row)
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            out = pd.DataFrame(
                {"key": [str(key[0])], "first_seen_batch_rows": [0], "n_dropped": [n]}
            )
        else:
            state.update((n,))
            out = pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "first_seen_batch_rows": [n],
                    "n_dropped": [n - 1],
                }
            )
        # processing-time timeouts are cleared on every invocation for the
        # key, so the TTL must be re-armed after EVERY update — arming only
        # on first sighting leaves repeat keys immortal (unbounded state)
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield out

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def running_counts(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Per-key running row count maintained in state; emits the updated
    total each time the key appears in a micro-batch."""
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("total", LongType()),
        ]
    )
    state_schema = StructType([StructField("total", LongType())])

    def count_fn(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"key": [str(key[0])], "total": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        count_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
