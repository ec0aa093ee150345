"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming state at all (SURVEY.md §2.9 — its Kafka
path is write-side micro-batching only).  This module supplies the two
stateful primitives a continuously-ingesting 100 TB pipeline needs, as
Arrow-batched grouped-state operators:

- `stateful_dedup`   — emit each key's row once across ALL micro-batches
  (streaming twin of the exact-dedup operator q15; the DedupeFilter of
  `core/store/.../base/BaseConstraintsQuery.java:274-276` in
  /root/reference, lifted to unbounded input)
- `running_cell_counts` — per-cell running totals maintained in state
  (streaming twin of the row-range-histogram statistic that drives
  salting, `RowRangeHistogramStatistic.java`)

State lives in the checkpointed state store, so a killed job resumes with
its dedup/count memory intact — the same resumability contract as the
batch per-partition checkpoint writer (plans/checkpoint.py).

Scale notes: state is partitioned by the grouping key across executors;
keys never co-reside, so state size per task is bounded by the hottest
key, which for `cell` keys is exactly what the salting machinery
(index/cover.salted) spreads when needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)


def stateful_dedup(stream_df: DataFrame, key_col: str, out_schema: str) -> DataFrame:
    """First-seen-wins streaming dedup on ``key_col``.

    ``out_schema`` must describe the columns to emit (a subset of the
    input columns, including ``key_col``).  Rows for a key already seen in
    ANY earlier micro-batch produce no output.
    """
    state_schema = StructType([StructField("seen", LongType())])

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            # drain the iterator without emitting — key already output
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[[0]]
                break
        for _ in pdfs:  # drain remainder
            pass
        state.update((1,))
        if first is not None:
            yield first

    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_cell_counts(stream_df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Per-cell running row counts across all micro-batches.

    Emits one (cell, total) row per cell per batch with the updated total —
    an always-current statistics sidecar for skew decisions.
    """
    state_schema = StructType([StructField("n", LongType())])
    out_schema = f"{cell_col} long, total long"

    def count(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        prev = state.get[0] if state.exists else 0
        n = prev + sum(len(p) for p in pdfs)
        state.update((n,))
        yield pd.DataFrame({cell_col: [key[0]], "total": [n]})

    return stream_df.groupBy(cell_col).applyInPandasWithState(
        count,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
