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

import math
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


_INTERVAL_UNIT_MS = {
    "second": 1_000, "seconds": 1_000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _interval_ms(interval: str) -> int:
    """Parse a Spark-style '<n> <unit>' interval to milliseconds,
    raising on anything Spark's own parser would reject — keeps the
    Python-side timeout arithmetic and `withWatermark` in agreement."""
    parts = str(interval).split()
    if len(parts) == 2 and parts[0].isdigit() and parts[1] in _INTERVAL_UNIT_MS:
        return int(parts[0]) * _INTERVAL_UNIT_MS[parts[1]]
    raise ValueError(f"unsupported interval: {interval!r}")


TRACK_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_points", LongType()),
    StructField("x0_micro", LongType()),
    StructField("y0_micro", LongType()),
    StructField("x1_micro", LongType()),
    StructField("y1_micro", LongType()),
    StructField("path_micro", LongType()),
])

_TRACK_STATE = StructType([
    StructField("n", LongType()),
    StructField("x0", LongType()), StructField("y0", LongType()),
    StructField("x1", LongType()), StructField("y1", LongType()),
    StructField("path", LongType()),
    StructField("last_x", LongType()), StructField("last_y", LongType()),
    StructField("last_ts", LongType()),
])


def track_assembler(stream_df: DataFrame, gap: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """Timeout-driven track assembly: accumulate each user's points in
    state and EMIT the completed track (count, bbox, integer path
    length) only when the event-time watermark passes `gap` beyond the
    user's last point — the streaming form of trajectory assembly
    (`table/trackfiles.gpx_tracks` / the STANAG track rollup), and the
    third stateful primitive after dedup and running counts: the first
    to use GroupStateTimeout (EventTimeTimeout), exercising the
    emit-on-silence contract every session-izing tracker needs.

    State per user is O(1) — aggregates plus the last point, never the
    point list — so a million concurrent vehicles hold a million small
    state rows, and a killed job resumes from the state store with its
    partial tracks intact."""
    stream_df = stream_df.withColumn("ts", stream_df["ts"].cast("timestamp"))
    gap_ms = _interval_ms(gap)
    _interval_ms(watermark)  # validate before handing to Spark

    def assemble(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            (n, x0, y0, x1, y1, path, _lx, _ly, _lt) = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]], "n_points": [n],
                "x0_micro": [x0], "y0_micro": [y0],
                "x1_micro": [x1], "y1_micro": [y1],
                "path_micro": [path],
            })
            return
        if state.exists:
            n, x0, y0, x1, y1, path, lx, ly, lt = state.get
        else:
            n = path = 0
            x0 = y0 = x1 = y1 = lx = ly = lt = None
        for pdf in pdfs:
            order = [c for c in ("ts", "event_id") if c in pdf.columns]
            pdf = pdf.sort_values(order, kind="stable")
            for _, r in pdf.iterrows():
                px = int(r["x_micro"])
                py = int(r["y_micro"])
                pt = int(r["ts"].value // 1000)  # micros
                if n == 0:
                    x0 = x1 = px
                    y0 = y1 = py
                else:
                    x0, x1 = min(x0, px), max(x1, px)
                    y0, y1 = min(y0, py), max(y1, py)
                    # integer planar path step (micro-deg, floor);
                    # math.sqrt is correctly rounded — pow(x, 0.5) is
                    # NOT guaranteed to be, and must match the batch
                    # twin's floor(sqrt(...)) exactly (q295 parity)
                    path += int(math.sqrt(
                        (px - lx) ** 2 + (py - ly) ** 2))
                lx, ly, lt = px, py, pt
                n += 1
        state.update((n, x0, y0, x1, y1, path, lx, ly, lt))
        # fire when the watermark passes last event time + gap
        state.setTimeoutTimestamp(lt // 1000 + gap_ms)
        return
        yield  # pragma: no cover — generator form

    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=TRACK_SCHEMA,
            stateStructType=_TRACK_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
