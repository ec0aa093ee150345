"""Sequence packing: greedy next-fit assignment of documents into
fixed-token-budget packs, the standard pre-training batch-construction
step (concatenate documents up to the context length; start a new pack
when the next one would overflow).

Packing is inherently sequential *within a shard* but embarrassingly
parallel *across shards*, so the operator shards by `id % shards` (or a
caller-supplied column), orders each shard deterministically by hash, and
runs the next-fit fold in `applyInPandas` — one keyed shuffle, then pure
per-group numpy/python work, the same group-process shape the reference
uses for its server-side tile merges
(`core/store/.../adapter/RowMergingDataStore` pattern;
`analytics/mapreduce/.../kde/KDEJobRunner.java:551-623` groupByKey→merge
in /root/reference).

Determinism: order and shard are pure functions of the row id, so the
output is reproducible and an independent SQL oracle (recursive CTE over
the same ordering) verifies it bit-for-bit.

Scale notes: at 100 TB pick `shards` >> cores (e.g. 2^14) — pack quality
is per-shard so more shards only adds parallelism; the shuffle key is
uniform by construction (modular hash), no skew.  A doc larger than the
budget gets a pack of its own (never split here — chunk upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from .sampling import HASH_MOD, det_hash

PACK_SCHEMA = (
    "shard int, pack_id bigint, pos bigint, id bigint, tok bigint"
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int,
    shards: int = 32,
    mult: int = 48271,
    add: int = 7,
) -> DataFrame:
    """Next-fit pack assignment: returns one row per input doc with
    `(shard, pack_id, pos, id, tok)` — `pack_id` is 0-based within the
    shard, `pos` 0-based within the pack.
    """
    budget = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "id"], kind="mergesort")
        toks = pdf["tok"].to_list()
        pack_ids, poss = [], []
        pack, pos, running = 0, 0, 0
        for t in toks:
            if running > 0 and running + t > budget:
                pack += 1
                pos, running = 0, 0
            pack_ids.append(pack)
            poss.append(pos)
            running += t
            pos += 1
        out = pdf[["shard", "id", "tok"]].copy()
        out["pack_id"] = pack_ids
        out["pos"] = poss
        return out[["shard", "pack_id", "pos", "id", "tok"]]

    base = df.select(
        (F.col(id_col) % F.lit(shards)).cast("int").alias("shard"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(tok_col).cast("bigint").alias("tok"),
        det_hash(id_col, mult, add).alias("_h"),
    )
    return base.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)


def pack_oracle_sql(
    docs_sql: str,
    budget: int,
    shards: int = 32,
    mult: int = 48271,
    add: int = 7,
) -> str:
    """DuckDB recursive-CTE twin of `pack_sequences`: steps row-by-row per
    shard (depth = max rows per shard), reproducing the next-fit fold.
    `docs_sql` must yield (id, tok)."""
    return f"""
WITH RECURSIVE d AS (
  SELECT id % {shards} AS shard, id, tok,
         row_number() OVER (
           PARTITION BY id % {shards}
           ORDER BY (id * {mult} + {add}) % {HASH_MOD}, id) AS rn
  FROM ({docs_sql})
),
step AS (
  SELECT shard, rn, id, tok,
         cast(0 as bigint) AS pack_id, cast(0 as bigint) AS pos,
         tok AS running
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.id, d.tok,
         CASE WHEN s.running > 0 AND s.running + d.tok > {budget}
              THEN s.pack_id + 1 ELSE s.pack_id END,
         CASE WHEN s.running > 0 AND s.running + d.tok > {budget}
              THEN 0 ELSE s.pos + 1 END,
         CASE WHEN s.running > 0 AND s.running + d.tok > {budget}
              THEN d.tok ELSE s.running + d.tok END
  FROM step s JOIN d ON d.shard = s.shard AND d.rn = s.rn + 1
)
SELECT cast(shard as int) AS shard, pack_id, pos, id, tok FROM step
"""
