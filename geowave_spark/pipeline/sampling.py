"""Deterministic sampling and dataset-mixing operators for training-data
pipelines.

These extend the engine past the reference's query surface (GeoWave has no
sampling ops) toward the corpus-preparation workload the north rule
targets: balancing strata before training, drawing fixed-size per-stratum
samples, and temperature-weighted source mixing under a token budget.

Everything is *deterministic by hash*, never `rand()`: the sample is a pure
function of the row id, so re-runs, retries, and the DuckDB oracles all
agree bit-for-bit, and membership can be recomputed row-side at any scale
(the same property the reference's insertion-id scheme relies on for
dedup — `core/index/.../InsertionIds.java` in /root/reference).

Scale notes (100 TB shape): every operator is a scan + a broadcast join
against a tiny per-stratum table + a codegen filter — no shuffle of the
data side except `topk_per_stratum`'s per-stratum window, whose scale
variant is the documented two-phase prefilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

#: modulus of the integer sampling hash — prime, so low bits are well mixed
HASH_MOD = 1_000_003


def det_hash(col, mult: int = 40503, add: int = 2_531_011):
    """Deterministic integer hash `(id * mult + add) % 1000003`.

    Small multiplier by design: exact in int64 for ids < 2^63 / mult
    (~2.3e14 rows), and expressible identically in any ANSI SQL engine —
    the oracle recomputes it verbatim.  For ids past that range swap in
    `xxhash64` (engine-only).
    """
    return (F.col(col) * F.lit(mult) + F.lit(add)) % F.lit(HASH_MOD)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    id_col: str,
    target: int | None = None,
    mult: int = 40503,
    add: int = 2_531_011,
) -> DataFrame:
    """Hash-Bernoulli stratified downsample: thin every stratum to ~`target`
    rows (default: the smallest stratum's size, i.e. full balance).

    Plan shape: one partial-aggregate pass for stratum counts (tiny result),
    broadcast back, then a pure codegen filter on the scan — the data side
    never shuffles, so this holds at any scale.  The per-stratum keep rate
    is `min(1, target/n)` quantized to milli-units so the filter is exact
    integer arithmetic.
    """
    cnt = df.groupBy(*strata).agg(F.count("*").alias("_n"))
    if target is None:
        tgt = cnt.agg(F.min("_n").alias("_t"))
        rates = cnt.crossJoin(F.broadcast(tgt))
    else:
        rates = cnt.withColumn("_t", F.lit(int(target)))
    rates = rates.select(
        *strata,
        F.least(F.lit(1000).cast("bigint"),
                F.expr("(_t * 1000) div _n")).alias("_rate_milli"),
    )
    h = det_hash(id_col, mult, add) % 1000
    return (
        df.join(F.broadcast(rates), strata)
        .where(h < F.col("_rate_milli"))
        .drop("_rate_milli")
    )


def topk_per_stratum(
    df: DataFrame,
    strata: list[str],
    id_col: str,
    k: int,
    mult: int = 69069,
    add: int = 12345,
) -> DataFrame:
    """Exactly-k deterministic sample per stratum (reservoir analog): rank
    rows by hash within each stratum, keep rank <= k.  Adds `rk` (1-based,
    bigint).

    Scale note: the window shuffles by stratum key; with few huge strata
    prefix this with `stratified_sample(..., target=8*k)` — the hash
    prefilter preserves the top-k-by-hash set with overwhelming margin and
    turns the window input into O(strata * k) rows.
    """
    h = det_hash(id_col, mult, add)
    w = Window.partitionBy(*strata).orderBy(h, F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
    )


def isqrt_col(col):
    """Exact integer sqrt of a bigint column, safe against float rounding
    in either direction (works for any x < 2^52)."""
    r = F.floor(F.sqrt(F.col(col).cast("double"))).cast("bigint")
    r = F.when(r * r > F.col(col), r - 1).otherwise(r)
    return F.when((r + 1) * (r + 1) <= F.col(col), r + 1).otherwise(r)


def weighted_mixture(
    df: DataFrame,
    source_col: str,
    tok_col: str,
    id_col: str,
    budget_num: int = 2,
    budget_den: int = 5,
    mult: int = 48271,
    add: int = 11,
) -> DataFrame:
    """Temperature-weighted (alpha = 0.5) source mixing under a token
    budget: source s receives `budget * sqrt(tok_s) / sum(sqrt(tok_s))`
    tokens (the standard multilingual rebalance — sqrt damps head sources,
    boosts tail ones), filled by docs in hash order until the per-source
    cumulative token count exceeds its share.

    Returns the selected rows plus `cum_tok` (running total including the
    row) and `src_budget`.  All integer arithmetic (exact isqrt, integer
    division) so an independent SQL oracle reproduces it bit-for-bit.

    Plan shape: one aggregate pass for per-source token sums (tiny),
    broadcast back, one window cumsum per source.  The cumsum shuffles by
    source; at extreme skew pre-shard the window by hash range per source
    and merge partial sums (not needed below ~10^10 rows/source).
    """
    src = df.groupBy(source_col).agg(F.sum(tok_col).alias("_toks"))
    src = src.withColumn("_w", isqrt_col("_toks"))
    tot = src.agg(
        F.sum("_w").alias("_sw"), F.sum("_toks").alias("_st")
    )
    bud = (
        src.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.expr(
                f"((_st * {int(budget_num)}) div {int(budget_den)})"
                " * _w div _sw"
            ).alias("src_budget"),
        )
    )
    h = det_hash(id_col, mult, add)
    w = (
        Window.partitionBy(source_col)
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tok", F.sum(tok_col).over(w))
        .join(F.broadcast(bud), source_col)
        .where(F.col("cum_tok") <= F.col("src_budget"))
    )
