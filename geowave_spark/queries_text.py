"""Training-data pipeline operators over documents/embeddings:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search (brute-force cosine top-k, hyperplane-LSH bucketed), and text
analysis (stats, language-ID, fingerprinting).

Architecture: every operator is PURE Spark SQL built from
`functions/sqlgen.py` dual-dialect fragments — array lambdas + folds +
windows, fully inside whole-stage codegen (no Python in the hot path), with
the DuckDB oracle evaluating the formula-identical twin.  At 100 TB the
LSH operators are the scale path (candidate generation is an equi-join on
band/bucket ids — shuffle on a well-distributed key, broadcast-able when
one side is small); the brute-force variants are the correctness oracles,
exactly like the reference's indexed-vs-brute spatial join tests
(`test/.../spark/GeoWaveSparkSpatialJoinIT.java:228-255` in /root/reference).
GeoWave itself has no text/vector ops — this extends the engine to the
large-scale training-data workload the north rule targets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .functions import sqlgen as G
from .table.views import register_views


def _dual(build):
    """build(dialect) -> SQL string; returns (spark_fn, duck_sql)."""
    spark_sql = build(G.SPARK)
    duck_sql = build(G.DUCK)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return fn, duck_sql


# ------------------------------------------------------------ deduplication


def _q15(d: G.Dialect) -> str:
    return """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
       cast(count(*) as bigint) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY canonical_id
"""


def _q16(d: G.Dialect) -> str:
    """MinHash+LSH near-dup pairs, fully relational (the 100 TB shape):
    shingles explode to rows ONCE, minhash = 16 groupBy-min aggregates,
    band buckets equi-join for candidates, and the Jaccard verify is a
    shingle-equality join + group count — every step is a keyed shuffle,
    nothing re-evaluates array lambdas per candidate pair."""
    sh = G.shingles3_from(d, "v")
    mins = ", ".join(
        f"min(({2 * j + 3} * (shingle % {G.P_MINHASH}) + {104729 * (j + 1) % G.P_MINHASH}) % {G.P_MINHASH}) AS m{j}"
        for j in range(16)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, "
        f"{G.band_hash([f'm{4 * b + i}' for i in range(4)])} AS bh FROM sig"
        for b in range(4)
    )
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
sh_rows AS (
  SELECT DISTINCT doc_id, {d.explode(sh)} AS shingle
  FROM wv WHERE {d.size('v')} >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh_rows GROUP BY doc_id),
sig AS (SELECT doc_id, {mins} FROM sh_rows GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.d1, c.d2, count(*) AS ninter
  FROM cand c
  JOIN sh_rows a ON a.doc_id = c.d1
  JOIN sh_rows b ON b.doc_id = c.d2 AND b.shingle = a.shingle
  GROUP BY c.d1, c.d2
),
verified AS (
  SELECT i.d1, i.d2,
         cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) AS jac_micro
  FROM inter i JOIN sizes z1 ON z1.doc_id = i.d1 JOIN sizes z2 ON z2.doc_id = i.d2
)
SELECT d1, d2, jac_micro FROM verified WHERE jac_micro >= 500000
ORDER BY d1, d2
"""


def _q17(d: G.Dialect) -> str:
    sim = G.simhash16_from(d, "v")
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents)
SELECT doc_id, cast({sim} as bigint) AS simhash
FROM wv WHERE {d.size('v')} >= 1 ORDER BY doc_id
"""


def _q18(d: G.Dialect) -> str:
    """Pairwise n-gram Jaccard within source groups — exploded-row
    formulation: intersection sizes come from a shingle-equality join
    (pairs with empty intersection never materialize; the >= 30000
    threshold implies ninter >= 1, so results are identical to the
    all-pairs nested-array version).

    Scale contract: the join key is (source, shingle), so fan-out is
    bounded by within-source co-occurrence — a stop-shingle shared by all
    n_s docs of one source still yields O(n_s^2) join rows, which is
    INHERENT to exact pairwise Jaccard at a 0.03 threshold (prefix
    filtering prunes nothing that low).  This operator is the exact
    verifier for bounded groups, mirroring the reference's brute-force
    side (`GeoWaveSparkSpatialJoinIT.java:228-255`); the 100 TB candidate
    path is q16's banded MinHash join, whose band keys are uniform."""
    sh = G.shingles3_from(d, "v")
    return f"""
WITH wv AS (SELECT doc_id, source, {G.wordvals(d)} AS v FROM documents),
sh_rows AS (
  SELECT DISTINCT doc_id, source, {d.explode(sh)} AS shingle
  FROM wv WHERE {d.size('v')} >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh_rows GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ninter
  FROM sh_rows a
  JOIN sh_rows b ON b.source = a.source AND b.shingle = a.shingle
                AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.d1, i.d2,
       cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) AS jac_micro
FROM inter i JOIN sizes z1 ON z1.doc_id = i.d1 JOIN sizes z2 ON z2.doc_id = i.d2
WHERE cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) >= 30000
ORDER BY d1, d2
"""


def _q18_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _q18 with the codegen shingle build
    (`shingle_rows_sql_spark`): identical (doc_id, source, shingle) set,
    the HOF transform stays only in the DuckDB oracle dialect."""
    register_views(spark, sf_dir)
    return spark.sql(f"""
WITH sh_rows AS ({shingle_rows_sql_spark("source")}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh_rows GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ninter
  FROM sh_rows a
  JOIN sh_rows b ON b.source = a.source AND b.shingle = a.shingle
                AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.d1, i.d2,
       cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) AS jac_micro
FROM inter i JOIN sizes z1 ON z1.doc_id = i.d1 JOIN sizes z2 ON z2.doc_id = i.d2
WHERE cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) >= 30000
ORDER BY d1, d2
""")


# ------------------------------------------------------- similarity search


def _vec_cte(d: G.Dialect) -> str:
    v = G.to_double_arr(d, "embedding")
    nrm = G.dot(d, "v", "v", 64)
    return (
        f"v0 AS (SELECT vec_id, label, {v} AS v FROM embeddings),\n"
        f"vecs AS (SELECT vec_id, label, v, sqrt({nrm}) AS nv FROM v0)"
    )


def _q19(d: G.Dialect) -> str:
    """Brute-force cosine top-5 over the FULL corpus per panel query —
    the exact-baseline op of the ANN ladder (the corpus side must stay
    whole; that is the operator's meaning).  The query panel is pinned
    to the fixed id set below 2000 (40 queries above sf0.1; every
    gate-scale id is under the cap, so gate results are byte-identical
    to the old 1/50 sample) — the r5 sweep caught the fraction-based
    panel making the scan O(n^2/50), the q258/q285 disease."""
    dt = G.dot(d, "q.v", "c.v", 64)
    return f"""
WITH {_vec_cte(d)},
q AS (SELECT * FROM vecs WHERE vec_id % 50 = 0 AND vec_id < 2000),
sims AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         cast(floor(1000000.0 * ({dt}) / (q.nv * c.nv)) as bigint) AS sim_micro
  FROM q JOIN vecs c ON q.vec_id <> c.vec_id
)
SELECT qid, cid, sim_micro, rank FROM (
  SELECT qid, cid, sim_micro,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim_micro DESC, cid ASC) AS rank
  FROM sims
) t WHERE rank <= 5 ORDER BY qid, rank
"""


def _q20(d: G.Dialect) -> str:
    """Hyperplane-LSH bucketed ANN: 16-bit bucket = 65,536 cells (the
    round-1 12-bit/4096-cell version left each bucket with n/4096 rows —
    too coarse past ~10^8 vectors; 16 bits is the self-join sweet spot,
    and q41's IVF path is the scale answer beyond that)."""
    bucket = G.hyperplane_bucket(d, "v", 64, nbits=16)
    dt = G.dot(d, "q.v", "c.v", 64)
    return f"""
WITH {_vec_cte(d)},
b AS (SELECT vec_id, v, nv, {bucket} AS bucket FROM vecs),
sims AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         cast(floor(1000000.0 * ({dt}) / (q.nv * c.nv)) as bigint) AS sim_micro
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT qid, cid, sim_micro, rank FROM (
  SELECT qid, cid, sim_micro,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim_micro DESC, cid ASC) AS rank
  FROM sims
) t WHERE rank <= 3 ORDER BY qid, rank
"""


# ----------------------------------------------------------- text analysis

STOPWORDS = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"


def _q21(d: G.Dialect) -> str:
    toks = G.tokens(d)
    ntok = d.size(toks)
    total_len = d.fold(d.xform(toks, "length(x)"), "cast(0 as bigint)", "acc + x")
    stop = d.size(d.arr_filter(toks, f"x IN {STOPWORDS}"))
    return f"""
SELECT doc_id, cast({ntok} as bigint) AS n_tokens,
       cast(floor(1000000.0 * {total_len} / {ntok}) as bigint) AS avg_tok_len_micro,
       cast({stop} as bigint) AS n_stopwords,
       cast(floor(1000000.0 * {stop} / {ntok}) as bigint) AS stop_ratio_micro,
       cast(length(text) as bigint) AS n_chars_actual
FROM documents WHERE {ntok} >= 1 ORDER BY doc_id
"""


def _q63(d: G.Dialect) -> str:
    """Document quality scoring — the LLM-pipeline filter pass: length,
    punctuation ratio, alphabetic ratio, stopword ratio, whitespace vs
    BPE-ish token counts, and a composite keep/drop flag (the C4/Gopher
    rule shape: length band + punct bound + stopword floor).  Pure codegen
    SQL in both engines (`regexp_count` on a Java/RE2-common pattern)."""
    toks = G.tokens(d)
    ntok = d.size(toks)
    stop = d.size(d.arr_filter(toks, f"x IN {STOPWORDS}"))
    bpe = d.regexp_count("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
    punct = d.regexp_count("text", "[^A-Za-z0-9 ]")
    alpha = d.regexp_count("text", "[A-Za-z]")
    return f"""
WITH m AS (
  SELECT doc_id,
         cast(length(text) as bigint) AS n_chars,
         cast({ntok} as bigint) AS n_ws_tokens,
         cast({bpe} as bigint) AS n_bpe_tokens,
         cast({punct} as bigint) AS n_punct,
         cast({alpha} as bigint) AS n_alpha,
         cast({stop} as bigint) AS n_stop
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, n_chars, n_ws_tokens, n_bpe_tokens,
       cast(floor(1000000.0 * n_punct / n_chars) as bigint) AS punct_ratio_micro,
       cast(floor(1000000.0 * n_alpha / n_chars) as bigint) AS alpha_ratio_micro,
       cast(floor(1000000.0 * n_stop / n_ws_tokens) as bigint) AS stop_ratio_micro,
       cast(CASE WHEN n_chars BETWEEN 20 AND 100000
                  AND n_ws_tokens >= 5
                  AND 1000000.0 * n_punct / n_chars < 150000
                  AND 1000000.0 * n_alpha / n_chars > 500000
                  AND 1000000.0 * n_stop / n_ws_tokens >= 20000
             THEN 1 ELSE 0 END as int) AS keep
FROM m ORDER BY doc_id
"""


LANG_MARKERS = {
    "en": "('scan', 'join', 'sort')",
    "es": "('table', 'merge', 'hash')",
    "de": "('stream', 'batch', 'spark')",
    "fr": "('window', 'key', 'order')",
}


def _q22(d: G.Dialect) -> str:
    toks = G.tokens(d)
    scores = {
        lang: d.size(d.arr_filter(toks, f"x IN {mk}"))
        for lang, mk in LANG_MARKERS.items()
    }
    cols = ", ".join(f"{e} AS sc_{lang}" for lang, e in scores.items())
    langs = list(LANG_MARKERS)
    # deterministic argmax with fixed tie order en > es > de > fr
    pred = "case "
    for lang in langs:
        others = [f"sc_{lang} >= sc_{o}" for o in langs if o != lang]
        pred += f"when {' and '.join(others)} then '{lang}' "
    pred += "else 'unk' end"
    return f"""
WITH sc AS (SELECT doc_id, lang, {cols} FROM documents)
SELECT doc_id, lang, {pred} AS pred_lang,
       (case when ({pred}) = lang then 1 else 0 end) AS hit
FROM sc ORDER BY doc_id
"""


def _q23(d: G.Dialect) -> str:
    fp = d.fold(
        G.wordvals(d), "cast(7 as bigint)", "(acc * 31 + x) % 1000000007"
    )
    return f"""
WITH f AS (SELECT doc_id, {fp} AS fp FROM documents)
SELECT fp, min(doc_id) AS canonical_id, cast(count(*) as bigint) AS n_docs
FROM f GROUP BY fp ORDER BY canonical_id
"""


def _q39_sig_sql(d: G.Dialect) -> str:
    """Shared signature relation: 64-bit SimHash as two 32-bit halves,
    voted over the doc's DISTINCT 3-gram shingles (q16's feature set —
    see `simhash64_halves_from` for why unigram word values degenerate
    at scale)."""
    lo, hi = G.simhash64_halves_from(d, "sh")
    sh = d.arr_distinct(G.shingles3_from(d, "v"))
    return (
        f"SELECT doc_id, cast({lo} as bigint) AS lo, cast({hi} as bigint) AS hi "
        f"FROM (SELECT doc_id, {sh} AS sh "
        f"FROM (SELECT doc_id, {G.wordvals(d)} AS v FROM documents) wv0 "
        f"WHERE {d.size('v')} >= 3) wv"
    )


def _q39_duck() -> str:
    """Brute-force all-pairs oracle over the same 64-bit signature
    (indexed-vs-brute equivalence, `GeoWaveSparkSpatialJoinIT.java:228-255`
    pattern): quadratic and test-scale only."""
    sig = _q39_sig_sql(G.DUCK)
    ham = "bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))"
    return f"""
WITH s AS ({sig})
SELECT a.doc_id AS d1, b.doc_id AS d2, cast({ham} as int) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {ham} <= 3
ORDER BY d1, d2
"""


def _q39_sig_sql_spark_fast() -> str:
    """Spark-side twin of `_q39_sig_sql`, whole-stage codegen: DISTINCT
    shingle rows from `shingle_rows_sql_spark` (posexplode + lead — the
    codegen formulation proven set-equal to the HOF shingles) and the 64
    bit votes become 64 SUM aggregates (map-side partial) instead of 64
    HOF folds per document (CodegenFallback, interpreted).  The vote sum
    is order-independent, so the signature is bit-identical to the fold
    formulation; parity is the q39 oracle itself plus
    test_q39_sig_codegen_matches_fold."""
    sums = ", ".join(
        f"sum(case when ((shingle % 2147483648) * {G.SIMHASH64_MULTS[b]})"
        f" % 2147483648 >= 1073741824 then 1 else -1 end) AS s{b}"
        for b in range(64))
    lo = " + ".join(
        f"(case when s{b} > 0 then {1 << b} else 0 end)" for b in range(32))
    hi = " + ".join(
        f"(case when s{b} > 0 then {1 << (b - 32)} else 0 end)"
        for b in range(32, 64))
    return f"""
SELECT doc_id, cast({lo} as bigint) AS lo, cast({hi} as bigint) AS hi
FROM (
  SELECT doc_id, {sums}
  FROM ({shingle_rows_sql_spark()})
  GROUP BY doc_id
)
"""


def _q39_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded candidate join + exact Hamming refine.

    Scale-real parameterization (Manku et al. near-duplicate detection):
    a 64-bit signature split into 4 bands of 16 bits.  Pigeonhole: a pair
    with Hamming distance <= 3 differs in <= 3 bands, so at least one band
    matches exactly — PROVABLY 100% recall at threshold 3, and the band
    join key has 65,536 distinct values per band (the round-1 version's
    4-bit bands had 16, degenerating toward n^2/16 candidates; see
    tests/test_queries.py::test_q39_band_candidates_scale).

    The signature relation is persisted (q16 pattern): Spark inlines CTEs,
    so the 6 references (4 band branches + 2 refine joins) would otherwise
    recompute the 64-fold SimHash each time.
    """
    register_views(spark, sf_dir)
    d = G.SPARK
    sig_df = spark.sql(_q39_sig_sql_spark_fast()).persist()
    sig_df.createOrReplaceTempView("q39_sig")
    sig_df.count()  # eager build: band branches race the cache otherwise
    band_exprs = [
        ("0", "lo % 65536"),
        ("1", "lo div 65536"),
        ("2", "hi % 65536"),
        ("3", "hi div 65536"),
    ]
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {j} AS band, ({e}) AS bh FROM q39_sig"
        for j, e in band_exprs
    )
    ham = "bit_count(a.lo ^ b.lo) + bit_count(a.hi ^ b.hi)"
    return spark.sql(f"""
WITH bands AS ({bands}),
cand AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
  WHERE x.doc_id < y.doc_id
)
SELECT c.d1, c.d2, cast({ham} as int) AS hamming
FROM cand c JOIN q39_sig a ON a.doc_id = c.d1 JOIN q39_sig b ON b.doc_id = c.d2
WHERE {ham} <= 3
ORDER BY d1, d2
""")


_Q40_NBITS = 128   # hyperplane signature width
_Q40_BAND_BITS = 8  # -> 16 bands of 8 bits, 256 join-key values per band


def _q40(d: G.Dialect) -> str:
    """Embedding-cosine near-dup pairs (>= 0.35): hyperplane-LSH banded
    candidates + exact cosine refine.

    Scale-real parameterization: a 128-bit signature in 16 bands of 8 bits
    (the round-1 version banded a 16-bit signature into 4-bit keys — 16
    distinct values per band, degenerating toward n^2/16).  The signature
    is ONE keyed aggregation pass: dims explode to rows once and all 128
    bit projections are SUM aggregates with closed-form +-1 signs
    (map-side partials; an earlier hyperplane-TABLE equi-join
    materialized |dims| x 128 intermediate rows — 41M at sf0.1, 10^13 at
    10^9 vectors — for the same integer sums).  Local wall is a wash
    (~5s either way at sf0.1; the refine dot dominates); the aggregate
    shape wins on shuffle volume at scale.  Integer projections
    (floor-micro components) keep every bit decision order-independent
    and bit-identical across engines.

    Recall (OR-construction, p = 1 - theta/pi per bit): at the 0.35
    threshold of this dataset ~28%; at a production near-dup threshold of
    0.9 it is 1-(1-0.857^8)^16 ~ 99.6%.  Engine and oracle share candidate
    generation (q16/q20 formula-twin pattern), so parity is exact either
    way; refine cost is |candidates|, never n^2.
    """
    nb, bb = _Q40_NBITS, _Q40_BAND_BITS
    if d.is_spark:
        dims = (
            "SELECT vec_id, pos + 1 AS dd, cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0 LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT vec_id, dg.g AS dd, cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    # bit j's projection: one SUM aggregate over the dim rows (map-side
    # partials, single pass for all nb bits — replaced an nb-way
    # hyperplane-table join that materialized |dims| * nb rows)
    sums = ", ".join(
        f"sum(val * (CASE WHEN (({j} * 131 + dd * 37) % 97) % 2 = 0 "
        f"THEN 1 ELSE -1 END)) AS s{j}"
        for j in range(nb))
    bhs = ", ".join(
        "(" + " + ".join(
            f"(CASE WHEN s{bb * b + i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bb)) + f") AS bh{b}"
        for b in range(nb // bb))
    if d.is_spark:
        stack_args = ", ".join(f"{b}, bh{b}" for b in range(nb // bb))
        bands_rows = (
            f"SELECT vec_id, t.band, t.bh FROM bandw "
            f"LATERAL VIEW stack({nb // bb}, {stack_args}) t AS band, bh"
        )
    else:
        bands_rows = "\nUNION ALL\n".join(
            f"SELECT vec_id, {b} AS band, bh{b} AS bh FROM bandw"
            for b in range(nb // bb))
    dt = G.dot(d, "a.v", "b.v", 64)
    return f"""
WITH v0 AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v FROM embeddings),
vecs AS (SELECT vec_id, v, sqrt({G.dot(d, 'v', 'v', 64)}) AS nv FROM v0),
dims AS ({dims}),
projw AS (
  SELECT vec_id, {sums}
  FROM dims GROUP BY vec_id
),
bandw AS (
  SELECT vec_id, {bhs} FROM projw
),
bands AS ({bands_rows}),
cand AS (
  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
  WHERE x.vec_id < y.vec_id
)
SELECT c.id1, c.id2,
       cast(floor(1000000.0 * ({dt}) / (a.nv * b.nv)) as bigint) AS sim_micro
FROM cand c JOIN vecs a ON a.vec_id = c.id1 JOIN vecs b ON b.vec_id = c.id2
WHERE cast(floor(1000000.0 * ({dt}) / (a.nv * b.nv)) as bigint) >= 350000
ORDER BY id1, id2
"""


def _q41(d: G.Dialect) -> str:
    """IVF-bucketed ANN (coarse quantizer, nprobe=1): centroids are a
    deterministic prefix of the (dense) vec_id space whose count SCALES
    as sqrt(n) — K = 16 * max(1, floor(sqrt(n / 2000))), the IVF design
    point.  Fixed K made both the assignment join (n x K) and the
    per-cell probe (n/50 x n/K) quadratic overall (the r3 sf1 run
    measured 8.8x at 10x data); K ~ sqrt(n) bounds total work at
    n^1.5, the published IVF trade.  Byte-identical to the fixed-16
    text at every sf <= 0.1 (n <= 2000 -> multiplier 1).  Every vector
    is assigned to its max-cosine centroid (the inverted-file cell);
    queries search only their own cell.  Spark auto-broadcasts the
    small centroid side of the assignment join; the per-cell top-k is a
    window — at 100 TB this is the classic IVF layout: one shuffle to
    co-locate cells, then local ranking.  Formula-identical oracle
    (q20 pattern).
    """
    return f"""
WITH vecs AS ({_q41_vecs_sql(d)}),
cells AS ({_q41_cells_sql(d, "vecs")})
{_q41_probe_sql(d, "cells")}
"""


_Q41_K = ("(SELECT 16 * greatest(cast(1 as bigint), "
          "cast(floor(sqrt(cast(count(*) as double) / 2000e0)) as bigint)) "
          "FROM embeddings)")


def _q41_vecs_sql(d: G.Dialect) -> str:
    """Decoded double vectors + norm — the ONE pass over the raw arrays.
    The Spark fn materializes this relation (localCheckpoint): CTE
    inlining would re-run the interpreted 64-element HOF decode once per
    reference (5x at sf1 — measured 8.5 s of a 13.7 s wall)."""
    return (f"SELECT vec_id, v, sqrt({G.dot(d, 'v', 'v', 64)}) AS nv "
            f"FROM (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v "
            f"FROM embeddings) v0")


def _q41_cells_sql(d: G.Dialect, vecs: str) -> str:
    """Inverted file: every vector labeled with its max-cosine centroid."""
    dt_ac = G.dot(d, "a.v", "c.v", 64)
    return f"""
SELECT s.vec_id, s.v, s.nv, a.cent_id
FROM {vecs} s JOIN (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY ({dt_ac}) / (a.nv * c.nv) DESC, c.cent_id ASC
           ) AS rn
    FROM {vecs} a CROSS JOIN
         (SELECT vec_id AS cent_id, v, nv
          FROM {vecs} WHERE vec_id < {_Q41_K}) c
  ) t WHERE rn = 1
) a ON a.vec_id = s.vec_id"""


def _q41_probe_sql(d: G.Dialect, cells: str) -> str:
    """nprobe=1 probe: each sampled query ranks only its own cell."""
    dt_qx = G.dot(d, "q.v", "x.v", 64)
    return f"""
SELECT qid, cid, cent_id, sim_micro, rank FROM (
  SELECT q.vec_id AS qid, x.vec_id AS cid, q.cent_id,
         cast(floor(1000000.0 * ({dt_qx}) / (q.nv * x.nv)) as bigint) AS sim_micro,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY cast(floor(1000000.0 * ({dt_qx}) / (q.nv * x.nv)) as bigint) DESC,
                    x.vec_id ASC
         ) AS rank
  FROM {cells} q JOIN {cells} x
    ON x.cent_id = q.cent_id AND x.vec_id <> q.vec_id
  WHERE q.vec_id % 50 = 0
) t WHERE rank <= 3 ORDER BY qid, rank"""


def _q41_spark_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine side of q41: the SAME piece texts as the oracle, but vecs
    and cells MATERIALIZE once (mat_view / localCheckpoint) instead of
    re-running per CTE reference, and the one-file embeddings scan
    repartitions to the cluster width before the interpreted HOF decode
    (a single input split would serialize it)."""
    from .table.views import mat_view

    register_views(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    mat_view(spark, "q41_vecs",
             spark.sql(_q41_vecs_sql(G.SPARK)).repartition(par))
    mat_view(spark, "q41_cells",
             spark.sql(_q41_cells_sql(G.SPARK, "q41_vecs")))
    return spark.sql(_q41_probe_sql(G.SPARK, "q41_cells"))


def shingle_rows_sql_spark(extra_cols: str = "") -> str:
    """Codegen shingle rows for the SPARK side: posexplode words, scalar
    word-hash, 3-gram via lead() windows — every expression whole-stage
    codegen, vs the HOF transform/element_at formulation which is
    CodegenFallback (interpreted; measured 3.9s -> 0.7s for the sh_rows
    build at sf0.1).  Output set is IDENTICAL to the dual-dialect
    `shingles3_from` explode (asserted in tests), so the DuckDB oracle
    keeps the array formulation."""
    d = G.SPARK
    ec = f"{extra_cols}, " if extra_cols else ""
    from .functions.sqlgen import _wordval_expr

    wv = _wordval_expr("w")
    return f"""
SELECT DISTINCT doc_id, {ec}((v1 * 1009 + v2) * 1009 + v3) AS shingle
FROM (
  SELECT doc_id, {ec}v AS v1,
         lead(v, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS v2,
         lead(v, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS v3
  FROM (
    SELECT doc_id, {ec}pos, {wv} AS v
    FROM (SELECT doc_id, {ec}posexplode({d.split_ws("text")}) AS (pos, w)
          FROM documents)
  )
)
WHERE v3 IS NOT NULL
"""


def _q16_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _q16 with explicit reuse: Spark inlines CTEs, so the
    self-joined `bands`/`sh_rows` relations would otherwise be recomputed
    up to 4x (measured 8.9s -> ~2s at sf0.01).  Persisted temp views make
    each expensive intermediate a single cached computation — the same
    intermediate-persistence strategy as the reference join
    (`TieredSpatialJoin.java:352` MEMORY_ONLY_SER persists)."""
    register_views(spark, sf_dir)
    mins = ", ".join(
        f"min(({2 * j + 3} * (shingle % {G.P_MINHASH}) + {104729 * (j + 1) % G.P_MINHASH}) % {G.P_MINHASH}) AS m{j}"
        for j in range(16)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, "
        f"{G.band_hash([f'm{4 * b + i}' for i in range(4)])} AS bh FROM q16_sig"
        for b in range(4)
    )
    sh_rows = spark.sql(shingle_rows_sql_spark()).persist()
    sh_rows.createOrReplaceTempView("q16_sh")
    sig = spark.sql(f"SELECT doc_id, {mins} FROM q16_sh GROUP BY doc_id").persist()
    sig.createOrReplaceTempView("q16_sig")
    # Materialize eagerly: the band UNION ALL fans out into 4 concurrent
    # subtrees that otherwise RACE to build the same InMemoryRelation
    # partitions (measured 16s -> 46s pathological re-runs from duplicate
    # cache builds + lock contention; eager build makes every branch a pure
    # cache read).  One count() per intermediate is one extra tiny stage.
    sh_rows.count()
    sig.count()
    return spark.sql(f"""
WITH bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM q16_sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, count(*) AS ninter
  FROM cand c
  JOIN q16_sh a ON a.doc_id = c.d1
  JOIN q16_sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
  GROUP BY c.d1, c.d2
),
verified AS (
  SELECT i.d1, i.d2,
         cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter)) as bigint) AS jac_micro
  FROM inter i JOIN sizes z1 ON z1.doc_id = i.d1 JOIN sizes z2 ON z2.doc_id = i.d2
)
SELECT d1, d2, jac_micro FROM verified WHERE jac_micro >= 500000
ORDER BY d1, d2
""")


def _q50(d: G.Dialect) -> str:
    # Text-index analog (reference `core/index/.../text/*` n-gram term
    # index, chosen in OptimalExpressionQuery.java:109-118): begins-with /
    # contains / ends-with predicates over the documents table.  At scale
    # the begins-with predicate is a pushed-down StringStartsWith on the
    # parquet scan (dictionary + min/max pruning); the reference needed a
    # dedicated term index because its KV store can only range-scan keys.
    return """
SELECT source,
       cast(sum(case when text like 'the %' then 1 else 0 end) as bigint) AS n_prefix,
       cast(sum(case when lower(text) like '%model%' then 1 else 0 end) as bigint) AS n_contains,
       cast(sum(case when text like '%.' then 1 else 0 end) as bigint) AS n_suffix,
       cast(count(*) as bigint) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


def _q64_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: the canonical-document step after pair
    generation.  q16's MinHash+LSH pairs are the edge list; alternating
    large-star/small-star contraction (`agg/components.py`, O(log^2)
    rounds, two shuffles per round, no driver graph state) labels every
    document with its duplicate-cluster minimum; documents in no pair are
    their own canonical.  Output: one row per document with its canonical
    id and cluster size — exactly the keep/drop decision a 100 TB dedup
    pipeline materializes."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .agg.components import connected_components

    pairs = _q16_spark(spark, sf_dir)
    comp = connected_components(pairs, "d1", "d2")
    docs = spark.table("documents").select("doc_id")
    return (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
        )
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
        )
        .select("doc_id", "canonical_id",
                F.col("n_members").cast("long").alias("n_members"))
        .orderBy("doc_id")
    )


def _q64_duck() -> str:
    """Oracle: transitive closure by recursive CTE over the IDENTICAL
    q16 pair SQL — min reachable id per node is the component label."""
    pairs_sql = _q16(G.DUCK)
    return f"""
WITH RECURSIVE
pairs AS (SELECT d1, d2 FROM ({pairs_sql}) z),
edges AS (SELECT d1 AS u, d2 AS v FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS canonical_id,
       cast(count(*) OVER (
         PARTITION BY coalesce(c.component, d.doc_id)) as bigint
       ) AS n_members
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
ORDER BY doc_id
"""


# --- semantic dedup (q83) ---------------------------------------------------


def _q83(d: G.Dialect) -> str:
    """SemDeDup: semantic (embedding-space) deduplication — cluster the
    embeddings with a fixed-K coarse quantizer, then drop every vector
    that is cosine-similar (>= 0.34) to a lower-id vector in the SAME
    cluster.  This is the cluster-then-pairwise shape of semantic dedup
    for training corpora: K keeps the pairwise step bounded per cluster
    (all-pairs happens only WITHIN a cell, never across the corpus), so
    cost is sum over cells of |cell|^2 — with K scaled ~n/avg_cell the
    per-cell work is constant and the whole operator is one assignment
    broadcast join + one cell-keyed self-join.  Reuses q41's fixed-K
    deterministic centroids (K independent of n — the round-1 lesson).

    Output: one row per dropped vector with its earliest similar keeper,
    how many cluster members it duplicated, and the strongest similarity.
    All aggregates are plain min/max/count — no argmin encoding needed.
    """
    dt_ac = G.dot(d, "a.v", "c.v", 64)
    dt_ab = G.dot(d, "a.v", "b.v", 64)
    return f"""
WITH v0 AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v FROM embeddings),
vecs AS (SELECT vec_id, v, sqrt({G.dot(d, 'v', 'v', 64)}) AS nv FROM v0),
cent AS (SELECT vec_id AS cent_id, v, nv
         FROM (SELECT vec_id, v, nv FROM vecs ORDER BY vec_id LIMIT 16) t),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY ({dt_ac}) / (a.nv * c.nv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) t WHERE rn = 1
),
cells AS (
  SELECT s.vec_id, s.v, s.nv, a.cent_id
  FROM vecs s JOIN assign a ON a.vec_id = s.vec_id
),
sim AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, a.cent_id,
         cast(floor(1000000.0 * ({dt_ab}) / (a.nv * b.nv)) as bigint) AS sim_micro
  FROM cells a JOIN cells b
    ON b.cent_id = a.cent_id AND a.vec_id < b.vec_id
)
SELECT drop_id, min(keep_id) AS kept_for, min(cent_id) AS cent_id,
       cast(count(*) as bigint) AS n_similar, max(sim_micro) AS max_sim_micro
FROM sim WHERE sim_micro >= 340000
GROUP BY drop_id ORDER BY drop_id
"""


# --- n-gram LM familiarity score (q84) --------------------------------------


def _q84_body(sh_rows: str, d: G.Dialect) -> str:
    """Shared q84 body over a (doc_id, shingle) relation: global trigram
    document frequencies, then per-doc mean RELATIVE df — integer-exact,
    and scale-invariant (df is normalized by corpus size, so the rare
    threshold means the same thing at sf0.01 and at 10^12 rows)."""
    fam = d.intdiv("(1000000 * sum_df)", "(n_grams * n_docs)")
    return f"""
WITH sh_rows AS ({sh_rows}),
nd AS (SELECT cast(count(*) as bigint) AS n_docs FROM documents),
tdf AS (SELECT shingle, cast(count(*) as bigint) AS df
        FROM sh_rows GROUP BY shingle),
per_doc AS (
  SELECT s.doc_id, cast(count(*) as bigint) AS n_grams,
         sum(t.df) AS sum_df
  FROM sh_rows s JOIN tdf t ON t.shingle = s.shingle
  GROUP BY s.doc_id
)
SELECT doc_id, n_grams,
       cast({fam} as bigint) AS fam_micro,
       cast((CASE WHEN {fam} < 3400 THEN 1 ELSE 0 END) as bigint) AS is_rare
FROM per_doc CROSS JOIN nd ORDER BY doc_id
"""


def _q84_duck() -> str:
    d = G.DUCK
    sh = G.shingles3_from(d, "v")
    sh_rows = (
        f"SELECT DISTINCT doc_id, {d.explode(sh)} AS shingle "
        f"FROM (SELECT doc_id, {G.wordvals(d)} AS v FROM documents) wv "
        f"WHERE {d.size('v')} >= 3"
    )
    return _q84_body(sh_rows, d)


def _q84_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram language-model familiarity score — the frequency-based
    quality filter of LLM data pipelines (a doc whose n-grams are rare in
    the corpus is boilerplate, noise, or another language; the standard
    perplexity gate with the LM replaced by corpus document frequencies,
    which keeps the score integer-exact for the oracle).

    Scale shape: the whole operator is two keyed shuffles — groupBy
    shingle for the model 'training' pass, join-back + groupBy doc for
    scoring — on well-spread 64-bit shingle keys.  The model table is
    O(distinct trigrams) and never collects; scoring is a shuffle join
    (broadcastable when the model is small after a min-df cut).  Shingle
    rows come from the codegen build (posexplode + lead windows, no
    CodegenFallback HOFs — the measured 3-5x round-2 lesson)."""
    register_views(spark, sf_dir)
    return spark.sql(_q84_body(shingle_rows_sql_spark(), G.SPARK))


# --- product quantization ANN (q82) ----------------------------------------

_PQ_M = 32         # subvectors (64 dims / 2)
_PQ_K = 16         # codes per subvector = a 4x4 grid over the 2-dim cell
#: deterministic codebook, integer micro-units: each of the 2 dims gets 4
#: levels spanning the data range (embeddings lie in [-0.53, 0.46]), so a
#: code k = (k%4, k//4) is a grid point — per-dim quantization error is
#: bounded by half the level spacing (~0.13), the property that makes ADC
#: distances track true L2 (16 codes over an 8-dim cell, the first cut,
#: had unbounded directional error and ADC ranks were noise)


def _pq_c(d: "G.Dialect", k: str, jj: str) -> str:
    lvl = (f"(CASE WHEN ({jj}) = 0 THEN ({k}) % 4 "
           f"ELSE {d.intdiv(f'({k})', '4')} END)")
    return f"({lvl} * 266666 - 400000)"


def _q82(d: G.Dialect) -> str:
    """ANN by product quantization + asymmetric distance (ADC): encode
    every vector as 32 4-bit codes (argmin vs a fixed 4x4-grid codebook
    per 2-dim subvector), then answer top-3 queries from codes alone — the
    memory-bound regime of billion-scale ANN (PQ compresses a 256-byte
    vector to 16 bytes; IVF q41 narrows candidates, PQ shrinks what each
    candidate costs — together they are the standard IVF-PQ layout).

    Everything is INTEGER micro-unit arithmetic (vals and codebook
    floored to 1e-6), so encode and ADC are exact and order-independent —
    the DuckDB twin reproduces bit-for-bit, no float-sum ambiguity.

    Scale shape: encode = one posexplode + grouped integer SUMs
    (map-side partials compress 64 dim-rows to 32 subvector rows before
    the shuffle) + an encoded `least(dist*16+k)` argmin — zero joins,
    pure codegen (the window-argmin alternative measured slower; the
    encoded hash-agg argmin is the q41 lesson).  ADC = data codes
    (32 small ints/vector) ⋈ broadcast query distance table (512
    rows/query) → 32-row sum per (query, vector) → per-query top-k
    window.  At 10^9 vectors the only wide shuffle carries the 16-byte
    code rows.
    """
    if d.is_spark:
        dims = (
            "SELECT vec_id, pos AS d0, "
            "cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0 LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT vec_id, dg.g - 1 AS d0, "
            "cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    m_of = d.intdiv("d0", "2")
    jj_of = "jj"
    sums = ", ".join(
        f"sum((val - ({_pq_c(d, str(k), jj_of)})) "
        f"* (val - ({_pq_c(d, str(k), jj_of)}))) AS s{k}"
        for k in range(_PQ_K)
    )
    enc = "least(" + ", ".join(
        f"s{k} * {_PQ_K} + {k}" for k in range(_PQ_K)
    ) + f") % {_PQ_K}"
    kseq = d.explode(d.seq("0", str(_PQ_K - 1)))
    if d.is_spark:
        krows = f"SELECT vec_id, d0, val, {kseq} AS k FROM qdims"
    else:
        krows = (
            "SELECT vec_id, d0, val, kg.g AS k "
            "FROM qdims, LATERAL (SELECT unnest(generate_series(0, "
            f"{_PQ_K - 1})) AS g) kg"
        )
    return f"""
WITH v0 AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v
            FROM embeddings),
dims AS ({dims}),
sub AS (
  SELECT vec_id, m, {sums}
  FROM (SELECT vec_id, val, {m_of} AS m, (d0 % 2) AS jj FROM dims)
  GROUP BY vec_id, m
),
codes AS (SELECT vec_id, m, cast(({enc}) as bigint) AS code FROM sub),
qdims AS (SELECT * FROM dims WHERE vec_id % 100 = 7),
qdist AS (
  SELECT vec_id AS q_id, m, k,
         sum((val - ({_pq_c(d, 'k', jj_of)}))
             * (val - ({_pq_c(d, 'k', jj_of)}))) AS dq
  FROM (SELECT vec_id, val, {m_of} AS m, (d0 % 2) AS jj, k
        FROM ({krows}))
  GROUP BY vec_id, m, k
),
adc AS (
  SELECT q.q_id, c.vec_id, sum(q.dq) AS dist
  FROM codes c JOIN qdist q ON q.m = c.m AND q.k = c.code
  WHERE c.vec_id <> q.q_id
  GROUP BY q.q_id, c.vec_id
),
ranked AS (
  SELECT q_id, vec_id AS neighbor_id, dist,
         cast(row_number() OVER (
           PARTITION BY q_id ORDER BY dist, vec_id) as bigint) AS rk
  FROM adc
)
SELECT q_id, neighbor_id, rk, cast(dist as bigint) AS adc_dist
FROM ranked WHERE rk <= 3 ORDER BY q_id, rk
"""


# --- decontamination (q96) --------------------------------------------------


def _q96_body(sh_rows: str) -> str:
    """Shared q96 SQL over a (doc_id, shingle) relation."""
    return f"""
WITH sh_rows AS ({sh_rows}),
eval_sh AS (SELECT doc_id AS eval_id, shingle FROM sh_rows
            WHERE doc_id % 50 = 7),
train_sh AS (SELECT doc_id AS train_id, shingle FROM sh_rows
             WHERE doc_id % 50 <> 7),
hits AS (
  SELECT t.train_id, e.eval_id, cast(count(*) as bigint) AS n_shared
  FROM train_sh t JOIN eval_sh e ON e.shingle = t.shingle
  GROUP BY t.train_id, e.eval_id
)
SELECT train_id, eval_id, n_shared
FROM hits WHERE n_shared >= 5
ORDER BY train_id, eval_id
"""


def _q96_duck() -> str:
    d = G.DUCK
    sh = G.shingles3_from(d, "v")
    sh_rows = (
        f"SELECT DISTINCT doc_id, {d.explode(sh)} AS shingle "
        f"FROM (SELECT doc_id, {G.wordvals(d)} AS v FROM documents) wv "
        f"WHERE {d.size('v')} >= 3"
    )
    return _q96_body(sh_rows)


def _q96_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing >= 5
    distinct trigrams with any eval-set document — the overlap scrub every
    serious pre-training pipeline runs before training (eval contamination
    inflates benchmarks).  Same candidate-contract as the reference's
    indexed-vs-brute joins: the EXACT n-gram join is the verifier; at
    10^12 docs the eval side is tiny and broadcasts, so the hot path is a
    map-side hash join on the shingle key — the train side never shuffles.
    Shingles come from the codegen build (posexplode + lead windows)."""
    register_views(spark, sf_dir)
    return spark.sql(_q96_body(shingle_rows_sql_spark()))


# --- BM25 retrieval scoring (q99) -------------------------------------------


def _q99(d: G.Dialect) -> str:
    """BM25-style relevance scoring (k1=1.2, b=0.75) of the corpus against
    a fixed query — the retrieval primitive behind quality-weighted data
    selection and search-based eval mining.  Query terms are the 8
    alphabetically-smallest distinct words of doc 7 (deterministic, corpus-
    derived — no external data).

    Scale shape: the postings explode is filtered by a BROADCAST semi-join
    on the 8 query terms BEFORE any aggregation, so the 100 TB token
    stream reduces to matching postings immediately; document length is a
    scalar expression on `documents` (never exploded); df/avgdl are scalar
    aggregates.  One small shuffle on (doc_id, word).

    Exactness: idf uses the rational Robertson form without the log,
    idf = (2N - 2df + 1)/(2df + 1), and each per-term score is floored to
    integer micro units from two IEEE-exact double divisions — so the
    cross-engine hash match is deterministic (ln() and float sum order
    would not be).  int64-safe: numerators < 2^53 at sf1."""
    split = d.split_ws("text")
    return f"""
WITH tok AS (
  SELECT doc_id, {d.explode(split)} AS word FROM documents
),
qterms AS (
  SELECT word FROM (SELECT DISTINCT word FROM tok WHERE doc_id = 7) q
  ORDER BY word LIMIT 8
),
stats AS (
  SELECT cast(count(*) as bigint) AS n_docs,
         cast(sum({d.size(split)}) as bigint) AS total_len
  FROM documents
),
dl AS (
  SELECT doc_id, cast({d.size(split)} as bigint) AS dl FROM documents
),
tf AS (
  SELECT t.doc_id, t.word, cast(count(*) as bigint) AS tf
  FROM tok t JOIN qterms q ON q.word = t.word
  GROUP BY t.doc_id, t.word
),
df AS (SELECT word, cast(count(*) as bigint) AS df FROM tf GROUP BY word),
term AS (
  SELECT tf.doc_id,
         cast(floor(
           1000000.0
           * (cast(2 * s.n_docs - 2 * df.df + 1 as double)
              / cast(2 * df.df + 1 as double))
           * (cast(22 * tf.tf * s.total_len as double)
              / cast(10 * tf.tf * s.total_len + 3 * s.total_len
                     + 9 * dl.dl * s.n_docs as double))
         ) as bigint) AS term_micro
  FROM tf JOIN df ON df.word = tf.word
       JOIN dl ON dl.doc_id = tf.doc_id
       CROSS JOIN stats s
)
SELECT doc_id, cast(sum(term_micro) as bigint) AS score_micro
FROM term GROUP BY doc_id
ORDER BY score_micro DESC, doc_id
LIMIT 20
"""


def _q110(d: G.Dialect) -> str:
    """Exact duplicated-span detection (the word-level analog of
    exact-substring dedup, Lee et al. 2022): any shared run of >= 8
    consecutive words between two documents shares at least one 8-gram,
    so positional 8-gram hash rows + an equality self-join find every
    such span, and a gaps-and-islands pass over the match positions
    (constant pa-pb diagonal => consecutive pa values) recovers the
    LENGTH of the longest shared span exactly — not an estimate like
    q16's MinHash Jaccard.  Reference analog: the indexed-vs-brute
    candidate contract of `test/.../spark/GeoWaveSparkSpatialJoinIT
    .java:228-255` in /root/reference (candidates from an equi-join on a
    derived key, exact refine after).

    Scale shape: the join key is a 50-bit positional 8-gram hash —
    near-unique outside true duplicated spans, so candidate fan-out is
    O(actual shared spans), never quadratic (contrast a 4-bit LSH band).
    The islands pass is one window inside the (d1, d2, diff) hash
    partition; everything is integer arithmetic."""
    v = "v"
    a = [d.at(v, f"(pos + {k})") for k in range(8)]
    body = a[0]
    for x in a[1:]:
        body = f"(({body} % 1099511627791) * 1009 + {x})"
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
h AS (
  SELECT doc_id, pos, {body} AS sh
  FROM (
    SELECT doc_id, v, {d.explode(d.seq("1", f"{d.size('v')} - 7"))} AS pos
    FROM wv WHERE {d.size('v')} >= 8
  ) t
),
m AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS pa, b.pos AS pb
  FROM h a JOIN h b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
runs AS (
  SELECT d1, d2, pa - pb AS diff,
         pa - row_number() OVER (PARTITION BY d1, d2, pa - pb ORDER BY pa)
           AS island
  FROM m
),
spans AS (
  SELECT d1, d2, count(*) AS run_len
  FROM runs GROUP BY d1, d2, diff, island
)
SELECT d1, d2,
       cast(max(run_len) + 7 as bigint) AS longest_span_words,
       cast(sum(run_len) as bigint) AS n_shared_grams
FROM spans GROUP BY d1, d2
ORDER BY d1, d2
"""


def _q111(d: G.Dialect) -> str:
    """Repetition quality signals (the Gopher rep-filter family): per-doc
    duplicate-word fraction and most-frequent-bigram share, plus a
    drop flag for degenerate repetitive documents.  Token and bigram
    counts are keyed aggregates over ONE positional explode of the
    word-value array — no self-joins, no arrays carried past the first
    projection; flags are codegen CASE arithmetic.  All ratios floor to
    integer micro units, so the DuckDB twin hashes identically."""
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
tok AS (
  SELECT doc_id, {d.size('v')} AS n_tok, pos,
         {d.at('v', 'pos')} AS wval,
         CASE WHEN pos < {d.size('v')}
              THEN {d.at('v', 'pos')} * 100003 + {d.at('v', '(pos + 1)')}
         END AS bg
  FROM (
    SELECT doc_id, v, {d.explode(d.seq("1", d.size('v')))} AS pos
    FROM wv WHERE {d.size('v')} >= 2
  ) t
),
per AS (
  SELECT doc_id, max(n_tok) AS n_tok,
         count(DISTINCT wval) AS n_distinct
  FROM tok GROUP BY doc_id
),
bc AS (
  SELECT doc_id, bg, count(*) AS c
  FROM tok WHERE bg IS NOT NULL GROUP BY doc_id, bg
),
bm AS (SELECT doc_id, max(c) AS top_bg FROM bc GROUP BY doc_id)
SELECT p.doc_id, cast(p.n_tok as bigint) AS n_tok,
       cast(floor(1000000.0 * (p.n_tok - p.n_distinct) / p.n_tok)
            as bigint) AS dup_word_micro,
       cast(floor(1000000.0 * bm.top_bg / (p.n_tok - 1))
            as bigint) AS top_bigram_micro,
       cast(CASE WHEN floor(1000000.0 * (p.n_tok - p.n_distinct) / p.n_tok)
                      >= 600000
                  OR floor(1000000.0 * bm.top_bg / (p.n_tok - 1)) >= 180000
             THEN 1 ELSE 0 END as int) AS repetitive
FROM per p JOIN bm ON bm.doc_id = p.doc_id
ORDER BY p.doc_id
"""


def _q112(d: G.Dialect) -> str:
    """Token-window chunking with overlap (window 40, stride 32) — the
    pre-training/RAG segmentation operator: each document explodes into
    ceil-covering chunks, each chunk carries its token range and a
    rolling content hash (so downstream chunk-level dedup needs no text).
    Per-row bounded explode (no shuffle until the presentation sort);
    chunk hashes are sequential integer folds, bit-identical across
    engines."""
    W, S = 40, 32
    lo = f"(ck * {S} + 1)"
    hi = f"least({lo} + {W} - 1, n_tok)"
    vals = d.xform(d.seq(lo, hi), d.at("v", "x"))
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
c AS (
  SELECT doc_id, v, {d.size('v')} AS n_tok,
         {d.explode(d.seq('0', f"greatest(cast(ceil(({d.size('v')} - {W}) / {S}.0) as int), 0)"))} AS ck
  FROM wv
),
ch AS (
  SELECT doc_id, ck, {lo} AS tok_lo, {hi} AS tok_hi,
         {d.fold(vals, 'cast(7 as bigint)', '(acc * 1009 + x) % 1099511627791')} AS chunk_hash
  FROM c
)
SELECT doc_id, cast(ck as bigint) AS chunk_idx,
       cast(tok_lo as bigint) AS tok_lo, cast(tok_hi as bigint) AS tok_hi,
       cast(tok_hi - tok_lo + 1 as bigint) AS n_tok_chunk,
       cast(chunk_hash as bigint) AS chunk_hash
FROM ch ORDER BY doc_id, chunk_idx
"""


def _q115(d: G.Dialect) -> str:
    """Corpus vocabulary statistics (the tokenizer-training scan): word
    frequency, Zipf rank, document frequency, and cumulative coverage
    share — one token explode, one (word) aggregate, one global window
    over the (tiny) vocabulary.  At 100 TB the explode+aggregate is a
    map-side-combined word count (the canonical Spark job); the window
    runs over the aggregated vocab, not the token stream."""
    return f"""
WITH tok AS (
  SELECT doc_id, {d.explode(G.tokens(d))} AS word FROM documents
),
wc AS (
  SELECT word, cast(count(*) as bigint) AS freq,
         cast(count(DISTINCT doc_id) as bigint) AS doc_freq
  FROM tok GROUP BY word
),
tot AS (SELECT sum(freq) AS total FROM wc)
SELECT word, freq, doc_freq,
       cast(row_number() OVER (ORDER BY freq DESC, word) as bigint) AS zipf_rank,
       cast(floor(1000000.0 * sum(freq) OVER (
              ORDER BY freq DESC, word
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.total)
            as bigint) AS cum_share_micro
FROM wc CROSS JOIN tot t
ORDER BY zipf_rank
"""


def _q116(d: G.Dialect) -> str:
    """Embedding label-consistency outlier detection (the CLIP-filtering
    shape: drop pairs whose embedding disagrees with its cohort): each
    vector's cosine against its label centroid, flagging the strays.
    Centroids are integer-component sums (micro-unit floored per element
    BEFORE summing, so the aggregate is order-independent — a float avg
    would hash-diverge); cosine numerator/denominator stay in int64 and
    the ratio floors once.  Scale shape: dims explode to (label, dim)
    rows, centroid = one keyed aggregate (10 labels x 64 dims = tiny,
    broadcast back), per-vector re-aggregate over 64 rows."""
    at_e = d.at("embedding", "j")
    return f"""
WITH dims AS (
  SELECT vec_id, label, j,
         cast(floor(cast({at_e} as double) * 1000000) as bigint) AS vi
  FROM (
    SELECT vec_id, label, embedding,
           {d.explode(d.seq('1', '64'))} AS j
    FROM embeddings
  ) t
),
cent AS (
  SELECT label, j, sum(vi) AS cj FROM dims GROUP BY label, j
),
parts AS (
  SELECT dm.vec_id, dm.label,
         sum(dm.vi * c.cj) AS dotp,
         sum(dm.vi * dm.vi) AS nv,
         sum(c.cj * c.cj) AS nc
  FROM dims dm JOIN cent c ON c.label = dm.label AND c.j = dm.j
  GROUP BY dm.vec_id, dm.label
)
SELECT vec_id, label,
       cast(floor(1000000.0 * dotp / (sqrt(nv) * sqrt(nc))) as bigint)
         AS cos_centroid_micro,
       cast(CASE WHEN 1000000.0 * dotp / (sqrt(nv) * sqrt(nc)) < 250000
             THEN 1 ELSE 0 END as int) AS outlier
FROM parts ORDER BY vec_id
"""


def _q118_edges_sql(d: G.Dialect) -> str:
    """kNN similarity edges (top-5 by cosine per source vector)."""
    dt = G.dot(d, "q.v", "c.v", 64)
    return f"""
WITH {_vec_cte(d)},
sims AS (
  SELECT q.vec_id AS src, c.vec_id AS dst,
         cast(floor(1000000.0 * ({dt}) / (q.nv * c.nv)) as bigint) AS sim
  FROM vecs q JOIN vecs c ON q.vec_id <> c.vec_id
)
SELECT src, dst FROM (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst ASC)
           AS rk
  FROM sims
) t WHERE rk <= 5
"""


def _q118_round_sql(d: G.Dialect, edges: str, nodes: str, prev: str) -> str:
    """One PageRank round over view names."""
    contrib = d.intdiv("17 * r.r", "100")
    return f"""
SELECT n.vec_id, 150000 + coalesce(s.contrib, 0) AS r
FROM {nodes} n LEFT JOIN (
  SELECT e.dst AS vec_id, sum({contrib}) AS contrib
  FROM {edges} e JOIN {prev} r ON r.vec_id = e.src
  GROUP BY e.dst
) s ON s.vec_id = n.vec_id
"""


_Q118_FINAL = """
SELECT vec_id, cast(r as bigint) AS rank_fp,
       cast(row_number() OVER (ORDER BY r DESC, vec_id) as bigint)
         AS centrality_order
FROM {r} ORDER BY vec_id
"""


def _q118(d: G.Dialect) -> str:
    """Graph centrality over the kNN similarity graph (PageRank, 4
    iterations): importance-weighted sample selection — central
    documents anchor dup clusters / coreset picks, peripheral ones are
    candidates for trimming.  Complements q64 (connected components) as
    the second iterative graph operator: each iteration is one hash
    join (edges x ranks on src) + one keyed aggregate — no driver-side
    data, no collect.

    This unrolled-CTE form is the ORACLE; the Spark path
    (`_q118_spark`) materializes the edge build once via `mat_view` —
    inlined CTEs would re-run the all-pairs top-5 candidate generator
    every round.  Determinism: fixed-point integer ranks (damping 0.85,
    uniform out-degree 5 => per-edge contribution floor(17*r/100)
    floored BEFORE the sum, so the aggregate is order-independent int64
    and the DuckDB twin hashes identically).  Scale note: the all-pairs
    top-5 edge build is the oracle-grade candidate generator; at corpus
    scale the edges come from q20's LSH buckets or q41's IVF cells, and
    the iteration cost is |E| per round regardless."""
    its = []
    for i in range(1, 5):
        body = _q118_round_sql(d, "edges", "nodes", f"r{i - 1}")
        its.append(f"r{i} AS ({body})")
    return f"""
WITH edges AS ({_q118_edges_sql(d)}),
nodes AS (SELECT vec_id FROM embeddings),
r0 AS (SELECT vec_id, cast(1000000 as bigint) AS r FROM nodes),
{",".join(its)}
{_Q118_FINAL.format(r="r4")}
"""


def _q118_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-loop Spark path for `_q118`."""
    from .table.views import mat_view

    d = G.SPARK
    register_views(spark, sf_dir)
    mat_view(spark, "q118_edges", _q118_edges_sql(d))
    mat_view(spark, "q118_nodes", "SELECT vec_id FROM embeddings")
    r = spark.sql("SELECT vec_id, cast(1000000 as bigint) AS r "
                  "FROM q118_nodes")
    for _ in range(4):
        r.createOrReplaceTempView("q118_prev")
        r = spark.sql(
            _q118_round_sql(d, "q118_edges", "q118_nodes", "q118_prev"))
        r = r.localCheckpoint(eager=True)
    r.createOrReplaceTempView("q118_final")
    return spark.sql(_Q118_FINAL.format(r="q118_final"))


def _q122(d: G.Dialect) -> str:
    """PII scrubbing — the redaction pass every training-data pipeline runs
    before a corpus ships (emails, phone numbers): per-document match
    counts + an md5 fingerprint of the REDACTED text.  Everything is one
    codegen projection over the scan — regexp_extract_all / regexp_replace
    are JVM expressions, no shuffle at all until the final ORDER BY (which
    only the test harness needs), so the op streams at scan speed at any
    corpus size.

    The synthetic corpus contains no PII, so deterministic PII is INJECTED
    in the same query text for both engines (doc_id-derived emails for
    doc_id%3=0, phone numbers for %3=1) — the injection is fixture, the
    scrub is the operator.  Patterns stay in the Java-regex/RE2 common
    subset with no backslashes (Spark literals eat them, DuckDB keeps
    them); DuckDB's regexp_replace needs the 'g' flag to match Spark's
    replace-all default."""
    cast_t = "string" if d.is_spark else "varchar"
    g = "" if d.is_spark else ", 'g'"
    email = "[a-z0-9]+@[a-z0-9.]+"
    phone = "[+]1-555-01[0-9][0-9]"
    pii = (
        f"CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || "
        f"cast(doc_id as {cast_t}) || '@mail.example.com now' "
        f"WHEN doc_id % 3 = 1 THEN text || ' call +1-555-01' || "
        f"lpad(cast(doc_id % 100 as {cast_t}), 2, '0') || ' or +1-555-0199 today' "
        f"ELSE text END"
    )
    scrub = (f"regexp_replace(regexp_replace(t, '{email}', '<EMAIL>'{g}), "
             f"'{phone}', '<PHONE>'{g})")
    return f"""
SELECT doc_id, cast({d.regexp_count("t", email)} as bigint) AS n_emails,
       cast({d.regexp_count("t", phone)} as bigint) AS n_phones,
       md5({scrub}) AS scrub_md5
FROM (SELECT doc_id, {pii} AS t FROM documents) src
ORDER BY doc_id
"""


_Q142_ROUNDS = 3


def _q142_tok0_sql(d: G.Dialect) -> str:
    """(doc_id, pos, w) token stream, pos 0-based in document order."""
    toks = G.tokens(d)
    if d.is_spark:
        return (f"SELECT doc_id, cast(pos as bigint) AS pos, w "
                f"FROM (SELECT doc_id, posexplode({toks}) AS (pos, w) "
                f"FROM documents)")
    return (f"SELECT doc_id, cast(pg.g - 1 as bigint) AS pos, t[pg.g] AS w "
            f"FROM (SELECT doc_id, {toks} AS t FROM documents) d0, "
            f"LATERAL (SELECT unnest(generate_series(1, {d.size('t')})) "
            f"AS g) pg")


def q142_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding-style merge rounds over the corpus token stream
    — the inner loop of tokenizer training (count adjacent pairs, merge
    the globally most frequent pair everywhere, repeat).  Bounded at 3
    rounds (the q128/q135 fixed-horizon contract); pairs with a = b are
    excluded so every selected pair's occurrences are provably disjoint
    (an overlap at pos, pos+1 would need w[pos+1] = a AND = b) and the
    merge is order-independent — no sequential greedy scan needed.

    Scale shape per round: ONE adjacency self-join on (doc_id, pos+1)
    (co-partitioned — both sides hash on doc_id), one keyed count + a
    driver-side top-1 row (the KMeans-centroid pattern: the aggregate is
    tiny), then the merge/renumber pass is a broadcast of the 1-row pair
    + a per-document window.  Rounds are cut with localCheckpoint — each
    round's stream is referenced three times (join x2 + count), so an
    uncut lineage grows 3^r.  The reference has no text pipeline; this
    extends the tokenizer-training scan (q115) to the merge loop.
    GeoWave analog: none (training-data op, north-rule extension)."""
    register_views(spark, sf_dir)
    cur = spark.sql(_q142_tok0_sql(G.SPARK)).localCheckpoint()
    out = []
    for i in range(1, _Q142_ROUNDS + 1):
        cur.createOrReplaceTempView("q142_t")
        top = spark.sql("""
            SELECT t.w AS a, n.w AS b, cast(count(*) as bigint) AS freq
            FROM q142_t t JOIN q142_t n
              ON n.doc_id = t.doc_id AND n.pos = t.pos + 1
            WHERE t.w <> n.w
            GROUP BY t.w, n.w ORDER BY freq DESC, a, b LIMIT 1
        """).collect()[0]
        spark.createDataFrame(
            [(top["a"], top["b"])], "a string, b string"
        ).createOrReplaceTempView("q142_top")
        cur = spark.sql("""
            SELECT doc_id,
                   cast(row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                        - 1 as bigint) AS pos,
                   CASE WHEN st = 1 THEN w || '_' || nw ELSE w END AS w
            FROM (
              SELECT doc_id, pos, w, nw, st,
                     lag(st, 1, 0) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS pst
              FROM (
                SELECT t.doc_id, t.pos, t.w, n.w AS nw,
                       CASE WHEN t.w = p.a AND n.w = p.b THEN 1 ELSE 0 END
                         AS st
                FROM q142_t t
                LEFT JOIN q142_t n
                  ON n.doc_id = t.doc_id AND n.pos = t.pos + 1
                CROSS JOIN q142_top p
              )
            ) WHERE pst = 0
        """).localCheckpoint()
        out.append((i, top["a"], top["b"], int(top["freq"]),
                    int(cur.count())))
    return spark.createDataFrame(
        out,
        "merge_round int, a string, b string, freq bigint, "
        "corpus_tokens bigint",
    ).orderBy("merge_round")


def _q142_duck() -> str:
    d = G.DUCK
    parts = [f"t0 AS MATERIALIZED ({_q142_tok0_sql(d)})"]
    for i in range(1, _Q142_ROUNDS + 1):
        parts.append(f"""
p{i} AS MATERIALIZED (
  SELECT t.doc_id, t.pos, t.w, n.w AS nw
  FROM t{i - 1} t LEFT JOIN t{i - 1} n
    ON n.doc_id = t.doc_id AND n.pos = t.pos + 1
),
top{i} AS MATERIALIZED (
  SELECT w AS a, nw AS b, cast(count(*) as bigint) AS freq
  FROM p{i} WHERE nw IS NOT NULL AND w <> nw
  GROUP BY w, nw ORDER BY freq DESC, a, b LIMIT 1
),
t{i} AS MATERIALIZED (
  SELECT doc_id,
         cast(row_number() OVER (PARTITION BY doc_id ORDER BY pos)
              - 1 as bigint) AS pos,
         CASE WHEN st = 1 THEN w || '_' || nw ELSE w END AS w
  FROM (
    SELECT s.*, lag(st, 1, 0) OVER (PARTITION BY doc_id ORDER BY pos) AS pst
    FROM (
      SELECT p.doc_id, p.pos, p.w, p.nw,
             CASE WHEN p.w = t.a AND p.nw = t.b THEN 1 ELSE 0 END AS st
      FROM p{i} p CROSS JOIN top{i} t
    ) s
  ) WHERE pst = 0
)""")
    merges = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, a, b, freq FROM top{i}"
        for i in range(1, _Q142_ROUNDS + 1))
    counts = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_round, cast(count(*) as bigint) "
        f"AS corpus_tokens FROM t{i}"
        for i in range(1, _Q142_ROUNDS + 1))
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT m.merge_round, m.a, m.b, m.freq, c.corpus_tokens
FROM ({merges}) m JOIN ({counts}) c USING (merge_round)
ORDER BY merge_round
""")


def _q152(d: G.Dialect) -> str:
    """Embedding covariance matrix (the whitening / PCA-prep scan of an
    embedding corpus; upper triangle, 64x64 dims -> 2080 rows).
    Integer-exact: per-dim micro-floored values, integer floor means,
    centered products summed in int64 (|c| <= 2e6, n = 500 =>
    |cov_sum| <= 2e15).  Scale shape: ONE explode to (vec, dim) rows,
    a tiny per-dim mean aggregate broadcast back, then the dim x dim
    self-join on vec_id — n*d^2 product rows reduced by map-side partial
    aggregation into d^2/2 outputs; no global sort.  Reference analog:
    none (vector-corpus op; the reference's statistics layer stops at
    per-field numeric stats, `core/store/.../statistics/field/*`)."""
    if d.is_spark:
        dims = (
            "SELECT vec_id, pos + 1 AS dd, "
            "cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0 LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT vec_id, dg.g AS dd, "
            "cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    return f"""
WITH v0 AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v
            FROM embeddings),
dims AS ({dims}),
mean AS (
  SELECT dd, {d.intdiv('sum(val)', 'count(*)')} AS m FROM dims GROUP BY dd
),
cent AS (
  SELECT dims.vec_id, dims.dd, dims.val - mean.m AS c
  FROM dims JOIN mean ON mean.dd = dims.dd
)
SELECT a.dd AS dim_i, b.dd AS dim_j,
       cast(sum(a.c * b.c) as bigint) AS cov_sum,
       cast(count(*) as bigint) AS n_vecs
FROM cent a JOIN cent b ON a.vec_id = b.vec_id AND a.dd <= b.dd
GROUP BY a.dd, b.dd
ORDER BY dim_i, dim_j
"""


def _q155(d: G.Dialect) -> str:
    """Inter-class separation matrix: squared euclidean distance between
    per-label embedding centroids (the class-separability diagnostic run
    before trusting labels for CLIP-style filtering; companion of q116's
    per-vector outlier scan).  Integer-exact end-to-end: micro-floored
    elements, trunc-division centroids, integer squared distances
    (<= 64 * (2e6)^2 ~ 2.6e14).  Scale shape: one explode, one tiny
    (label, dim) aggregate, then the pairwise join runs over 10x64
    centroid rows — constant-size regardless of corpus size."""
    if d.is_spark:
        dims = (
            "SELECT label, pos + 1 AS dd, "
            "cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0 LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT label, dg.g AS dd, "
            "cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    return f"""
WITH v0 AS (SELECT label, {G.to_double_arr(d, 'embedding')} AS v
            FROM embeddings),
dims AS ({dims}),
cent AS (
  SELECT label, dd, {d.intdiv('sum(val)', 'count(*)')} AS c
  FROM dims GROUP BY label, dd
)
SELECT a.label AS label_i, b.label AS label_j,
       cast(sum((a.c - b.c) * (a.c - b.c)) as bigint) AS dist2
FROM cent a JOIN cent b ON a.dd = b.dd AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_i, label_j
"""


def _q156(d: G.Dialect) -> str:
    """Blocked fuzzy dedup by true edit distance: candidates share a
    16-char prefix block (the mutation model preserves prefixes — same
    contract as q16's shared candidate generation), refined by
    levenshtein <= 12 over the first 128 chars.  Both engines implement
    the identical unit-cost Levenshtein DP, so the refine is a
    formula-twin.  Scale shape: the block join is an equi-join on a
    16-byte key; the O(len^2) DP runs only on candidates, never
    all-pairs.  Skew note for 10^12 rows: one hot prefix (boilerplate
    headers) makes its block quadratic — production runs cap block
    cardinality (count-min the keys, reroute hot blocks through a
    second signature band, the q16 LSH path), the same hot-key
    treatment as the salted spatial join."""
    del d  # identical text in both dialects
    return """
SELECT a.doc_id AS id1, b.doc_id AS id2,
       cast(levenshtein(substr(a.text, 1, 128), substr(b.text, 1, 128))
            as bigint) AS edit_dist
FROM documents a JOIN documents b
  ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 128), substr(b.text, 1, 128)) <= 12
ORDER BY id1, id2
"""


def _q184(d: G.Dialect) -> str:
    """Collocation mining: top word pairs by document-co-occurrence lift
    (the PMI-style association scan of corpus linguistics; q158 is the
    temporal-basket twin, this is the lexical one).  Candidate space is
    bounded twice: only words in >= 25 documents enter (tiny frequent
    vocabulary), and pairs need support >= 15; lift in trunc-division
    micro.  Scale shape: distinct (doc, word) projection, frequent-word
    semi-join, self-equi-join ON DOC (fan-out = frequent-words-per-doc
    squared), keyed counts; final top-50 is a bounded sort over the
    (tiny) pair aggregate."""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, {d.explode(G.tokens(d))} AS w FROM documents
),
freq AS (
  SELECT w, cast(count(*) as bigint) AS df FROM tok GROUP BY w
  HAVING count(*) >= 25
),
ft AS (SELECT t.doc_id, t.w, f.df FROM tok t JOIN freq f ON f.w = t.w),
nd AS (SELECT cast(count(DISTINCT doc_id) as bigint) AS n FROM tok),
p AS (
  SELECT a.w AS w1, b.w AS w2, min(a.df) AS df1, min(b.df) AS df2,
         cast(count(*) as bigint) AS n_co
  FROM ft a JOIN ft b ON b.doc_id = a.doc_id AND a.w < b.w
  GROUP BY a.w, b.w HAVING count(*) >= 15
)
SELECT w1, w2, n_co,
       cast({d.intdiv('n_co * nd.n * 1000000', '(df1 * df2)')}
            as bigint) AS lift_micro
FROM p CROSS JOIN nd
ORDER BY lift_micro DESC, w1, w2
LIMIT 50
"""


def _q185(d: G.Dialect) -> str:
    """DSIR-style importance resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): token
    features hash into 1024 buckets, the target distribution is the
    English slice, the raw distribution is the whole corpus, and each
    document scores by the mean add-1-smoothed target/raw bucket lift
    (integer micro; the published method uses the log-ratio — lift keeps
    the pipeline integer-exact with the same bucket machinery and a
    near-identical doc ranking).  Output: top-100 docs a target-matched
    pretraining mix would keep.

    Scale shape: one explode of the token stream, two map-side-combinable
    bucket aggregates, and the bucket table is FIXED at 1024 rows — the
    lift join back onto the token stream is always a broadcast, so the
    whole operator is two keyed aggregates over the corpus regardless of
    scale.

    The lift is the PER-RATE micro form: bucket rates rt/rr in micro
    units via a pre-divided denominator (den = n div 1000 + 1, rate =
    count * 1000 div den), then l_micro = (rt+1)*1e6 div (rr+1).  Every
    intermediate is bounded — rate <= ~1e6, products <= ~1e12, count *
    1000 safe to ~9e15 tokens (petabyte-scale text).  History: round 4
    shipped the exact product form (ct+1)*(nr+1024)*1e6 with a comment
    deferring the rate form to "production"; the round-5 sf10 sweep
    DID overflow it — a Zipf-heavy bucket at 27M tokens pushed the
    product past int64 (Spark ANSI raised, and DuckDB would raise on
    the same text) — so "production" is any corpus past ~10M tokens
    and the rate form is now the only form.  Reference analog: none —
    GeoWave has no corpus ops; this is the data-mixing primitive next
    to q77's source sampler."""
    bucket = d.xform("v", "x % 1024")
    rt = d.intdiv("a.ct * 1000", "tots.dent")
    rr = d.intdiv("a.cr * 1000", "tots.denr")
    return f"""
WITH wv AS (SELECT doc_id, lang, {G.wordvals(d)} AS v FROM documents),
tok AS (SELECT doc_id, lang, {d.explode(bucket)} AS b FROM wv),
allc AS (
  SELECT b, cast(count(*) as bigint) AS cr,
         cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) as bigint) AS ct
  FROM tok GROUP BY b
),
tots AS (
  SELECT {d.intdiv('cast(sum(cr) as bigint)', '1000')} + 1 AS denr,
         {d.intdiv('cast(sum(ct) as bigint)', '1000')} + 1 AS dent
  FROM allc
),
lift AS (
  SELECT a.b,
         cast({d.intdiv(f'(({rt}) + 1) * 1000000', f'(({rr}) + 1)')} as bigint) AS l_micro
  FROM allc a CROSS JOIN tots
)
SELECT t.doc_id, cast(count(*) as bigint) AS n_tok,
       cast({d.intdiv('sum(l.l_micro)', 'count(*)')} as bigint) AS imp_micro
FROM tok t JOIN lift l ON l.b = t.b
GROUP BY t.doc_id
ORDER BY imp_micro DESC, doc_id
LIMIT 100
"""


def _q185_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _q185, the wordval pass de-HOFed (VERDICT r4 "next"
    #4): the dual-dialect text computes the 16-term WORDVAL polynomial
    inside an array transform — CodegenFallback, interpreted per word.
    Here the token stream is built via the codegen posexplode path
    (scalar wordval under whole-stage codegen, the shingle_rows_sql_spark
    lesson).  The bucket multiset is identical to the transform/explode
    formulation, so results match the unchanged DuckDB oracle exactly.

    Measured at sf0.1 (best-of-3, idle box): HOF dual text 1.08s ->
    this form 0.72s.  A persisted-tok variant (compute wordvals once,
    both consumers read the cache) was measured SLOWER at bench scale —
    the extra materialization job costs more than the second codegen
    pass it saves (persist+eager 1.15s, persist+lazy 0.88s, inline
    two-pass 0.72s at 270k tokens) — but WINS once the wordval pass
    itself dominates (sf10: 27M tokens, ~20s/pass), so the strategy is
    metadata-derived like q07's build side: documents past 100k rows
    (parquet footer count, no scan job — the audit runs at sf0.001
    where the inline branch is taken, preserving its build-only
    invariant) persist the token stream once.  The remaining gap to the
    pre-r4 0.42s is the honest price of the collision-resistant hash
    (~17 string ops/word vs 3 for the hash whose entropy collapse
    DNF'd sf10); one pass of it is irreducible."""
    register_views(spark, sf_dir)
    from .functions.sqlgen import _wordval_expr
    from .queries import _parquet_num_rows

    d = G.SPARK
    wv = _wordval_expr("w")
    rt = d.intdiv("a.ct * 1000", "tots.dent")
    rr = d.intdiv("a.cr * 1000", "tots.denr")
    tok_sql = f"""
  SELECT doc_id, en, ({wv}) % 1024 AS b
  FROM (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
               explode({d.split_ws('text')}) AS w
        FROM documents)"""
    n_docs = _parquet_num_rows(os.path.join(sf_dir, "documents.parquet"))
    if n_docs > 100_000:
        tok = spark.sql(tok_sql).persist()
        tok.createOrReplaceTempView("q185_tok")
        tok.count()  # eager: both consumers read the built cache
        tok_sql = "SELECT * FROM q185_tok"
    return spark.sql(f"""
WITH tok AS (
{tok_sql}
),
allc AS (
  SELECT b, cast(count(*) as bigint) AS cr,
         cast(sum(en) as bigint) AS ct
  FROM tok GROUP BY b
),
tots AS (
  SELECT {d.intdiv('cast(sum(cr) as bigint)', '1000')} + 1 AS denr,
         {d.intdiv('cast(sum(ct) as bigint)', '1000')} + 1 AS dent
  FROM allc
),
lift AS (
  SELECT a.b,
         cast({d.intdiv(f'(({rt}) + 1) * 1000000', f'(({rr}) + 1)')} as bigint) AS l_micro
  FROM allc a CROSS JOIN tots
)
SELECT t.doc_id, cast(count(*) as bigint) AS n_tok,
       cast({d.intdiv('sum(l.l_micro)', 'count(*)')} as bigint) AS imp_micro
FROM tok t JOIN lift l ON l.b = t.b
GROUP BY t.doc_id
ORDER BY imp_micro DESC, doc_id
LIMIT 100
""")


def _q193(d: G.Dialect) -> str:
    """Domain-shift detector: per-language chi-square divergence of the
    hashed-token bucket distribution against the corpus-wide one (the
    drift monitor a data pipeline runs when a new crawl snapshot lands —
    large chi2 means the slice's token mix no longer matches the mix the
    model was tuned on).  Rate-form chi-square in integer micro: per
    bucket, observed and expected token rates floor to micro, the term is
    (ro - re)^2 / max(re, 1) — all nonnegative, trunc == floor, and every
    product stays under 1e15 regardless of corpus size (the overflow-safe
    form; the raw-count chi-square squares token counts and bursts bigint
    at ~1e6 tokens).

    Scale shape: shares q185's machinery — one explode, one 1024-row
    bucket aggregate per slice (GROUPING by lang and bucket in a single
    map-side-combinable pass), then all arithmetic runs over <= 1024 * 5
    rows.  Reference analog: none; sibling of q185 (importance weights)
    and q115 (Zipf) in the corpus-health toolbox."""
    bucket = d.xform("v", "x % 1024")
    return f"""
WITH wv AS (SELECT doc_id, lang, {G.wordvals(d)} AS v FROM documents),
tok AS (SELECT doc_id, lang, {d.explode(bucket)} AS b FROM wv),
bl AS (
  SELECT lang, b, cast(count(*) as bigint) AS o FROM tok GROUP BY lang, b
),
nl AS (SELECT lang, cast(sum(o) as bigint) AS n FROM bl GROUP BY lang),
corp AS (SELECT b, cast(sum(o) as bigint) AS cr FROM bl GROUP BY b),
tot AS (SELECT cast(sum(cr) as bigint) AS nr FROM corp),
terms AS (
  SELECT bl.lang,
         ({d.intdiv('bl.o * 1000000', 'nl.n')}
          - {d.intdiv('c.cr * 1000000', 'tot.nr')})
         * ({d.intdiv('bl.o * 1000000', 'nl.n')}
            - {d.intdiv('c.cr * 1000000', 'tot.nr')}) AS d2,
         greatest({d.intdiv('c.cr * 1000000', 'tot.nr')}, 1) AS re
  FROM bl JOIN nl ON nl.lang = bl.lang
  JOIN corp c ON c.b = bl.b CROSS JOIN tot
)
SELECT t.lang, cast(max(n2.n) as bigint) AS n_tok,
       cast(sum({d.intdiv('d2', 're')}) as bigint) AS chi2_micro
FROM terms t JOIN nl n2 ON n2.lang = t.lang
GROUP BY t.lang ORDER BY t.lang
"""


def _q195(d: G.Dialect) -> str:
    """Leakage-safe train/val/test split assignment: exact-duplicate
    clusters (q15's md5 groups) are assigned as a UNIT — the split is
    hashed from the cluster's canonical doc_id, never the member's — so
    no verbatim copy of a training document can land in the eval split
    (the train/test-contamination guard every serious pretraining corpus
    applies; q96 is the external-benchmark twin of this internal one).
    Split by canonical hash: 90/5/5 via (canonical_id * 2654435761) %
    1000 — deterministic, engine-independent integer mixing.

    Scale shape: one md5 groupBy for canonicals (map-side combinable),
    one broadcast-able join back, one tiny rollup — the same two-pass
    shape as q15 at any corpus size."""
    return """
WITH canon AS (
  SELECT md5(text) AS k, min(doc_id) AS canonical_id,
         cast(count(*) as bigint) AS sz
  FROM documents GROUP BY md5(text)
),
assign AS (
  SELECT k, canonical_id, sz,
         CASE WHEN (canonical_id * 2654435761) % 1000 < 900 THEN 'train'
              WHEN (canonical_id * 2654435761) % 1000 < 950 THEN 'val'
              ELSE 'test' END AS split
  FROM canon
)
SELECT split, cast(count(*) as bigint) AS n_clusters,
       cast(sum(sz) as bigint) AS n_docs,
       cast(min(canonical_id) as bigint) AS first_canonical
FROM assign GROUP BY split ORDER BY split
"""


def _q196_sh_sql(d: G.Dialect) -> str:
    """Distinct shingle rows of the 1-in-4 audit sample."""
    sh = G.shingles3_from(d, "v")
    return f"""
SELECT DISTINCT doc_id, {d.explode(sh)} AS shingle
FROM (SELECT doc_id, {G.wordvals(d)} AS v
      FROM documents WHERE doc_id % 4 = 1) wv
WHERE {d.size('v')} >= 3
"""


def _q196_tail_sql(d: G.Dialect, sh_rows: str) -> str:
    """Audit body over a shingle-row view name."""
    mins = ", ".join(
        f"min(({2 * j + 3} * (shingle % {G.P_MINHASH}) + {104729 * (j + 1) % G.P_MINHASH}) % {G.P_MINHASH}) AS m{j}"
        for j in range(16)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, "
        f"{G.band_hash([f'm{4 * b + i}' for i in range(4)])} AS bh FROM sig"
        for b in range(4)
    )
    return f"""
sizes AS (SELECT doc_id, count(*) AS sz FROM {sh_rows} GROUP BY doc_id),
sig AS (SELECT doc_id, {mins} FROM {sh_rows} GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ninter
  FROM {sh_rows} a JOIN {sh_rows} b ON b.shingle = a.shingle
                              AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
tru AS (
  SELECT i.d1, i.d2
  FROM inter i JOIN sizes z1 ON z1.doc_id = i.d1
               JOIN sizes z2 ON z2.doc_id = i.d2
  WHERE cast(floor(1000000.0 * i.ninter / (z1.sz + z2.sz - i.ninter))
             as bigint) >= 500000
),
hit AS (SELECT t.d1 FROM tru t JOIN cand c ON c.d1 = t.d1 AND c.d2 = t.d2),
n AS (
  SELECT (SELECT cast(count(*) as bigint) FROM cand) AS n_cand,
         (SELECT cast(count(*) as bigint) FROM tru) AS n_true,
         (SELECT cast(count(*) as bigint) FROM hit) AS n_hit
)
SELECT n_cand, n_true, n_hit,
       cast({d.intdiv('n_hit * 1000000', 'greatest(n_cand, 1)')}
            as bigint) AS precision_micro,
       cast({d.intdiv('n_hit * 1000000', 'greatest(n_true, 1)')}
            as bigint) AS recall_micro
FROM n
"""


def _q196(d: G.Dialect) -> str:
    """LSH recall/precision audit: on a deterministic 1-in-4 sample
    (doc_id % 4 = 1), generate q16's banded MinHash candidates AND the
    exact Jaccard >= 0.5 ground truth, then report candidate count, true
    count, hits, precision and recall in micro — the self-audit every
    production dedup pipeline runs before trusting its banding parameters
    (and exactly the indexed-vs-brute contract of the reference's join
    ITs, `test/.../spark/GeoWaveSparkSpatialJoinIT.java:228-255` in
    /root/reference, turned into a standing metric).

    This one-text form is the ORACLE; the Spark path materializes the
    shingle rows once (they feed sizes, sig and BOTH sides of the exact
    join — inlined CTEs would re-explode them ~7x).  Scale shape: the
    candidate side is q16's keyed band join (the scale path); the exact
    side is a shingle-equality join, quadratic only within co-shingle
    groups — which is why the audit runs on a bounded SAMPLE slice at
    production scale (sampling is the point: recall estimates don't
    need the full corpus)."""
    return (f"WITH sh_rows AS ({_q196_sh_sql(d)}),"
            + _q196_tail_sql(d, "sh_rows"))


def _q196_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized Spark path for `_q196`."""
    from .table.views import mat_view

    d = G.SPARK
    register_views(spark, sf_dir)
    mat_view(spark, "q196_sh", _q196_sh_sql(d))
    return spark.sql("WITH " + _q196_tail_sql(d, "q196_sh"))


def _q197(d: G.Dialect) -> str:
    """Cross-source overlap matrix: for every source pair, the number of
    shared distinct 3-gram shingles and the containment ratio against the
    smaller source's shingle set (the dedup-planning table that tells a
    corpus team which crawls to cross-dedup first, and the mirror-site
    detector).  Integer micro containment.

    Scale shape: project DISTINCT (source, shingle) once — the join key
    is the shingle and fan-out per shingle is bounded by the NUMBER OF
    SOURCES (20), never by document count, so the pair join is O(distinct
    shingles x sources), not O(docs^2); the output is a <= 20x20 matrix.
    This bounded-fanout containment join is the scalable form q18's
    within-source Jaccard cannot take across sources."""
    sh = G.shingles3_from(d, "v")
    return f"""
WITH wv AS (SELECT doc_id, source, {G.wordvals(d)} AS v FROM documents),
ss AS (
  SELECT DISTINCT source, {d.explode(sh)} AS shingle
  FROM wv WHERE {d.size('v')} >= 3
),
tot AS (SELECT source, cast(count(*) as bigint) AS n FROM ss GROUP BY source),
pair AS (
  SELECT a.source AS s1, b.source AS s2, cast(count(*) as bigint) AS n_shared
  FROM ss a JOIN ss b ON b.shingle = a.shingle AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.s1, p.s2, p.n_shared,
       cast({d.intdiv('p.n_shared * 1000000', 'least(t1.n, t2.n)')}
            as bigint) AS containment_micro
FROM pair p JOIN tot t1 ON t1.source = p.s1 JOIN tot t2 ON t2.source = p.s2
ORDER BY containment_micro DESC, s1, s2
LIMIT 50
"""


def _q201(d: G.Dialect) -> str:
    """Heaps'-law vocabulary growth curve (Heaps 1978): distinct-vocab
    size and cumulative token count at ten doc_id-ordered checkpoints —
    the corpus-health curve that tells a data team whether a new crawl
    still adds vocabulary or is recycling boilerplate (sublinear growth
    flattening early = saturated/duplicated source).  Vocabulary is the
    hashed word-value space (the q185/q16 token machinery).

    Scale shape: per-word FIRST occurrence is one keyed min aggregate;
    per-doc token counts one more; both then fan out only 10x against the
    broadcast checkpoint row set — no token ever joins tokens.  All
    integer."""
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
tok AS (SELECT doc_id, {d.explode('v')} AS w FROM wv),
first_occ AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
dt AS (SELECT doc_id, cast(count(*) as bigint) AS nt FROM tok GROUP BY doc_id),
mx AS (SELECT max(doc_id) AS m FROM documents),
chk AS (
  SELECT g.g AS decile, {d.intdiv('(mx.m + 1) * g.g', '10')} AS c
  FROM mx, (SELECT {d.explode(d.seq('1', '10'))} AS g) g
),
vocab AS (
  SELECT k.decile, cast(count(*) as bigint) AS n_vocab
  FROM first_occ f JOIN chk k ON f.fd < k.c GROUP BY k.decile
),
toks AS (
  SELECT k.decile, cast(sum(t.nt) as bigint) AS n_tokens
  FROM dt t JOIN chk k ON t.doc_id < k.c GROUP BY k.decile
)
SELECT t.decile, t.n_tokens, coalesce(v.n_vocab, 0) AS n_vocab
FROM toks t LEFT JOIN vocab v ON v.decile = t.decile
ORDER BY t.decile
"""


def _q203(d: G.Dialect) -> str:
    """Hard-negative mining for contrastive training: the closest
    CROSS-LABEL embedding pairs among hyperplane-LSH bucket mates (q20's
    16-bit buckets) — the pairs a metric-learning run feeds as negatives
    because the encoder currently confuses them.  Distance is exact
    integer: micro-floored components, squared euclidean (the q155
    convention), deterministic (dist2, id) ordering, top 50.

    Scale shape: candidates come from the bucket equi-join (the q20
    scale path — mining within buckets is the production contract, not a
    test shortcut), label inequality prunes in the join, and the top-50
    is a bounded sort over the candidate aggregate."""
    mf = d.xform("v", "cast(floor(x * 1000000) as bigint)")
    bucket = G.hyperplane_bucket(d, "v", 64, nbits=16)
    terms = " + ".join(
        f"({d.at('a.mv', str(i))} - {d.at('c.mv', str(i))}) * "
        f"({d.at('a.mv', str(i))} - {d.at('c.mv', str(i))})"
        for i in range(1, 65)
    )
    return f"""
WITH v0 AS (SELECT vec_id, label, {G.to_double_arr(d, 'embedding')} AS v
            FROM embeddings),
b AS (SELECT vec_id, label, {mf} AS mv, {bucket} AS bucket FROM v0),
cand AS (
  SELECT a.vec_id AS id1, c.vec_id AS id2,
         a.label AS label1, c.label AS label2,
         cast({terms} as bigint) AS dist2
  FROM b a JOIN b c ON c.bucket = a.bucket AND a.vec_id < c.vec_id
                   AND a.label <> c.label
)
SELECT id1, id2, label1, label2, dist2
FROM cand ORDER BY dist2, id1, id2 LIMIT 50
"""


def _q204(d: G.Dialect) -> str:
    """Symmetric int8 embedding quantization with a reconstruction-error
    audit — the storage/serving compression pass of an embedding corpus
    (FAISS SQ8 / product-serving convention: one scale per vector,
    code = round-toward-zero(x * 127 / max|x|)).  Integer-exact
    end-to-end: micro-floored elements, sign-split truncating division
    (both dialects' intdiv semantics agree on nonnegative operands, so
    the sign is factored out explicitly), squared dequantization error
    summed in int64 (|err_elem| <= scale/127 * ~5e5 -> sums << 2^63).

    Scale shape: one narrow projection per vector — no explode, no
    shuffle until the tiny per-label aggregate; at 100 TB this is a
    single map-side-combinable scan.  Reference analog: none (GeoWave
    stores raster tiles, not vectors); this is the pipeline op a
    trillion-vector store runs before writing ANN shards (q82's PQ is
    the codebook sibling; SQ8 is the per-vector sibling)."""
    mf = d.xform("v", "cast(floor(x * 1000000) as bigint)")
    absmax = d.fold(d.xform("mv", "abs(x)"), "cast(1 as bigint)",
                    "greatest(acc, x)")
    # code(x)   = sign(x) * (|x| * 127 div s)           (|code| <= 127)
    # deq(x)    = sign(x) * (|code| * s div 127)
    # err(x)    = (x - deq(x))^2
    q_abs = d.intdiv("(abs(x) * 127)", "s")
    deq_abs = d.intdiv(f"(({q_abs}) * s)", "127")
    err = (f"(abs(x) - ({deq_abs})) * (abs(x) - ({deq_abs}))")
    sum_err = d.fold(d.xform("mv", err), "cast(0 as bigint)", "acc + x")
    nonzero = d.size(d.arr_filter("mv", f"{q_abs} > 0"))
    return f"""
WITH v0 AS (SELECT vec_id, label, {G.to_double_arr(d, 'embedding')} AS v
            FROM embeddings),
m AS (SELECT vec_id, label, {mf} AS mv FROM v0),
s AS (SELECT vec_id, label, mv, {absmax} AS s FROM m),
e AS (
  SELECT vec_id, label, s AS scale,
         cast({sum_err} as bigint) AS sq_err,
         cast({nonzero} as bigint) AS n_nonzero
  FROM s
)
SELECT label,
       cast(count(*) as bigint) AS n_vecs,
       cast(sum(scale) as bigint) AS sum_scale,
       cast(sum(sq_err) as bigint) AS sum_sq_err,
       cast({d.intdiv('sum(sq_err)', 'sum(n_nonzero)')} as bigint)
         AS err_per_dim,
       cast(sum(n_nonzero) as bigint) AS n_nonzero
FROM e GROUP BY label ORDER BY label
"""


_LEXICON = "('slow', 'big', 'small')"


def _q205(d: G.Dialect) -> str:
    """Lexicon screening — the denylist/compliance gate of a text
    pipeline (toxicity / boilerplate / brand-term screens all reduce to
    this shape): per-document hit counts against a flag lexicon, rolled
    up per source with a flagged-document rate.  Distinct from q63
    (statistical quality) and q122 (PII rewrite): the lexicon here is a
    *membership* screen whose word list would be a broadcast side input
    at production size.

    Scale shape: pure per-row codegen (token filter against an inlined
    literal set; a 100k-term production lexicon becomes a broadcast
    hash join on exploded tokens — same plan class as q96's
    decontamination join), then one tiny keyed aggregate."""
    toks = G.tokens(d)
    hits = d.size(d.arr_filter(toks, f"x IN {_LEXICON}"))
    return f"""
WITH m AS (
  SELECT doc_id, source,
         cast({d.size(toks)} as bigint) AS n_tokens,
         cast({hits} as bigint) AS n_hits
  FROM documents WHERE length(text) > 0
)
SELECT source,
       cast(count(*) as bigint) AS n_docs,
       cast(sum(n_hits) as bigint) AS total_hits,
       cast(sum(CASE WHEN n_hits >= 3 THEN 1 ELSE 0 END) as bigint)
         AS n_flagged,
       cast((sum(CASE WHEN n_hits >= 3 THEN 1 ELSE 0 END) * 1000)
            {'div' if d.is_spark else '//'} count(*) as bigint)
         AS flag_rate_milli,
       cast({d.intdiv('(sum(n_hits) * 1000000)', 'sum(n_tokens)')} as bigint)
         AS hit_density_micro
FROM m GROUP BY source ORDER BY source
"""


def _q206(d: G.Dialect) -> str:
    """Containment near-dup pairs — the ASYMMETRIC dedup relation
    (Broder's containment c(A,B) = |A∩B| / |A|): catches a short
    document wholly quoted inside a longer one, which symmetric Jaccard
    (q18) scores low because the union is large.  The canonical
    quote-inclusion / page-template detector of a crawl pipeline.
    Emitted when the SMALLER shingle set is >= 60% contained in the
    other; integer-exact micro ratios.

    Scale shape: identical join skeleton to q18 (distinct-shingle
    equality join keyed by (source, shingle), group-count for the
    intersection) — fan-out bounded by within-source shingle
    co-occurrence; the production candidate path is q16's banded
    MinHash join.  Ordering (contained, container) is decided per pair
    from the two set sizes — no second join pass."""
    sh = G.shingles3_from(d, "v")
    return f"""
WITH wv AS (SELECT doc_id, source, {G.wordvals(d)} AS v FROM documents),
sh_rows AS (
  SELECT DISTINCT doc_id, source, {d.explode(sh)} AS shingle
  FROM wv WHERE {d.size('v')} >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh_rows GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ninter
  FROM sh_rows a
  JOIN sh_rows b ON b.source = a.source AND b.shingle = a.shingle
                AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT CASE WHEN z1.sz <= z2.sz THEN i.d1 ELSE i.d2 END AS contained_id,
         CASE WHEN z1.sz <= z2.sz THEN i.d2 ELSE i.d1 END AS container_id,
         least(z1.sz, z2.sz) AS small_sz,
         greatest(z1.sz, z2.sz) AS big_sz,
         cast(floor(1000000.0 * i.ninter / least(z1.sz, z2.sz)) as bigint)
           AS containment_micro
  FROM inter i
  JOIN sizes z1 ON z1.doc_id = i.d1 JOIN sizes z2 ON z2.doc_id = i.d2
)
SELECT contained_id, container_id,
       cast(small_sz as bigint) AS small_sz,
       cast(big_sz as bigint) AS big_sz, containment_micro
FROM scored WHERE containment_micro >= 600000
ORDER BY contained_id, container_id
"""


def _q207(d: G.Dialect) -> str:
    """Skyline (Pareto-frontier) document selection — "best quality at
    every length budget": a document survives iff no other document has
    a higher quality score with fewer-or-equal characters (nor a
    same-score strictly-shorter one).  The data-selection shape behind
    "pick the most instructive sample per token budget" curation.

    Scale shape: the 2-D skyline decomposes relationally — one keyed
    aggregate to (score -> min length), a running min over the DISTINCT
    score axis (a window over a tiny relation, broadcast back), and a
    semi-join of the corpus against the surviving (score, len) frontier.
    No pairwise self-join: O(n) + O(|distinct scores|), the textbook
    sort-based skyline (Borzsony et al., ICDE 2001) in window form.
    Score here is q63's distinct-token ratio in permille (integer)."""
    toks = G.tokens(d)
    score = (f"cast(({d.size(d.arr_distinct(toks))} * 1000) "
             f"{'div' if d.is_spark else '//'} {d.size(toks)} as bigint)")
    return f"""
WITH m AS (
  SELECT doc_id, cast(length(text) as bigint) AS n_chars, {score} AS score
  FROM documents WHERE length(text) > 0
),
per_score AS (SELECT score, min(n_chars) AS min_len FROM m GROUP BY score),
frontier AS (
  SELECT score, min_len,
         min(min_len) OVER (ORDER BY score DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_above
  FROM per_score
)
SELECT m.doc_id, m.score, m.n_chars
FROM m
JOIN frontier f ON f.score = m.score AND m.n_chars = f.min_len
WHERE f.best_above IS NULL OR f.min_len < f.best_above
ORDER BY m.score DESC, m.doc_id
"""




# ------------------------------------------------------ q219 ppjoin


def _q219_core(d: G.Dialect, candidates: str) -> str:
    """Shared verify/threshold tail over a `cand (d1, d2)` CTE."""
    return f"""
inter AS (
  SELECT c.d1, c.d2, cast(count(*) as bigint) AS ninter
  FROM cand c
  JOIN tok x ON x.doc_id = c.d1
  JOIN tok y ON y.doc_id = c.d2 AND y.w = x.w
  GROUP BY c.d1, c.d2
)
SELECT i.d1, i.d2, i.ninter,
       cast(floor(1000000.0 * i.ninter / (s1.n + s2.n - i.ninter))
            as bigint) AS jac_micro
FROM inter i
JOIN sz s1 ON s1.doc_id = i.d1
JOIN sz s2 ON s2.doc_id = i.d2
WHERE 2 * i.ninter >= (s1.n + s2.n - i.ninter)
ORDER BY d1, d2
"""


def _q219_head(d: G.Dialect) -> str:
    sh = G.shingles3_from(d, "v")
    return f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
tok AS (
  SELECT DISTINCT doc_id, {d.explode(sh)} AS w
  FROM wv WHERE {d.size('v')} >= 3
),
sz AS (SELECT doc_id, cast(count(*) as bigint) AS n FROM tok GROUP BY doc_id)
"""


def _q219_spark(spark, sf_dir):
    """PPJoin-style set-similarity self-join with PREFIX FILTERING
    (Chaudhuri/Ganti/Kaushik SSJoin + Xiao et al. PPJoin): 3-gram
    shingle-set Jaccard >= 0.5 pairs, but candidates come ONLY from each
    document's prefix — its (n - ceil(0.5 n) + 1) globally-rarest
    shingles under the total order (df, shingle).  The prefix-filter
    lemma makes this lossless: J(x,y) >= t implies |x| >= t|y|, hence
    overlap >= t * max(|x|,|y|), hence the prefixes must intersect — so
    the result
    set equals the brute-force oracle's exactly (the indexed-vs-brute
    contract of `GeoWaveSparkSpatialJoinIT.java:228-255`).

    Scale shape: stop-shingles NEVER generate candidate pairs (they
    rank past every prefix), which is precisely the quadratic blowup in
    a naive shingle-equality join (q18's shape — q18 runs at J >= 0.03
    where prefix filtering cannot prune; this operator is the
    high-threshold regime where it prunes almost everything); candidate
    fan-out is bounded by rare-shingle co-occurrence.  The threshold
    test is integer-exact (2*inter >= union); only the reported
    jac_micro divides, with one shared expression text.

    Two lossless scale guards (r5 full-registry sweep: 604 s at sf1,
    47M candidates = 116x at 10x data — the FIXED synthetic vocabulary
    saturates the shingle space, so even the df-rarest shingles' prefix
    frequency grows with the corpus and sum(pdf^2) goes quadratic; a
    Heaps-law vocabulary keeps prefixes selective, so this is the
    corpus's adversarial regime, not the operator's typical one):
    (1) the canonical SSJoin LENGTH filter in the candidate join
    (J >= 1/2 forces 2*min(n_x, n_y) >= max(n_x, n_y)); (2) the verify
    step intersects PER-PAIR SORTED ARRAYS (two hash lookups + one
    array_intersect per candidate) instead of re-joining the token
    table per pair, which shuffled ~candidates x tokens-per-doc rows
    (~2.4B at sf1).  Both leave the result set exactly equal to the
    brute-force oracle's.
    """
    d = G.SPARK
    register_views(spark, sf_dir)
    # tok is referenced by df, ranked and the array build — materialize
    # it once (Spark inlines CTEs; see `mat_view`).
    from .table.views import mat_view

    sh = G.shingles3_from(d, "v")
    mat_view(spark, "q219_tok", f"""
SELECT DISTINCT doc_id, {d.explode(sh)} AS w
FROM (SELECT doc_id, {G.wordvals(d)} AS v FROM documents) wv
WHERE {d.size('v')} >= 3""")
    sql = f"""
WITH tok AS (SELECT * FROM q219_tok),
sz AS (SELECT doc_id, cast(count(*) as bigint) AS n FROM tok GROUP BY doc_id),
df AS (SELECT w, count(*) AS dfreq FROM tok GROUP BY w),
ranked AS (
  SELECT t.doc_id, t.w, s.n,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY f.dfreq, t.w) AS r
  FROM tok t JOIN df f ON f.w = t.w JOIN sz s ON s.doc_id = t.doc_id
),
pref AS (
  SELECT doc_id, w, n FROM ranked
  WHERE r <= n - {d.intdiv('(n + 1)', '2')} + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM pref a JOIN pref b ON b.w = a.w AND a.doc_id < b.doc_id
   AND 2 * least(a.n, b.n) >= greatest(a.n, b.n)
),
arr AS (
  SELECT doc_id, sort_array(collect_list(w)) AS ws,
         cast(count(*) as bigint) AS n
  FROM tok GROUP BY doc_id
),
inter AS (
  SELECT c.d1, c.d2,
         cast(size(array_intersect(x.ws, y.ws)) as bigint) AS ninter,
         x.n AS n1, y.n AS n2
  FROM cand c JOIN arr x ON x.doc_id = c.d1
              JOIN arr y ON y.doc_id = c.d2
)
SELECT d1, d2, ninter,
       cast(floor(1000000.0 * ninter / (n1 + n2 - ninter))
            as bigint) AS jac_micro
FROM inter
WHERE 2 * ninter >= (n1 + n2 - ninter)
ORDER BY d1, d2"""
    return spark.sql(sql)


def _q219_duck_sql() -> str:
    """Brute-force oracle: every co-token pair, same integer threshold."""
    d = G.DUCK
    return f"""
{_q219_head(d)},
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM tok a JOIN tok b ON b.w = a.w AND a.doc_id < b.doc_id
),
{_q219_core(d, 'cand')}"""




def _q224_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized Spark path for `_q224`: the positional index `pos`
    is referenced five times (trigram scan + three hit joins) — at
    scale it is a STORED index; here it is checkpointed once via
    `mat_view` so the explode runs a single time."""
    from .table.views import mat_view

    d = G.SPARK
    register_views(spark, sf_dir)
    mat_view(spark, "q224_pos", f"""
SELECT doc_id, pos + 1 AS pos, col AS w
FROM (SELECT doc_id, {d.split_ws('text')} AS t FROM documents) toks
LATERAL VIEW posexplode(t) pe AS pos, col""")
    return spark.sql(f"""
WITH pos AS (SELECT * FROM q224_pos),
tri AS (
  SELECT a.w AS w1, b.w AS w2, c.w AS w3, count(*) AS n
  FROM pos a
  JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN pos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY a.w, b.w, c.w
),
top AS (SELECT w1, w2, w3 FROM tri ORDER BY n DESC, w1, w2, w3 LIMIT 1),
hits AS (
  SELECT p1.doc_id, p1.pos
  FROM pos p1 JOIN top t ON p1.w = t.w1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
            AND p2.w = t.w2
  JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
            AND p3.w = t.w3
)
SELECT h.doc_id, cast(count(*) as bigint) AS n_matches,
       cast(min(h.pos) as bigint) AS first_pos, t.w1, t.w2, t.w3
FROM hits h CROSS JOIN top t
GROUP BY h.doc_id, t.w1, t.w2, t.w3 ORDER BY doc_id""")


# --------------------------------------------- q222 power iteration


def _q222_tdiv(d: G.Dialect, x: str, n: str) -> str:
    """Sign-safe truncating integer division (Spark div truncates toward
    zero, DuckDB // floors; they agree only through this CASE form)."""
    return (f"(CASE WHEN {x} >= 0 THEN {d.intdiv(x, n)} "
            f"ELSE -{d.intdiv(f'(-({x}))', n)} END)")


def _q222_covs_sql(d: G.Dialect) -> str:
    """Full covariance matrix covs(i, j, c) in down-scaled integers."""
    if d.is_spark:
        dims = (
            "SELECT vec_id, pos + 1 AS dd, "
            "cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0e LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT vec_id, dg.g AS dd, "
            "cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0e, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    return f"""
WITH v0e AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v
             FROM embeddings),
dims AS ({dims}),
mean AS (
  SELECT dd, {d.intdiv('sum(val)', 'count(*)')} AS m FROM dims GROUP BY dd
),
cent AS (
  SELECT dims.vec_id, dims.dd, dims.val - mean.m AS c
  FROM dims JOIN mean ON mean.dd = dims.dd
),
cov AS (
  SELECT a.dd AS i, b.dd AS j, cast(sum(a.c * b.c) as bigint) AS cs
  FROM cent a JOIN cent b ON a.vec_id = b.vec_id GROUP BY a.dd, b.dd
)
SELECT i, j, {_q222_tdiv(d, 'cs', '1000000')} AS c FROM cov
"""


def _q222_round_sql(d: G.Dialect, covs: str, prev: str) -> str:
    """One power-iteration round (multiply + max-abs renormalize)."""
    return f"""
WITH w AS (
  SELECT c.i AS dd, cast(sum(c.c * v.val) as bigint) AS wv
  FROM {covs} c JOIN {prev} v ON v.dd = c.j GROUP BY c.i
),
m AS (SELECT greatest(max(abs(wv)), 1) AS ma FROM w)
SELECT dd, {_q222_tdiv(d, '(wv * 1000)', 'ma')} AS val
FROM w CROSS JOIN m
"""


def _q222(d: G.Dialect) -> str:
    """Dominant eigenvector of the embedding covariance by POWER
    ITERATION (4 rounds) — the spectral step PCA/whitening pipelines
    run after q152's covariance scan; together they are the "top
    principal direction" primitive for embedding-drift and anisotropy
    diagnostics.

    This unrolled-CTE form is the ORACLE (DuckDB materializes CTEs
    once); the Spark path materializes `covs` with `mat_view` and
    iterates — inlined CTEs would re-run the n*d^2 covariance build
    ~2^rounds times.  Determinism: all fixed-point integer — sign-safe
    truncating divisions, iterate renormalized to max-abs 1000 each
    round, every sum order-independent int64 (|w| <= 64 * 2e9 * 1e3 <
    2^47), so both engines hash identically.

    Scale shape: the covariance build is q152's n*d^2 map-side-reduced
    self-join; each round is ONE 64^2 x 64 hash join + keyed aggregate
    + a scalar cross join — constant work after the covariance scan."""
    its = []
    for k in range(1, 5):
        body = _q222_round_sql(d, "covs", f"v{k - 1}")
        its.append(f"v{k} AS ({body})")
    return f"""
WITH covs AS ({_q222_covs_sql(d)}),
v0 AS (SELECT {d.explode(d.seq('1', '64'))} AS dd, cast(1000 as bigint) AS val),
{','.join(its)}
SELECT dd, val AS v_fix FROM v4 ORDER BY dd
"""


def _q222_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-loop Spark path for `_q222`."""
    from .table.views import mat_view

    d = G.SPARK
    register_views(spark, sf_dir)
    mat_view(spark, "q222_covs", _q222_covs_sql(d))
    v = spark.sql(f"SELECT {d.explode(d.seq('1', '64'))} AS dd, "
                  "cast(1000 as bigint) AS val")
    for _ in range(4):
        v.createOrReplaceTempView("q222_prev")
        v = spark.sql(_q222_round_sql(d, "q222_covs", "q222_prev"))
        v = v.localCheckpoint(eager=True)
    v.createOrReplaceTempView("q222_final")
    return spark.sql("SELECT dd, val AS v_fix FROM q222_final ORDER BY dd")


# ------------------------------------------- q223 random projection


def _q223(d: G.Dialect) -> str:
    """Johnson-Lindenstrauss dimensionality reduction by DETERMINISTIC
    sign projection (Achlioptas 2003: +-1 entries preserve pairwise
    distances in expectation) — 64 -> 16 dims, the ANN-prep /
    embedding-compaction step that runs before LSH bucketing (q20 emits
    hash BITS; this emits the reduced VECTOR, which downstream cosine /
    IVF ops consume).  The sign matrix is a closed-form hash of
    (in_dim, out_dim), so both engines build the identical matrix with
    no randomness and no broadcast variable.

    Integer-exact: micro-floored components times +-1 summed in int64
    (|p| <= 64 * 2e6 < 2^28).  Scale shape: one explode to (vec, dim)
    rows, one equi-join against the 1024-row sign matrix (broadcast in
    Spark by size), one keyed aggregate to (vec, out_dim) — n*d*k
    product rows with map-side partial sums, no shuffle of raw vectors.
    """
    if d.is_spark:
        dims = (
            "SELECT vec_id, pos + 1 AS dd, "
            "cast(floor(col * 1000000) as bigint) AS val "
            "FROM v0e LATERAL VIEW posexplode(v) pe AS pos, col"
        )
    else:
        dims = (
            "SELECT vec_id, dg.g AS dd, "
            "cast(floor(v[dg.g] * 1000000) as bigint) AS val "
            "FROM v0e, LATERAL (SELECT unnest(generate_series(1, 64)) AS g) dg"
        )
    sign = "(CASE WHEN (j * 2654435761 + k * 40503) % 2 = 0 THEN 1 ELSE -1 END)"
    return f"""
WITH v0e AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v
             FROM embeddings),
dims AS ({dims}),
jm AS (SELECT {d.explode(d.seq('1', '64'))} AS j),
km AS (SELECT {d.explode(d.seq('1', '16'))} AS k),
sgn AS (SELECT j, k, {sign} AS s FROM jm CROSS JOIN km)
SELECT dims.vec_id, sgn.k AS out_dim,
       cast(sum(dims.val * sgn.s) as bigint) AS p_micro
FROM dims JOIN sgn ON sgn.j = dims.dd
GROUP BY dims.vec_id, sgn.k
ORDER BY vec_id, out_dim
"""




# ---------------------------------------------- q224 phrase search


def _q224(d: G.Dialect) -> str:
    """Exact PHRASE search over a positional inverted index — the
    retrieval primitive q99 (BM25 bag scoring) and q96 (set-overlap
    decontamination) both lack: order-sensitive term-at-a-time
    intersection, w1 at p, w2 at p+1, w3 at p+2 via (doc, pos)
    equi-joins.  The query phrase is the corpus's most frequent word
    trigram (deterministic tie-break) so the test is self-contained; in
    production the phrase is user input and only the `hits` chain runs
    — each join is keyed by (doc_id, pos) and semi-filtered by the
    (broadcast) query terms, so cost is O(postings of the rarest term),
    the classic positional-index bound.

    Output: per-document match count + first match position, with the
    phrase words carried for readability."""
    if d.is_spark:
        pos = ("SELECT doc_id, pos + 1 AS pos, col AS w "
               "FROM toks LATERAL VIEW posexplode(t) pe AS pos, col")
    else:
        pos = ("SELECT doc_id, pg.g AS pos, t[pg.g] AS w "
               "FROM toks, LATERAL (SELECT unnest(generate_series(1, "
               "len(t))) AS g) pg")
    return f"""
WITH toks AS (SELECT doc_id, {d.split_ws('text')} AS t FROM documents),
pos AS ({pos}),
tri AS (
  SELECT a.w AS w1, b.w AS w2, c.w AS w3, count(*) AS n
  FROM pos a
  JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN pos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY a.w, b.w, c.w
),
top AS (SELECT w1, w2, w3 FROM tri ORDER BY n DESC, w1, w2, w3 LIMIT 1),
hits AS (
  SELECT p1.doc_id, p1.pos
  FROM pos p1 JOIN top t ON p1.w = t.w1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
            AND p2.w = t.w2
  JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
            AND p3.w = t.w3
)
SELECT h.doc_id, cast(count(*) as bigint) AS n_matches,
       cast(min(h.pos) as bigint) AS first_pos, t.w1, t.w2, t.w3
FROM hits h CROSS JOIN top t
GROUP BY h.doc_id, t.w1, t.w2, t.w3 ORDER BY doc_id
"""




# ------------------------------------- q238 truncation (MRL) audit


def _q238(d: G.Dialect) -> str:
    """Embedding-truncation fidelity audit (the Matryoshka /
    dimensionality-truncation question: how well does cosine on the
    FIRST 16 dims track cosine on all 64?) — run before committing to
    truncated vectors for cheap ANN prefilters (q20/q41 style).  On a
    deterministic pair sample (vec_id % 5 = 0 paired with its
    successor), reports both cosines and the absolute gap, plus the
    concordance-ready ordering columns.

    Scale shape: the pair sample is an equi-join on vec_id + 1 (no
    all-pairs anything); cosines are sequential-fold array lambdas
    (whole-stage codegen, bit-identical across engines via the shared
    fold text)."""
    va, vb = G.to_double_arr(d, "a.embedding"), G.to_double_arr(d, "b.embedding")
    c64 = G.cosine_micro(d, "av", "bv", 64)
    c16 = G.cosine_micro(d, "av", "bv", 16)
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2, {va} AS av, {vb} AS bv
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 5 = 0
),
scored AS (
  SELECT v1, v2, {c64} AS cos64_micro, {c16} AS cos16_micro FROM pairs
)
SELECT v1, v2, cos64_micro, cos16_micro,
       abs(cos64_micro - cos16_micro) AS gap_micro
FROM scored ORDER BY v1
"""




# --------------------------------------------- q243 tf-idf keywords


def _q243(d: G.Dialect) -> str:
    """Per-document keyword extraction: top-3 terms by TF-IDF (the
    tagging/labeling primitive; q99's BM25 scores documents against a
    QUERY, q115 ranks the global vocabulary — this ranks terms WITHIN
    each document).  IDF is the Robertson rational form scaled to
    integer micro BEFORE the ranking window, so the order is
    engine-exact with no logarithms: score = tf * (2N - 2df + 1) *
    1e6 / (2df + 1), trunc division.

    Scale shape: one token explode -> (doc, word) tf counts
    (map-side combined), the df/N aggregates are vocabulary-sized and
    broadcast back, and the only per-doc work is a top-3 window over
    that doc's own distinct terms."""
    return f"""
WITH tok AS (
  SELECT doc_id, {d.explode(G.tokens(d))} AS w FROM documents
),
tf AS (
  SELECT doc_id, w, cast(count(*) as bigint) AS tf
  FROM tok GROUP BY doc_id, w
),
df AS (SELECT w, cast(count(*) as bigint) AS df FROM tf GROUP BY w),
n AS (SELECT cast(count(*) as bigint) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w,
         {d.intdiv('(tf.tf * (2 * n.n - 2 * df.df + 1) * 1000000)',
                   '(2 * df.df + 1)')} AS score
  FROM tf JOIN df ON df.w = tf.w CROSS JOIN n
),
ranked AS (
  SELECT doc_id, w, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, w ASC) AS rnk
  FROM scored
)
SELECT doc_id, cast(rnk as int) AS rnk, w AS term,
       cast(score as bigint) AS score_micro
FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
"""




# ----------------------------------------------- q246 k-center coreset


def _q246_pts_sql(d: G.Dialect) -> str:
    """Integer-micro embedding vectors (vec_id, iv array<bigint>)."""
    arr = G.to_double_arr(d, "embedding")
    iv = d.xform(arr, "cast(floor(x * 1000000) as bigint)")
    return f"SELECT vec_id, {iv} AS iv FROM embeddings"


def _q246_dist2(d: G.Dialect, a: str, b: str) -> str:
    """Integer squared L2 distance between two bigint arrays."""
    ea = d.at(a, "i")
    eb = d.at(b, "i")
    if d.is_spark:
        terms = f"transform(sequence(1, 64), i -> ({ea} - {eb}) * ({ea} - {eb}))"
    else:
        terms = (f"list_transform(generate_series(1, 64), "
                 f"i -> ({ea} - {eb}) * ({ea} - {eb}))")
    return d.fold(terms, "cast(0 as bigint)", "acc + x")


def _q246_round_pick_sql(d: G.Dialect, pts: str, cent: str) -> str:
    dist2 = _q246_dist2(d, "p.iv", "c.iv")
    dv = d.intdiv("enc", "1024")
    return f"""
SELECT cast(1023 - enc % 1024 as bigint) AS vec_id,
       cast({dv} as bigint) AS radius
FROM (
  SELECT max(dmin * 1024 + (1023 - vec_id)) AS enc FROM (
    SELECT p.vec_id, min({dist2}) AS dmin
    FROM {pts} p CROSS JOIN {cent} c
    GROUP BY p.vec_id
  ) pd
) nx
"""


def _q246(d: G.Dialect) -> str:
    """Coreset selection by greedy k-center (farthest-point traversal,
    Gonzalez 1985; 4 rounds from the lowest-id seed): the DIVERSITY
    sampler of training-data curation — q74/q76 sample by rate and
    mixture weight, SemDeDup (q83) removes redundancy, this picks the
    maximally-spread representatives (and its radius column is the
    2-approximation of the optimal k-center cost).

    This unrolled-CTE form is the ORACLE; the Spark path materializes
    the integer-vector relation once and loops, checkpointing the tiny
    center set each round.  Each round is ONE points x centers join
    (centers <= 5 rows, broadcast) + per-point min + encoded argmax —
    no all-pairs anything; integer-exact (micro components, int64
    squared distances, encoded ties to the lowest vec_id)."""
    parts = [f"pts AS ({_q246_pts_sql(d)})",
             "c0 AS (SELECT vec_id, iv FROM pts WHERE vec_id = "
             "(SELECT min(vec_id) FROM pts))"]
    sels = ["SELECT 0 AS round, vec_id, cast(0 as bigint) AS radius FROM c0"]
    for k in range(1, 5):
        parts.append(
            f"p{k} AS ({_q246_round_pick_sql(d, 'pts', f'c{k - 1}')})")
        parts.append(
            f"c{k} AS (SELECT vec_id, iv FROM c{k - 1} UNION ALL "
            f"SELECT pts.vec_id, pts.iv FROM pts "
            f"JOIN p{k} ON p{k}.vec_id = pts.vec_id)")
        sels.append(f"SELECT {k} AS round, vec_id, radius FROM p{k}")
    body = "\nUNION ALL\n".join(sels)
    return (f"WITH {','.join(parts)}\n"
            f"SELECT cast(round as int) AS round, vec_id, radius "
            f"FROM ({body}) u ORDER BY round")


def _q246_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-loop Spark path for `_q246`."""
    from .table.views import mat_view

    d = G.SPARK
    register_views(spark, sf_dir)
    mat_view(spark, "q246_pts", _q246_pts_sql(d))
    cent = spark.sql("SELECT vec_id, iv FROM q246_pts WHERE vec_id = "
                     "(SELECT min(vec_id) FROM q246_pts)")
    cent = cent.localCheckpoint(eager=True)
    cent.createOrReplaceTempView("q246_cent")
    picks = spark.sql(
        "SELECT 0 AS round, vec_id, cast(0 as bigint) AS radius "
        "FROM q246_cent")
    for k in range(1, 5):
        cent.createOrReplaceTempView("q246_cent")
        pick = spark.sql(_q246_round_pick_sql(d, "q246_pts", "q246_cent"))
        pick = pick.localCheckpoint(eager=True)
        pick.createOrReplaceTempView("q246_pick")
        picks = picks.unionAll(spark.sql(
            f"SELECT {k} AS round, vec_id, radius FROM q246_pick"))
        cent = cent.unionAll(spark.sql(
            "SELECT p.vec_id, p.iv FROM q246_pts p "
            "JOIN q246_pick x ON x.vec_id = p.vec_id"))
        cent = cent.localCheckpoint(eager=True)
    picks.createOrReplaceTempView("q246_picks")
    return spark.sql("SELECT cast(round as int) AS round, vec_id, radius "
                     "FROM q246_picks ORDER BY round")


def _q258(d: G.Dialect) -> str:
    """IVF recall-vs-nprobe tuning curve: for nprobe in {1, 2, 4}, the
    recall@1 of q41's fixed-K inverted-file ANN against the brute-force
    true nearest neighbor, over the sampled query set.  THE operational
    question of ANN at 10^12 vectors is "how many cells must I probe for
    the recall I need" — this query IS that curve, computed inside the
    engine so the tuning loop needs no export.

    Shape: q41's assignment CTEs (vecs x 16 broadcast centroids), per
    query a centroid ranking (sample x 16), candidate search restricted
    to the probed cells (equi-join on cent_id), true NN from the
    brute-force sample x corpus join (the oracle-grade reference), one
    hit flag per (nprobe, query).  Integer micro cosine everywhere so
    ranking ties break identically in both engines (q41 lesson).

    The query panel is the FIXED set `vec_id % 50 = 0 AND vec_id <
    2000` (40 queries above sf0.1; every gate-scale id is < 2000, so
    gate results are byte-identical to the old 1/50 sample).  The r5
    full-registry sweep caught the old fraction-based panel turning the
    brute-force truth side into O(n^2/50) — 90 s at sf1, headed for
    ~100x per decade; a recall curve needs a representative panel, not
    a panel that grows with the corpus."""
    dt_ac = G.dot(d, "a.v", "c.v", 64)
    dt_qc = G.dot(d, "q.v", "c.v", 64)
    dt_qx = G.dot(d, "q.v", "x.v", 64)
    npv = "(VALUES (1), (2), (4)) AS np(nprobe)"
    return f"""
WITH v0 AS (SELECT vec_id, {G.to_double_arr(d, 'embedding')} AS v FROM embeddings),
vecs AS (SELECT vec_id, v, sqrt({G.dot(d, 'v', 'v', 64)}) AS nv FROM v0),
cent AS (SELECT vec_id AS cent_id, v, nv
         FROM (SELECT vec_id, v, nv FROM vecs ORDER BY vec_id LIMIT 16) t),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY cast(floor(1000000.0 * ({dt_ac}) / (a.nv * c.nv)) as bigint) DESC,
                      c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) t WHERE rn = 1
),
cells AS (
  SELECT s.vec_id, s.v, s.nv, a.cent_id
  FROM vecs s JOIN assign a ON a.vec_id = s.vec_id
),
qs AS (SELECT vec_id, v, nv FROM vecs WHERE vec_id % 50 = 0 AND vec_id < 2000),
qrank AS (
  SELECT q.vec_id AS qid, c.cent_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY cast(floor(1000000.0 * ({dt_qc}) / (q.nv * c.nv)) as bigint) DESC,
                    c.cent_id ASC
         ) AS crank
  FROM qs q CROSS JOIN cent c
),
truenn AS (
  SELECT qid, cid AS true_cid FROM (
    SELECT q.vec_id AS qid, x.vec_id AS cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY cast(floor(1000000.0 * ({dt_qx}) / (q.nv * x.nv)) as bigint) DESC,
                      x.vec_id ASC
           ) AS rn
    FROM qs q JOIN vecs x ON x.vec_id <> q.vec_id
  ) t WHERE rn = 1
),
approx AS (
  SELECT nprobe, qid, cid AS approx_cid FROM (
    SELECT np.nprobe, q.vec_id AS qid, x.vec_id AS cid,
           row_number() OVER (
             PARTITION BY np.nprobe, q.vec_id
             ORDER BY cast(floor(1000000.0 * ({dt_qx}) / (q.nv * x.nv)) as bigint) DESC,
                      x.vec_id ASC
           ) AS rn
    FROM {npv}
    CROSS JOIN qs q
    JOIN qrank r ON r.qid = q.vec_id AND r.crank <= np.nprobe
    JOIN cells x ON x.cent_id = r.cent_id AND x.vec_id <> q.vec_id
  ) t WHERE rn = 1
)
SELECT a.nprobe,
       cast(count(*) as bigint) AS n_queries,
       cast(sum(CASE WHEN a.approx_cid = tn.true_cid THEN 1 ELSE 0 END) as bigint)
         AS hits,
       cast(floor(1000.0 * sum(CASE WHEN a.approx_cid = tn.true_cid THEN 1 ELSE 0 END)
            / count(*)) as bigint) AS recall_milli
FROM approx a
JOIN truenn tn ON tn.qid = a.qid
GROUP BY a.nprobe
ORDER BY a.nprobe
"""


def _q268_tail_sql(edges: str) -> str:
    """Wedge/triangle closure aggregate over an ordered near-dup edge
    relation (d1 < d2) — identical text in both dialects."""
    return f"""
WITH e AS (SELECT d1, d2 FROM ({edges}) p),
wedge AS (
  SELECT a.d1 AS x, a.d2 AS y, b.d2 AS z
  FROM e a JOIN e b ON b.d1 = a.d2
),
cl AS (
  SELECT w.x, w.y, w.z,
         CASE WHEN c.d1 IS NOT NULL THEN 1 ELSE 0 END AS closed
  FROM wedge w LEFT JOIN e c ON c.d1 = w.x AND c.d2 = w.z
)
SELECT cast(count(*) as bigint) AS wedges,
       cast(sum(closed) as bigint) AS closed,
       cast(count(*) - sum(closed) as bigint) AS open_wedges,
       cast(CASE WHEN count(*) = 0 THEN 1000
            ELSE floor(1000.0 * sum(closed) / count(*)) END as bigint)
         AS closure_milli
FROM cl
"""


def _q268_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup transitivity audit: similarity is NOT transitive, but
    q64's connected-components dedup collapses clusters as if it were —
    this measures how wrong that is on the actual q16 edge set.  closure
    = fraction of wedges (a~b~c, ordered) whose closing edge a~c is also
    a near-dup pair; open wedges are exactly the places where collapsing
    the component merges documents that are NOT near-dups of each other
    (chaining drift).  A curation run gates the cheap component collapse
    on this number and falls back to star-clustering under a threshold.

    Shape: the q16 pair relation (persisted once, the expensive part) +
    two self-joins on the SMALL edge list — candidate edges are O(n *
    dup_rate), so the wedge join is bounded by cluster sizes, never the
    corpus."""
    from .table.views import mat_view

    edges = _q16_spark(spark, sf_dir).select("d1", "d2")
    mat_view(spark, "q268_edges", edges)
    return spark.sql(_q268_tail_sql("SELECT d1, d2 FROM q268_edges"))


def _q272(d: G.Dialect) -> str:
    """Span-to-token alignment under chunking: given labeled CHARACTER
    spans (the form every PII/NER/regex annotation arrives in — q122's
    scrubber emits exactly these), recover the covering TOKEN span and
    its position in the 64-token training chunks (q112's chunking rule),
    flagging spans that straddle a chunk boundary — the rows a training
    pipeline must either re-window or drop, because a label split across
    two training sequences is silently corrupted.

    One deterministic span per doc (chars [a, a+12), a closed-form in
    doc_id and n_chars — byte offsets, independent of tokenization).
    Token char extents come from one cumulative-length window over the
    exploded token rows; alignment is an overlap join (token [s,e) x
    span [a,b): s < b AND e > a) BOUNDED PER DOC, never cross-doc;
    chunk ids are pure arithmetic on the token index.  At 10^12 docs
    every stage is keyed by doc_id — no global anything.
    """
    tv = d.split_ws("text")
    return f"""
WITH toks AS (
  SELECT doc_id, n_chars, {tv} AS tv FROM documents
),
trows AS (
  SELECT doc_id, n_chars, i.g AS ti, {d.at('tv', 'i.g')} AS w
  FROM toks, LATERAL (SELECT {d.explode(d.seq('1', d.size('tv')))} AS g) i
),
pos AS (
  SELECT doc_id, n_chars, ti, length(w) AS wl,
         cast(sum(length(w) + 1) OVER (PARTITION BY doc_id ORDER BY ti)
              - length(w) - 1 as bigint) AS start_c
  FROM trows
),
spans AS (
  SELECT doc_id,
         cast((doc_id * 37) % (CASE WHEN n_chars > 20 THEN n_chars - 20
                                    ELSE 1 END) as bigint) AS a
  FROM documents
),
hit AS (
  SELECT s.doc_id, s.a,
         min(p.ti) AS tok_start, max(p.ti) AS tok_end
  FROM spans s
  JOIN pos p ON p.doc_id = s.doc_id
            AND p.start_c < s.a + 12 AND p.start_c + p.wl > s.a
  GROUP BY s.doc_id, s.a
)
SELECT doc_id, a AS char_start,
       cast(tok_start as bigint) AS tok_start,
       cast(tok_end as bigint) AS tok_end,
       cast({d.intdiv('(tok_start - 1)', '64')} as bigint) AS chunk_start,
       cast({d.intdiv('(tok_end - 1)', '64')} as bigint) AS chunk_end,
       cast(CASE WHEN {d.intdiv('(tok_start - 1)', '64')}
                 <> {d.intdiv('(tok_end - 1)', '64')}
            THEN 1 ELSE 0 END as int) AS crosses_chunk
FROM hit
ORDER BY doc_id
"""


def _q285(d: G.Dialect) -> str:
    """Embedding-space benchmark decontamination: flag training vectors
    cosine-similar to any EVAL vector (the semantic complement of q96's
    exact-trigram decontamination — paraphrased eval leakage that no
    n-gram overlap catches; Yang et al. 2023 'rephrased samples').

    Plan: the eval set is small by contract (its cardinality is the eval
    benchmark's, not the corpus's) — Spark broadcasts it and the train
    side streams through ONE BroadcastNestedLoopJoin with the fold-based
    dot product in the join condition; no LSH needed because the
    candidate set IS the whole cross product eval x train, bounded by
    |eval| ~ constant.  Per-eval rollup: contaminated-train count,
    max similarity, and the worst offender (encoded argmax — hash agg,
    no window).

    The `vec_id < 2000` cap is what MAKES the contract true: the r5
    full-registry sweep caught the old fixture sampling eval as a FIXED
    FRACTION (1/50) of a scaling corpus, so eval x train grew
    quadratically (87 s at sf1, ~100x pair mass at 10x data) —
    contradicting this docstring's own |eval| ~ constant argument.  The
    cap covers every vec_id at the sf0.01/sf0.1 gate scales (<= 1999),
    so gate results are byte-identical; above that the eval benchmark
    stays 40 vectors and the scan is linear, as a decontamination pass
    against a fixed benchmark should be."""
    dt = G.dot(d, "t.v", "e.v", 64)
    sim = f"cast(floor(1000000.0 * ({dt}) / (t.nv * e.nv)) as bigint)"
    return f"""
WITH {_vec_cte(d)},
e AS (SELECT * FROM vecs WHERE vec_id % 50 = 17 AND vec_id < 2000),
t AS (SELECT * FROM vecs WHERE vec_id % 50 <> 17 OR vec_id >= 2000),
hits AS (
  SELECT e.vec_id AS eid, t.vec_id AS tid, {sim} AS sim_micro
  FROM t JOIN e ON {sim} >= 250000
)
SELECT eid, cast(count(*) as bigint) AS n_contaminated,
       cast(max(sim_micro) as bigint) AS max_sim_micro,
       cast(min((1000000 - sim_micro) * 10000000000 + tid) % 10000000000
            as bigint) AS worst_tid
FROM hits GROUP BY eid ORDER BY eid
"""


TEXT_QUERIES = {
    "q285_embedding_decontamination": _dual(_q285),
    "q258_ivf_recall_curve": _dual(_q258),
    "q272_span_token_alignment": _dual(_q272),
    "q268_neardup_transitivity": (_q268_spark,
                                  _q268_tail_sql(_q16(G.DUCK))),
    "q15_exact_dedup": _dual(_q15),
    "q219_ppjoin_similarity": (_q219_spark, _q219_duck_sql()),
    "q222_power_iteration": (_q222_spark, _q222(G.DUCK)),
    "q223_random_projection": _dual(_q223),
    "q238_truncation_audit": _dual(_q238),
    "q243_tfidf_keywords": _dual(_q243),
    "q246_kcenter_coreset": (_q246_spark, _q246(G.DUCK)),
    "q224_phrase_search": (_q224_spark, _q224(G.DUCK)),
    "q16_minhash_lsh_pairs": (_q16_spark, _q16(G.DUCK)),
    "q17_simhash": _dual(_q17),
    "q18_ngram_jaccard": (_q18_spark, _q18(G.DUCK)),
    "q19_ann_bruteforce_topk": _dual(_q19),
    "q20_ann_lsh_bucketed": _dual(_q20),
    "q21_text_stats": _dual(_q21),
    "q22_langid": _dual(_q22),
    "q23_fingerprint_dedup": _dual(_q23),
    "q39_simhash_neardup": (_q39_spark, _q39_duck()),
    "q40_embedding_neardup": _dual(_q40),
    "q41_ann_ivf": (_q41_spark_fn, _q41(G.DUCK)),
    "q50_text_search": _dual(_q50),
    "q63_quality_score": _dual(_q63),
    "q64_dup_clusters": (_q64_spark, _q64_duck()),
    "q82_ann_pq_adc": _dual(_q82),
    "q83_semantic_dedup": _dual(_q83),
    "q84_lm_familiarity": (_q84_spark, _q84_duck()),
    "q96_decontamination": (_q96_spark, _q96_duck()),
    "q99_bm25_scoring": _dual(_q99),
    "q110_exact_span_dedup": _dual(_q110),
    "q111_repetition_signals": _dual(_q111),
    "q112_token_chunking": _dual(_q112),
    "q115_zipf_vocab": _dual(_q115),
    "q116_embedding_outliers": _dual(_q116),
    "q118_graph_centrality": (_q118_spark, _q118(G.DUCK)),
    "q122_pii_scrub": _dual(_q122),
    "q142_bpe_merge_rounds": (q142_bpe_merge_rounds, _q142_duck()),
    "q152_embedding_covariance": _dual(_q152),
    "q155_class_separation": _dual(_q155),
    "q156_fuzzy_dedup": _dual(_q156),
    "q184_collocations": _dual(_q184),
    "q185_dsir_importance": (_q185_spark, _q185(G.DUCK)),
    "q193_domain_shift": _dual(_q193),
    "q195_leakage_safe_split": _dual(_q195),
    "q196_lsh_recall_audit": (_q196_spark, _q196(G.DUCK)),
    "q197_source_overlap": _dual(_q197),
    "q201_heaps_law": _dual(_q201),
    "q203_hard_negatives": _dual(_q203),
    "q204_int8_quant": _dual(_q204),
    "q205_lexicon_screen": _dual(_q205),
    "q206_containment_dedup": _dual(_q206),
    "q207_skyline_selection": _dual(_q207),
}
