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
    sh = G.shingles3(d)
    ntok = d.size(G.tokens(d))
    sig = G.minhash_sig(d, "sh", k=16)
    mcols = ", ".join(f"{m} AS m{j}" for j, m in enumerate(sig))
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, "
        f"{G.band_hash([f'm{4 * b + i}' for i in range(4)])} AS bh FROM sig"
        for b in range(4)
    )
    jac = G.jaccard_micro(d, "s1.sh", "s2.sh")
    return f"""
WITH s AS (SELECT doc_id, {sh} AS sh FROM documents WHERE {ntok} >= 3),
sig AS (SELECT doc_id, {mcols} FROM s),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT d1, d2, {jac} AS jac_micro
  FROM cand JOIN s s1 ON s1.doc_id = d1 JOIN s s2 ON s2.doc_id = d2
)
SELECT d1, d2, jac_micro FROM verified WHERE jac_micro >= 500000
ORDER BY d1, d2
"""


def _q17(d: G.Dialect) -> str:
    sim = G.simhash16(d)
    ntok = d.size(G.tokens(d))
    return f"""
SELECT doc_id, cast({sim} as bigint) AS simhash
FROM documents WHERE {ntok} >= 1 ORDER BY doc_id
"""


def _q18(d: G.Dialect) -> str:
    sh = G.shingles3(d)
    ntok = d.size(G.tokens(d))
    jac = G.jaccard_micro(d, "s1.sh", "s2.sh")
    return f"""
WITH s AS (
  SELECT doc_id, source, {sh} AS sh FROM documents WHERE {ntok} >= 3
)
SELECT s1.doc_id AS d1, s2.doc_id AS d2, {jac} AS jac_micro
FROM s s1 JOIN s s2 ON s1.source = s2.source AND s1.doc_id < s2.doc_id
WHERE {jac} >= 30000
ORDER BY d1, d2
"""


# ------------------------------------------------------- similarity search


def _vec_cte(d: G.Dialect) -> str:
    v = G.to_double_arr(d, "embedding")
    nrm = G.dot(d, "v", "v", 64)
    return (
        f"v0 AS (SELECT vec_id, label, {v} AS v FROM embeddings),\n"
        f"vecs AS (SELECT vec_id, label, v, sqrt({nrm}) AS nv FROM v0)"
    )


def _q19(d: G.Dialect) -> str:
    dt = G.dot(d, "q.v", "c.v", 64)
    return f"""
WITH {_vec_cte(d)},
q AS (SELECT * FROM vecs WHERE vec_id % 50 = 0),
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
    bucket = G.hyperplane_bucket(d, "v", 64, nbits=12)
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


TEXT_QUERIES = {
    "q15_exact_dedup": _dual(_q15),
    "q16_minhash_lsh_pairs": _dual(_q16),
    "q17_simhash": _dual(_q17),
    "q18_ngram_jaccard": _dual(_q18),
    "q19_ann_bruteforce_topk": _dual(_q19),
    "q20_ann_lsh_bucketed": _dual(_q20),
    "q21_text_stats": _dual(_q21),
    "q22_langid": _dual(_q22),
    "q23_fingerprint_dedup": _dual(_q23),
}
