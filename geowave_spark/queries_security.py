"""Visibility (row/field-level authorization) registry queries.

Reference parity targets (/root/reference):
- q105: row visibility filtering — expression grammar
  `core/store/.../data/visibility/VisibilityExpression.java:54-150`
  (left-to-right fold, NO precedence: 'a|b&c' == '(a|b)&c'; empty = public)
  applied as `query/filter/ClientVisibilityFilter.java:30-38`.
- q106: per-row field-level visibility from a JSON attribute —
  `data/visibility/JsonFieldLevelVisibilityHandler.java:40-90`.

The oracles never run the engine's evaluator: each CASE class's pass/fail
under the fixed auth set is derived BY HAND from the reference's truth-table
test (`core/store/src/test/.../VisibilityExpressionTest.java:20-50`), so the
DuckDB side is an independent re-derivation, not a re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .table import visibility as vis
from .table.views import register_views

# six visibility classes keyed by event_id % 6; auths = {a, c}
# hand truth:  ''            -> True   (empty = public)
#              'a'           -> True
#              'b'           -> False
#              'a&b'         -> False  (b missing)
#              '(a&b)|c'     -> True   (c)
#              'a|b&c'       -> True   ((a|b)=T, &c=T — the no-precedence trap)
_VIS_CASE = ("CASE pmod(event_id, 6) WHEN 0 THEN '' WHEN 1 THEN 'a' "
             "WHEN 2 THEN 'b' WHEN 3 THEN 'a&b' WHEN 4 THEN '(a&b)|c' "
             "ELSE 'a|b&c' END")
_Q105_AUTHS = ("a", "c")
_VISIBLE_CLASSES = (0, 1, 4, 5)


def q105_visibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = spark.table("events").withColumn("visibility", F.expr(_VIS_CASE))
    visible = vis.filter_visible(ev, _Q105_AUTHS, "visibility")
    return (
        visible.groupBy("event_type")
        .agg(F.count("*").alias("n_visible"),
             F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("sum_mvalue"))
        .orderBy("event_type")
    )


def _q105_sql() -> str:
    classes = ", ".join(str(c) for c in _VISIBLE_CLASSES)
    return f"""
SELECT event_type,
       cast(count(*) as bigint) AS n_visible,
       cast(sum(cast(floor(value * 1000) as bigint)) as bigint) AS sum_mvalue
FROM events
WHERE (event_id % 6 + 6) % 6 IN ({classes})
GROUP BY event_type ORDER BY event_type
"""


# q106: per-row JSON field visibility.  value governed by class event_id % 3
# (0 -> 'a' pass, 1 -> 'a&b' fail, 2 -> missing key = public pass); props
# always governed by 's' (fail) under auths = {a}.
_Q106_JSON = ("CASE pmod(event_id, 3) "
              "WHEN 0 THEN '{\"value\":\"a\",\"props\":\"s\"}' "
              "WHEN 1 THEN '{\"value\":\"a&b\",\"props\":\"s\"}' "
              "ELSE '{\"props\":\"s\"}' END")


def q106_field_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    ev = spark.table("events").withColumn("field_vis", F.expr(_Q106_JSON))
    redacted = vis.apply_json_field_visibility(
        ev, "field_vis", auths=("a",), fields=("value", "props"))
    return (
        redacted.groupBy("event_type")
        .agg(F.count("*").alias("n_rows"),
             F.count("value").alias("n_value_visible"),
             F.count("props").alias("n_props_visible"),
             F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("sum_mvalue"))
        .orderBy("event_type")
    )


def _q106_sql() -> str:
    return """
SELECT event_type,
       cast(count(*) as bigint) AS n_rows,
       cast(count(CASE WHEN (event_id % 3 + 3) % 3 <> 1 THEN 1 END) as bigint)
         AS n_value_visible,
       cast(0 as bigint) AS n_props_visible,
       cast(sum(CASE WHEN (event_id % 3 + 3) % 3 <> 1
                     THEN cast(floor(value * 1000) as bigint) END) as bigint)
         AS sum_mvalue
FROM events
GROUP BY event_type ORDER BY event_type
"""


SECURITY_QUERIES = {
    "q105_visibility_filter": (q105_visibility_filter, _q105_sql()),
    "q106_field_visibility": (q106_field_visibility, _q106_sql()),
}
