"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship spatial join at sf0.001; `queries()` exposes
every implemented operator; `oracle_sql()` gives the DuckDB-equivalent SQL
(same column names, integerized float outputs for hash stability).

Implementations live in `geowave_spark/` (see SURVEY.md §7 for the build
plan and ARCHITECTURE notes in README).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geowave_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: indexed point-in-polygon-set join on sf0.001 (single-tier
    broadcast cover + interior/boundary split + codegen raycast refine)."""
    fn, _ = QUERIES["q54_polygon_join"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
