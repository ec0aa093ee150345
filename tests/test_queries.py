"""Every oracle-paired query must match DuckDB at sf0.001 (fast gate;
the driver re-checks at sf0.01).  Reference analog: indexed-vs-brute
equivalence `GeoWaveSparkSpatialJoinIT.java:98-176`."""

import pytest

from geowave_spark.queries import QUERIES
from geowave_spark.testing import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = oracle.sql(sql).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"
