"""GWQL statement surface (`plans/gwql.py`) — parser cases mirror the
reference's GWQLParserTest / SelectStatementTest
(core/store and core/geotime src/test .../gwql in /root/reference)."""
import pytest

from geowave_spark.plans import gwql as G
from geowave_spark.table import geo
from geowave_spark.table.views import register_views

GEOM_MAP = {"geom": f"GeomPoint({geo.lon_sql('event_id')}, {geo.lat_sql('event_id')})"}


# ---------------------------------------------------------------- parser

def test_select_star():
    s = G.parse_statement("SELECT * FROM type")
    assert isinstance(s, G.SelectStatement)
    assert s.selectors is None and s.where is None and s.limit is None
    assert s.to_sql() == "SELECT * FROM type"


def test_select_columns_aliases_limit():
    s = G.parse_statement("SELECT a, b AS bee FROM type WHERE pop > 1 LIMIT 2")
    assert s.selectors == [("a", None), ("b", "bee")]
    assert s.limit == 2
    assert "pop > 1" in s.where


def test_aggregates():
    s = G.parse_statement(
        "SELECT COUNT(*), MIN(pop) AS lo, MAX(pop), SUM(pop) FROM type")
    assert s.aggregate
    exprs = dict((a, e) for e, a in s.selectors)
    assert exprs["count_all"] == "count(*)"
    assert exprs["lo"] == "min(pop)"
    assert exprs["max_pop"] == "max(pop)"
    assert exprs["sum_pop"] == "sum(pop)"


@pytest.mark.parametrize("stmt", [
    "SELECT *",                       # missing FROM
    "SELECT * FROM",                  # missing table
    "SELECT",                         # missing selectors
    "SELECT *, pop FROM type",        # * mixes with columns
    "SELECT agg(*), pop FROM type",   # aggregates mix with columns
    "SELECT * FROM type WHERE",       # missing filter
    "SELECT * FROM type LIMIT",       # missing limit value
    "SELECT * FROM type LIMIT 1.5",   # non-integer limit
    "SELECT pop AS FROM type",        # missing alias
])
def test_invalid_statements(stmt):
    with pytest.raises(G.GWQLError):
        G.parse_statement(stmt)


def test_temporal_operators_emission():
    # bare datetime literal is an INSTANT (reference GWQLParserTest:
    # start == end for '2020-01-01')
    w = G.parse_statement(
        "SELECT * FROM t WHERE start AFTER '2020-01-01'").where
    assert w == "(start > TIMESTAMP '2020-01-01 00:00:00')"
    w = G.parse_statement(
        "SELECT * FROM t WHERE start DURING '2020-01-01/2020-01-05'").where
    assert w == ("(start >= TIMESTAMP '2020-01-01 00:00:00' AND "
                 "start <= TIMESTAMP '2020-01-05 00:00:00')")
    w = G.parse_statement(
        "SELECT * FROM t WHERE start BEFORE_OR_DURING '2020-01-01/2020-01-05'"
    ).where
    assert w == "(start <= TIMESTAMP '2020-01-05 00:00:00')"


def test_spatial_predicates_emission():
    w = G.parse_statement(
        "SELECT * FROM t WHERE intersects(geometry, 'POINT(1 1)')").where
    assert w == "GeomIntersects(geometry, 'POINT(1 1)')"
    w = G.parse_statement(
        "SELECT * FROM t WHERE bbox(geometry, 0, 0, 1, 1)").where
    assert "GeomIntersects(geometry, 'POLYGON ((0.0 0.0, 1.0 0.0," in w
    # loose: envelope vs envelope
    w = G.parse_statement(
        "SELECT * FROM t WHERE intersectsLoose(geometry, "
        "'POLYGON((0 0, 2 0, 1 3, 0 0))')").where
    assert w.startswith("GeomIntersects(GeomEnvelope(geometry), 'POLYGON ((0.0 0.0")


def test_bbox_mercator_converts_corners():
    w = G.parse_statement(
        "SELECT * FROM t WHERE bbox(geometry, 0, 0, 111319, 111325, 'EPSG:3857')"
    ).where
    # ~1 degree in web mercator at the equator
    assert "0.99999" in w and "GeomIntersects" in w


def test_expression_surface():
    w = G.parse_statement(
        "SELECT * FROM t WHERE abs(a * 2 - 1) > b / 4 + 1").where
    assert w == "(abs(((a * 2) - 1)) > ((b / 4) + 1))"
    w = G.parse_statement(
        "SELECT * FROM t WHERE strstartswith(concat(a, b), 'x''y')").where
    assert w == "startswith(concat(a, b), 'x''y')"
    w = G.parse_statement("SELECT * FROM t WHERE pop::number > '5'::number").where
    assert w == "(cast(pop as double) > cast('5' as double))"
    w = G.parse_statement(
        "SELECT * FROM t WHERE pop::date BETWEEN '2020-01-01' AND '2020-01-02'"
    ).where
    assert w == "(cast(pop as timestamp) BETWEEN '2020-01-01' AND '2020-01-02')"


def test_filter_algebra():
    w = G.parse_statement(
        "SELECT * FROM t WHERE NOT (a = 1 OR b <> 2) AND [c IS NOT NULL]").where
    assert w == "((NOT ((a = 1) OR (b != 2))) AND (c IS NOT NULL))"
    assert G.parse_statement("SELECT * FROM t WHERE INCLUDE").where == "true"
    assert G.parse_statement("SELECT * FROM t WHERE EXCLUDE").where == "false"


def test_delete_parse():
    s = G.parse_statement("DELETE FROM type WHERE pop > 1")
    assert isinstance(s, G.DeleteStatement)
    assert s.table == "type" and "pop > 1" in s.where


# ------------------------------------------------------------- execution

def test_select_executes_like_hand_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    df = G.gwql(
        spark,
        "SELECT COUNT(*) AS n, SUM(value) AS sv FROM events "
        "WHERE bbox(geom, -120, -60, 60, 60) "
        "AND ts DURING '2024-01-01/2024-06-01' "
        "AND strcontains(event_type, 'i')",
        geom_map=GEOM_MAP,
    )
    lon, lat = geo.lon_sql("event_id"), geo.lat_sql("event_id")
    exp = spark.sql(
        f"SELECT count(*) AS n, sum(value) AS sv FROM events "
        f"WHERE {lon} BETWEEN -120 AND 60 AND {lat} BETWEEN -60 AND 60 "
        f"AND ts >= TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-06-01' "
        f"AND contains(event_type, 'i')"
    )
    assert df.collect() == exp.collect()
    assert df.first()["n"] > 0


def test_bbox_aggregate(spark, sf_dir):
    register_views(spark, sf_dir)
    df = G.gwql(spark, "SELECT BBOX(geom) AS env, COUNT(*) AS n FROM events",
                geom_map=GEOM_MAP)
    row = df.first()
    lon, lat = geo.lon_sql("event_id"), geo.lat_sql("event_id")
    exp = spark.sql(
        f"SELECT min({lon}) a, min({lat}) b, max({lon}) c, max({lat}) d "
        f"FROM events").first()
    assert row["env"]["minx"] == pytest.approx(exp["a"])
    assert row["env"]["miny"] == pytest.approx(exp["b"])
    assert row["env"]["maxx"] == pytest.approx(exp["c"])
    assert row["env"]["maxy"] == pytest.approx(exp["d"])


def test_limit_and_columns(spark, sf_dir):
    register_views(spark, sf_dir)
    df = G.gwql(spark, "SELECT event_id AS eid, value FROM events "
                       "WHERE value BETWEEN 100 AND 200 LIMIT 5")
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert set(df.columns) == {"eid", "value"}
    assert all(100 <= r["value"] <= 200 for r in rows)


def test_delete_executes_against_snapshot_table(spark, sf_dir, tmp_path):
    from geowave_spark.table import snapshots as snap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey", "cast(l_quantity as bigint) AS qty")
    path = str(tmp_path / "tbl")
    snap.create(li, path, num_files=2)
    n0 = li.count()
    n_hit = li.filter("qty > 40").count()
    summary = G.gwql(spark, "DELETE FROM mytable WHERE qty > 40",
                     snapshot_tables={"mytable": path})
    assert summary["deleted_rows"] == n_hit
    assert snap.scan(spark, path).count() == n0 - n_hit
    # time travel: snapshot 1 still intact
    assert snap.scan(spark, path, snapshot=1).count() == n0


def test_unknown_table_raises(spark, sf_dir):
    register_views(spark, sf_dir)
    with pytest.raises(G.GWQLError, match="no type named"):
        G.gwql(spark, "SELECT * FROM nonexistent")
