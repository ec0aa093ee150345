"""Incremental IVF ANN index (`pipeline/ann_index.py`): accumulation
semantics, frozen-quantizer contract, and single-cell file pruning."""

from __future__ import annotations

import shutil

import pytest

from geowave_spark.pipeline import ann_index as AX
from geowave_spark.table import snapshots as S
from geowave_spark.table.views import register_views

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def views(spark):
    register_views(spark, SF)
    for b in range(3):
        spark.sql(
            f"SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = {b}"
        ).createOrReplaceTempView(f"ax_b{b}")
    spark.sql(
        "SELECT vec_id, embedding FROM embeddings"
    ).createOrReplaceTempView("ax_all")
    spark.sql(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0"
    ).createOrReplaceTempView("ax_q")
    return spark


def test_incremental_appends_equal_single_build(views, tmp_path):
    """3 batch commits through the frozen quantizer == one build over
    the union (same quantizer seed), row for row."""
    spark = views
    p_inc = str(tmp_path / "inc")
    AX.build_index(spark, "ax_b0", p_inc)
    AX.append_batch(spark, p_inc, "ax_b1")
    AX.append_batch(spark, p_inc, "ax_b2")

    # single build whose quantizer rule picks the same 16 centroids:
    # batch 0 holds the globally smallest vec_ids' multiples of 3, so
    # freeze explicitly from ax_b0 then assign everything in one pass
    p_one = str(tmp_path / "one")
    spark.sql(
        f"SELECT vec_id, embedding FROM ax_b0 ORDER BY vec_id LIMIT {AX.K_CENT}"
    ).createOrReplaceTempView("_ann_cent")
    from geowave_spark.table import snapshots
    rows = spark.sql(f"""
SELECT vec_id, cent_id, cast(0 as int) AS is_cent, embedding
FROM ({AX._assign_sql('ax_all', '_ann_cent')})
UNION ALL
SELECT vec_id, vec_id AS cent_id, cast(1 as int) AS is_cent, embedding
FROM _ann_cent
""")
    snapshots.create(rows, p_one, cluster_by=["cent_id"])

    a = {(r.vec_id, r.cent_id)
         for r in S.scan(spark, p_inc, where="is_cent = 0").collect()}
    b = {(r.vec_id, r.cent_id)
         for r in S.scan(spark, p_one, where="is_cent = 0").collect()}
    assert a == b and len(a) > 0

    qa = [(r.qid, r.cid, r.rank)
          for r in AX.query_topk(spark, p_inc, "ax_q").collect()]
    qb = [(r.qid, r.cid, r.rank)
          for r in AX.query_topk(spark, p_one, "ax_q").collect()]
    assert qa == qb and len(qa) > 0


def test_appends_use_frozen_quantizer_not_batch_ids(views, tmp_path):
    """The quantizer read back from the index after appends is exactly
    batch 0's seed — appends must not re-derive centroids."""
    spark = views
    p = str(tmp_path / "idx")
    AX.build_index(spark, "ax_b0", p)
    AX.append_batch(spark, p, "ax_b1")
    cents = sorted(
        r.vec_id for r in S.scan(spark, p, where="is_cent = 1").collect())
    seed = sorted(r.vec_id for r in spark.sql(
        f"SELECT vec_id FROM ax_b0 ORDER BY vec_id LIMIT {AX.K_CENT}"
    ).collect())
    assert cents == seed


def test_single_cell_probe_prunes_files(views, tmp_path):
    """cluster_by=cent_id + footer stats: a one-cell probe must plan a
    strict subset of the table's files."""
    spark = views
    p = str(tmp_path / "idx")
    AX.build_index(spark, "ax_b0", p)
    AX.append_batch(spark, p, "ax_b1")
    cents = [r.vec_id
             for r in S.scan(spark, p, where="is_cent = 1").collect()]
    target = sorted(cents)[0]
    kept, total = S.plan_files(p, None, [("cent_id", "=", target)])
    assert total > 1 and len(kept) < total
