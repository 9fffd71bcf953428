"""Semantics tests for MMR diverse selection and Spearman ranks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions.similarity import mmr_select


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_prefers_diversity_over_pure_relevance(spark):
    """Query = v0 = e_x. v1 and v2 both point along e_x (v2 slightly
    less relevant); v3 is orthogonal. Pure relevance ranks v2 second,
    but after picking v1 the redundancy penalty drops v2 below the
    orthogonal v3."""
    rows = [
        (0, [1.0, 0.0, 0.0]),          # query
        (1, [0.99, 0.14106735979665885, 0.0]),   # rel ~0.99
        (2, [0.98, 0.19899748742132397, 0.0]),   # rel ~0.98, near-dup of v1
        (3, [0.5, 0.0, 0.8660254037844386]),     # rel 0.5, orthogonal-ish to v1
    ]
    out = mmr_select(_vecs(spark, rows), k=3, lam=0.5, pool=10).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.pick_order)]
    assert order[0] == 1  # most relevant first
    assert order[1] == 3  # diversity beats the near-duplicate v2
    assert order[2] == 2


def test_mmr_first_pick_is_pure_relevance_and_ties_break_low_id(spark):
    rows = [
        (0, [1.0, 0.0]),
        (5, [0.8, 0.6]),
        (2, [0.8, 0.6]),  # identical to v5 → tie, lower id wins
        (9, [0.0, 1.0]),
    ]
    out = {r.pick_order: r.vec_id for r in mmr_select(_vecs(spark, rows), k=2, lam=0.7, pool=10).collect()}
    assert out[1] == 2


def test_spearman_rank_averages_ties(spark):
    """values [1, 2, 2, 3]: fractional ranks are [1, 2.5, 2.5, 4]."""
    df = spark.createDataFrame(
        [("A", i, v) for i, v in enumerate([1.0, 2.0, 2.0, 3.0])],
        "symbol string, t long, ret double",
    )
    from pyspark.sql import Window

    r = df.select(
        "t",
        (
            F.rank().over(Window.partitionBy("symbol").orderBy("ret"))
            + (F.count("*").over(Window.partitionBy("symbol", "ret")) - 1) / 2.0
        ).alias("r"),
    ).collect()
    got = {row.t: row.r for row in r}
    assert got[0] == 1.0 and got[3] == 4.0
    assert got[1] == 2.5 and got[2] == 2.5


def test_spearman_monotone_nonlinear_is_one(spark):
    """y = x³ is a nonlinear but monotone map: Pearson < 1 yet
    Spearman = exactly 1 on the ranks."""
    import numpy as np

    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = x ** 3
    rx = np.argsort(np.argsort(x)) + 1.0
    ry = np.argsort(np.argsort(y)) + 1.0
    sp = np.corrcoef(rx, ry)[0, 1]
    pe = np.corrcoef(x, y)[0, 1]
    assert math.isclose(sp, 1.0)
    assert pe < 1.0
