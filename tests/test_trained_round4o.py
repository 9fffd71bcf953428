"""Hand-checked semantics for the X17 trained-model/composition family
(NB classifier, GARCH vol, BM25 context pack). Oracle parity at
sf0.001 is covered parametrically by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_data_pipeline_spark.registry import QUERIES


def test_nb_classifier_beats_chance_on_holdout(spark):
    """Diagonal mass of the confusion matrix should beat uniform
    chance — the synthetic langs carry distinct marker tokens, so a
    trained NB must separate them far better than 1/n_langs."""
    out = QUERIES["nb_lang_classifier"](spark, "/root/testdata/sf0.001").toPandas()
    total = out["n_docs"].sum()
    correct = out[out["true_lang"] == out["pred_lang"]]["n_docs"].sum()
    n_langs = out["true_lang"].nunique()
    assert total > 0
    assert correct / total > 1.5 / n_langs


def test_garch_vol_positive_and_mean_reverting_scale(spark):
    """Conditional variance stays positive, and with variance
    targeting the long-run level matches the unconditional variance's
    order of magnitude."""
    out = QUERIES["garch_11_vol"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert (out["garch_vol_annual"] > 0).all()


def test_garch_recursion_hand_example(spark):
    """Tiny 4-price series: replay the recursion by hand."""
    from finance_data_pipeline_spark import indicators as ind

    closes = [100.0, 110.0, 99.0, 104.0]
    rows = [("A", f"2024-01-{i + 1:02d}", c) for i, c in enumerate(closes)]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    df = df.select("symbol", F.col("date").cast("date").alias("date"), "close")
    rets = [closes[i] / closes[i - 1] - 1 for i in range(1, 4)]
    mu = sum(rets) / 3
    seed = sum((r - mu) ** 2 for r in rets) / 2
    sv = spark.createDataFrame([("A", seed)], "symbol string, seed_var double")
    out = (
        ind.with_garch_vol(df.join(sv, "symbol"), alpha=0.1, beta=0.85)
        .orderBy("date")
        .toPandas()
    )
    omega = (1 - 0.1 - 0.85) * seed
    v2 = seed
    v3 = omega + 0.1 * rets[0] * rets[0] + 0.85 * v2
    v4 = omega + 0.1 * rets[1] * rets[1] + 0.85 * v3
    got = out["garch_var"].tolist()
    assert got[1] == v2 and got[2] == v3 and got[3] == v4


def test_context_pack_respects_budget_and_rank_order(spark):
    out = QUERIES["bm25_context_pack"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert (out["cum_tokens"] <= 800).all()
    for _, g in out.groupby("query_id"):
        ranks = g["rank"].tolist()
        # prefix rule: ranks are a contiguous prefix 1..len
        assert ranks == list(range(1, len(ranks) + 1))
        # cum_tokens strictly increasing by n_tokens
        assert (g["cum_tokens"].diff().dropna() == g["n_tokens"].iloc[1:].values).all()
