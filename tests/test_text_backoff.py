"""Hand-verifiable semantics for trigram stupid-backoff scoring."""

from __future__ import annotations

import math

from finance_data_pipeline_spark.extensions.text import trigram_backoff_logprob


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_trigram_backoff_hand_corpus(spark):
    """Corpus 'a b c' + 'a b d': token scores are exact count ratios.

    Doc 0 = "a b c": S(a) = c(a)/T = 2/6; S(b|a) = c(ab)/c(a·) = 2/2;
    S(c|ab) = c(abc)/c(ab·) = 1/2.
    """
    out = {
        r.doc_id: r
        for r in trigram_backoff_logprob(_docs(spark, ["a b c", "a b d"])).collect()
    }
    lp0 = out[0].avg_backoff_logprob
    expect = (
        round(math.log(2 / 6) * 1e6) + round(math.log(1.0) * 1e6)
        + round(math.log(1 / 2) * 1e6)
    ) / (3 * 1e6)
    assert math.isclose(lp0, round(expect, 6), abs_tol=1e-6)
    assert out[0].n_tokens == 3


def test_trigram_backoff_unseen_backs_off(spark):
    """A doc whose trigram never repeats still scores every token
    (no nulls, no -inf): the unseen-trigram path takes 0.4·bigram and
    the unseen-bigram path 0.16·unigram."""
    rows = trigram_backoff_logprob(
        _docs(spark, ["x y z", "x q z"])
    ).collect()
    assert all(r.avg_backoff_logprob is not None for r in rows)
    assert all(r.n_tokens == 3 for r in rows)
