"""Hand-computed semantics for the X4+++b text round-out (readability,
TTR/Yule's K, pairwise source JS divergence). Oracle parity at sf0.001
is covered parametrically by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions import text as tx


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_flesch_counts_hand_example(spark):
    """'the cat sat. the dog ran!' → 6 words, 2 sentences; syllables =
    vowel-group runs = 6 (one per word)."""
    d = _docs(spark, [(1, "the cat sat. the dog ran!", "en", "s", 25)])
    n_words = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"([.!?]+)"), 0)), F.lit(1)
    )
    n_syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"([aeiouy]+)"), 0)
    )
    row = d.select(
        n_words.alias("w"), n_sents.alias("s"), n_syl.alias("y")
    ).collect()[0]
    assert (row["w"], row["s"], row["y"]) == (6, 2, 6)


def test_flesch_unpunctuated_doc_gets_sentence_floor(spark):
    d = _docs(spark, [(1, "alpha beta gamma", "en", "s", 16)])
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"([.!?]+)"), 0)), F.lit(1)
    )
    assert d.select(n_sents.alias("s")).collect()[0]["s"] == 1


def test_yule_k_zero_for_all_distinct_words(spark):
    """Every word unique → Σf² = N → K = 0; repetition raises K."""
    from finance_data_pipeline_spark.extensions.dedup import tokens

    d = _docs(spark, [
        (1, "a b c d", "en", "s", 7),
        (2, "a a a a", "en", "s", 7),
    ])
    freq = (
        d.select("doc_id", F.explode(tokens("text")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("f"))
    )
    s = freq.groupBy("doc_id").agg(
        F.sum("f").alias("n"), F.sum(F.col("f") * F.col("f")).alias("f2")
    )
    rows = {
        r["doc_id"]: 10000.0 * (r["f2"] - r["n"]) / (r["n"] * r["n"])
        for r in s.collect()
    }
    assert rows[1] == 0.0
    assert rows[2] == 10000.0 * (16 - 4) / 16


def test_js_divergence_symmetric_and_zero_on_identical_sources(spark):
    """Two sources with identical text → JS = 0; a divergent third
    source scores strictly higher against both, and JS is symmetric by
    construction (only a < b pairs are emitted)."""
    d = _docs(spark, [
        (1, "alpha beta gamma delta", "en", "s1", 22),
        (2, "alpha beta gamma delta", "en", "s2", 22),
        (3, "omega omega omega omega", "en", "s3", 23),
    ])
    out = tx.js_divergence_sources(d).collect()
    js = {(r["source_a"], r["source_b"]): r["js_nats"] for r in out}
    assert set(js) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert js[("s1", "s2")] == 0.0
    assert js[("s1", "s3")] > 0.0
    assert js[("s1", "s3")] == js[("s2", "s3")]
    # bounded by ln 2
    assert all(v <= math.log(2) + 1e-9 for v in js.values())
