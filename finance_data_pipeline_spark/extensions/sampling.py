"""Deterministic corpus sampling and splitting (§2.11 family).

Training-data pipelines need train/test splits and per-stratum samples
that are (a) reproducible across runs, engines, and cluster sizes, and
(b) decided row-locally — no seeded RNG (seed + partition layout =
non-portable), no global sort, no driver-side state. Everything here
keys off ``md5(key)``: the split decision is a pure Column expression
evaluated at scan time, so it costs zero shuffles at any scale and the
DuckDB oracle can replay it verbatim.

Rates are quantized to sixteenths: the first hex nibble of md5 is a
uniform 1/16 bucket, and ``nibble < NIBBLES[k]`` keeps exactly k/16 of
rows in expectation. Finer rates would read more nibbles; 16 buckets is
enough for the classic 1/8 test split and per-language downsampling.

The reference has no sampling surface (its whole corpus is ~4k rows);
this generalizes its deterministic re-run behavior (README.md:91-97 —
same inputs, same outputs) to corpus-scale subset selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NIBBLES = "0123456789abcdef"


def hash_nibble(key_col: str) -> Column:
    """First hex nibble of md5(key) — a uniform, engine-portable
    1/16 bucket (identical in Spark and DuckDB for the same key)."""
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)


def keep_fraction(key_col: str, sixteenths: int) -> Column:
    """Boolean: keep this row in a sixteenths/16 deterministic sample."""
    if not 0 <= sixteenths <= 16:
        raise ValueError(f"sixteenths must be in [0, 16], got {sixteenths}")
    if sixteenths >= 16:
        return F.lit(True)
    if sixteenths <= 0:
        return F.lit(False)
    return hash_nibble(key_col) < NIBBLES[sixteenths]


def hash_split(
    df: DataFrame, key_col: str = "doc_id", test_sixteenths: int = 2
) -> DataFrame:
    """Add a ``split`` column: 'test' for test_sixteenths/16 of rows
    (hash-deterministic per key), 'train' for the rest. Row-local — the
    split survives repartitioning, re-runs, and engine changes."""
    return df.withColumn(
        "split",
        F.when(keep_fraction(key_col, test_sixteenths), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, int],
    key_col: str = "doc_id",
    default_sixteenths: int = 16,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep rates[stratum]/16 of
    each stratum's rows (default_sixteenths/16 for unlisted strata) —
    the shape of language rebalancing in a pretraining mix. Unlike
    ``df.sampleBy`` (seeded RNG, layout-dependent) this is a pure
    filter: reproducible, oracle-checkable, and shuffle-free."""
    cond = ~F.col(stratum_col).isin(*sorted(rates)) & keep_fraction(
        key_col, default_sixteenths
    )
    for stratum, sixteenths in sorted(rates.items()):
        cond = cond | (
            (F.col(stratum_col) == stratum) & keep_fraction(key_col, sixteenths)
        )
    return df.filter(cond)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int = 2000,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-first token-budget fill: per language, take documents in
    descending quality_score order (ties → lowest doc_id) until the
    running token total would exceed ``budget_tokens`` — the selection
    step that builds a fixed-size pretraining mix ("give me the best
    N billion tokens per language") instead of a fixed fraction.

    Deterministic and fully oracle-checkable: ordering is (rounded
    quality, doc_id); the cumulative sum is an integer token count.
    Scale shape: one window per language — a per-stratum sort, same
    cost class as the other per-key windows here; at extreme per-
    language volume you'd first drop below a quality threshold read
    off quality_cdf, then budget-fill the survivors, so the sorted set
    is orders of magnitude smaller than the corpus.

    Returns (doc_id, lang, n_tokens, cum_tokens) for kept docs.
    """
    from pyspark.sql import Window

    from finance_data_pipeline_spark.extensions.text import token_count, quality_score

    base = docs.select(
        F.col(id_col), F.col(lang_col), token_count(text_col).cast("long").alias("n_tokens")
    ).join(quality_score(docs, id_col, text_col), id_col)
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc("quality_score"), id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(id_col, lang_col, "n_tokens", "cum_tokens")
    )


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Importance sampling with hash determinism: keep each row with
    probability ≈ ``weight`` (clamped to [0, 1], quantized to
    1/resolution) — include iff ``h60(key) mod resolution < round(
    weight · resolution)``. The weighted generalization of
    keep_fraction: quality-weighted corpus downsampling (keep good docs
    with high probability, junk with low) that is reproducible across
    runs, engines, partitionings, and cluster sizes, unlike
    ``df.sample``'s seeded per-partition RNG.

    Row-local pure Column filter — zero shuffles at any scale; the
    decision replays verbatim in SQL (60-bit md5 + integer compare).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    thr = (
        F.round(
            F.greatest(F.lit(0.0), F.least(weight, F.lit(1.0))) * resolution, 0
        )
    ).cast("long")
    return df.filter((h % resolution) < thr)
