"""Margin guard for lsh_recall_report_fast's exact-equality oracle
(ADVICE r5 low, registry.py q_lsh_recall_report_fast).

The fast 63/21×3 MinHash config's oracle asserts n_lsh == n_exact and
recall == 1.0 for a probabilistic algorithm — safe only while the
EXPECTED number of band-missed qualifying pairs stays far below any
flake budget. A pair at Jaccard J is missed with probability
(1 − J³)²¹ (all 21 bands of 3 rows disagree), so the flake rate of
the whole driver check is the sum of that over every qualifying pair.
This test computes that sum exactly at both driver SFs and pins it
below 1e-6 (one expected flake per million driver rounds). A testdata
regeneration that introduces borderline pairs (J barely above 0.7,
where per-pair miss is ~1.5e-4) fails HERE with a clear message to
loosen the oracle, instead of surfacing later as a driver flake.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions import dedup

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

_BANDS = 21
_ROWS_PER_BAND = 3
_FLAKE_BUDGET = 1e-6


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_expected_band_misses_below_flake_budget(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    miss = F.pow(
        F.lit(1.0) - F.pow(F.col("jaccard"), _ROWS_PER_BAND), _BANDS
    )
    row = (
        dedup.shingle_pairs_jaccard(docs)
        .filter(F.col("jaccard") >= 0.7)
        .agg(
            F.sum(miss).alias("expected_misses"),
            F.min("jaccard").alias("jmin"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .first()
    )
    if row["n_pairs"] == 0:
        return  # no qualifying pairs at this SF: equality is trivially safe
    assert row["expected_misses"] < _FLAKE_BUDGET, (
        f"expected band misses {row['expected_misses']:.3g} over "
        f"{row['n_pairs']} qualifying pairs (min J={row['jmin']:.4f}) in "
        f"{sf_dir}: lsh_recall_report_fast's exact-equality oracle is no "
        "longer flake-proof — give it a recall tolerance or raise num_hashes"
    )
