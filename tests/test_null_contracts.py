"""NULL contracts of the engine's relational primitives — the hazard
class ADVICE r5 caught in binned_cum_weights (a NULL key corrupting a
NULLS-FIRST window and then vanishing at an equi-join). Each primitive
now DOCUMENTS what NULL input does; these tests pin that documented
behavior empirically, so a future plan change that silently alters
NULL handling fails here instead of surfacing as a wrong answer on
NULL-bearing production data. (binned_cum_weights/global_rank have
their own pins in test_binned_cum.py.)
"""

from __future__ import annotations

import pytest

from finance_data_pipeline_spark.operators import relational as rel


@pytest.fixture()
def degenerate_docs(spark):
    """A corpus with the degenerate rows a 100 TB crawl always has:
    NULL text, empty text, and a single-token doc, next to two normal
    docs (one near-dup pair)."""
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again",
             "en", 0.9, "web"),
            (2, "the quick brown fox jumps over a sleepy dog again and again",
             "en", 0.8, "web"),
            (3, None, "en", 0.5, "web"),
            (4, "", "de", 0.4, "book"),
            (5, "word", "de", 0.6, "book"),
        ],
        "doc_id long, text string, lang string, quality_score double, source string",
    )


def test_skyline_excludes_null_coordinates(spark):
    """A point with an unknown dimension has no dominance position:
    NULL x and NULL y rows are excluded; real rows are unaffected by
    their presence."""
    df = spark.createDataFrame(
        [(None, 5.0, "nx"), (1.0, 10.0, "b"), (2.0, 3.0, "c"), (3.0, None, "ny")],
        "x double, y double, tag string",
    )
    got = sorted(r.tag for r in rel.skyline_2d(df, "x", "y", ["tag"]).collect())
    assert got == ["b", "c"]


def test_fk_orphan_audit_null_key_is_an_orphan_row_not_a_key(spark):
    """Documented ANSI deviation: NULL child keys count in the ROW
    metrics (a NULL FK is a surfaced data defect, not a satisfied
    constraint) but not in the countDistinct KEY metrics."""
    child = spark.createDataFrame([(1,), (None,), (99,)], "k int")
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    r = rel.fk_orphan_audit(child, parent, "k", "k").first()
    assert (r.n_child_rows, r.n_child_keys) == (3, 2)
    assert (r.n_orphan_rows, r.n_orphan_keys) == (2, 1)  # NULL + 99; key 99 only


def test_snapshot_diff_null_values_safe_null_keys_never_match(spark):
    """VALUE columns compare null-safely (NULL==NULL is unchanged, a
    NULL appearing/disappearing is changed); a NULL KEY is not an
    identity — the row reports as a removed+added pair."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (None, 7.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(1, None), (2, 5.0), (None, 7.0)], "k int, v double"
    )
    got = sorted(
        ((r.k, r.change_type) for r in rel.snapshot_diff(old, new, ["k"]).collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    # k=1: NULL==NULL null-safe -> unchanged (absent); k=2: NULL->5.0
    # changed; k=NULL: removed+added pair, never "changed".
    assert got == [(2, "changed"), (None, "added"), (None, "removed")]


def test_asof_join_null_timestamps_precede_everything(spark):
    """NULL timestamps sort NULLS-FIRST: a NULL-ts right row fills only
    NULL-ts left rows, and real-ts left rows never see NULL-ts state."""
    left = spark.createDataFrame(
        [("A", 10, "L1"), ("A", None, "L2")], "k string, ts int, lv string"
    )
    right = spark.createDataFrame(
        [("A", 5, 100.0), ("A", None, 999.0)], "k string, ts int, price double"
    )
    got = {
        r.lv: r.price_asof
        for r in rel.asof_join(left, right, "k", "ts", "ts", ["price"]).collect()
    }
    assert got == {"L1": 100.0, "L2": 999.0}


def test_text_stats_degenerate_docs_yield_null_ratios(degenerate_docs):
    """NULL/empty docs return rows with NULL ratios — never a
    DIVIDE_BY_ZERO job failure under ANSI mode (DuckDB's float x/0 is
    NULL, so the oracle semantics already are 'NULL ratio')."""
    from finance_data_pipeline_spark.extensions import text as tx

    got = {r.doc_id: r for r in tx.text_stats(degenerate_docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # empty text tokenizes to [''] (1 token of length 0 — the
    # documented split identity), so avg_word_len is 0.0 while the
    # 0-char punct_ratio denominator nullifies.
    assert got[4].punct_ratio is None and got[4].avg_word_len == 0.0
    assert got[3].punct_ratio is None
    assert got[1].avg_word_len is not None


def test_quality_score_degenerate_docs_score_without_crashing(degenerate_docs):
    """Empty/NULL docs score 0.0 (every rule term falls to its
    otherwise-0 branch) instead of failing the scan."""
    from finance_data_pipeline_spark.extensions import text as tx

    got = {r.doc_id: r.quality_score for r in tx.quality_score(degenerate_docs).collect()}
    assert got[4] == 0.0
    assert got[1] > 0.0


def test_gopher_quality_single_token_and_empty_docs(degenerate_docs):
    """The bigram fan-out needs >= 2 tokens: under ANSI, sequence(1,0)
    counts DOWN and element_at(toks, 2) on a 1-element array would
    fail the whole job. Degenerate docs must emit rows (keep=false),
    never an exception."""
    from finance_data_pipeline_spark.extensions import text as tx

    got = {r.doc_id: r for r in tx.gopher_quality(degenerate_docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[5].top_bigram_char_frac == 0.0  # one token, no bigrams
    assert bool(got[4].keep) is False and bool(got[5].keep) is False


def test_cosine_ops_exclude_invalid_vectors(spark):
    """Valid-vector corpus contract (round 7, supersedes the round-6
    'zero vector scores 0.0' rule for corpus-level operators): NULL
    and zero-norm embeddings are EXCLUDED from the candidate corpus by
    similarity.valid_vectors — counting them as 0-similarity rows
    deflated means and hit engine-asymmetric NULL/ANSI paths (the
    adversarial-docs probe's 20 divergences). Pins kmeans assignment,
    brute-force top-k, and SemDeDup over a corpus holding one zero and
    one NULL vector: both drop, nothing crashes. The scalar cosine()
    function keeps its own conventions (zero-norm -> 0.0, NULL ->
    NULL) for ad-hoc column math — see the test below."""
    import random

    from finance_data_pipeline_spark.extensions import similarity as sim

    rng = random.Random(1)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)], "en") for i in range(20)]
    rows.append((20, [0.0] * 64, "en"))
    rows.append((21, None, "en"))
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    from pyspark.sql import functions as F

    assert sim.valid_vectors(vecs).count() == 20
    assigned = sim.kmeans_clusters(vecs).collect()
    assert len(assigned) == 20  # zero + NULL vectors excluded, not crashed
    topk = sim.brute_force_topk(vecs, vecs.filter(F.col("vec_id") < 2)).collect()
    assert topk
    assert {r.neighbor_id for r in topk}.isdisjoint({20, 21})
    assert sim.semantic_dedup(vecs).count() == 20


def test_cosine_null_vector_propagates_null_zero_norm_scores_zero(spark):
    """Two distinct degeneracies, two conventions (ADVICE r6): a
    zero-NORM vector is a real row with no direction — it scores 0.0
    so argmax/top-k stay well-defined; a NULL vector is MISSING data —
    the score is NULL so avg()-style consumers skip the pair instead
    of silently counting a 0 (pairwise_label_cosine deflation)."""
    from pyspark.sql import functions as F

    from finance_data_pipeline_spark.functions import cosine

    df = spark.createDataFrame(
        [
            ([1.0, 0.0], [1.0, 0.0], "same"),
            ([1.0, 0.0], [0.0, 0.0], "zero_norm"),
            ([1.0, 0.0], None, "null_vec"),
            (None, None, "both_null"),
        ],
        "a array<double>, b array<double>, tag string",
    )
    got = {r.tag: r.c for r in df.select("tag", cosine("a", "b").alias("c")).collect()}
    assert got["same"] == 1.0
    assert got["zero_norm"] == 0.0
    assert got["null_vec"] is None and got["both_null"] is None
    # and the aggregate consumer behavior the convention exists for:
    mean = df.agg(F.avg(cosine("a", "b"))).first()[0]
    assert mean == 0.5  # (1.0 + 0.0) / 2 — NULL pairs skipped, not zeroed


def test_quality_pipeline_survives_degenerate_docs(degenerate_docs):
    """The composed consumers (CDF, per-lang percentile, ensemble rank,
    budget sampling, corpus cleaning, funnel) all ride quality_score /
    text token counts — each must run over the degenerate corpus."""
    from finance_data_pipeline_spark.extensions import dedup, sampling
    from finance_data_pipeline_spark.extensions import text as tx

    assert tx.quality_cdf(degenerate_docs).count() > 0
    assert tx.quality_percentile_by_lang(degenerate_docs).count() == 5
    assert tx.quality_ensemble_rank(degenerate_docs).count() == 5
    assert sampling.token_budget_sample(degenerate_docs).count() >= 0
    assert dedup.training_corpus(degenerate_docs).count() >= 1
    assert dedup.dedup_stage_funnel(degenerate_docs).count() > 0
