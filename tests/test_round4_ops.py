"""Edge semantics for the round-4 operators: forward as-of direction,
the binned temporal proximity join, and span-level benchmark
decontamination. (Oracle parity for the registry entries is covered
parametrically by tests/test_oracle_parity.py.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions import dedup
from finance_data_pipeline_spark.operators import relational as rel


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- asof_join direction="forward" ---------------------------------------


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [("A", "2024-01-01 10:30:00"), ("A", "2024-01-01 12:30:00")],
        "k string, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 1.0), ("A", "2024-01-01 11:00:00", 2.0)],
        "k string, rts string, v double",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    out = {
        r.ts.hour: r.v_asof
        for r in rel.asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_cols=["v"], direction="forward",
        ).collect()
    }
    # 10:30 -> next bar 11:00 (v=2.0); 12:30 -> nothing after -> null
    assert out[10] == 2.0
    assert out[12] is None


def test_asof_forward_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [("A", "2024-01-01 11:00:00")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 11:00:00", 5.0)], "k string, rts string, v double"
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    row = rel.asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_cols=["v"], direction="forward",
    ).first()
    assert row.v_asof == 5.0


def test_asof_rejects_unknown_direction(spark):
    import pytest

    df = spark.range(1).select(
        F.lit("A").alias("k"), F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError):
        rel.asof_join(df, df, key="k", left_ts="ts", right_ts="ts",
                      right_cols=[], direction="sideways")


def test_asof_nearest_picks_smaller_gap_with_backward_ties(spark):
    """Nearest: 10:20 is 20min after the 10:00 bar and 40min before
    11:00 → backward wins; 10:50 is 50/10 → forward wins; 10:30 is the
    exact tie → backward (the documented rule); 09:00 has no earlier
    bar → forward; 12:00 has no later bar → backward."""
    left = spark.createDataFrame(
        [("A", f"2024-01-01 {h}") for h in
         ("10:20:00", "10:50:00", "10:30:00", "09:00:00", "12:00:00")],
        "k string, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 1.0), ("A", "2024-01-01 11:00:00", 2.0)],
        "k string, rts string, v double",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    out = {
        (r.ts.hour, r.ts.minute): r.v_asof
        for r in rel.asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            right_cols=["v"], direction="nearest",
        ).collect()
    }
    assert out[(10, 20)] == 1.0
    assert out[(10, 50)] == 2.0
    assert out[(10, 30)] == 1.0  # tie -> backward
    assert out[(9, 0)] == 1.0   # only forward exists -> 10:00 bar
    assert out[(12, 0)] == 2.0  # only backward exists


# --- windowed_pair_join ---------------------------------------------------


def test_windowed_pair_join_equals_theta_join(spark):
    """The binned equi-join must return EXACTLY the pairs the naive
    per-key theta join defines — including pairs whose timestamps
    straddle a bin boundary."""
    rows = []
    # user 1: a burst straddling the 300s bin edge (t=290 vs t=310),
    # a within-bin pair (t=10, t=100), and a far-apart pair (t=10, t=2000)
    for eid, (u, t) in enumerate(
        [(1, 10), (1, 100), (1, 290), (1, 310), (1, 2000), (2, 50), (2, 340), (2, 360)]
    ):
        rows.append((eid, u, t))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, t long").select(
        "event_id", "user_id", F.col("t").cast("timestamp").alias("ts")
    )
    got = {
        (r.user_id, r.id_a, r.id_b, r.dt_sec)
        for r in rel.windowed_pair_join(
            ev, key="user_id", ts="ts", id_col="event_id", radius_sec=300
        ).collect()
    }
    a, b = ev.alias("a"), ev.alias("b")
    naive = {
        (r["user_id"], r["id_a"], r["id_b"], r["dt_sec"])
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            (
                F.unix_timestamp("b.ts").cast("long")
                - F.unix_timestamp("a.ts").cast("long")
            ).alias("dt_sec"),
        )
        .filter(F.abs(F.col("dt_sec")) <= 300)
        .collect()
    }
    assert got == naive
    # the boundary-straddling pair is present exactly once
    assert (1, 2, 3, 20) in got
    # dt sign preserved when the smaller id is the later event
    assert all(isinstance(x[3], int) for x in got)


def test_windowed_pair_join_no_duplicate_pairs(spark):
    ev = spark.createDataFrame(
        [(i, 1, i) for i in range(20)], "event_id long, user_id long, t long"
    ).select("event_id", "user_id", F.col("t").cast("timestamp").alias("ts"))
    out = rel.windowed_pair_join(
        ev, key="user_id", ts="ts", id_col="event_id", radius_sec=300
    )
    assert out.count() == out.select("id_a", "id_b").distinct().count() == 190


# --- decontaminate_spans --------------------------------------------------


def test_decontaminate_spans_excises_bench_ngrams(spark):
    """Train doc 1 shares the 4-gram 'aa bb cc dd' with the bench doc:
    those 4 tokens are removed; its other tokens survive. Train doc 2
    shares nothing and is untouched. Train doc 3 is shorter than n and
    has no windows at all."""
    docs = spark.createDataFrame(
        [
            (1, "xx aa bb cc dd yy"),
            (2, "one two three four five"),
            (3, "tiny doc"),
            (99, "aa bb cc dd zz qq"),  # benchmark
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99,)], "doc_id long")
    out = {r.doc_id: r for r in dedup.decontaminate_spans(docs, bench, n=4).collect()}
    assert set(out) == {1, 2, 3}  # bench doc excluded from output
    assert out[1].n_tokens == 6 and out[1].n_removed == 4
    assert out[1].cleaned_md5 == _md5("xx yy")
    assert out[2].n_removed == 0
    assert out[2].cleaned_md5 == _md5("one two three four five")
    assert out[3].n_tokens == 2 and out[3].n_removed == 0
    assert out[3].cleaned_md5 == _md5("tiny doc")


def test_decontaminate_spans_overlapping_windows_union(spark):
    """Two overlapping contaminated windows remove the UNION of their
    positions, not double-count: bench has 'aa bb cc dd' and
    'bb cc dd ee'; the train doc 'aa bb cc dd ee ff' loses tokens 0-4
    (5 tokens), keeping only 'ff'."""
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),
            (98, "aa bb cc dd xx"),
            (99, "yy bb cc dd ee"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(98,), (99,)], "doc_id long")
    row = {r.doc_id: r for r in dedup.decontaminate_spans(docs, bench, n=4).collect()}[1]
    assert row.n_removed == 5
    assert row.cleaned_md5 == _md5("ff")


# --- grouped HLL ----------------------------------------------------------


def test_grouped_hll_matches_per_group_global_sketch(spark):
    """Each group's grouped-HLL row must equal the GLOBAL sketch run on
    that group's rows alone — grouping changes state layout, not any
    group's estimate."""
    from finance_data_pipeline_spark import quality

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    grouped = {
        r.event_type: (r.present_buckets, r.est_distinct, r.exact_distinct)
        for r in quality.hll_distinct(ev, "user_id", p=9, by=["event_type"]).collect()
    }
    for et in grouped:
        solo = quality.hll_distinct(
            ev.filter(F.col("event_type") == et), "user_id", p=9
        ).first()
        assert grouped[et] == (
            solo.present_buckets, solo.est_distinct, solo.exact_distinct
        ), et


def test_grouped_hll_error_within_theory(spark):
    """Every group's estimate stays within 4 standard errors
    (1.04/sqrt(512) per group) of its exact count — the same bound the
    global sketch is property-tested against."""
    from finance_data_pipeline_spark import quality

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = quality.hll_distinct(ev, "user_id", p=9, by=["event_type"]).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.est_distinct - r.exact_distinct) / max(r.exact_distinct, 1)
        assert rel_err <= 4 * 1.04 / (512 ** 0.5), (r.event_type, rel_err)


# --- audio frame energy ---------------------------------------------------


def test_audio_frame_energy_frames_and_values(spark):
    """Frame fan-out equals duration_ms div frame_ms per audio row;
    energy equals the hand-computed probe-byte sum of squares."""
    from finance_data_pipeline_spark.extensions import multimodal as mm

    # doc_id=1 -> modality audio (doc_id % 3 == 1)
    text = "abcdefghij"  # 10 bytes
    docs = spark.createDataFrame(
        [(1, text, len(text))], "doc_id long, text string, n_chars long"
    )
    media = mm.synthetic_media(docs)
    dur = 1000 + (10 * 7) % 5000  # 1070 -> 4 frames at 250ms
    out = mm.audio_frame_energy(media, frame_ms=250, probes=8).collect()
    assert len(out) == dur // 250 == 4
    payload = text.encode()
    for r in sorted(out, key=lambda r: r.frame_idx):
        expected = sum(
            payload[(r.frame_idx * 8 + j) % len(payload)] ** 2 for j in range(8)
        )
        assert r.energy == expected
        assert r.t_ms == r.frame_idx * 250
        assert abs(r.rms - (expected / 8) ** 0.5) < 1e-3


def test_audio_frame_energy_only_audio_rows(spark):
    from finance_data_pipeline_spark.extensions import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "image doc", 9), (1, "audio doc", 9), (2, "video doc", 9)],
        "doc_id long, text string, n_chars long",
    )
    out = mm.audio_frame_energy(mm.synthetic_media(docs)).select("media_id").distinct().collect()
    assert {r.media_id for r in out} == {1}


# --- driver-contract hygiene ----------------------------------------------


def test_priority_lists_reference_real_queries_without_duplicates():
    """A typo in _PRIORITY/_TAIL silently drops a query from its
    intended window position — assert every listed name exists in the
    registry and nothing is listed twice, and that rows-only queries
    are exactly the _TAIL set (an oracle-backed query in _TAIL would
    never earn a driver slot; a rows-only query outside it burns one)."""
    import __spark_entry__ as entrymod
    from finance_data_pipeline_spark.registry import ORACLES, QUERIES

    listed = entrymod._PRIORITY + entrymod._TAIL
    unknown = [n for n in listed if n not in QUERIES]
    assert not unknown, f"listed but not registered: {unknown}"
    dupes = [n for n in set(listed) if listed.count(n) > 1]
    assert not dupes, f"duplicated entries: {dupes}"
    rows_only = set(QUERIES) - set(ORACLES)
    assert set(entrymod._TAIL) == rows_only, (
        set(entrymod._TAIL) ^ rows_only
    )


# --- scorer semantics -----------------------------------------------------


def test_knn_label_vote_recovers_separable_labels(spark):
    """Two well-separated synthetic clusters: every query's predicted
    label must equal its true label with a unanimous-ish vote."""
    from finance_data_pipeline_spark.extensions import similarity

    rows = []
    for i in range(30):
        base = [0.0] * 64
        if i % 2 == 0:
            base[0] = 1.0 + (i % 5) * 0.01  # cluster A along dim 0
            lab = 0
        else:
            base[1] = 1.0 + (i % 5) * 0.01  # cluster B along dim 1
            lab = 1
        rows.append((i, base, lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = similarity.knn_label_vote(emb, n_queries=10, k=5).collect()
    assert len(out) == 10
    for r in out:
        assert r.predicted_label == r.true_label, r
        assert r.votes == 5  # clusters are fully separated


def test_bigram_logprob_prefers_repeated_patterns(spark):
    """A corpus dominated by one bigram pattern scores that pattern's
    doc higher than a doc of the same unigrams in scrambled order —
    the signal unigram models cannot see."""
    from finance_data_pipeline_spark.extensions import text

    fluent = "the cat sat on the mat " * 5
    scrambled = "cat the mat sat the on " * 5
    docs = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, fluent), (4, scrambled)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logprob for r in text.bigram_logprob(docs).collect()}
    assert got[1] > got[4]
    # unigram distributions are identical, so the unigram scorer ties
    uni = {r.doc_id: r.avg_logprob for r in text.unigram_logprob(docs).collect()}
    assert uni[1] == uni[4]


def test_dsir_ranks_target_like_docs_first(spark):
    """Docs sharing the synthetic target split's vocabulary must
    outrank docs from a disjoint vocabulary."""
    import hashlib

    from finance_data_pipeline_spark.extensions import sampling

    # find ids whose md5 nibble is 'f' (the bench/target split)
    target_ids = [i for i in range(200)
                  if hashlib.md5(str(i).encode()).hexdigest()[0] == "f"][:3]
    other_ids = [i for i in range(200)
                 if hashlib.md5(str(i).encode()).hexdigest()[0] != "f"]
    rows = [(i, "alpha beta gamma delta " * 3) for i in target_ids]
    rows += [(other_ids[0], "alpha beta gamma delta " * 3)]      # target-like
    rows += [(j, "xx yy zz ww " * 3) for j in other_ids[1:6]]    # off-target
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.dsir_select(docs, n_buckets=64, top_n=6).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: -r.avg_log_ratio)]
    assert ranked[0] == other_ids[0], ranked


def test_source_unigram_kl_flags_drifted_source(spark):
    """A source whose vocabulary diverges from the corpus gets a larger
    KL than sources matching the corpus mixture."""
    from finance_data_pipeline_spark.extensions import text

    rows = [(i, "common words shared across sources", "s_norm")
            for i in range(20)]
    rows += [(100 + i, "vollkommen andere sprache hier drin", "s_drift")
             for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kl = {r.source: r.kl_nats for r in text.source_unigram_kl(docs).collect()}
    assert kl["s_drift"] > kl["s_norm"]
    assert kl["s_norm"] >= 0 and kl["s_drift"] >= 0


def test_canonical_dedup_collapses_formatting_variants(spark):
    """Punctuation / case / whitespace variants of one text share a
    canonical hash: min doc_id keeps, the rest drop, and a genuinely
    different text is untouched."""
    rows = [
        (1, "Hello, World!", "a"),
        (2, "hello world", "a"),
        (3, "  HELLO -- world  ", "b"),
        (4, "something else entirely", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in dedup.canonical_dedup_stats(docs).collect()}
    assert out["a"].n_docs == 2 and out["a"].n_kept == 1 and out["a"].n_dropped == 1
    # doc 3 is a dup of doc 1 (keeper in source a) -> b keeps only doc 4
    assert out["b"].n_docs == 2 and out["b"].n_kept == 1 and out["b"].n_dropped == 1


def test_canonical_dedup_counts_are_consistent(spark):
    """On real data: per-source kept+dropped == docs, and global kept
    equals the number of distinct canonical hashes."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup.canonical_dedup_stats(docs).collect()
    assert all(r.n_kept + r.n_dropped == r.n_docs for r in out)
    n_canon = (
        docs.select(F.md5(dedup.canonical_text("text")).alias("c"))
        .distinct()
        .count()
    )
    assert sum(r.n_kept for r in out) == n_canon
    assert sum(r.n_docs for r in out) == docs.count()


def test_split_leakage_flags_cross_split_duplicate(spark):
    """An exact duplicate placed across the hash-split boundary must
    surface as one test-train pair; a within-train duplicate pair must
    land in train-train. doc_ids are picked by their real md5 nibble
    so the test pins the split, not luck."""
    test_ids = [i for i in range(300)
                if _md5(str(i))[0] < "2"]
    train_ids = [i for i in range(300)
                 if _md5(str(i))[0] >= "2"]
    dup = "the exact same duplicated document body repeated verbatim " * 4
    other = "an unrelated training document about completely different topics " * 4
    rows = [
        (test_ids[0], dup, "s"),
        (train_ids[0], dup, "s"),
        (train_ids[1], other, "s"),
        (train_ids[2], other, "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.split_pair: r for r in dedup.split_leakage(docs, threshold=0.7).collect()}
    assert out["test-train"].n_pairs == 1 and out["test-train"].n_docs == 2
    assert out["train-train"].n_pairs == 1 and out["train-train"].n_docs == 2
    assert "test-test" not in out


def test_sq8_error_bounded_by_half_quantization_step(spark):
    """SQ8 theory: per-element reconstruction error ≤ scale/2 where
    scale=(max-min)/255; rmse ≤ max error; a constant vector costs 0."""
    from finance_data_pipeline_spark.extensions import similarity

    rows = [
        (1, [0.0, 0.5, 1.0], "a"),       # 0 and 1 land on grid exactly
        (2, [2.0, 2.0, 2.0], "b"),       # constant -> zero error
        (3, [-1.0, 0.3333, 1.0], "a"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r.label: r for r in similarity.sq8_error_report(emb).collect()}
    assert out["b"].avg_rmse_q8 == 0.0 and out["b"].max_abs_err_q8 == 0.0
    bound = 2.0 / 255.0 / 2.0 + 1e-9    # widest range is [-1, 1]
    assert 0.0 < out["a"].max_abs_err_q8 <= round(bound, 6) + 1e-6
    assert out["a"].avg_rmse_q8 <= out["a"].max_abs_err_q8


def test_transition_matrix_rows_normalize_to_one(spark):
    """Each current-type row of the Markov matrix sums to probability
    ~1, and counts are conserved (sum of transitions = events - one
    per user timeline)."""
    from finance_data_pipeline_spark.registry import QUERIES

    out = QUERIES["event_transition_matrix"](spark, "/root/testdata/sf0.001").collect()
    by_cur = {}
    for r in out:
        by_cur.setdefault(r.cur_type, []).append(r)
    for cur, rows in by_cur.items():
        assert abs(sum(r.p_next for r in rows) - 1.0) < 1e-4, cur
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in out) == ev.count() - n_users


def test_dau_wau_stickiness_bounds(spark):
    """WAU dominates DAU (a day's actives are inside its trailing
    week), so stickiness sits in (0, 1]; every observed day appears."""
    from finance_data_pipeline_spark.registry import QUERIES

    out = QUERIES["dau_wau_stickiness"](spark, "/root/testdata/sf0.001").collect()
    assert all(r.wau >= r.dau > 0 for r in out)
    assert all(0.0 < r.stickiness <= 1.0 for r in out)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    assert len(out) == n_days


def test_kcore_peels_chains_keeps_triangle(spark):
    """A path graph fully peels at k=2 (endpoints cascade inward); a
    triangle with a pendant keeps exactly the triangle at degree 2."""
    from finance_data_pipeline_spark.extensions import graph

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    assert graph.kcore(path, k=2, rounds=4).count() == 0

    tri = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (12, 13)], "id_a long, id_b long"
    )
    out = {r.node: r.core_degree for r in graph.kcore(tri, k=2, rounds=4).collect()}
    assert out == {10: 2, 11: 2, 12: 2}


def test_kcore_default_rounds_converged_on_dup_graph(spark):
    """The registry's 4 peel rounds must have reached the fixpoint on
    the real near-dup graph (round 5 changes nothing), so the bounded
    oracle equals true 2-core semantics there."""
    from finance_data_pipeline_spark.extensions import dedup, graph

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.near_dup_pairs(docs, threshold=0.7).select("id_a", "id_b")
    pairs = pairs.localCheckpoint()
    r4 = sorted(map(tuple, graph.kcore(pairs, rounds=4).collect()))
    r5 = sorted(map(tuple, graph.kcore(pairs, rounds=5).collect()))
    assert r4 == r5


def test_epoch_shuffle_permutes_differently_per_epoch(spark):
    """Different epochs give different orders over the same docs; the
    permutation is deterministic per epoch, positions are dense 1..n
    per shard, and every doc appears exactly once."""
    from finance_data_pipeline_spark.extensions import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e1 = sampling.epoch_shuffle(docs, epoch=1, n_shards=8)
    e2 = sampling.epoch_shuffle(docs, epoch=2, n_shards=8)
    r1 = sorted(map(tuple, e1.collect()))
    r2 = sorted(map(tuple, e2.collect()))
    assert r1 != r2                                   # epoch changes the permutation
    assert r1 == sorted(map(tuple, sampling.epoch_shuffle(docs, 1, 8).collect()))
    assert len(r1) == docs.count()
    assert len({d for d, _, _ in r1}) == docs.count()
    by_shard = {}
    for _, s, p in r1:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.epoch_shuffle(docs, 1, n_shards=5)


def test_indexed_bm25_matches_from_scratch_and_prunes(spark, tmp_path):
    """The materialized inverted index must (a) reproduce bm25_topk's
    exact rows for the same query doc, (b) push the term IN-list into
    the postings scan, and (c) lay postings out range-sorted on the
    term hash."""
    import glob
    import os

    from finance_data_pipeline_spark.extensions import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "bm25_idx")
    text.build_text_index(docs, idx, n_files=4)

    qtext = docs.filter(F.col("doc_id") == 2).select("text").first().text
    got = text.bm25_topk_indexed(spark, idx, qtext, k=10, exclude_id=2)
    want = (
        text.bm25_topk(docs, n_queries=3, k=10)
        .filter(F.col("query_id") == 2)
        .select(F.col("neighbor_id").alias("doc_id"), "score")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(_h" in plan

    files = sorted(
        f for f in glob.glob(os.path.join(idx, "postings", "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    )
    assert len(files) == 4
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(names["_h"]).statistics
        lo = st.min
        hi = pq.ParquetFile(f).metadata.row_group(md.num_row_groups - 1).column(
            names["_h"]
        ).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_indexed_ivf_prunes_partitions_and_matches_bruteforce(spark, tmp_path):
    """ann_search_ivf_indexed must (a) equal a numpy brute-force cosine
    ranking over exactly the probed cells' members, (b) equal global
    brute force when probing every cell, and (c) show the cell IN-list
    as a partition filter (directory pruning, not row filtering)."""
    import numpy as np

    from finance_data_pipeline_spark.extensions import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(emb, idx, n_cells=8)

    qrow = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in qrow.embedding]

    got = similarity.ann_search_ivf_indexed(spark, idx, qvec, k=5, n_probe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    rows = got.collect()
    cells = spark.read.parquet(f"{idx}/cells")
    probed = {r.cell for r in rows}
    members = cells.filter(F.col("cell").isin([int(c) for c in probed])).collect()
    qn = np.asarray(qvec) / np.linalg.norm(qvec)
    exact = sorted(
        (
            (round(float(np.dot(qn, np.asarray(m.embedding) / max(np.linalg.norm(m.embedding), 1e-12))), 6), -m.vec_id)
            for m in members
        ),
        reverse=True,
    )
    got_pairs = [(r.cosine, -r.vec_id) for r in rows]
    # the probed-cell brute force must agree on every returned row
    assert got_pairs == exact[: len(got_pairs)]

    full = similarity.ann_search_ivf_indexed(spark, idx, qvec, k=5, n_probe=8)
    allm = cells.collect()
    exact_all = sorted(
        (
            (round(float(np.dot(qn, np.asarray(m.embedding) / max(np.linalg.norm(m.embedding), 1e-12))), 6), -m.vec_id)
            for m in allm
        ),
        reverse=True,
    )[:5]
    assert [(r.cosine, -r.vec_id) for r in full.collect()] == exact_all


def test_contrastive_pairs_labels_and_no_overlap(spark):
    """Positives are exactly the verified near-dup pairs; negatives
    never repeat a positive pair; every pair is ordered id_a < id_b."""
    from finance_data_pipeline_spark.extensions import dedup, sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sampling.contrastive_pairs(docs).collect()
    pos = {(r.id_a, r.id_b) for r in out if r.pair_type == "positive"}
    neg = {(r.id_a, r.id_b) for r in out if r.pair_type == "negative"}
    want_pos = {
        (r.id_a, r.id_b)
        for r in dedup.near_dup_pairs(docs, threshold=0.7).collect()
    }
    assert pos == want_pos
    assert not pos & neg
    assert all(a < b for a, b in pos | neg)
    # At sf0.001 the 256 hash buckets per source are sparse (500 docs),
    # so negatives are few; at corpus scale buckets fill and negatives
    # dominate. Here just require the mechanism produced some.
    assert len(neg) > 0


def test_merge_text_index_equals_full_rebuild(spark, tmp_path):
    """Folding a new batch into an existing index must equal rebuilding
    from the union corpus: same postings set, same term dfs, same
    stats, and identical BM25 answers."""
    from finance_data_pipeline_spark.extensions import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    p_old = str(tmp_path / "idx_old")
    p_merged = str(tmp_path / "idx_merged")
    p_full = str(tmp_path / "idx_full")
    text.build_text_index(old, p_old, n_files=4)
    text.merge_text_index(spark, p_old, new, p_merged, n_files=4)
    text.build_text_index(docs, p_full, n_files=4)

    for sub in ("postings", "terms", "stats"):
        a = sorted(map(tuple, spark.read.parquet(f"{p_merged}/{sub}").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{p_full}/{sub}").collect()))
        assert a == b, sub

    qtext = docs.filter(F.col("doc_id") == 2).select("text").first().text
    got = text.bm25_topk_indexed(spark, p_merged, qtext, k=10, exclude_id=2)
    want = text.bm25_topk_indexed(spark, p_full, qtext, k=10, exclude_id=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_ivf_add_appends_without_rewriting_old_files(spark, tmp_path):
    """Adding a batch must leave every pre-existing cell file untouched
    (append-only ingestion), route new vectors with the SAME centroids
    a full build over the union would use, and serve searches over the
    union corpus."""
    import glob
    import os

    from finance_data_pipeline_spark.extensions import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    idx = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(old, idx, n_cells=8)

    def inventory():
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(idx, "cells", "cell=*", "*.parquet"))
        }

    before = inventory()
    similarity.add_to_ivf_index(new, idx)
    after = inventory()
    assert set(before) <= set(after)
    assert all(after[f] == m for f, m in before.items())   # old files untouched
    assert len(after) > len(before)

    cells = spark.read.parquet(f"{idx}/cells")
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    got = similarity.ann_search_ivf_indexed(spark, idx, qvec, k=5, n_probe=8)
    # probing every cell == exact: vec 0 itself must rank first
    assert got.first().vec_id == 0


# --- calendar_fill / resample_ohlc / k_anonymity / zorder ---------------


def test_calendar_fill_densifies_and_forward_fills(spark):
    from finance_data_pipeline_spark import indicators

    s = spark.createDataFrame(
        [
            ("A", "2024-01-01", 10.0, 100),
            ("A", "2024-01-04", 13.0, 400),   # 2-day gap before this row
            ("B", "2024-02-01", 5.0, 50),     # single-day symbol
        ],
        "symbol string, date string, close double, volume long",
    ).select("symbol", F.col("date").cast("date").alias("date"), "close", "volume")
    out = indicators.calendar_fill(s).orderBy("symbol", "date").collect()
    a = [r for r in out if r.symbol == "A"]
    assert [str(r.date) for r in a] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    ]
    assert [r.is_filled for r in a] == [False, True, True, False]
    assert [r.close_ffill for r in a] == [10.0, 10.0, 10.0, 13.0]
    assert [r.volume for r in a] == [100, 0, 0, 400]
    b = [r for r in out if r.symbol == "B"]
    # span is per-symbol: B stays one row, never densified into A's range
    assert len(b) == 1 and b[0].is_filled is False


def test_resample_ohlc_picks_first_open_last_close(spark):
    from finance_data_pipeline_spark import indicators

    s = spark.createDataFrame(
        [
            # one ISO week (Mon 2024-01-01 .. Sun 2024-01-07), out of order
            ("A", "2024-01-03", 20.0, 25.0, 19.0, 24.0, 300),
            ("A", "2024-01-01", 10.0, 15.0, 9.0, 14.0, 100),
            ("A", "2024-01-05", 30.0, 35.0, 29.0, 34.0, 500),
            # next week
            ("A", "2024-01-08", 40.0, 45.0, 39.0, 44.0, 800),
        ],
        "symbol string, date string, open double, high double, low double,"
        " close double, volume long",
    ).select(
        "symbol", F.col("date").cast("date").alias("date"),
        "open", "high", "low", "close", "volume",
    )
    out = indicators.resample_ohlc(s, grain="week").orderBy("bucket_start").collect()
    assert len(out) == 2
    w1 = out[0]
    assert str(w1.bucket_start) == "2024-01-01"
    assert w1.open == 10.0     # Monday's open, not the max/min
    assert w1.close == 34.0    # Friday's close
    assert (w1.high, w1.low, w1.volume, w1.n_bars) == (35.0, 9.0, 900, 3)


def test_k_anonymity_flags_small_classes(spark):
    from finance_data_pipeline_spark import quality

    df = spark.createDataFrame(
        [("US", "A")] * 5 + [("US", "B")] * 2 + [("FR", "A")],
        "country string, seg string",
    )
    out = {
        (r.country, r.seg): (r.class_n, r.at_risk)
        for r in quality.k_anonymity(df, ["country", "seg"], k=5).collect()
    }
    assert out[("US", "A")] == (5, False)
    assert out[("US", "B")] == (2, True)
    assert out[("FR", "A")] == (1, True)


def test_zorder_expr_is_morton_interleave():
    from finance_data_pipeline_spark.operators.relational import zorder_expr

    def morton(x, y, bits):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    expr = zorder_expr("xb", "yb", 4)
    for xb in (0, 3, 7, 15):
        for yb in (0, 5, 10, 15):
            assert eval(expr) == morton(xb, yb, 4)


def test_zorder_layout_stats_invariants(spark):
    from finance_data_pipeline_spark.operators import relational as rel

    # dense 32x32 integer grid: every (x, y) cell once
    g = spark.range(32 * 32).selectExpr("id DIV 32 AS x", "id % 32 AS y")
    out = {
        r.layout: r
        for r in rel.zorder_layout_stats(
            g, "x", "y", n_files=16, bits=5, rect_tenths=(4, 6)
        ).collect()
    }
    assert set(out) == {"linear_x", "linear_y", "zorder"}
    # identical true selectivity regardless of layout
    match = {r.rows_match for r in out.values()}
    assert len(match) == 1 and match.pop() > 0
    for r in out.values():
        assert r.files_total == 16
        assert 1 <= r.files_hit <= 16
        assert r.rows_scanned >= r.rows_match
    # on a uniform grid the Morton layout prunes at least as well as the
    # better linear layout (2-D blocks vs 1-D stripes)
    assert out["zorder"].rows_scanned <= min(
        out["linear_x"].rows_scanned, out["linear_y"].rows_scanned
    )


def test_cms_join_size_exact_when_collision_free(spark):
    from finance_data_pipeline_spark.operators import relational as rel

    left = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    right = spark.createDataFrame([(i,) for i in range(3)], "k long")
    r = rel.cms_join_size(left, right, "k", "k").collect()[0]
    # keys 0,1,2 appear 10x each on the left -> exact join size 30; with
    # 8 distinct keys in a width-8192 sketch, collisions are absent and
    # the CMS inner product is exact
    assert r.exact_rows == 30
    assert r.est_rows == 30


def test_cms_join_size_disjoint_keys_estimates_zero(spark):
    from finance_data_pipeline_spark.operators import relational as rel

    left = spark.createDataFrame([(i,) for i in range(10)], "k long")
    right = spark.createDataFrame([(i,) for i in range(100, 110)], "k long")
    r = rel.cms_join_size(left, right, "k", "k").collect()[0]
    assert r.exact_rows == 0
    # a depth row with no overlapping cells proves disjointness -> 0,
    # not "min over the rows that happened to collide"
    assert r.est_rows == 0


def test_cms_join_size_always_upper_bound(spark):
    from finance_data_pipeline_spark.operators import relational as rel

    left = spark.createDataFrame([(i % 37,) for i in range(500)], "k long")
    right = spark.createDataFrame([(i % 53,) for i in range(400)], "k long")
    r = rel.cms_join_size(left, right, "k", "k").collect()[0]
    assert r.est_rows >= r.exact_rows > 0
