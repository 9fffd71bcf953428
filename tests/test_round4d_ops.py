"""Edge semantics for the round-4 batch-2 operators: Ichimoku shifts,
KS/PSI drift, Mann-Whitney midranks, the dedup stage funnel. (Oracle
parity for the registry entries is covered by tests/test_oracle_parity.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finance_data_pipeline_spark import indicators as ind
from finance_data_pipeline_spark.extensions import dedup


def test_ichimoku_shifts_land_on_the_right_rows(spark):
    """senkou lines lag their source by 26 bars; chikou leads close by
    26 — verify the alignment on a linear series where every midline
    is computable by hand."""
    rows = [("A", t, float(t), float(t), float(t), float(t), 1) for t in range(1, 61)]
    b = spark.createDataFrame(
        rows,
        "symbol string, bar_ts long, open double, high double, low double, close double, volume long",
    )
    out = {r.bar_ts: r for r in ind.with_ichimoku(b).collect()}
    # linear prices: tenkan at t (t>=9) = (t + t-8)/2 = t - 4
    assert out[40].tenkan == 36.0
    assert out[40].kijun == 40 - 12.5
    # senkou_a at t = (tenkan + kijun)/2 evaluated at t-26 = 14, where
    # both midlines are still in their min_periods=1 warm-up (windows
    # clipped to bars 1..14): tenkan = (14+6)/2, kijun = (14+1)/2
    assert out[40].senkou_a == (10.0 + 7.5) / 2
    assert out[34].chikou == 60.0  # close 26 bars ahead
    assert out[60].chikou is None  # no bar 26 ahead


def test_ks_statistic_on_disjoint_samples_is_one(spark):
    """Two fully separated samples have KS D = 1; identical samples 0."""
    rows = [("purchase", float(v)) for v in range(10)] + [
        ("view", float(v + 100)) for v in range(10)
    ]
    e = spark.createDataFrame(rows, "event_type string, value double")
    from pyspark.sql import Window

    u = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    w = Window.orderBy("value")
    c = u.select(F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb"))
    d = c.agg(
        F.max(F.abs(F.col("ca") / 10.0 - F.col("cb") / 10.0)).alias("d")
    ).collect()[0].d
    assert d == 1.0


def test_mann_whitney_midranks_handle_ties(spark):
    """Ties take midranks: values [1,1,2] -> ranks [1.5,1.5,3]."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1.0,), (1.0,), (2.0,)], "value double"
    )
    midrank = F.rank().over(Window.orderBy("value")) + (
        F.count("*").over(Window.partitionBy("value")) - 1
    ) / 2.0
    got = sorted(r[0] for r in df.select(midrank).collect())
    assert got == [1.5, 1.5, 3.0]


def test_dedup_stage_funnel_is_monotone_and_accounts_all_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs away home."),
            (2, "the quick brown fox jumps over the lazy dog and runs away home."),
            (3, "an entirely different document, with its own words. it is fine?"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    rows = {r.stage: r for r in dedup.dedup_stage_funnel(docs).collect()}
    assert rows["raw"].docs_out == 4
    assert rows["exact_dedup"].docs_out == 3  # doc 2 is an exact dup
    outs = [
        rows[s].docs_out
        for s in ("raw", "exact_dedup", "near_dedup", "quality_gate")
    ]
    assert outs == sorted(outs, reverse=True)  # monotone nonincreasing
    assert rows["exact_dedup"].docs_removed == 1
    # removed column accounts every drop exactly
    assert sum(
        rows[s].docs_removed
        for s in ("exact_dedup", "near_dedup", "quality_gate")
    ) == 4 - rows["quality_gate"].docs_out


def test_variance_ratio_of_deterministic_trend_exceeds_one(spark):
    """A monotone exponential trend has perfectly correlated returns:
    var(2-bar) = 4·var(1-bar)... for constant growth var is 0 — use an
    alternating two-step pattern instead where vr is computable."""
    # close doubles then halves: r1 alternates +ln2, -ln2 (var > 0);
    # every 2-bar log return is exactly 0 -> vr_2 = 0 (mean reversion).
    closes = []
    c = 100.0
    for i in range(40):
        c = c * 2 if i % 2 == 0 else c / 2
        closes.append(c)
    rows = [("A", t + 1, 0.0, 1.0, 0.0, cl, 1) for t, cl in enumerate(closes)]
    b = spark.createDataFrame(
        rows,
        "symbol string, bar_ts long, open double, high double, low double, close double, volume long",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy("bar_ts")
    r = b.select(
        F.log(F.col("close") / F.lag("close").over(w)).alias("r1"),
        F.log(F.col("close") / F.lag("close", 2).over(w)).alias("r2"),
    )
    v = r.agg(
        F.var_samp("r1").alias("v1"), F.var_samp("r2").alias("v2")
    ).collect()[0]
    assert v.v1 > 0.4
    assert math.isclose(v.v2, 0.0, abs_tol=1e-12)


def test_audio_silence_runs_counts_islands(spark):
    """A clip whose probe bytes are all NULs is one wall-to-wall silent
    run; a clip of 0xFF-ish bytes has zero runs but stays in the
    report."""
    from finance_data_pipeline_spark.extensions import multimodal as mm

    docs = spark.createDataFrame(
        [
            (1, "\x00" * 64, 64),   # doc_id % 3 == 1 -> audio; zero bytes
            (4, "\x7f" * 64, 64),   # 0x7f**2 * 8 = 129032 < 130000 -> silent
            (7, "zzzzzzzz" * 8, 64),  # 'z'=0x7a -> 122**2*8 = 119072 silent too
        ],
        "doc_id long, text string, n_chars long",
    )
    media = mm.synthetic_media(docs)
    out = {r.media_id: r for r in mm.audio_silence_runs(media).collect()}
    # duration_ms = 1000 + (64*7)%5000 = 1448 -> 1448//250 = 5 frames
    assert out[1].n_runs == 1
    assert out[1].n_silent_frames == 5
    assert out[1].longest_run == 5
    assert out[1].first_run_start == 0


def test_audio_silence_runs_loud_clip_reports_zero(spark):
    from finance_data_pipeline_spark.extensions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "ÿ" * 64, 64)], "doc_id long, text string, n_chars long"
    )
    # NB: utf-8 encodes U+00FF as two bytes 0xC3 0xBF -> energy
    # = 8 probes of alternating 0xC3/0xBF squares, far above threshold.
    out = mm.audio_silence_runs(mm.synthetic_media(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_runs, r.n_silent_frames, r.longest_run) == (0, 0, 0)
    assert r.first_run_start is None


def test_bar_gap_report_detects_single_hole(spark):
    import datetime as dt

    rows = [
        ("A", dt.datetime(2024, 1, 1, h), 1.0, 1.0, 1.0, 1.0, 1)
        for h in (0, 1, 3, 4)  # hour 2 missing
    ]
    b = spark.createDataFrame(
        rows,
        "symbol string, bar_ts timestamp, open double, high double, low double, close double, volume long",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy("bar_ts")
    g = b.select(
        "symbol",
        F.unix_timestamp("bar_ts").alias("es"),
        (F.unix_timestamp("bar_ts") - F.unix_timestamp(F.lag("bar_ts").over(w))).alias("gap_s"),
    )
    r = g.groupBy("symbol").agg(
        F.count("*").alias("n_bars"),
        ((F.max("es") - F.min("es")) / 3600 + 1).cast("long").alias("n_expected"),
        (F.max("gap_s") / 3600 - 1).cast("long").alias("longest_gap_hours"),
    ).collect()[0]
    assert (r.n_bars, r.n_expected, r.longest_gap_hours) == (4, 5, 1)


def test_calendar_interpolate_linear_gap_values(spark):
    """A 3-day hole between closes 10 and 18 interpolates to 12/14/16."""
    import datetime as dt

    rows = [
        ("A", dt.date(2024, 1, 1), 10.0),
        ("A", dt.date(2024, 1, 5), 18.0),
    ]
    s = spark.createDataFrame(rows, "symbol string, date date, close double")
    out = {r.date.day: r for r in ind.calendar_interpolate(s).collect()}
    assert [out[d].close_interp for d in (1, 2, 3, 4, 5)] == [10.0, 12.0, 14.0, 16.0, 18.0]
    assert [out[d].is_filled for d in (1, 2, 3, 4, 5)] == [False, True, True, True, False]
