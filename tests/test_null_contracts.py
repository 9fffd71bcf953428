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

from finance_data_pipeline_spark.operators import relational as rel


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
