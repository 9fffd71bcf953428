"""Guards for the adversarial-probe table builders (tools/): the
probes are the robustness gate for every oracle query, so their
synthetic tables must stay schema-compatible with the driver corpora
and bit-deterministic (a drifting builder would turn probe diffs into
noise). Pure pandas/pyarrow — no Spark session needed."""

import duckdb
import pandas as pd

REAL_SF = "/root/testdata/sf0.001"


def _real_columns(table: str) -> list[str]:
    con = duckdb.connect()
    return list(
        con.sql(f"SELECT * FROM '{REAL_SF}/{table}.parquet' LIMIT 0").df().columns
    )


def test_docs_builder_schema_and_determinism():
    from tools.adversarial_docs_probe import build_documents_pdf, build_embeddings_pdf

    d1, d2 = build_documents_pdf(), build_documents_pdf()
    assert list(d1.columns) == _real_columns("documents")
    pd.testing.assert_frame_equal(d1, d2)
    # n_chars must be consistent with text (several queries derive it)
    assert (d1["n_chars"] == d1["text"].str.len()).all()
    assert d1["doc_id"].is_unique
    # the shapes the probe exists for
    assert (d1["text"] == "").any()
    assert d1["text"].duplicated().any()

    e1, e2 = build_embeddings_pdf(), build_embeddings_pdf()
    pd.testing.assert_frame_equal(e1, e2)
    assert e1["vec_id"].is_unique
    assert (e1["vec_id"] == range(len(e1))).all()  # dense 0-based (train_n)
    has_null = e1["embedding"].isna().any()
    dims = {len(v) for v in e1["embedding"] if v is not None}
    assert has_null and dims == {64}
    assert any(v is not None and all(x == 0.0 for x in v) for v in e1["embedding"])


def test_events_builder_schema_and_determinism():
    from tools.adversarial_events_probe import build_events_pdf

    p1, p2 = build_events_pdf(), build_events_pdf()
    assert list(p1.columns) == _real_columns("events")
    pd.testing.assert_frame_equal(p1, p2)
    assert p1["event_id"].is_unique
    # timestamp ties and malformed props are the point
    assert p1.duplicated(subset=["user_id", "ts"]).any()
    assert (p1["props"] == "{not json}").any()
    assert p1["props"].isna().any()


def test_tpch_builder_schema_and_determinism():
    from tools.adversarial_tpch_probe import build_tables

    t1, t2 = build_tables(), build_tables()
    assert set(t1) == {
        "region", "nation", "supplier", "customer", "orders", "lineitem", "part",
    }
    for name, pdf in t1.items():
        assert list(pdf.columns) == _real_columns(name), name
        pd.testing.assert_frame_equal(pdf, t2[name])
    orders, lineitem, customer = t1["orders"], t1["lineitem"], t1["customer"]
    assert orders["o_orderkey"].is_unique
    assert not lineitem.duplicated(subset=["l_orderkey", "l_linenumber"]).any()
    assert str(orders["o_orderdate"].dtype) == "datetime64[us]"
    assert str(lineitem["l_shipdate"].dtype) == "datetime64[us]"
    # the dirty shapes: NULL keys, FK orphans, orderless customers,
    # lineless orders
    assert orders["o_custkey"].isna().any()
    assert not set(orders["o_custkey"].dropna()) <= set(customer["c_custkey"])
    assert (~customer["c_custkey"].isin(orders["o_custkey"].dropna())).any()
    assert (~orders["o_orderkey"].isin(lineitem["l_orderkey"])).any()


def test_bars_builder_determinism():
    from tools.adversarial_bars_probe import build_events_pdf

    p1, p2 = build_events_pdf(), build_events_pdf()
    assert list(p1.columns) == _real_columns("events")
    pd.testing.assert_frame_equal(p1, p2)
    assert p1["event_id"].is_unique


def test_natural_text_builder_schema_and_determinism():
    from tools.natural_text_probe import build_documents_pdf

    d1, d2 = build_documents_pdf(), build_documents_pdf()
    assert list(d1.columns) == _real_columns("documents")
    pd.testing.assert_frame_equal(d1, d2)
    assert (d1["n_chars"] == d1["text"].str.len()).all()
    assert d1["doc_id"].is_unique
    # the shapes THIS probe exists for: sentence terminators and the
    # Gopher stop set present in the bulk (primary-branch coverage)
    import re

    stop = set("the be to of and that have with".split())
    hits = d1["text"].apply(
        lambda t: sum(w in stop for w in re.findall(r"[a-z]+", t.lower()))
    )
    assert (hits > 0).mean() > 0.9  # stopwords are the NORM here
    assert d1["text"].str.contains(r"[.!?]").mean() > 0.95
    assert d1["text"].str.contains("\n").any()  # multi-line paragraphs
    assert d1["text"].duplicated().any()  # dedup structure
