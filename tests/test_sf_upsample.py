"""Guards for the growth-probe upsampler (tools/sf_upsample.py): the
sf0.1 -> ~sf1 growth factors in GROWTH_PROBE.json are only meaningful
if the upsampled corpus preserves the star-schema invariants the
registry queries rely on — schema parity, FK integrity, ts-uniqueness
inside the OHLCV fixture groups, and linear (not clone-quadratic)
near-dup structure. Pure DuckDB on sf0.001 with R=3 — fast, no Spark."""

import os

import duckdb
import pytest

REAL_SF = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def up_dir(tmp_path_factory):
    from tools.sf_upsample import upsample

    dst = str(tmp_path_factory.mktemp("up") / "sf3x")
    upsample(REAL_SF, dst, replicas=3)
    return dst


def _schema(con, path):
    return [(r[0], r[1]) for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]


def test_schema_parity_and_row_counts(up_dir):
    con = duckdb.connect()
    for t in TABLES:
        real, up = f"{REAL_SF}/{t}.parquet", f"{up_dir}/{t}.parquet"
        assert _schema(con, real) == _schema(con, up), t
        n_real = con.execute(f"SELECT count(*) FROM '{real}'").fetchone()[0]
        n_up = con.execute(f"SELECT count(*) FROM '{up}'").fetchone()[0]
        expect = n_real if t in ("region", "nation") else 3 * n_real
        assert n_up == expect, (t, n_real, n_up)


def test_fk_integrity(up_dir):
    con = duckdb.connect()
    for fact, key, dim, dkey in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ]:
        orphans = con.execute(
            f"SELECT count(*) FROM '{up_dir}/{fact}.parquet' f "
            f"LEFT JOIN '{up_dir}/{dim}.parquet' d ON f.{key} = d.{dkey} "
            f"WHERE d.{dkey} IS NULL"
        ).fetchone()[0]
        assert orphans == 0, (fact, key)


def test_fixture_ts_uniqueness_and_symbol_folding(up_dir):
    con = duckdb.connect()
    # fixtures.py min_by/max_by determinism: ts unique within (symbol, date)
    dup = con.execute(
        f"SELECT coalesce(max(c), 0) FROM (SELECT user_id % 100, "
        f"date_trunc('day', ts), ts, count(*) c "
        f"FROM '{up_dir}/events.parquet' GROUP BY 1, 2, 3)"
    ).fetchone()[0]
    assert dup <= 1
    # STRIDE is a multiple of 100: replicas fold onto the same symbols
    n_sym_real = con.execute(
        f"SELECT count(DISTINCT user_id % 100) FROM '{REAL_SF}/events.parquet'"
    ).fetchone()[0]
    n_sym_up = con.execute(
        f"SELECT count(DISTINCT user_id % 100) FROM '{up_dir}/events.parquet'"
    ).fetchone()[0]
    assert n_sym_up == n_sym_real


def test_documents_scale_linearly_not_clonewise(up_dir):
    con = duckdb.connect()
    # replica texts are token-mutated, so cross-replica near-dup groups
    # don't form: distinct-text count scales by exactly R (every source
    # text, duplicated or not, maps to R distinct mutated variants)
    d_real = con.execute(
        f"SELECT count(DISTINCT text) FROM '{REAL_SF}/documents.parquet'"
    ).fetchone()[0]
    d_up = con.execute(
        f"SELECT count(DISTINCT text) FROM '{up_dir}/documents.parquet'"
    ).fetchone()[0]
    assert d_up == 3 * d_real
    # n_chars stays consistent with the mutated text (queries derive it)
    bad = con.execute(
        f"SELECT count(*) FROM '{up_dir}/documents.parquet' "
        f"WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_embeddings_rotation_preserves_norms(up_dir):
    con = duckdb.connect()
    # rotation preserves each vector's norm set exactly
    q = (
        "SELECT count(DISTINCT round(sqrt(list_sum("
        "list_transform(embedding, x -> x * x))), 3)) FROM '{p}' "
        "WHERE embedding IS NOT NULL"
    )
    n_real = con.execute(q.format(p=f"{REAL_SF}/embeddings.parquet")).fetchone()[0]
    n_up = con.execute(q.format(p=f"{up_dir}/embeddings.parquet")).fetchone()[0]
    assert n_up == n_real
    # ids stay unique across replicas
    dup_ids = con.execute(
        f"SELECT count(*) - count(DISTINCT vec_id) FROM '{up_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert dup_ids == 0


def test_determinism(up_dir, tmp_path):
    from tools.sf_upsample import upsample

    dst2 = str(tmp_path / "again")
    upsample(REAL_SF, dst2, replicas=3)
    con = duckdb.connect()
    for t in ("lineitem", "documents", "embeddings", "events"):
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT * FROM '{up_dir}/{t}.parquet' EXCEPT "
            f" SELECT * FROM '{dst2}/{t}.parquet') UNION ALL "
            f"(SELECT * FROM '{dst2}/{t}.parquet' EXCEPT "
            f" SELECT * FROM '{up_dir}/{t}.parquet'))"
        ).fetchone()[0]
        assert diff == 0, t


def test_stride_collision_guard(tmp_path):
    """ADVICE r7: a source key >= STRIDE must fail loudly, not silently
    produce colliding replica key ranges."""
    import tools.sf_upsample as u

    src = str(tmp_path / "bad_src")
    os.makedirs(src)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{REAL_SF}/{t}.parquet') "
            f"TO '{src}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(doc_id + {u.STRIDE} AS BIGINT) AS doc_id) "
        f"FROM '{REAL_SF}/documents.parquet') "
        f"TO '{src}/documents.parquet' (FORMAT PARQUET)"
    )
    with pytest.raises(SystemExit, match="STRIDE .* too small"):
        u.upsample(src, str(tmp_path / "dst"), replicas=2)


def test_negative_key_guard(tmp_path):
    """ADVICE r8: a negative source key must fail loudly — replica i's
    offset range [i*S + min, i*S + max] would dip into replica i-1's."""
    import tools.sf_upsample as u

    src = str(tmp_path / "neg_src")
    os.makedirs(src)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{REAL_SF}/{t}.parquet') "
            f"TO '{src}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        "COPY (SELECT * REPLACE (CAST(doc_id - 1000000 AS BIGINT) AS doc_id) "
        f"FROM '{REAL_SF}/documents.parquet') "
        f"TO '{src}/documents.parquet' (FORMAT PARQUET)"
    )
    with pytest.raises(SystemExit, match="negative source key"):
        u.upsample(src, str(tmp_path / "dst"), replicas=2)


def test_offset_keys_cover_every_fact_table():
    """Every replicated table must have its offset columns validated —
    a FACT_SQL entry without an OFFSET_KEYS entry would skip the guard."""
    import tools.sf_upsample as u

    assert set(u.OFFSET_KEYS) == set(u.FACT_SQL)
