#!/usr/bin/env python
"""Deterministic R× upsample of a driver SF dir for the growth probe.

Produces a corpus ~R× the source in every fact table while preserving
the star-schema invariants the registry queries rely on, so runtime
growth factors between the source SF and the upsampled dir measure
PLAN scaling, not data corruption:

* Key integrity — every BIGINT primary/foreign key is offset by
  ``i * STRIDE`` per replica ``i``, consistently across tables
  (orders.o_custkey matches the replica's customer.c_custkey, lineitem
  FKs match the replica's orders/part/supplier). Dimension tables
  ``region``/``nation`` are NOT replicated (TPC-H semantics: facts
  scale, dims don't), so per-nation groups simply get R× the rows.
* Fixture determinism — fixtures.py builds OHLCV bars from ``events``
  with ``min_by(value, ts)``, which needs ``ts`` unique within each
  (symbol, date) group. The stride is a multiple of 100, so replica
  users fold onto the SAME symbols (R× deeper per-bar input, identical
  bar grid — the realistic scale direction), and each replica shifts
  ``ts`` by ``i`` microseconds: source timestamps are second-aligned,
  so shifted rows can never collide with any other replica's.
* Near-dup realism — replica documents get a per-replica suffix
  appended to every token (``regexp_replace(text, '(\\S+)', '\\1xi')``)
  so word shingles never match across replicas: the dup-pair structure
  scales ~linearly (R× the sf0.1 groups) instead of exploding
  quadratically inside artificial R-clone groups, which would measure
  pair-emission semantics rather than plan scaling. ``n_chars`` is
  recomputed from the mutated text.
* Embedding diversity — replica vectors are rotated by ``i`` positions
  (norm- and distribution-preserving, direction-decorrelating), so ANN
  / semantic-dedup candidate structure also scales ~linearly.

Output layout matches the driver dirs (one ``<table>.parquet`` per
table), so any ``(spark, sf_dir)`` registry callable runs against it
unchanged. Pure DuckDB, seedless, bit-deterministic.

Usage:
    python tools/sf_upsample.py [SRC_DIR] [DST_DIR] [REPLICAS]
Defaults: /root/testdata/sf0.1 -> <repo>/.probe_data/sf1, R=10.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRIDE = 10_000_000  # > any source key; multiple of 100 (symbol folding)

# Per-table projection templates. ``{i}``-free columns pass through;
# key columns add the replica offset. Types are pinned with CASTs so
# the upsampled parquet schema is byte-compatible with the driver's.
FACT_SQL = {
    "customer": """
        SELECT CAST(c_custkey + i * {S} AS BIGINT) AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM src CROSS JOIN reps
    """,
    "supplier": """
        SELECT CAST(s_suppkey + i * {S} AS BIGINT) AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM src CROSS JOIN reps
    """,
    "part": """
        SELECT CAST(p_partkey + i * {S} AS BIGINT) AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src CROSS JOIN reps
    """,
    "orders": """
        SELECT CAST(o_orderkey + i * {S} AS BIGINT) AS o_orderkey,
               CAST(o_custkey + i * {S} AS BIGINT) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src CROSS JOIN reps
    """,
    "lineitem": """
        SELECT CAST(l_orderkey + i * {S} AS BIGINT) AS l_orderkey,
               CAST(l_partkey + i * {S} AS BIGINT) AS l_partkey,
               CAST(l_suppkey + i * {S} AS BIGINT) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src CROSS JOIN reps
    """,
    "events": """
        SELECT CAST(event_id + i * {S} AS BIGINT) AS event_id,
               ts + to_microseconds(CAST(i AS BIGINT)) AS ts,
               CAST(user_id + i * {S} AS BIGINT) AS user_id,
               event_type, value, props
        FROM src CROSS JOIN reps
    """,
    "documents": r"""
        SELECT CAST(doc_id + i * {S} AS BIGINT) AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\S+)',
                                        '\1x' || CAST(i AS VARCHAR), 'g')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\S+)',
                                        '\1x' || CAST(i AS VARCHAR), 'g')
               END) AS BIGINT) AS n_chars
        FROM src CROSS JOIN reps
    """,
    "embeddings": """
        SELECT CAST(vec_id + i * {S} AS BIGINT) AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE embedding[(i + 1):] || embedding[1:i]
               END AS embedding,
               label
        FROM src CROSS JOIN reps
    """,
}
DIM_TABLES = ("region", "nation")

# Every column the templates offset by ``i * STRIDE``. Validated against
# the source before writing: a source key >= STRIDE (e.g. lineitem
# orderkeys at sf>=2) would silently collide replica key ranges,
# corrupting PK/FK structure and invalidating the probe's growth factors.
OFFSET_KEYS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def upsample(src_dir: str, dst_dir: str, replicas: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for name, keys in OFFSET_KEYS.items():
        bounds = con.execute(
            "SELECT " + ", ".join(f"min({k}), max({k})" for k in keys)
            + f" FROM '{src_dir}/{name}.parquet'"
        ).fetchone()
        for idx, key in enumerate(keys):
            mn, mx = bounds[2 * idx], bounds[2 * idx + 1]
            if mx is not None and mx >= STRIDE:
                raise SystemExit(
                    f"STRIDE {STRIDE} too small: {name}.{key} max is {mx}; "
                    f"replica key ranges would collide. Raise STRIDE."
                )
            # ADVICE r8: a negative source key would let replica i's
            # offset range [i*S + mn, i*S + mx] dip into replica i-1's.
            if mn is not None and mn < 0:
                raise SystemExit(
                    f"negative source key: {name}.{key} min is {mn}; "
                    f"replica key ranges would collide. Keys must be >= 0."
                )
    con.execute(f"CREATE TEMP TABLE reps AS SELECT range AS i FROM range({replicas})")
    for name in DIM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src_dir}/{name}.parquet') "
            f"TO '{dst_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: copied (dimension, not replicated)")
    for name, tmpl in FACT_SQL.items():
        sql = tmpl.format(S=STRIDE)
        con.execute(f"CREATE OR REPLACE TEMP VIEW src AS SELECT * FROM '{src_dir}/{name}.parquet'")
        con.execute(
            f"COPY ({sql}) TO '{dst_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst_dir}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".probe_data", "sf1")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upsample(src, dst, reps)


if __name__ == "__main__":
    main()
