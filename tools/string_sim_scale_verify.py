#!/usr/bin/env python
"""Scale verification for ``string_sim_join`` at an upsampled SF dir.

The round-7 sf1 sweep could not row-level-compare ``string_sim_join``
at sf1 — not because the oracle is infeasible (word-token vocab is far
smaller than char 4-grams) but because the 51M-pair result set does
not fit through the harness's toPandas compare. This tool closes that
gap the same way tools/ngram_sf1_verify.py closes ngram's, with two
independent checks at any SF dir:

1. **Subset row-level parity** (strict driver-equivalent comparator):
   documents restricted to ``doc_id % MOD == res`` shrink the pair
   space MOD^2-fold so the full strict comparator checks every row.
   The upsample STRIDE (10M) is a multiple of MOD=20, so the subset
   keeps every replica of each selected source doc — the cross-replica
   structure stays in-subset. Two residues (0 and 7).

2. **Full-corpus aggregate parity** (cross-engine, exact): count,
   sum(id_a), sum(id_b), and DECIMAL(38,6) sum(round(jaccard,6)) over
   the FULL output, computed independently by Spark and by DuckDB
   running the registry's own oracle SQL — aggregates fit in one row,
   so this compares every pair's contribution without materializing
   the pair set in pandas.

Usage: python tools/string_sim_scale_verify.py [SF_DIR] [MOD]
Defaults: <repo>/.probe_data/sf2, MOD=20.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from finance_data_pipeline_spark.extensions import dedup
    from finance_data_pipeline_spark.io import table
    from finance_data_pipeline_spark.registry import ORACLES
    from finance_data_pipeline_spark.session import get_spark
    from tools.mini_driver import _canon
    from tools.parity_compare import values_match

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".probe_data", "sf2")
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    oracle_sql = ORACLES["string_sim_join"]

    spark = get_spark(app_name="string-sim-scale-verify")
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = f"{sf_dir}/documents.parquet"
    docs = table(spark, sf_dir, "documents")

    n_fail = 0
    for res in (0, 7 % mod):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{docs_path}' "
            f"WHERE doc_id % {mod} == {res}"
        )
        t0 = time.time()
        sub = docs.filter(F.col("doc_id") % mod == res)
        out = dedup.string_sim_join(sub, threshold=0.7).select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
        )
        spark_pdf = out.toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
        oracle_pdf = con.sql(oracle_sql).df()
        t_oracle = time.time() - t0
        errs = []
        if len(spark_pdf) != len(oracle_pdf):
            errs.append(f"rows {len(spark_pdf)} vs {len(oracle_pdf)}")
        else:
            s, o = _canon(spark_pdf), _canon(oracle_pdf)
            for col in s.columns:
                if errs:
                    break
                for i, (a, b) in enumerate(zip(s[col].tolist(), o[col].tolist())):
                    if not values_match(a, b):
                        errs.append(f"value {col}[{i}]: {a!r} vs {b!r}")
                        break
        status = "ok" if not errs else f"FAIL {errs}"
        n_fail += bool(errs)
        print(
            f"subset doc_id%{mod}=={res}: {len(spark_pdf)} pairs, {status}"
            f" (spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)",
            flush=True,
        )
        con.close()

    # Full-corpus aggregate parity: one row per engine, exact compare.
    t0 = time.time()
    agg = (
        dedup.string_sim_join(docs, threshold=0.7)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .agg(
            F.count("*").alias("n"),
            F.sum("id_a").alias("sum_a"),
            F.sum("id_b").alias("sum_b"),
            F.sum(F.col("jaccard").cast("decimal(38,6)")).alias("sum_j"),
        )
        .first()
    )
    t_spark = time.time() - t0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'")
    t0 = time.time()
    drow = con.sql(
        "SELECT count(*) AS n, sum(id_a) AS sum_a, sum(id_b) AS sum_b, "
        "sum(CAST(jaccard AS DECIMAL(38,6))) AS sum_j "
        f"FROM ({oracle_sql})"
    ).fetchone()
    t_oracle = time.time() - t0
    pairs = list(zip([agg["n"], agg["sum_a"], agg["sum_b"], agg["sum_j"]], drow))
    agg_ok = all(values_match(a, b) for a, b in pairs)
    n_fail += not agg_ok
    print(
        f"full-corpus aggregates (spark {t_spark:.1f}s, oracle {t_oracle:.1f}s): "
        f"count={agg['n']} sum_id_a={agg['sum_a']} sum_id_b={agg['sum_b']} "
        f"sum_jaccard={agg['sum_j']} -> "
        + ("MATCH" if agg_ok else f"MISMATCH duckdb={drow}"),
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
