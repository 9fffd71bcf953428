#!/usr/bin/env python
"""sf1 verification for ``ngram_sim_join`` (VERDICT r7 item 5).

The full-row naive 4-gram oracle is infeasible at sf1 — its all-pairs
gram self-join materializes ~3.5e11 intermediate rows (killed after
35 min in the round-7 sweep). This tool closes the adjudicated gap the
way ``string_sim_join``'s was closed, with two independent checks:

1. **Subset row-level parity** (the strong check): documents restricted
   to ``doc_id % MOD == 0`` shrink the oracle's pair space by MOD², so
   the SAME naive DuckDB oracle runs in seconds and the strict
   driver-equivalent comparator (tools/parity_compare.py) checks every
   row. The sf1 stride (10M) is a multiple of MOD, so the subset keeps
   every replica of each selected source doc — the cross-replica
   near-dup structure the upsample creates is inside the subset. The
   subset vocabulary stays far above _MASK_VOCAB_CAP, so the Spark side
   exercises the same prefix-filter dispatch the full corpus does.
   Two residues (0 and 7) double the coverage for free.

2. **Full-corpus Spark aggregates** (the reproducibility anchor):
   count, sum(id_a), sum(id_b), and DECIMAL(38,6) sum(round(jaccard,6))
   over the full sf1 output, printed for BENCH_NOTES. No cross-engine
   compare at full scale (that is exactly the infeasible part); the
   aggregates pin the output so any future plan change that alters a
   single row is visible.

Usage: python tools/ngram_sf1_verify.py [SF_DIR] [MOD]
Defaults: <repo>/.probe_data/sf1, MOD=20.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The registry's ngram_sim_join oracle, with documents pre-filtered to
# the residue subset (same gram unit, threshold, rounding).
ORACLE_SQL = """WITH cg AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(length(s) - 3, 1) + 1),
                   i -> substring(s, CAST(i AS INTEGER), 4)))) AS gram
  FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents
        WHERE doc_id % {mod} = {res})),
sizes AS (SELECT doc_id, count(*) AS n FROM cg GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM cg a JOIN cg b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(common * 1.0 / (s1.n + s2.n - common), 6) AS jaccard
FROM pairs
JOIN sizes s1 ON id_a = s1.doc_id
JOIN sizes s2 ON id_b = s2.doc_id
WHERE common * 1.0 / (s1.n + s2.n - common) >= 0.8"""


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from finance_data_pipeline_spark.extensions import dedup
    from finance_data_pipeline_spark.io import table
    from finance_data_pipeline_spark.session import get_spark
    from tools.mini_driver import _canon
    from tools.parity_compare import values_match

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".probe_data", "sf1")
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark(app_name="ngram-sf1-verify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    docs = table(spark, sf_dir, "documents")

    n_fail = 0
    for res in (0, 7):
        t0 = time.time()
        sub = docs.filter(F.col("doc_id") % mod == res)
        out = dedup.string_sim_join(
            sub, threshold=0.8, grams=dedup.char_ngrams("text", 4)
        ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        spark_pdf = out.toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
        oracle_pdf = con.sql(ORACLE_SQL.format(mod=mod, res=res)).df()
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
            f" (spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)"
        )

    t0 = time.time()
    agg = (
        dedup.string_sim_join(docs, threshold=0.8, grams=dedup.char_ngrams("text", 4))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .agg(
            F.count("*").alias("n"),
            F.sum("id_a").alias("sum_a"),
            F.sum("id_b").alias("sum_b"),
            F.sum(F.col("jaccard").cast("decimal(38,6)")).alias("sum_j"),
        )
        .first()
    )
    print(
        f"full-corpus aggregates ({time.time() - t0:.1f}s): "
        f"count={agg['n']} sum_id_a={agg['sum_a']} sum_id_b={agg['sum_b']} "
        f"sum_jaccard={agg['sum_j']}"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
