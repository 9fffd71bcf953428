"""Parquet sources and sinks.

Replaces the reference's three I/O paths — yfinance HTTP fetch,
``pd.read_sql`` scans, and row-at-a-time / executemany MySQL writes
(SURVEY.md §2.1 S1-S7) — with columnar Parquet reads and distributed
writes. Paths are scheme-agnostic: ``s3a://`` works unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from finance_data_pipeline_spark.schemas import DRIVER_TABLES, RENAME_MAP, STOCKS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Catalyst pushes filters/projections into
    the Parquet scan (predicate pushdown + row-group skipping), so
    callers just compose on top (SURVEY.md §4).

    ``events.ts`` is stored as TIMESTAMP(NANOS) parquet, which Spark
    rejects natively — read it as long and convert. The driver data is
    µs-aligned (verified: epoch_ns % 1000 == 0 at every sf), so integer
    division by 1000 is lossless; ``div`` avoids the double-precision
    loss a float division would hit on epoch-nano magnitudes (~1.7e18
    > 2^53)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql``."""
    for name in DRIVER_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def normalize_stocks(df: DataFrame) -> DataFrame:
    """Schema normalization (SURVEY.md P9, S6).

    The reference flattens yfinance MultiIndex columns and probes four
    spellings of adj_close (fetch_and_store_multi.py:41-111). Here:
    rename via a static map, cast to the canonical types, and fill the
    reference's NaN→0 defaults (P8, fetch_and_store_multi.py:164-169).
    """
    renamed = df
    for src, dst in RENAME_MAP.items():
        if src in renamed.columns:
            renamed = renamed.withColumnRenamed(src, dst)
    cols = []
    for field in STOCKS.fields:
        if field.name in renamed.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif field.name == "adj_close":
            # Reference tolerates a missing adj_close column entirely
            # (fetch_and_store_multi.py:202-214).
            cols.append(F.col("close").cast("double").alias("adj_close"))
        else:
            raise ValueError(f"missing required column: {field.name}")
    out = renamed.select(*cols)
    return out.fillna({"volume": 0, "open": 0.0, "high": 0.0, "low": 0.0, "close": 0.0})


def write_stocks(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned columnar write (replaces S4/S5 row-wise inserts).

    Partitioning by symbol gives partition pruning for every
    ``WHERE symbol = ?`` query the reference issues (dashboard.py:27,
    analyze_visualize.py:66) — at 100 TB this is the difference between
    a metadata lookup and a full scan.
    """
    df.write.mode(mode).partitionBy("symbol").parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into ``n_buckets``
    hash buckets on ``bucket_cols`` at write time, so every later join
    or aggregation on those keys is exchange-free — the write pays the
    shuffle ONCE, each of the N downstream queries pays zero.

    At 100 TB this is the difference between re-shuffling the fact
    table per query and a metadata-only co-located join: two tables
    bucketed the same way join with NO Exchange in the plan
    (tests/test_io.py asserts this on the physical plan). ``sort_cols``
    additionally sorts within buckets → sort-merge join skips its sort.

    Buckets live in the session catalog (saveAsTable) because bucket
    metadata is catalog state; plain ``.parquet(path)`` writes cannot
    carry it.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def export_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export (S7; reference README.md:99-107 does `aws s3 cp`).

    Value-fidelity options (the defaults silently corrupt real text):
    Spark's CSV WRITER strips leading/trailing whitespace from values
    unless told not to, and writes empty string and NULL identically
    (both read back as NULL). Whitespace is preserved explicitly and
    empty strings are written quoted (``""``) so the round trip keeps
    the empty-vs-NULL distinction."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("emptyValue", '""')
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema=None, multiline: bool = True
) -> DataFrame:
    """CSV source. An explicit schema keeps the read single-pass;
    without one, inference costs an extra scan — never do that at
    100 TB (pass the canonical StructType from schemas.py instead).

    ``multiline=True`` (default) parses quoted values containing
    embedded newlines correctly — without it the reader splits such
    rows mid-value and fabricates garbage rows, SILENTLY. The cost is
    that multiLine files are not splittable (one task per file), so
    at scale either keep CSV files small at the producer, or pass
    ``multiline=False`` only when values are guaranteed newline-free
    (restores intra-file splits). CSV is the interchange path —
    parquet/ORC are the scale formats.

    ``nullValue`` is the MySQL-style ``\\N`` token rather than the
    default empty string: with the default, a QUOTED empty field
    (export_csv's spelling of empty string) also reads back as NULL,
    collapsing the empty-vs-NULL distinction the writer preserves.
    Unquoted empty fields still parse as NULL either way; only a
    literal ``\\N`` value in third-party data is affected."""
    reader = (
        spark.read.option("header", "true")
        .option("multiLine", str(multiline).lower())
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "\\N")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV source that SURVIVES malformed rows instead of failing the
    job: bad lines land whole in ``corrupt_col`` (NULL elsewhere), so a
    100 TB ingest quarantines garbage with
    ``df.filter(col(corrupt_col).isNotNull())`` and keeps going —
    FAILFAST on real-world exports is a guaranteed 3 a.m. page. The
    explicit schema is mandatory: inference both costs a second scan
    and masks corruption by widening types to string.

    Carries read_csv's value-fidelity options (multiLine, preserved
    whitespace, \\N null token): without multiLine, a VALID quoted
    value containing a newline would be split and quarantined as two
    fake corrupt rows — quarantine should catch producer garbage, not
    manufacture it.
    """
    # Copy before extending: StructType.add mutates (and returns) the
    # receiver, so extending the caller's schema in place would leak a
    # _corrupt_record field into later reuses of that object (e.g. a
    # strict FAILFAST read with the same schema).
    if corrupt_col not in schema.names:
        full = T.StructType(list(schema.fields)).add(corrupt_col, "string")
    else:
        full = schema
    return (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", "\\N")
        .schema(full)
        .csv(path)
    )


def export_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export — the interchange format for downstream
    non-columnar consumers. Prefer Parquet for anything Spark re-reads
    (columnar pruning + stats; JSON scans are schema-on-read text)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source; same explicit-schema rule as read_csv."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def zorder_value(cols: list, bits: int = 16):
    """Z-order (Morton) curve value over pre-quantized non-negative int
    columns: interleaves the low ``bits`` bits of each column so rows
    close in EVERY dimension get close z-values. Pure codegen bit math.

    ``bits * len(cols)`` must stay within the 63 value bits of a signed
    long — bit 63 is the sign, and setting it silently inverts the
    z-order for affected rows.
    """
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits={bits} over {len(cols)} columns needs {bits * len(cols)} "
            "interleaved bits; a signed long holds 63 — lower bits."
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c) if isinstance(c, str) else c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering write: range-partition + sort the
    data along a Z-order curve over ``zcols`` so parquet row-group
    min/max stats become tight in EVERY z-dimension at once — a scan
    filtered on any subset of them skips most files (linear sort gives
    this for the leading column only). This is the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER, as a plain parquet write.

    Columns are min-max quantized to ``bits`` bits via a broadcast
    1-row bounds aggregate (lazy, no driver action), interleaved, then
    ``repartitionByRange`` on the z-value (one range shuffle — sampled
    boundaries, no global sort) with an in-partition sort. At 100 TB
    the shuffle is the write's cost; every later multi-predicate scan
    repays it (tests/test_io.py asserts per-file stat tightness in both
    dimensions vs a linear layout).
    """
    aggs = []
    for c in zcols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    qcols = []
    top = (1 << bits) - 1
    for c in zcols:
        span = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        q = F.when(span > 0, ((F.col(c) - F.col(f"_min_{c}")) / span * top).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        qcols.append(q.alias(f"_q_{c}"))
    quantized = scaled.select(*df.columns, *qcols)
    withz = quantized.select(
        *df.columns, zorder_value([f"_q_{c}" for c in zcols], bits).alias("_z")
    )
    (
        withz.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_name: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source — the S3 analogue for users whose store is a real
    database (the reference reads MySQL via pd.read_sql,
    analyze_visualize.py:63-80; dashboard.py:21-33).

    Without ``partition_column`` the whole table arrives through ONE
    connection on one executor — fine for dimension tables, wrong for
    facts. Pass (partition_column, lower_bound, upper_bound,
    num_partitions) to fan the scan out as range predicates executed in
    parallel; Spark also pushes filters and projections into the
    generated SQL. At 100 TB a JDBC database is the wrong store —
    land big tables to Parquet once and scan that — but the connector
    makes the migration path one line.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table_name)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table_name: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """JDBC sink — the S4/S5 analogue (reference: executemany INSERT …
    ON DUPLICATE KEY UPDATE, fetch_and_store.py:302-326). Each task
    writes its partition over its own connection with ``batchsize``-row
    batched inserts — the distributed restatement of executemany.

    JDBC has no portable upsert: compute the merge in Spark first
    (ingest.upsert) and write the result, or write to a staging table
    and run the database's native MERGE. ``mode="overwrite"`` with
    ``truncate=true`` (pass as option) keeps indexes/grants intact.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table_name)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def export_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    ecosystems); same pushdown/pruning properties as Parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Raw-file multimodal ingestion (the X5 front door): the built-in
    ``binaryFile`` source reads whole files as rows of
    (path, modificationTime, length, content binary) — the shape the
    multimodal pipeline (extensions/multimodal.py) consumes after
    renaming. ``pattern`` is a pathGlobFilter pushed into file listing
    (only matching files are even opened — at 100 TB of mixed media
    the listing-level filter is the difference between scanning one
    modality and scanning the lake). Each file must fit in one task's
    memory; huge objects belong in a chunked format instead.
    """
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path)


def binary_files_as_media(files: DataFrame, modality: str = "binary") -> DataFrame:
    """Adapt a read_binary_files frame to the media-table schema
    (media_id, modality, payload, meta) used by media_manifest/meta —
    media_id is the file path (unique within a listing)."""
    return files.select(
        F.col("path").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col("content").alias("payload"),
        F.named_struct(
            F.lit("mime"), F.lit(None).cast("string"),
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("duration_ms"), F.lit(None).cast("long"),
        ).alias("meta"),
    )


def read_text_lines(
    spark: SparkSession, path: str, wholetext: bool = False
) -> DataFrame:
    """Line-oriented text source (one row per line, column ``value``) —
    the raw-corpus ingestion path for txt/log dumps; ``wholetext=True``
    reads each file as a single row (document-per-file corpora).
    Splittable per line at any scale (wholetext is not — same caveat
    as binaryFile)."""
    return spark.read.text(path, wholetext=wholetext)


def export_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (built into Spark 4 — the spark-xml package graduated
    into core): the interchange format regulatory/enterprise feeds
    still demand. One row element per record under a single root."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rootTag", "rows")
        .option("rowTag", row_tag)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema=None,
    row_tag: str = "row",
    ignore_surrounding_spaces: bool = False,
) -> DataFrame:
    """XML source with an explicit schema (inference costs a second
    pass and widens everything to string — same rule as
    read_csv_permissive).

    ``ignore_surrounding_spaces=False`` (NOT Spark's default) keeps
    leading/trailing whitespace inside element values — export_xml
    writes values tight, so the round trip is exact. Pass True for
    third-party pretty-printed XML where values are wrapped in
    indentation whitespace that is layout, not data."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option(
            "ignoreSurroundingSpaces",
            str(ignore_surrounding_spaces).lower(),
        )
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_parquet_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    fpp: float = 0.01,
    ndv: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Point-lookup layout: write parquet with a BLOOM FILTER per
    ``bloom_cols`` column chunk (plus zstd compression). Min/max stats
    only skip files for range-clustered columns; a bloom filter skips
    row groups for EQUALITY probes on high-cardinality, unsorted keys
    (doc_id, user_id, content hash) — the `WHERE key = x` debugging
    scan that otherwise reads all 100 TB touches only the row groups
    whose filter admits the key, at ~1.2 bytes/value for 1% fpp.

    Readers need no cooperation: the filter rides in the file footer
    metadata, and Spark's parquet scan consults it whenever an
    equality predicate on the column is pushed down (engines without
    bloom support — pyarrow 16, duckdb 1.0 — just ignore it, as
    tests/test_io.py shows by reading the same file back with both).

    ``ndv`` (expected distinct values per file) sizes the filter;
    estimating it would cost an action, so callers at scale pass their
    known per-file key cardinality and the default leaves sizing to
    the parquet writer.
    """
    writer = df.write.mode(mode).option("compression", "zstd")
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer = writer.option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
        if ndv is not None:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
            )
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction — the table-maintenance job every
    long-running ingestion needs (streaming sinks and per-batch
    partition overwrites accumulate files far below the HDFS/S3 sweet
    spot, and at 100 TB a scan's task count is the FILE count, so a
    10k-file table wastes 10k task schedules on kilobyte reads).

    Rewrites ``src_path`` into ``dst_path`` as ``ceil(rows /
    target_rows_per_file)`` similarly-sized files via one
    round-robin repartition — no shuffle key needed, compaction
    preserves rows not order. Also caps per-file rows with
    ``maxRecordsPerFile`` so a future append through the same writer
    config cannot recreate the problem in reverse (one giant file).
    Returns the output file count. The one driver-side action is the
    row count that sizes the output; the rewrite itself is a single
    distributed pass.

    Deliberately writes to a NEW path: an in-place overwrite that
    fails mid-write destroys the source; the caller swaps paths (or
    views) after the write commits — the same commit discipline the
    streaming sinks use.
    """
    import math

    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(dst_path)
    )
    import glob as _glob
    import os as _os

    return len(
        [
            f
            for f in _glob.glob(_os.path.join(dst_path, "*.parquet"))
            if not _os.path.basename(f).startswith(("_", "."))
        ]
    )


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is on the classpath.
    Spark ships Avro as an EXTERNAL data source module (not bundled in
    the distribution's jars); this container has no network to fetch
    it, so the Avro read/write path below is gated rather than stubbed
    — on a cluster with the module deployed it works unchanged."""
    try:
        # Class.forName is NOT enough: the pyspark wheel carries the
        # Avro classes but not the DataSourceRegister service entry, so
        # format("avro") still fails. Probe the same lookup the writer
        # performs.
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def export_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro export (S7 family). Raises a clear error when the external
    spark-avro module is absent — see avro_available."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro external module not on the classpath; deploy "
            "org.apache.spark:spark-avro to enable Avro I/O"
        )
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro external module not on the classpath; deploy "
            "org.apache.spark:spark-avro to enable Avro I/O"
        )
    return spark.read.format("avro").load(path)


# --- S11: snapshot-versioned store (time travel / rollback) ---------------


def write_snapshot(df: DataFrame, store: str) -> int:
    """Append an immutable full snapshot version to ``store`` and
    return its version number — the minimal time-travel layout
    (Delta/Iceberg's idea reduced to its portable core): data lives in
    ``v=N/`` directories that are NEVER rewritten, and a tiny JSON
    manifest names the current version. Readers pin a version for
    reproducible reruns (the training-data freeze a curation pipeline
    needs); rollback is a manifest pointer move, no data copy.

    Concurrency note for a real deployment: the manifest swap is the
    single commit point — on an object store it should be a
    conditional put (or a rename on HDFS); data files being immutable
    makes retries idempotent.
    """
    import json
    import os

    manifest = os.path.join(store, "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            current = json.load(f)["version"]
    else:
        os.makedirs(store, exist_ok=True)
        current = 0
    version = current + 1
    df.write.mode("errorifexists").parquet(os.path.join(store, f"v={version}"))
    with open(manifest, "w") as f:
        json.dump({"version": version}, f)
    return version


def read_snapshot(spark: SparkSession, store: str, version: int | None = None) -> DataFrame:
    """Read the store at a pinned ``version`` (time travel) or at the
    manifest's current version (default). Only the one ``v=N/``
    directory is listed — old versions cost storage, never scan time."""
    import json
    import os

    if version is None:
        with open(os.path.join(store, "manifest.json")) as f:
            version = json.load(f)["version"]
    return spark.read.parquet(os.path.join(store, f"v={version}"))


def rollback_snapshot(store: str, version: int) -> None:
    """Point the manifest back at an older version — O(1), no data
    movement; newer versions remain on disk for re-roll-forward."""
    import json
    import os

    target = os.path.join(store, f"v={version}")
    if not os.path.isdir(target):
        raise ValueError(f"version {version} does not exist in {store}")
    with open(os.path.join(store, "manifest.json"), "w") as f:
        json.dump({"version": version}, f)
