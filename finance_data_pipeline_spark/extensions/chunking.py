"""Training-sequence preparation (X6+): document chunking and
concat-and-chunk sequence packing — the two fan-out/fold operators
between a cleaned corpus and a tokenized training set.

Both are pure built-in array/window math (codegen, no UDFs) and both
are deterministic functions of (doc_id, text), so they carry full SQL
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions.dedup import tokens


def doc_chunks(
    docs: DataFrame,
    chunk_size: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into ``chunk_size``-token windows advancing
    by ``chunk_size − overlap`` tokens (sliding context windows for
    long-document training / retrieval indexing). The last chunk may be
    short; a doc shorter than one chunk yields itself.

    1→N fan-out as a row-local ``explode`` over a start-position
    sequence — a narrow map stage, no shuffle, no UDF; at 100 TB the
    fan-out multiplies rows ~len/stride per doc and flows straight into
    the downstream write. Emits the chunk's token count and md5 (the
    id-sized proof of content; downstream tokenizers re-read text by
    (doc_id, chunk_start)).
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    chunk = F.slice(toks, F.col("chunk_start"), chunk_size)
    return (
        docs.select(F.col(id_col), toks.alias("_toks"), F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(
            F.col(id_col),
            "chunk_idx",
            "chunk_start",
            F.size(F.slice("_toks", F.col("chunk_start"), chunk_size)).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(F.slice("_toks", F.col("chunk_start"), chunk_size), " ")).alias("chunk_md5"),
        )
    )


def packed_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay every document's tokens
    end-to-end in ``id_col`` order within a shard, cut the stream into
    ``seq_len``-token training sequences, and report each document's
    placement — ``start_pack``/``end_pack`` (0-based sequence ids its
    tokens land in) and ``n_packs_spanned``. Documents straddle pack
    boundaries by design (GPT-style pretraining packing; no padding
    waste, unlike greedy bin-packing which is order-fragile).

    The running token offset is one cumulative-sum window per shard —
    pack ids are a pure function of (shard, id order), so the layout is
    reproducible on any cluster. Packing is per-shard (``shard_col``)
    exactly as a 100 TB pipeline packs per input shard/file: the window
    never sees more than a shard's rows, and shards pack independently
    in parallel.
    """
    toks_n = F.size(tokens(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        F.col(id_col),
        F.col(shard_col),
        toks_n.cast("long").alias("n_tokens"),
    ).withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return base.select(
        id_col,
        shard_col,
        "n_tokens",
        "cum_before",
        F.floor(F.col("cum_before") / seq_len).cast("long").alias("start_pack"),
        F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / seq_len)
        .cast("long")
        .alias("end_pack"),
        (
            F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / seq_len)
            - F.floor(F.col("cum_before") / seq_len)
            + 1
        )
        .cast("long")
        .alias("n_packs_spanned"),
    )
