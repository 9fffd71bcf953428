"""Multimodal plumbing invariants: schema, batch shape, fan-out
cardinality, and kernel determinism (SURVEY.md X5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_data_pipeline_spark.extensions import multimodal
from finance_data_pipeline_spark.io import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synthetic_media(table(spark, SF_DIR, "documents")).cache()


def test_modalities_partition_the_corpus(spark, media):
    counts = {r.modality: r.n for r in media.groupBy("modality").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}
    assert sum(counts.values()) == media.count()


def test_meta_populated_per_modality(spark, media):
    assert media.filter((F.col("modality") == "image") & F.col("meta.width").isNull()).count() == 0
    assert media.filter((F.col("modality") != "image") & F.col("meta.width").isNotNull()).count() == 0
    assert media.filter((F.col("modality") != "image") & F.col("meta.duration_ms").isNull()).count() == 0


def test_resize_output_geometry_and_determinism(spark, media):
    out1 = multimodal.resize_media(media, 16, 12)
    rows = out1.withColumn("n", F.length("resized")).select("media_id", "n", F.md5("resized").alias("h")).collect()
    assert len(rows) == media.filter(F.col("modality") == "image").count()
    assert all(r.n == 16 * 12 for r in rows)
    rows2 = out1.select("media_id", F.md5("resized").alias("h")).collect()
    assert {(r.media_id, r.h) for r in rows} == {(r.media_id, r.h) for r in rows2}


def test_frame_sample_cardinality(spark, media):
    out = multimodal.sample_frames(media, every_ms=500)
    per_media = out.groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_idx").alias("max_idx")
    )
    joined = per_media.join(
        media.filter(F.col("modality") == "video").select(
            "media_id", F.col("meta.duration_ms").alias("d")
        ),
        "media_id",
    )
    bad = joined.filter(
        (F.col("n_frames") != F.floor(F.col("d") / 500) + 1)
        | (F.col("max_idx") * 500 > F.col("d"))
    )
    assert bad.count() == 0
    assert per_media.count() == media.filter(F.col("modality") == "video").count()


def test_true_decoder_stub_is_marked(spark, media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(media, 8, 8)


def test_media_ahash_identical_payloads_same_hash(spark):
    """Images with identical payload AND geometry share all 4 band
    words; a different payload (different content bits) does not."""
    from pyspark.sql import functions as F

    from finance_data_pipeline_spark.extensions import multimodal as mm

    txt = "the quick brown fox jumps over the lazy dog " * 3
    rows = [(0, txt, len(txt)), (24, txt, len(txt)), (48, "z " * 60, 120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    # doc_ids 0/24/48: all %3==0 (images) and %8/%6 equal -> same geometry
    h = {r.media_id: (r.b0, r.b1, r.b2, r.b3)
         for r in mm.media_ahash(mm.synthetic_media(docs)).collect()}
    assert h[0] == h[24]
    assert h[0] != h[48]


def test_media_phash_pairs_finds_identical_images(spark):
    from finance_data_pipeline_spark.extensions import multimodal as mm

    txt = "the quick brown fox jumps over the lazy dog " * 3
    rows = [(0, txt, len(txt)), (24, txt, len(txt)), (48, "z " * 60, 120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in mm.media_phash_pairs(mm.synthetic_media(docs)).collect()}
    assert pairs.get((0, 24)) == 0
    assert all(48 not in p for p in pairs)


def test_media_phash_recall_guarantee_and_banding_trade(spark):
    """Pigeonhole contract: at the default max_hamming=3 the banded
    candidate generation finds EVERY pair brute force finds (recall
    1.0). At the best-effort threshold 6, measure recall against brute
    force and require the banding loss stays bounded on real synthetic
    media — the documented MinHash-style trade, asserted the same way
    lsh_recall_report pins the MinHash banding curve."""
    from pyspark.sql import functions as F

    from finance_data_pipeline_spark.extensions import multimodal as mm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = mm.synthetic_media(docs)
    h = mm.media_ahash(media)
    ha = h.select(F.col("media_id").alias("id_a"),
                  *[F.col(f"b{b}").alias(f"a{b}") for b in range(4)])
    hb = h.select(F.col("media_id").alias("id_b"),
                  *[F.col(f"b{b}").alias(f"bb{b}") for b in range(4)])
    dist = sum(F.bit_count(F.expr(f"a{b} ^ bb{b}")) for b in range(4))
    brute = (
        ha.join(hb, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", dist.cast("long"))
    )
    truth6 = {(r.id_a, r.id_b) for r in brute.filter("hamming <= 6").collect()}
    truth3 = {(r.id_a, r.id_b) for r in brute.filter("hamming <= 3").collect()}
    got3 = {(r.id_a, r.id_b)
            for r in mm.media_phash_pairs(media, max_hamming=3).collect()}
    got6 = {(r.id_a, r.id_b)
            for r in mm.media_phash_pairs(media, max_hamming=6).collect()}
    # guaranteed regime: exact
    assert got3 == truth3
    # best-effort regime: no false positives ever (exact verify), and
    # measured recall stays above the floor for the banding layout
    # (0.833 on sf0.001 synthetic media — the pairs lost are exactly
    # those whose 4-6 differing bits touch all four bands)
    assert got6 <= truth6
    if truth6:
        recall = len(got6) / len(truth6)
        assert recall >= 0.8, f"phash banding recall at h<=6 fell to {recall:.3f}"
