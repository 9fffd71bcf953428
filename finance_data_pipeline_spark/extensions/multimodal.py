"""Multimodal columns (SURVEY.md X5): opaque binary payloads + typed
metadata, with Arrow-batched decode/transform plumbing.

The container has no image/audio libraries, so the decode kernels are
deterministic fakes / explicit NotImplementedError stubs — but the
Spark-side contract (schema, batch shape, partitioning, mapInPandas
signature) is real and tested. Swapping in PIL/torchaudio later changes
only the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal record: payload is opaque bytes; metadata is typed.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video | text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from documents: text payload as binary +
    named_struct metadata (X5 struct plumbing, SURVEY.md F11)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.named_struct(
            F.lit("mime"), F.lit("text/plain"),
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("duration_ms"), F.lit(None).cast("long"),
        ).alias("meta"),
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Byte-level manifest (size + content hash) — the integrity pass a
    100 TB media crawl runs before any decode. Pure built-ins."""
    return media.select(
        "media_id",
        "modality",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# --- decode / feature-extract kernels (Arrow-batched) ---------------------

FEATURE_SCHEMA = "media_id long, modality string, n_bytes int, feature array<double>"


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: folds payload bytes
    into a fixed-dim feature vector. Replace with PIL/librosa decode →
    model features in production."""
    acc = [0] * dim
    for i, byte in enumerate(payload or b""):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [x / 997.0 for x in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas decode pipeline: Arrow batches of binary payloads →
    per-row feature vectors. The iterator-of-batches shape keeps
    executor memory flat regardless of partition size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": pdf["payload"].map(lambda p: _fake_decode_features(p, dim)),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """TRUE image decode (JPEG/PNG → pixels). Requires an imaging
    library not present in this container — the Spark contract is
    defined; the kernel is a stub. ``resize_media`` below carries the
    identical plumbing with a deterministic byte-grid kernel."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in container); "
        "use resize_media() for the plumbing-tested deterministic path"
    )


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Media table with image/audio/video modalities deterministically
    derived from documents: payload = UTF-8 bytes of the text (opaque to
    every kernel), typed metadata populated per modality. Exercises the
    full MEDIA_SCHEMA (binary column + struct metadata) without any
    codec in the container."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
    )
    is_image = modality == "image"
    is_timed = modality.isin("audio", "video")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.named_struct(
            F.lit("mime"), F.concat(F.lit("application/x-fake-"), modality),
            F.lit("width"), F.when(is_image, (8 + F.pmod("doc_id", F.lit(8))).cast("int")),
            F.lit("height"), F.when(is_image, (6 + F.pmod("doc_id", F.lit(6))).cast("int")),
            F.lit("duration_ms"),
            F.when(is_timed, (1000 + F.pmod(F.col("n_chars") * 7, F.lit(5000))).cast("long")),
        ).alias("meta"),
    )


RESIZE_SCHEMA = "media_id long, width int, height int, resized binary"


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing with a real nearest-neighbor resample over
    the payload treated as a meta.width × meta.height byte grid.

    The kernel is the shape a PIL/opencv decode+resize would have —
    Arrow batches of binary in, fixed-size binary out, metadata-driven
    geometry — with the codec call replaced by deterministic byte math
    (the container has no imaging libs). Batch shape: 1 row in → 1 row
    out, bounded output size (width·height bytes per row)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            # Tuple iteration over raw ndarrays: iterrows() boxes every row
            # into a pandas Series, ~10× slower for byte-level kernels.
            for media_id, payload, sw, sh in zip(
                pdf["media_id"].values,
                pdf["payload"].values,
                pdf["src_w"].values,
                pdf["src_h"].values,
            ):
                sw, sh = int(sw), int(sh)
                grid = bytes(payload or b"")[: sw * sh].ljust(sw * sh, b"\0")
                resized = bytes(
                    grid[(y * sh // height) * sw + (x * sw // width)]
                    for y in range(height)
                    for x in range(width)
                )
                out_rows.append((media_id, width, height, resized))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "width", "height", "resized"]
            )

    src = media.filter(F.col("modality") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
    )
    return src.mapInPandas(kernel, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx long, t_ms long, frame_md5 string"


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to one row
    per sampled timestamp (UDTF shape inside mapInPandas — the batch
    iterator keeps fan-out memory bounded). A real ffmpeg kernel would
    emit decoded frames; this kernel emits a deterministic per-frame
    digest md5(payload ‖ ':' ‖ idx), which keeps the operator fully
    oracle-checkable end-to-end."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_ms": [], "frame_md5": []}
            # Tuple iteration avoids the per-row Series boxing of iterrows().
            for media_id, payload, duration_ms in zip(
                pdf["media_id"].values,
                pdf["payload"].values,
                pdf["duration_ms"].values,
            ):
                payload = bytes(payload or b"")
                for idx in range(int(duration_ms) // every_ms + 1):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["t_ms"].append(idx * every_ms)
                    out["frame_md5"].append(
                        hashlib.md5(payload + f":{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    src = media.filter(F.col("modality") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(kernel, schema=FRAME_SCHEMA)


AUDIO_ENERGY_SCHEMA = "media_id long, frame_idx long, t_ms long, energy long, rms double"


def audio_frame_energy(
    media: DataFrame, frame_ms: int = 250, probes: int = 8
) -> DataFrame:
    """Audio windowing kernel — the audio-modality counterpart of
    sample_frames (video) and resize_media (image): the payload is
    treated as a PCM-like byte stream and each ``frame_ms`` window of
    the clip's duration gets a frame energy (sum of squared probe
    bytes, exact integer) and an RMS level (the one float, computed in
    identical IEEE order in the SQL oracle). A torchaudio/ffmpeg
    implementation would swap the byte probes for real samples and
    keep the fan-out, schema, and windowing identical — this is the
    silence-detection / loudness-segmentation shape of an audio
    curation pass.

    Computed ENTIRELY with JVM built-ins (hex indexing + integer
    arithmetic — the media_ahash technique, no Python kernel): one
    row per frame via a single explode; ``probes`` evenly-spaced bytes
    per frame sampled cyclically (index mod payload length), summed as
    an explicit codegen expression, NOT a higher-order-function lambda
    (interpreted, defeats whole-stage codegen)."""
    # Empty payloads produce NO frames (a decoder cannot sample zero
    # bytes; the cyclic probe index would be `% 0`) — mirrored in the
    # oracles as `octet_length(encode(text)) > 0`.
    src = (
        media.filter(F.col("modality") == "audio")
        .filter(F.octet_length("payload") > 0)
        .select(
            "media_id",
            F.hex("payload").alias("_hx"),
            F.octet_length("payload").alias("_plen"),
            F.col("meta.duration_ms").alias("_dur"),
        )
    )
    frames = src.select(
        "media_id",
        "_hx",
        "_plen",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"_dur div {frame_ms} - 1"))
        ).alias("frame_idx"),
    )
    def _byte(j: int) -> str:
        return (
            "cast(conv(substring(_hx,"
            f" cast(((frame_idx * {probes} + {j}) % _plen) * 2 + 1 as int), 2),"
            " 16, 10) as bigint)"
        )

    probe_terms = " + ".join(f"({_byte(j)} * {_byte(j)})" for j in range(probes))
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * frame_ms).cast("long").alias("t_ms"),
        F.expr(f"{probe_terms}").alias("energy"),
    ).withColumn(
        "rms",
        F.round(F.sqrt(F.col("energy").cast("double") / float(probes)), 4),
    )


def media_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of image payloads, computed
    ENTIRELY with built-in JVM expressions — no Python kernel: the
    meta.width × meta.height byte grid is nearest-neighbor resampled
    to 8×8 through hex-string indexing (the same arithmetic as
    resize_media's kernel), each pixel is thresholded against the
    integer mean, and the 64 bits pack into four 16-bit band words.

    Band words double as the LSH buckets for near-dup search: two
    images within Hamming distance 3·bands_missed must share at least
    one exact band (pigeonhole) — the banding rule MinHash dedup uses,
    applied to perceptual bits.

    Returns (media_id, b0, b1, b2, b3) — one row per image.
    """
    imgs = media.filter(F.col("modality") == "image").select(
        "media_id",
        F.col("meta.width").alias("sw"),
        F.col("meta.height").alias("sh"),
        F.hex("payload").alias("hx"),
    )
    # pad the hex expansion so out-of-payload grid cells read 0x00,
    # mirroring the resize kernel's ljust
    imgs = imgs.withColumn(
        "hx", F.rpad("hx", (F.col("sw") * F.col("sh") * 2).cast("int"), "0")
    )
    pix = imgs.select(
        "media_id",
        "sw",
        "sh",
        "hx",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("pidx"),
    ).select(
        "media_id",
        "pidx",
        F.conv(
            F.substring(
                "hx",
                (
                    2
                    * (
                        F.expr("(pidx div 8) * sh div 8") * F.col("sw")
                        + F.expr("(pidx % 8) * sw div 8")
                    )
                    + 1
                ).cast("int"),
                2,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("px"),
    )
    mean = pix.groupBy("media_id").agg(
        F.expr("sum(px) div 64").alias("_mean")
    )
    bits = pix.join(mean, "media_id").select(
        "media_id",
        F.expr("pidx div 16").alias("band"),
        F.when(
            F.col("px") > F.col("_mean"),
            F.expr("shiftleft(1L, cast(pidx % 16 as int))"),
        )
        .otherwise(F.lit(0))
        .alias("bit"),
    )
    bands = bits.groupBy("media_id", "band").agg(F.sum("bit").alias("bval"))
    return bands.groupBy("media_id").agg(
        *[
            F.max(F.when(F.col("band") == b, F.col("bval"))).alias(f"b{b}")
            for b in range(4)
        ]
    )


def media_phash_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash band-bucket
    candidates (pairs sharing ≥1 exact 16-bit band) verified by the
    exact 64-bit Hamming distance via bit_count(xor) per band.

    Recall contract: with 4 bands the pigeonhole argument guarantees
    EVERY pair at Hamming ≤ 3 shares an unchanged band, so the default
    ``max_hamming=3`` has recall 1.0. Thresholds 4–6 are permitted but
    best-effort — a pair whose differing bits span all four bands is
    silently missed, the same precision/recall trade MinHash banding
    makes (tests/test_multimodal.py measures it against brute-force
    ground truth).

    Candidate generation is a bucketed self-join on (band, value) —
    never all-pairs; verification touches only candidate rows.
    Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤
    ``max_hamming``.
    """
    h = media_ahash(media)
    long_form = h.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bval"))
                    for b in range(4)
                ]
            )
        ).alias("x"),
    ).select("media_id", "x.band", "x.bval")
    cand = (
        long_form.alias("a")
        .join(
            long_form.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(4)],
    )
    hb = h.select(
        F.col("media_id").alias("id_b"),
        *[F.col(f"b{b}").alias(f"bb{b}") for b in range(4)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{b} ^ bb{b}")) for b in range(4)
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


SCENE_CUT_SCHEMA = "media_id long, frame_idx long, t_ms long, delta long"


def _probe_energy_expr(probes: int) -> str:
    """Spark SQL expression: sum of squared probe bytes for frame
    `frame_idx` over hex column `_hx` of byte length `_plen` (the
    audio_frame_energy technique, shared so video reuses it)."""

    def byte(j: int) -> str:
        return (
            "cast(conv(substring(_hx,"
            f" cast(((frame_idx * {probes} + {j}) % _plen) * 2 + 1 as int), 2),"
            " 16, 10) as bigint)"
        )

    return " + ".join(f"({byte(j)} * {byte(j)})" for j in range(probes))


def scene_cuts(
    media: DataFrame,
    every_ms: int = 500,
    probes: int = 8,
    factor_pct: int = 150,
) -> DataFrame:
    """Video scene-cut detection — the shot-segmentation pass of a
    video curation pipeline: a frame boundary is a CUT when its
    energy jump exceeds ``factor_pct``% of the clip's mean jump. A
    real implementation would decode frames and compare histograms;
    this kernel probes payload bytes per sampled frame (the
    audio_frame_energy technique — JVM hex indexing + integer
    arithmetic, no Python) and keeps the fan-out, windowing and
    thresholding identical, so the whole operator replays exactly in
    SQL.

    Exactness: energies and deltas are integers; the relative
    threshold is evaluated as ``delta · 100 · n_deltas >
    factor_pct · Σdeltas`` — ALL-INTEGER cross-multiplication, no
    float mean, so the rule is bit-portable. Single-frame clips have
    no deltas and emit nothing; an all-equal-energy clip has Σ = 0
    and emits nothing (0 > 0 is false).

    Scale: one explode row per sampled frame (bounded by duration),
    one per-media window pass for the lag, one map-side-combined
    per-media stat join — payload bytes never shuffle (only the hex
    projection of probed frames does).
    """
    from pyspark.sql import Window

    src = media.filter(F.col("modality") == "video").select(
        "media_id",
        F.hex("payload").alias("_hx"),
        F.octet_length("payload").alias("_plen"),
        F.col("meta.duration_ms").alias("_dur"),
    )
    frames = src.select(
        "media_id",
        "_hx",
        "_plen",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"_dur div {every_ms}"))
        ).alias("frame_idx"),
    )
    e = frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.expr(_probe_energy_expr(probes)).alias("_en"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    d = e.select(
        "media_id",
        "frame_idx",
        F.abs(F.col("_en") - F.lag("_en").over(w)).alias("_delta"),
    ).filter(F.col("_delta").isNotNull())
    stats = d.groupBy("media_id").agg(
        F.sum("_delta").alias("_sumd"), F.count(F.lit(1)).alias("_nd")
    )
    return (
        d.join(F.broadcast(stats), "media_id")
        .filter(
            F.col("_delta") * 100 * F.col("_nd")
            > F.lit(factor_pct) * F.col("_sumd")
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).cast("long").alias("t_ms"),
            F.col("_delta").cast("long").alias("delta"),
        )
    )


def audio_silence_runs(
    media: DataFrame,
    frame_ms: int = 250,
    probes: int = 8,
    max_energy: int = 130_000,
) -> DataFrame:
    """Silence segmentation over audio_frame_energy's frames: per clip,
    the count/total/longest of consecutive sub-threshold frame runs —
    the trim-silence / segment-speech primitive of an audio curation
    pass. Gaps-and-islands on (frame_idx − row_number) keeps it pure
    window algebra over the bounded frame fan-out; energies are exact
    integers so the threshold compare replays bit-identically in SQL.
    Clips with no silent frame report zero runs (left join keeps them);
    clips with an empty payload have no frames at all and are excluded
    (audio_frame_energy's empty-payload contract).
    """
    frames = audio_frame_energy(media, frame_ms=frame_ms, probes=probes)
    silent = frames.filter(F.col("energy") < max_energy)
    grp = F.col("frame_idx") - F.row_number().over(
        Window.partitionBy("media_id").orderBy("frame_idx")
    )
    runs = (
        silent.withColumn("_grp", grp)
        .groupBy("media_id", "_grp")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("frame_idx").cast("long").alias("run_start"),
        )
    )
    per_clip = runs.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_silent_frames"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.min("run_start").cast("long").alias("first_run_start"),
    )
    clips = frames.select("media_id").distinct()
    return clips.join(per_clip, "media_id", "left").select(
        "media_id",
        F.coalesce("n_runs", F.lit(0)).cast("long").alias("n_runs"),
        F.coalesce("n_silent_frames", F.lit(0)).cast("long").alias("n_silent_frames"),
        F.coalesce("longest_run", F.lit(0)).cast("long").alias("longest_run"),
        F.col("first_run_start"),
    )
