"""Multimodal binary-column plumbing (north-star extension).

Pattern: media payloads ride DataFrames as opaque `binary` columns with a
typed metadata struct beside them; per-item work (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched Python over
`mapInPandas`, so each task streams batches without materializing the
whole partition, and the output schema is declared up front (Catalyst
plans around the UDF as a black box with known shape).

The container has no image/audio codecs, so the real decoders are
explicit `NotImplementedError` stubs (`decode_image`, `decode_audio`)
and the pipeline runs a **deterministic fake decoder** — byte-histogram
moments over the payload — keeping every Spark-side piece real and
testable: schema, metadata struct, batch iteration, partitioning, and
the declared `q_multimodal_decode` query. Swapping in PIL/ffmpeg later
changes only the per-batch function body.

Scale posture: payloads shuffle at most once (they are attached 1:1 to
rows and processed map-side); feature extraction is embarrassingly
parallel; `spark.sql.files.maxPartitionBytes` bounds per-task payload
volume when reading real media parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries._util import t
from ..queries.registry import query

MODALITIES = ("image", "audio", "video")

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode (PIL/turbojpeg) — not available in this
    container; the pipeline substitutes `_fake_decode`."""
    raise NotImplementedError("image codecs not installed; use the fake decoder")


def decode_audio(payload: bytes) -> np.ndarray:
    """Real audio decode (soundfile/ffmpeg) — not available here."""
    raise NotImplementedError("audio codecs not installed; use the fake decoder")


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: normalized
    16-bin byte histogram folded to FEATURE_DIM moments. Pure function of
    the bytes → identical across runs/partitionings."""
    if len(payload) == 0:
        return np.zeros(FEATURE_DIM)
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16)
    hist = counts / counts.sum()
    return (hist[:FEATURE_DIM] + hist[FEATURE_DIM:]).astype(np.float64)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach the multimodal column pattern to `documents`: a binary
    payload (the utf-8 text bytes standing in for media bytes) plus a
    typed metadata struct. With real data these columns come straight out
    of the ingest parquet; nothing downstream depends on how the payload
    was produced."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    meta = F.struct(
        modality.alias("modality"),
        F.octet_length("text").cast("int").alias("n_bytes"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
    )
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"), meta.alias("media_meta")
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode: iterate Arrow batches, run the (stubbed)
    decoder per payload, emit the declared fixed-shape feature schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "feature": [np.round(f, 6) for f in feats],
                }
            )

    return with_payload.mapInPandas(run, DECODED_SCHEMA)


def sample_frames(with_payload: DataFrame, every_n: int = 64, frame_bytes: int = 16) -> DataFrame:
    """Frame-sampling shape for video payloads: slice every_n-th
    frame_bytes chunk out of the payload as its own row (posexplode on a
    byte-slicing transform — pure Catalyst, no Python). With real video
    this becomes a seek-and-decode inside the batch UDF; the row-shape
    contract (one row per sampled frame, frame index + bytes) is what
    downstream featurizers depend on."""
    n_frames = F.floor(F.octet_length("payload") / F.lit(every_n * frame_bytes)).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: F.substring(F.col("payload"), i * every_n * frame_bytes + 1, frame_bytes),
    )
    return (
        with_payload.filter(F.col("media_meta.modality") == "video")
        .select("doc_id", F.posexplode(frames).alias("frame_idx", "frame_bytes"))
    )


@query(
    "q_multimodal_framesample",
    oracle="""
    WITH v AS (
        SELECT doc_id, text,
               GREATEST(CAST(FLOOR(strlen(text) / 64) AS BIGINT), 1) AS m
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(substr(text, CAST(i * 64 + 1 AS INT), 16)) AS frame_md5
    FROM v, UNNEST(range(0, m)) AS t(i)
    """,
    tags=("multimodal", "framesample"),
)
def q_multimodal_framesample(spark, sf_dir):
    """Frame sampling over the video-modality payloads: every 4th 16-byte
    chunk becomes one row (``sample_frames`` — pure Catalyst byte
    slicing, no Python). Frames are projected as md5 hex so the binary
    column never reaches the driver's canonicalizer; because the stub
    payload is the utf-8 text bytes (ascii), DuckDB reproduces the exact
    slicing with substr — a full hash check of the frame extraction."""
    frames = sample_frames(
        attach_payload(t(spark, sf_dir, "documents")), every_n=4, frame_bytes=16
    )
    return frames.select(
        "doc_id", "frame_idx", F.md5("frame_bytes").alias("frame_md5")
    )


@query("q_multimodal_decode", oracle=None, tags=("multimodal", "udf"))
def q_multimodal_decode(spark, sf_dir):
    """Decode-and-featurize over the multimodal column pattern: binary
    payload + metadata struct → mapInPandas (stub) decoder → per-modality
    feature stats. Deterministic (fake decoder is a pure function of the
    bytes) but not SQL-expressible → rows-only."""
    docs = t(spark, sf_dir, "documents")
    decoded = decode_features(attach_payload(docs))
    return (
        decoded.groupBy("modality")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
            F.round(F.avg(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)), 6).alias(
                "avg_fsum"
            ),
        )
        .orderBy("modality")
    )


def decode_features_arrow(with_payload: DataFrame) -> DataFrame:
    """mapInArrow decode — the Spark-4 Arrow-native twin of
    ``decode_features``: batches arrive as ``pyarrow.RecordBatch`` and
    never materialize pandas objects, which drops the
    pandas-Block-construction overhead on wide/binary columns (exactly
    the multimodal case: payloads are opaque byte blobs pandas can only
    store as object arrays). The decode itself is the same pure
    per-payload function; equality with the pandas path is asserted in
    tests/test_session_additions.py."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column("payload").to_pylist()
            metas = batch.column("media_meta")
            feats = [np.round(_fake_decode(p), 6).tolist() for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    metas.field("modality"),
                    metas.field("n_bytes"),
                    pa.array(feats, pa.list_(pa.float64())),
                ],
                names=["doc_id", "modality", "n_bytes", "feature"],
            )

    return with_payload.mapInArrow(run, DECODED_SCHEMA)


PHASH_GRID = 8


def _fake_decode_grid(payload: bytes) -> np.ndarray:
    """Grid variant of the fake decoder for perceptual hashing: the
    payload splits into PHASH_GRID segments (standing in for pHash's
    spatial blocks) and each contributes an 8-dim folded histogram —
    a 64-dim positional feature, discriminative enough that sign
    projections separate unrelated payloads (the global-histogram
    8-dim feature is not: rank-8 projections gave ~n²/3 candidate
    pairs on this corpus)."""
    if len(payload) == 0:
        return np.zeros(PHASH_GRID * FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8)
    segs = np.array_split(arr, PHASH_GRID)
    feats = []
    for seg in segs:
        if len(seg) == 0:
            feats.append(np.zeros(FEATURE_DIM))
            continue
        counts = np.bincount(seg >> 4, minlength=16)
        hist = counts / counts.sum()
        feats.append(hist[:FEATURE_DIM] + hist[FEATURE_DIM:])
    return np.concatenate(feats).astype(np.float64)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def decode_phash(with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode emitting the 64-bit perceptual hash directly:
    grid feature → ±1 projection matrix (one numpy GEMM per Arrow
    batch) → sign bits packed into an int64. Computing the signature in
    the same batch as the decode is the production shape (pHash/CLIP
    embedding happens where the pixels are) and keeps the Spark plan
    free of a 64×64-term projection expression tree (which blew up plan
    compile + broadcast-thread memory when expressed in Catalyst)."""
    w = np.array(_phash_weights(dim=PHASH_GRID * FEATURE_DIM))  # (64, 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.stack([_fake_decode_grid(p) for p in pdf["payload"]])
            bits = (feats @ w.T) > 0  # (n, 64)
            sigs = np.packbits(bits, axis=1, bitorder="little").view(np.int64)[:, 0]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": sigs})

    return with_payload.mapInPandas(run, PHASH_SCHEMA)


def _phash_weights(n_bits: int = 64, dim: int = FEATURE_DIM) -> list[list[float]]:
    """Deterministic ±1 projection matrix for the perceptual-hash sign
    bits, derived from md5 of the (bit, component) coordinates — stable
    across processes (unlike builtin hash()) and baked into the plan as
    literals, so the projection is pure codegen arithmetic."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"phash:{b}:{j}".encode()).digest()[0] & 1 else -1.0
            for j in range(dim)
        ]
        for b in range(n_bits)
    ]


@query("q_multimodal_phash", oracle=None, tags=("multimodal", "phash", "dedup"))
def q_multimodal_phash(spark, sf_dir):
    """Perceptual-hash dedup over media payloads — the image-dedup step
    of a multimodal training pipeline (LAION-style): decode → grid
    feature → 64-bit sign-projection signature (one numpy GEMM per
    Arrow batch, see ``decode_phash``) → signature-equality clusters
    with a deterministic min-id keeper. Exact-signature bucketing is
    the production pHash mode (LAION deduped on exact pHash match);
    for a Hamming-tolerance variant on real media the 4×16-bit banded
    join machinery of q_dedup_simhash applies unchanged to this
    signature column. On this fixture the text-byte payloads give a
    unimodal Hamming distribution (byte histograms of same-vocabulary
    text are all alike — measured: no bimodal gap, median h≈5), so the
    tolerance knob would admit unrelated pairs; signature equality
    captures exactly the duplicated-payload clusters.

    Scale shape: payloads never shuffle (Arrow map-side decode+hash);
    the cluster aggregate is ONE combinable shuffle on the 8-byte
    signature — the same plan as exact text dedup, at any corpus size.
    Rows-only: the signature depends on the byte-level fake decoder,
    which DuckDB can't mirror.
    """
    wp = attach_payload(t(spark, sf_dir, "documents"))
    sig = decode_phash(wp.repartition(32, "doc_id"))
    return (
        sig.groupBy("phash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sum("doc_id").alias("id_sum"),
        )
        .filter(F.col("n_copies") >= 2)
    )
