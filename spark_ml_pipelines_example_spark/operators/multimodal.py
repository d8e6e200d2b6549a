"""Multimodal binary-column plumbing (north-star extension).

Pattern: media payloads ride DataFrames as opaque `binary` columns with a
typed metadata struct beside them; per-item work (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched Python over
`mapInPandas`, so each task streams batches without materializing the
whole partition, and the output schema is declared up front (Catalyst
plans around the UDF as a black box with known shape).

The container has no codec libraries, so the engine carries its OWN
real codecs for the two containers expressible in pure struct/numpy:
uncompressed 24-bit BMP (`encode_bmp`/`decode_image`) and 16-bit PCM
WAV (`encode_wav`/`decode_audio`). `render_media_payloads` renders the
fixture payloads into those containers so `q_multimodal_decode`
exercises a genuine decode end-to-end; compressed formats (JPEG/MP3/
video) still raise `NotImplementedError` — a wrong silent decode is
worse than an explicit gap — and raw payloads fall back to the
deterministic byte-histogram featurizer (`_fake_decode`). Swapping in
PIL/ffmpeg later widens only the magic-dispatch in `_decode_any`.

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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB, 4-byte-aligned bottom-up rows) — the one
    image container expressible with zero codec dependencies, used to
    render REAL image payloads for the decode pipeline."""
    import struct

    h, w, _ = pixels.shape
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += pixels[y, :, ::-1].tobytes() + pad  # BGR order
    return header + info + bytes(rows)


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed 24-bit BMP (pure struct/numpy,
    no external codec): returns an (h, w, 3) uint8 RGB array. Other
    containers (JPEG/PNG/...) would need PIL/turbojpeg, absent in this
    environment — those magics raise so a silent wrong-decode can't
    slip through."""
    import struct

    if payload[:2] != b"BM":
        raise NotImplementedError(
            "only BMP is decodable without external codecs (PIL/turbojpeg "
            "not installed); got magic %r" % payload[:2]
        )
    data_off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * abs(h), offset=data_off
    ).reshape(abs(h), row_len)[:, : w * 3].reshape(abs(h), w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb[::-1] if h > 0 else rgb  # bottom-up unless h negative


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a RIFF/WAVE PCM file (pure struct)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_audio(payload: bytes) -> np.ndarray:
    """REAL audio decode for 16-bit PCM mono RIFF/WAVE (pure
    struct/numpy): returns the int16 sample array. Compressed audio
    (MP3/OGG/...) would need ffmpeg/soundfile — absent here, so
    non-WAV magics raise instead of mis-decoding."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only WAV/PCM is decodable without external codecs "
            "(ffmpeg/soundfile not installed); got magic %r" % payload[:4]
        )
    # walk RIFF chunks to the data chunk (fmt may not be first in general)
    off, n = 12, len(payload)
    fmt_code = n_channels = bits = None
    while off + 8 <= n:
        cid, sz = struct.unpack_from("<4sI", payload, off)
        if cid == b"fmt ":
            fmt_code, n_channels, _rate = struct.unpack_from("<HHI", payload, off + 8)
            bits = struct.unpack_from("<H", payload, off + 22)[0]
        elif cid == b"data":
            if fmt_code != 1 or n_channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM mono supported (fmt={fmt_code}, "
                    f"ch={n_channels}, bits={bits})"
                )
            return np.frombuffer(payload, dtype="<i2", count=sz // 2, offset=off + 8)
        off += 8 + sz + (sz & 1)
    raise ValueError("WAV payload has no data chunk")


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: normalized
    16-bin byte histogram folded to FEATURE_DIM moments. Pure function of
    the bytes → identical across runs/partitionings."""
    if len(payload) == 0:
        return np.zeros(FEATURE_DIM)
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16)
    hist = counts / counts.sum()
    return (hist[:FEATURE_DIM] + hist[FEATURE_DIM:]).astype(np.float64)


def render_media_payloads(with_payload: DataFrame) -> DataFrame:
    """Render REAL media containers for the decode pipeline: image-
    modality payloads become genuine 24-bit BMPs, audio payloads genuine
    16-bit PCM WAVs (both deterministic pure functions of the original
    bytes — pixels/samples are the tiled source bytes), video payloads
    stay raw (a real container there means ffmpeg). Runs as Arrow-batched
    mapInPandas exactly like decode: map-side, no shuffle, schema
    preserved. In production this stage doesn't exist — payloads arrive
    as real media from ingest; it exists here so q_multimodal_decode
    exercises the REAL codec path end-to-end."""
    out_schema = with_payload.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rendered = []
            for payload, meta in zip(pdf["payload"], pdf["media_meta"]):
                src = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(src) == 0:
                    src = np.zeros(1, dtype=np.uint8)
                if meta["modality"] == "image":
                    w = 8 + int(meta["width"]) % 24
                    h = 8 + int(meta["height"]) % 16
                    pix = np.resize(src, (h, w, 3)).astype(np.uint8)
                    rendered.append(encode_bmp(pix))
                elif meta["modality"] == "audio":
                    samples = (
                        np.resize(src, 2048).astype(np.int16) - 128
                    ) * 256  # center + scale to int16 range
                    rendered.append(encode_wav(samples))
                else:  # video: raw bytes (real container would need ffmpeg)
                    rendered.append(bytes(payload))
            out = pdf.copy()
            out["payload"] = rendered
            yield out

    return with_payload.mapInPandas(run, out_schema)


def _decode_any(payload: bytes) -> np.ndarray:
    """Per-payload decode dispatch on container magic: BMP → real image
    decode → per-channel mean/std + dims feature; WAV → real audio
    decode → level/dynamics feature; anything else (the raw video
    stand-ins) → byte-histogram fake. Always FEATURE_DIM floats, pure
    function of the bytes."""
    payload = bytes(payload)
    if payload[:2] == b"BM":
        img = decode_image(payload).astype(np.float64)
        h, w = img.shape[0], img.shape[1]
        return np.array(
            [
                h / 1024.0,
                w / 1024.0,
                img[:, :, 0].mean() / 255.0,
                img[:, :, 1].mean() / 255.0,
                img[:, :, 2].mean() / 255.0,
                img.std() / 255.0,
                img.min() / 255.0,
                img.max() / 255.0,
            ]
        )
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        s = decode_audio(payload).astype(np.float64) / 32768.0
        zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if len(s) > 1 else 0.0
        return np.array(
            [
                len(s) / 1e6,
                s.mean(),
                s.std(),
                float(np.sqrt(np.mean(s * s))),
                zcr,
                s.min(),
                s.max(),
                float(np.abs(s).mean()),
            ]
        )
    return _fake_decode(payload)


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
    """mapInPandas decode: iterate Arrow batches, dispatch each payload
    on its container magic (real BMP/WAV decode, histogram fallback for
    raw bytes), emit the declared fixed-shape feature schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_any(p) for p in pdf["payload"]]
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


@query(
    "q_multimodal_decode",
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS L,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               8 + CAST((doc_id % 480 + 16) % 16 AS INT) AS h,
               8 + CAST((doc_id % 640 + 16) % 24 AS INT) AS w
        FROM documents
    ), img_elem AS (
        SELECT d.doc_id, d.h, d.w, d.L,
               CAST(ascii(substr(d.text, CAST(t.i % d.L AS INT) + 1, 1)) AS DOUBLE) AS b,
               CAST(t.i % 3 AS INT) AS ch
        FROM docs d, UNNEST(range(0, CAST(d.h * d.w * 3 AS BIGINT))) AS t(i)
        WHERE d.modality = 'image'
    ), img_doc AS (
        SELECT doc_id, MAX(L) AS L,
               round_even(MAX(h) / 1024.0, 6) AS f0,
               round_even(MAX(h) / 1024.0, 6) + round_even(MAX(w) / 1024.0, 6)
                 + round_even(AVG(CASE WHEN ch = 0 THEN b END) / 255.0, 6)
                 + round_even(AVG(CASE WHEN ch = 1 THEN b END) / 255.0, 6)
                 + round_even(AVG(CASE WHEN ch = 2 THEN b END) / 255.0, 6)
                 + round_even(stddev_pop(b) / 255.0, 6)
                 + round_even(MIN(b) / 255.0, 6)
                 + round_even(MAX(b) / 255.0, 6) AS fsum
        FROM img_elem GROUP BY doc_id
    ), aud_elem AS (
        SELECT d.doc_id, d.L, t.i,
               (ascii(substr(d.text, CAST(t.i % d.L AS INT) + 1, 1)) - 128) / 128.0 AS s,
               CASE WHEN t.i > 0 AND
                    (ascii(substr(d.text, CAST(t.i % d.L AS INT) + 1, 1)) < 128)
                    <> (ascii(substr(d.text, CAST((t.i - 1) % d.L AS INT) + 1, 1)) < 128)
                    THEN 1.0 ELSE 0.0 END AS zc
        FROM docs d, UNNEST(range(0, 2048)) AS t(i)
        WHERE d.modality = 'audio'
    ), aud_doc AS (
        SELECT doc_id, MAX(L) AS L,
               round_even(2048 / 1e6, 6) AS f0,
               round_even(2048 / 1e6, 6)
                 + round_even(AVG(s), 6)
                 + round_even(stddev_pop(s), 6)
                 + round_even(sqrt(AVG(s * s)), 6)
                 + round_even(SUM(zc) / 2047.0, 6)
                 + round_even(MIN(s), 6)
                 + round_even(MAX(s), 6)
                 + round_even(AVG(abs(s)), 6) AS fsum
        FROM aud_elem GROUP BY doc_id
    ), vid_elem AS (
        SELECT d.doc_id, d.L,
               CAST(ascii(substr(d.text, CAST(t.i AS INT) + 1, 1)) // 16 AS INT) AS nib
        FROM docs d, UNNEST(range(0, CAST(d.L AS BIGINT))) AS t(i)
        WHERE d.modality = 'video'
    ), vid_doc AS (
        SELECT doc_id, MAX(L) AS L,
               round_even((SUM(CASE WHEN nib IN (0, 8) THEN 1 ELSE 0 END))
                          / CAST(MAX(L) AS DOUBLE), 6) AS f0,
               round_even(SUM(CASE WHEN nib IN (0, 8) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (1, 9) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (2, 10) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (3, 11) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (4, 12) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (5, 13) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (6, 14) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6)
                 + round_even(SUM(CASE WHEN nib IN (7, 15) THEN 1 ELSE 0 END) / CAST(MAX(L) AS DOUBLE), 6) AS fsum
        FROM vid_elem GROUP BY doc_id
    ), per_doc AS (
        SELECT 'image' AS modality, * FROM img_doc
        UNION ALL SELECT 'audio', * FROM aud_doc
        UNION ALL SELECT 'video', * FROM vid_doc
    )
    SELECT modality, COUNT(*) AS n_items, CAST(SUM(L) AS BIGINT) AS total_bytes,
           ROUND(AVG(f0), 6) AS avg_f0, ROUND(AVG(fsum), 6) AS avg_fsum
    FROM per_doc GROUP BY modality
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_decode(spark, sf_dir):
    """Decode-and-featurize over the multimodal column pattern: binary
    payload + metadata struct → render to REAL containers (24-bit BMP
    for image rows, 16-bit PCM WAV for audio rows) → mapInPandas decode
    through the REAL codecs (struct/numpy BMP + WAV parsers; raw video
    bytes take the histogram fallback) → per-modality feature stats.

    FULL hash check (upgraded from rows-only, VERDICT r3 task #3): the
    codecs are deterministic pure functions of the fixture base bytes,
    so DuckDB replays the whole render→decode→featurize pipeline from
    `documents.text` — image pixels are the utf-8 bytes tiled cyclically
    into (h,w,3) (h = 8+(doc_id%480+16)%16, w = 8+(doc_id%640+16)%24;
    the BMP encode/decode roundtrip is exact, and channel c of pixel i
    is tiled byte 3i+c), audio samples are (byte−128)·256 over 2048
    tiled positions (zero-crossing sign = byte<128), video features are
    the folded high-nibble histogram of the raw bytes. Per-feature
    rounding uses round_even to mirror numpy's banker's rounding at
    exactly-representable halves (e.g. 8/1024 → 0.007812). The fixture
    is pure ascii (octet_length = length at every SF, asserted in
    tests), so DuckDB's character indexing equals byte indexing."""
    docs = t(spark, sf_dir, "documents")
    decoded = decode_features(render_media_payloads(attach_payload(docs)))
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
            feats = [np.round(_decode_any(p), 6).tolist() for p in payloads]
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
    spatial blocks) and each contributes an 8-dim folded high-nibble
    COUNT vector — a 64-dim positional feature, discriminative enough
    that sign projections separate unrelated payloads (the global-
    histogram 8-dim feature is not: rank-8 projections gave ~n²/3
    candidate pairs on this corpus). Counts, not normalized fractions,
    on purpose: sign(Σ ±count/L) = sign(Σ ±count) for L>0, so the
    projection bits are identical, but the integer form is EXACT in
    both engines (no float rounding can flip a bit whose true dot
    product is 0), which is what makes the signature SQL-oracle-able."""
    if len(payload) == 0:
        return np.zeros(PHASH_GRID * FEATURE_DIM, dtype=np.int64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    segs = np.array_split(arr, PHASH_GRID)
    feats = []
    for seg in segs:
        if len(seg) == 0:
            feats.append(np.zeros(FEATURE_DIM, dtype=np.int64))
            continue
        counts = np.bincount(seg >> 4, minlength=16).astype(np.int64)
        feats.append(counts[:FEATURE_DIM] + counts[FEATURE_DIM:])
    return np.concatenate(feats)


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
    w = np.array(_phash_weights(dim=PHASH_GRID * FEATURE_DIM), dtype=np.int64)  # (64, 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.stack([_fake_decode_grid(p) for p in pdf["payload"]])
            bits = (feats @ w.T) > 0  # (n, 64), exact int64 arithmetic
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


def _phash_oracle() -> str:
    """DuckDB replay of the whole pHash pipeline from `documents.text`
    (rows-only → SQL upgrade, continuing VERDICT r3 task #3's pattern):
    the payload is the ascii text bytes, the grid feature is integer
    folded high-nibble counts per np.array_split segment (first L%8
    segments get L//8+1 bytes), and the ±1 projection weights are baked
    into the SQL as '+'/'-' code strings from the same md5 derivation
    the engine uses — so both engines decide every sign bit with EXACT
    integer arithmetic and the 64-bit signature matches bit-for-bit
    (b=63 contributes -2^63: packbits little-endian + int64 view is
    two's complement)."""
    codes = [
        "".join("+" if wj > 0 else "-" for wj in row)
        for row in _phash_weights(dim=PHASH_GRID * FEATURE_DIM)
    ]
    vals = ",\n            ".join(
        f"({b}, '{code}', {-(2**63) if b == 63 else 2**b})" for b, code in enumerate(codes)
    )
    return f"""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS L FROM documents
    ), pos AS (
        SELECT d.doc_id,
               (CASE WHEN t.i < (d.L % 8) * (d.L // 8 + 1)
                     THEN t.i // (d.L // 8 + 1)
                     ELSE (d.L % 8) + (t.i - (d.L % 8) * (d.L // 8 + 1)) // (d.L // 8)
                END) * 8
               + (ascii(substr(d.text, CAST(t.i AS INT) + 1, 1)) // 16) % 8 AS c
        FROM docs d, UNNEST(range(0, d.L)) AS t(i)
    ), cnts AS (
        SELECT doc_id, c, COUNT(*) AS cnt FROM pos GROUP BY doc_id, c
    ), wt AS (
        SELECT v.b, v.pw, u.c,
               CASE WHEN substr(v.code, CAST(u.c AS INT) + 1, 1) = '+' THEN 1 ELSE -1 END AS w
        FROM (VALUES {vals}) AS v(b, code, pw),
             UNNEST(range(0, 64)) AS u(c)
    ), bits AS (
        SELECT cnts.doc_id, wt.b, MAX(wt.pw) AS pw,
               CASE WHEN SUM(cnts.cnt * wt.w) > 0 THEN 1 ELSE 0 END AS bit
        FROM cnts JOIN wt ON wt.c = cnts.c
        GROUP BY cnts.doc_id, wt.b
    ), ph AS (
        SELECT doc_id, CAST(SUM(bit * pw) AS BIGINT) AS phash
        FROM bits GROUP BY doc_id
    )
    SELECT phash, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM ph GROUP BY phash HAVING COUNT(*) >= 2
    """


@query("q_multimodal_phash", oracle=_phash_oracle(), tags=("multimodal", "phash", "dedup"))
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

    FULL hash check (upgraded from rows-only in round 4): the grid
    feature is integer folded nibble counts and the ±1 projection uses
    exact int64 arithmetic, so DuckDB replays decode → grid counts →
    sign projection → two's-complement bit packing → cluster rollup
    from `documents.text` alone (see ``_phash_oracle``); no float
    rounding exists anywhere that could flip a boundary bit between
    engines. (Fixture texts are non-empty ascii, asserted in tests;
    an empty payload would hash to 0 engine-side by construction.)
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


@query(
    "q_multimodal_binary_files",
    # The staged files are the deterministic BMP renders of the image-
    # modality subset (doc_id % 30 == 0), so DuckDB recomputes the file
    # inventory and decoded features from documents.text alone: the BMP
    # container size is 54 + ((w*3+3)//4)*4 * h bytes, and the pixel
    # features follow the q_multimodal_decode tiled-byte formulas.
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS L,
               8 + CAST((doc_id % 480 + 16) % 16 AS INT) AS h,
               8 + CAST((doc_id % 640 + 16) % 24 AS INT) AS w
        FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 30 = 0
    ), img_elem AS (
        SELECT d.doc_id, d.h, d.w,
               CAST(ascii(substr(d.text, CAST(t.i % d.L AS INT) + 1, 1)) AS DOUBLE) AS b
        FROM docs d, UNNEST(range(0, CAST(d.h * d.w * 3 AS BIGINT))) AS t(i)
    ), img_doc AS (
        SELECT doc_id,
               54 + ((MAX(w) * 3 + 3) // 4) * 4 * MAX(h) AS bmp_bytes,
               round_even(MAX(h) / 1024.0, 6) AS f0,
               round_even(AVG(b) / 255.0, 6) AS fmean
        FROM img_elem GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bmp_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(f0), 6) AS avg_f0,
           ROUND(AVG(fmean), 6) AS avg_mean
    FROM img_doc
    """,
    tags=("multimodal", "binary-file", "ingest", "scan"),
)
def q_multimodal_binary_files(spark, sf_dir):
    """Media ingest from FILES — the production entry point for image
    corpora (LAION-style: millions of image files on object storage)
    exercised end-to-end: stage the image-modality subset (doc_id%30==0)
    as real standalone .bmp files, read them back with Spark's
    ``binaryFile`` source (path/length/content rows, pathGlobFilter
    pruning at the listing level), recover the doc id from the file
    PATH (regexp — metadata travels in the name, as it does on real
    media lakes), decode through the same BMP codec as
    q_multimodal_decode, and aggregate file inventory + pixel features.
    The oracle recomputes everything from documents.text: container
    size is closed-form (54-byte header + 4-byte-aligned BGR rows) and
    features follow the tiled-byte formulas — so the whole
    file-write → listing → binary-read → decode path is hash-checked.

    Scale shape: binaryFile splits the listing across tasks;
    spark.sql.files.maxPartitionBytes bounds per-task payload volume;
    decode is map-side Arrow batches (no payload shuffle); the final
    aggregate is a 4-cell combine."""
    import os

    from ..queries._util import scratch_dir

    path = scratch_dir("q_multimodal_binary_files", sf_dir)
    docs = t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 30 == 0)
    )
    staged = render_media_payloads(attach_payload(docs)).select("doc_id", "payload")
    os.makedirs(path, exist_ok=True)

    def write_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with open(os.path.join(path, f"img_{int(doc_id)}.bmp"), "wb") as fh:
                    fh.write(bytes(payload))
            yield pd.DataFrame({"doc_id": pdf["doc_id"]})

    staged.mapInPandas(write_files, "doc_id long").count()  # stage (idempotent)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(path)
        .select(
            F.regexp_extract(F.input_file_name(), r"img_(\d+)\.bmp", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length"),
            F.col("content").alias("payload"),
        )
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, length, payload in zip(
                pdf["doc_id"], pdf["length"], pdf["payload"]
            ):
                img = decode_image(bytes(payload)).astype(np.float64)
                rows.append(
                    (
                        int(doc_id),
                        int(length),
                        round(img.shape[0] / 1024.0, 6),
                        float(np.round(img.mean() / 255.0, 6)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "bmp_bytes", "f0", "fmean"]
            )

    decoded = files.mapInPandas(
        decode, "doc_id long, bmp_bytes long, f0 double, fmean double"
    )
    return decoded.agg(
        F.count("*").alias("n_files"),
        F.sum("bmp_bytes").alias("total_bytes"),
        F.round(F.avg("f0"), 6).alias("avg_f0"),
        F.round(F.avg("fmean"), 6).alias("avg_mean"),
    )
