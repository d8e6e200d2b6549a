"""Multimodal manifest query (north-star extension).

The multimodal column *pattern*: one row carries text + embedding vector +
typed metadata; binary payload plumbing (decode/resize/frame-sample UDF
shapes) lives in ``operators/multimodal.py`` with a deterministic fake
decoder (the image/audio libs aren't in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.similarity import l2_norm
from ..functions.text import tokens
from ._util import t
from .registry import query


@query(
    "q_multimodal_manifest",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(strlen(text) AS INT) AS text_bytes,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6) AS emb_norm,
           CAST(label AS INT) AS label
    FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    tags=("multimodal",),
)
def q_multimodal_manifest(spark, sf_dir):
    """Multimodal manifest: text + vector + metadata in one row (documents
    ⋈ embeddings on doc_id = vec_id), projecting per-modality stats. The
    1:1 key join shuffles both sides once; with production bucketing on
    doc_id it would be shuffle-free."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(tokens("text")).cast("int").alias("n_tokens"),
        F.octet_length("text").cast("int").alias("text_bytes"),
        F.size("embedding").cast("int").alias("dim"),
        F.round(l2_norm(F.col("embedding")), 6).alias("emb_norm"),
        F.col("label").cast("int").alias("label"),
    )
