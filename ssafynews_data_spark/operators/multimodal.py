"""Multimodal column plumbing (north-star extension).

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.MEDIA_ASSET).  The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual
image/audio decode is STUBBED (the test image has no codec libraries)
behind ``decode_image_batch``'s import-try: with no PIL available it
produces a deterministic fake feature vector derived from the payload
bytes, so pipelines remain runnable and reproducible end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

THUMB_W, THUMB_H = 32, 32
N_FRAMES = 4


@register(
    "media_metadata",
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS mime,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    tags=("multimodal",),
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload (here fabricated as the
    utf-8 bytes of ``text`` — the container ships no media fixture),
    byte length, content hash.  Exercises binary casts + hashing on
    binary, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def fabricate_assets(docs: DataFrame) -> DataFrame:
    """documents → MEDIA_ASSET-shaped frame (deterministic fake payloads:
    the text bytes).  Stand-in source until a real media table exists."""
    payload = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.octet_length(payload).cast("long") * 10).alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched decode / feature-extract UDFs over mapInPandas.
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fold payload bytes
    into a fixed-dim feature vector.  NOT a real image feature — the
    contract (shape, dtype, determinism) is what's being exercised."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 1_000_003
    return [v / 1_000_003.0 for v in acc]


def decode_image_batch(it: Iterator) -> Iterator:
    """mapInPandas body: decode → resize(32×32) → feature-extract.

    Real decode is gated on PIL; the container has no codec libs, so the
    fallback produces the deterministic fake above.  Batch shape in/out
    is the real Arrow contract either way.
    """
    import pandas as pd

    try:  # pragma: no cover - PIL absent in the test image
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in it:
        feats = []
        for payload in pdf["payload"]:
            raw = bytes(payload) if payload is not None else b""
            if have_pil:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode requires codec fixtures; not shipped"
                )
            feats.append(_fake_features(raw))
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "feat": feats,
                "thumb_w": THUMB_W,
                "thumb_h": THUMB_H,
                "n_frames": [
                    N_FRAMES if m == "video" else 1 for m in pdf["media_type"]
                ],
            }
        )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas.  Repartition first so
    decode parallelism tracks cluster width rather than file layout
    (media payloads skew partition sizes badly at scale)."""
    n = assets.sparkSession.sparkContext.defaultParallelism
    return assets.repartition(n).mapInPandas(decode_image_batch, DECODED_SCHEMA)


@register(
    "media_decode_contract",
    oracle="""
        SELECT CASE doc_id % 3 + 1 WHEN 1 THEN 'image'
                                   WHEN 2 THEN 'audio'
                                   ELSE 'video' END AS media_type,
               count(*) AS n_assets,
               count(*) AS n_feat_ok,
               CAST(sum(CASE WHEN doc_id % 3 + 1 = 3 THEN 4 ELSE 1 END)
                    AS BIGINT) AS total_frames,
               CAST(32 AS INT) AS thumb_w,
               CAST(32 AS INT) AS thumb_h
        FROM documents GROUP BY 1
    """,
    tags=("multimodal", "mapInPandas", "contract"),
)
def media_decode_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for the multimodal decode plumbing: the
    media-type routing, per-type asset counts, frame-sampling rule
    (video → 4 frames, else 1), thumbnail dims, and feature-vector
    completeness are all deterministic facts DuckDB recomputes from the
    fabrication rule — only the feature VALUES (engine-internal fake
    decode) stay rows-only in ``media_decode_features``."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(fabricate_assets(docs))
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum((F.size("feat") == 8).cast("long")).alias("n_feat_ok"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.max("thumb_w").alias("thumb_w"),
        F.max("thumb_h").alias("thumb_h"),
    )


@register("media_decode_features", tags=("multimodal", "mapInPandas"))
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: fabricate binary assets → Arrow
    decode batches → per-media-type feature stats.  Rows-only check
    (fake decode is engine-internal); determinism asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(fabricate_assets(docs))
    return (
        decoded.select(
            "media_type",
            F.col("feat")[0].cast("double").alias("f0"),
            "n_frames",
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.round(F.avg("f0"), 4).alias("avg_f0"),
            F.sum("n_frames").alias("total_frames"),
        )
    )
