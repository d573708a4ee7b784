"""Multimodal column plumbing (SURVEY §2 D11).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas feature extraction, partition-friendly layout — is real and
tested; the actual media decode is STUBBED (no image/audio libs in this
container): ``decode_stub`` derives deterministic fake features from the
bytes, and ``decode_real`` raises NotImplementedError where a codec call
would go.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

ORACLE: dict[str, str] = {}

MEDIA_SCHEMA = "doc_id bigint, media binary, kind string, n_bytes int"
FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes int, checksum bigint, "
    "width int, height int, feat array<double>"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: the utf-8 bytes stand in for an
    encoded image payload. At scale this would be `spark.read.format
    ("binaryFile")` over an object store; the downstream plumbing is
    identical."""
    docs = table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.length(media).alias("n_bytes"),
    )


def decode_real(payload: bytes, kind: str):
    """Where PIL / torchaudio / pyav decode would run. STUB — the
    container has no media libraries."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this container"
    )


def decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode so the pipeline shape is testable:
    checksum + fake dimensions + an 8-dim 'embedding' from byte stats."""
    crc = zlib.crc32(payload)
    width = 16 + (crc & 0xFF)
    height = 16 + ((crc >> 8) & 0xFF)
    feat = [((crc >> (4 * i)) & 0xF) / 15.0 for i in range(8)]
    return {"checksum": crc, "width": width, "height": height, "feat": feat}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas keeps each batch in one python call (no per-row UDF
    overhead); at cluster scale batches arrive pre-partitioned by input
    split, so decode parallelism == core count with zero shuffle.
    """

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_stub(m, k) for m, k in zip(pdf["media"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": [f["checksum"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feat": [f["feat"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only gate: synthesize → extract → per-kind feature summary."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("feat", 1)), 6).alias("avg_feat0"),
    )


QUERIES = {"multimodal_features": multimodal_features}
