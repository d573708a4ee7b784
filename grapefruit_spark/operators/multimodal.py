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


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of extract_features: the batch stays a pyarrow
    RecordBatch end-to-end, so the binary payloads are never copied into
    pandas object arrays — the right surface when the payload bytes
    dominate the row (tested equal to the pandas path)."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            medias = batch.column("media").to_pylist()
            kinds = batch.column("kind").to_pylist()
            feats = [decode_stub(m, k) for m, k in zip(medias, kinds)]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "kind": batch.column("kind"),
                    "n_bytes": batch.column("n_bytes"),
                    "checksum": pa.array([f["checksum"] for f in feats], pa.int64()),
                    "width": pa.array([f["width"] for f in feats], pa.int32()),
                    "height": pa.array([f["height"] for f in feats], pa.int32()),
                    "feat": pa.array([f["feat"] for f in feats], pa.list_(pa.float64())),
                }
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------ transforms
TRANSFORM_SCHEMA = (
    "doc_id bigint, kind string, op string, out_w int, out_h int, "
    "n_frames int, frame_offsets array<int>, out_bytes int"
)

TARGET_W, TARGET_H = 64, 64
N_FRAMES = 4
AUDIO_WIN_MS = 250


def resize_stub(payload: bytes, w: int, h: int) -> dict:
    """Image resize placeholder: a real pipeline calls PIL here; the stub
    derives the 'resized' byte count deterministically."""
    return {"op": "resize", "out_w": w, "out_h": h, "n_frames": 1,
            "frame_offsets": [0], "out_bytes": w * h * 3}


def frame_sample_stub(payload: bytes, n_frames: int) -> dict:
    """Video frame sampling placeholder: evenly spaced offsets into the
    (fake) stream — a real pipeline seeks with pyav at these offsets."""
    dur = max(len(payload), 1)
    offs = [i * dur // n_frames for i in range(n_frames)]
    return {"op": "frame_sample", "out_w": TARGET_W, "out_h": TARGET_H,
            "n_frames": n_frames, "frame_offsets": offs,
            "out_bytes": n_frames * TARGET_W * TARGET_H * 3}


def audio_window_stub(payload: bytes, win_ms: int) -> dict:
    """Audio windowing placeholder: fixed-width windows over the (fake)
    sample stream — torchaudio framing in a real pipeline."""
    n = max(len(payload) // max(win_ms, 1), 1)
    return {"op": "audio_window", "out_w": 0, "out_h": 0, "n_frames": n,
            "frame_offsets": [i * win_ms for i in range(min(n, 16))],
            "out_bytes": len(payload)}


def transform_media(media: DataFrame) -> DataFrame:
    """Per-kind media transform over Arrow batches: images resize, videos
    frame-sample, audio windows — one mapInPandas, dispatch inside the
    batch (no per-kind shuffle or split scans)."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for doc_id, payload, kind in zip(pdf["doc_id"], pdf["media"], pdf["kind"]):
                if kind == "image":
                    t = resize_stub(payload, TARGET_W, TARGET_H)
                elif kind == "video":
                    t = frame_sample_stub(payload, N_FRAMES)
                else:
                    t = audio_window_stub(payload, AUDIO_WIN_MS)
                out.append({"doc_id": doc_id, "kind": kind, **t})
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=TRANSFORM_SCHEMA)


def multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only gate: per-kind transform profile (op, items, frames,
    output volume)."""
    t = transform_media(synthesize_media(spark, sf_dir))
    return (
        t.groupBy("kind", "op")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("out_bytes").alias("total_out_bytes"),
        )
        .orderBy("kind")
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_transform": multimodal_transform,
}
