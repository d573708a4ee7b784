"""Multimodal column plumbing (SURVEY §2 D11).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas feature extraction, partition-friendly layout — is real and
tested. Decode status by format:

- **image: REAL** for uncompressed 24-bit BMP (header parse + numpy
  pixel stats — no image library needed); synthesize_media emits real
  BMP payloads, and extract_features genuinely decodes them.
- **audio: REAL** for PCM WAV via the stdlib ``wave`` module (rate /
  channels / int16 sample stats).
- **video: STUBBED** — no pure-python codec exists; ``decode_real``
  raises NotImplementedError for video and the pipeline falls back to
  ``decode_stub``'s deterministic fake features, keeping the plumbing
  testable.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterable

import numpy as np
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


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """A REAL uncompressed 24-bit BMP payload with deterministic pixels
    (LCG over the seed) — what an object store would hand binaryFile."""
    row_bytes = (width * 3 + 3) & ~3
    img_size = row_bytes * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # vectorized deterministic pixels (multiplicative-hash per position):
    # a per-byte python LCG here cost ~4 s at sf0.1 across the corpus
    idx = np.arange(img_size, dtype=np.uint64)
    vals = ((idx * np.uint64(2654435761) + np.uint64(seed * 97 + 13)) % np.uint64(251)).astype(
        np.uint8
    )
    return header + vals.tobytes()


def encode_wav(n_samples: int, seed: int, rate: int = 8000) -> bytes:
    """A REAL PCM WAV payload (16-bit mono) with deterministic integer
    samples — decodable by the stdlib ``wave`` module anywhere."""
    samples = ((np.arange(n_samples, dtype=np.int64) * (seed % 97 + 3)) % 2001 - 1000) * 16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: image rows carry REAL BMP
    payloads, audio rows REAL WAV payloads (both deterministic from
    doc_id), video rows opaque bytes (no pure-python codec). At scale
    this would be `spark.read.format("binaryFile")` over an object
    store; the downstream plumbing is identical."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                k = doc_id % 3
                if k == 0:
                    payload = encode_bmp(16 + doc_id % 16, 16 + doc_id % 8, doc_id)
                    kind = "image"
                elif k == 1:
                    payload = encode_wav(400 + doc_id % 200, doc_id)
                    kind = "audio"
                else:
                    payload = text.encode("utf-8")
                    kind = "video"
                out.append(
                    {"doc_id": doc_id, "media": payload, "kind": kind,
                     "n_bytes": len(payload)}
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_real(payload: bytes, kind: str) -> dict:
    """REAL decode for the formats stdlib+numpy can handle.

    image: 24-bit uncompressed BMP — header parse + per-channel pixel
    means as the feature vector. audio: PCM WAV via ``wave`` — rate /
    sample stats. video: no pure-python codec exists → NotImplementedError
    (callers fall back to decode_stub; the gate stays honest).
    """
    if kind == "image":
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        if bpp != 24:
            raise ValueError(f"unsupported BMP bpp {bpp}")
        row_bytes = (width * 3 + 3) & ~3
        px = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                           count=row_bytes * abs(height))
        rows = px.reshape(abs(height), row_bytes)[:, : width * 3]
        ints = rows.reshape(abs(height), width, 3).astype(np.int64)
        # channel means from EXACT integer sums (one correctly-rounded
        # double division) — bit-reproducible by any engine that sums the
        # same integers, which is what the SQL oracle does
        means = ints.sum(axis=(0, 1)) / (255.0 * width * abs(height))
        bgr = ints.astype(np.float64) / 255.0
        stds = bgr.std(axis=(0, 1))
        feat = [*means, *stds, float(bgr.min()), float(bgr.max())]
        return {"checksum": zlib.crc32(payload), "width": int(width),
                "height": int(abs(height)), "feat": [float(f) for f in feat]}
    if kind == "audio":
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, nch, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
            raw = w.readframes(nframes)
        ints = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        s = ints.astype(np.float64) / 32768.0
        # rms from the EXACT int64 sum of squares: one double division +
        # one sqrt, both correctly rounded — bit-reproducible cross-engine
        rms = (
            float(np.sqrt(int((ints * ints).sum()) / (len(ints) * 1073741824.0)))
            if len(ints)
            else 0.0
        )
        peak = float(np.abs(s).max()) if len(s) else 0.0
        zcr = float((np.diff(np.signbit(s)) != 0).mean()) if len(s) > 1 else 0.0
        feat = [rms, peak, zcr, float(s.mean() * 0.5 + 0.5),
                min(len(s) / 65536.0, 1.0), min(rate / 48000.0, 1.0),
                float(nch / 2.0), 0.0]
        return {"checksum": zlib.crc32(payload), "width": int(rate),
                "height": int(nch), "feat": [float(f) for f in feat]}
    raise NotImplementedError(
        "video decode requires a codec library not present in this container"
    )


def decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode so the pipeline shape is testable:
    checksum + fake dimensions + an 8-dim 'embedding' from byte stats."""
    crc = zlib.crc32(payload)
    width = 16 + (crc & 0xFF)
    height = 16 + ((crc >> 8) & 0xFF)
    feat = [((crc >> (4 * i)) & 0xF) / 15.0 for i in range(8)]
    return {"checksum": crc, "width": width, "height": height, "feat": feat}


def _decode(payload: bytes, kind: str) -> dict:
    """Real decode where a pure-python codec exists (BMP, WAV); honest
    deterministic stub for video. A malformed/unknown container falls
    back to the stub instead of killing the batch — the corrupt-record
    tolerance a 100 TB ingest needs (quarantine, don't crash)."""
    if kind in ("image", "audio"):
        try:
            return decode_real(payload, kind)
        except (ValueError, EOFError, struct.error, wave.Error):
            return decode_stub(payload, kind)
    return decode_stub(payload, kind)


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
            feats = [_decode(m, k) for m, k in zip(pdf["media"], pdf["kind"])]
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
    """Synthesize → extract → per-kind feature summary.

    Hash-checked against a SQL oracle that recomputes the expected stats
    ANALYTICALLY from the deterministic payload generators — so the green
    row proves the whole encode→decode round-trip (BMP header+pixel
    parse, WAV frame parse), not just the aggregation. feat[0] (B-channel
    mean / audio rms) is a single correctly-rounded double derived from
    exact integer sums on both engines, emitted as per-doc floor-e6 then
    bigint-summed — exact under any partitioning. Video decode is the
    honest stub (no pure-python codec), so its feature column is NULL.
    """
    feats = extract_features(synthesize_media(spark, sf_dir))
    feat0_e6 = F.when(
        F.col("kind") != "video",
        F.floor(F.element_at("feat", 1) * 1000000),
    )
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(feat0_e6).alias("sum_feat0_e6"),
    )


# The oracle derives every expected stat from the generator definitions
# (encode_bmp/encode_wav above): BMP = 54-byte header + padded rows of
# multiplicative-hash pixels; WAV = 44-byte canonical header + 16-bit
# samples ((i*step) % 2001 - 1000)*16. A decode bug (wrong offset, wrong
# channel order, padding mishandled) breaks the hash.
ORACLE["multimodal_features"] = """
WITH img AS (
    SELECT doc_id,
           16 + doc_id % 16 AS w,
           16 + doc_id % 8  AS h,
           ((3 * (16 + doc_id % 16) + 3) // 4) * 4 AS row_bytes
    FROM documents WHERE doc_id % 3 = 0
),
img_px AS (
    SELECT i.doc_id, i.w, i.h, i.row_bytes,
           ((r.r * i.row_bytes + 3 * c.c) * 2654435761 + i.doc_id * 97 + 13) % 251 AS val
    FROM img i,
         LATERAL (SELECT unnest(range(i.h)) AS r) r,
         LATERAL (SELECT unnest(range(i.w)) AS c) c
),
img_stats AS (
    SELECT doc_id,
           54 + any_value(row_bytes) * any_value(h) AS n_bytes,
           CAST(floor((CAST(sum(val) AS DOUBLE) / (255.0 * any_value(w) * any_value(h)))
                      * 1000000) AS BIGINT) AS feat0_e6
    FROM img_px GROUP BY doc_id
),
aud AS (
    SELECT doc_id, 400 + doc_id % 200 AS n, doc_id % 97 + 3 AS step
    FROM documents WHERE doc_id % 3 = 1
),
aud_stats AS (
    SELECT a.doc_id,
           44 + 2 * any_value(a.n) AS n_bytes,
           CAST(floor(sqrt(CAST(sum(v.v * v.v) AS DOUBLE)
                           / (any_value(a.n) * 1073741824.0)) * 1000000)
                AS BIGINT) AS feat0_e6
    FROM aud a,
         LATERAL (SELECT ((unnest(range(a.n)) * a.step) % 2001 - 1000) * 16 AS v) v
    GROUP BY a.doc_id
),
vid AS (
    SELECT doc_id, strlen(text) AS n_bytes FROM documents WHERE doc_id % 3 = 2
)
SELECT 'image' AS kind, count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(feat0_e6) AS BIGINT) AS sum_feat0_e6
FROM img_stats
UNION ALL
SELECT 'audio', count(*), CAST(sum(n_bytes) AS BIGINT),
       CAST(sum(feat0_e6) AS BIGINT)
FROM aud_stats
UNION ALL
SELECT 'video', count(*), CAST(sum(n_bytes) AS BIGINT), NULL::BIGINT
FROM vid
"""


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
            feats = [_decode(m, k) for m, k in zip(medias, kinds)]
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
    """Per-kind transform profile (op, items, frames, output volume).

    Hash-checked: every transform output is an integer function of the
    deterministic payload sizes, so the oracle recomputes the profile
    analytically from the generators — a dispatch or sizing bug in the
    Arrow transform pass breaks the hash."""
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


ORACLE["multimodal_transform"] = f"""
WITH img AS (
    SELECT doc_id FROM documents WHERE doc_id % 3 = 0
),
aud AS (
    SELECT doc_id, 44 + 2 * (400 + doc_id % 200) AS n_bytes
    FROM documents WHERE doc_id % 3 = 1
),
vid AS (
    SELECT doc_id, strlen(text) AS n_bytes FROM documents WHERE doc_id % 3 = 2
)
SELECT 'image' AS kind, 'resize' AS op, count(*) AS n_items,
       count(*) AS total_frames,
       CAST(count(*) * {TARGET_W * TARGET_H * 3} AS BIGINT) AS total_out_bytes
FROM img
UNION ALL
SELECT 'audio', 'audio_window', count(*),
       CAST(sum(greatest(n_bytes // {AUDIO_WIN_MS}, 1)) AS BIGINT),
       CAST(sum(n_bytes) AS BIGINT)
FROM aud
UNION ALL
SELECT 'video', 'frame_sample', count(*),
       CAST(count(*) * {N_FRAMES} AS BIGINT),
       CAST(count(*) * {N_FRAMES * TARGET_W * TARGET_H * 3} AS BIGINT)
FROM vid
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_transform": multimodal_transform,
}
