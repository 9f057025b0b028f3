"""Multimodal (image/audio/video) column operators — Spark plumbing with
stubbed codecs.

The reference routes media through per-format ingestors: Whisper audio
transcription (/root/reference/ingestion/scripts/audio_processor.py:98-128),
vision-model image description + EXIF harvest
(/root/reference/ingestion/scripts/cellebrite/parser.py:33-95), and video
frame sampling. The decode/model layers are external services there and the
decoding libraries are not available in this container, so here each codec
is a clearly marked deterministic STUB — but everything Spark-side is real
and tested: the typed binary schema, Arrow-batched ``mapInPandas`` over
size-bounded batches, partition-count preservation, and the typed metadata
structs a 100 TB media pipeline needs.

Scale shape: media bytes never pass through a shuffle — every operator is a
narrow mapInPandas over the input partitioning; only the (tiny) extracted
features/metadata flow into joins downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("media_id string, kind string, content binary, "
                "mime string, ts timestamp")

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, sha1 string, "
    "width int, height int, duration_sec double, n_frames int, "
    "transcript string, feature array<float>"
)

# batch size bound for media rows — Arrow batches of raw bytes must stay
# well under the 2 GB arrow-chunk limit; at ~10 MB/object this is ~320 MB
MEDIA_ROWS_PER_BATCH = 32


def _decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB: real impl would be PIL/libvips decode. Deterministic fake:
    dimensions derived from the content hash (stable across runs/executors).
    Raises on empty payload like a real decoder would."""
    if not content:
        raise ValueError("empty image payload")
    h = hashlib.sha1(content).digest()
    return 320 + h[0] % 4 * 160, 240 + h[1] % 4 * 120


def _transcribe_audio_stub(content: bytes) -> tuple[float, str]:
    """STUB for the Whisper transcription stage (audio_processor.py:98-128).
    Deterministic fake transcript keyed by content hash."""
    if not content:
        raise ValueError("empty audio payload")
    dur = round(1.0 + (len(content) % 600), 1)
    return dur, f"transcript-{hashlib.sha1(content).hexdigest()[:12]}"


def _sample_video_frames_stub(content: bytes) -> tuple[float, int]:
    """STUB for ffmpeg frame sampling: (duration, frames at 1 fps)."""
    if not content:
        raise ValueError("empty video payload")
    dur = float(1 + len(content) % 3600)
    return dur, int(dur)  # 1 fps sample


def _feature_stub(content: bytes, dim: int = 8) -> list[float]:
    """STUB embedding: hashing-trick feature from content bytes —
    deterministic, unit-free; stands in for a CLIP/CLAP encoder."""
    h = hashlib.sha256(content).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, content binary, mime, ts) -> typed features.

    One Arrow-batched pass; corrupt/unknown rows yield nulls in their typed
    columns instead of failing the batch (the reference's per-entity error
    isolation, neo4j_writer.py:1154-1170)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), MEDIA_ROWS_PER_BATCH):
                chunk = pdf.iloc[start:start + MEDIA_ROWS_PER_BATCH]
                rows = []
                for mid, kind, content in zip(chunk["media_id"],
                                              chunk["kind"],
                                              chunk["content"]):
                    content = bytes(content) if content is not None else b""
                    row = dict(media_id=mid, kind=kind,
                               n_bytes=len(content),
                               sha1=hashlib.sha1(content).hexdigest(),
                               width=None, height=None, duration_sec=None,
                               n_frames=None, transcript=None,
                               feature=_feature_stub(content))
                    try:
                        if kind == "image":
                            row["width"], row["height"] = _decode_image_stub(content)
                        elif kind == "audio":
                            row["duration_sec"], row["transcript"] = \
                                _transcribe_audio_stub(content)
                        elif kind == "video":
                            row["duration_sec"], row["n_frames"] = \
                                _sample_video_frames_stub(content)
                    except ValueError:
                        pass  # quarantine-shaped: typed cols stay null
                    rows.append(row)
                out = pd.DataFrame(rows)
                out["n_bytes"] = out["n_bytes"].astype("int64")
                out["width"] = out["width"].astype("Int32")
                out["height"] = out["height"].astype("Int32")
                out["n_frames"] = out["n_frames"].astype("Int32")
                yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _resize_image_stub(content: bytes, w: int, h: int) -> bytes:
    """STUB: real impl is PIL/libvips resample. Deterministic fake: output
    bytes derive from (content hash, target dims) with a plausible size
    (smaller than input for downscale), so the plumbing around it —
    batching, schema, size accounting — is fully testable."""
    if not content:
        raise ValueError("empty image payload")
    h0 = hashlib.sha256(content + f"|{w}x{h}".encode()).digest()
    n = max(16, min(len(content), (w * h) // 64))
    return (h0 * (n // len(h0) + 1))[:n]


def resize_images(media: DataFrame, width: int = 256, height: int = 256) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas (the brief's resize op):
    image rows come back with resized payload bytes + old/new sizes; non-
    image rows pass through with NULL resized columns; corrupt rows
    quarantine as NULLs instead of failing the batch. Narrow op — no
    shuffle, media bytes never leave the partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), MEDIA_ROWS_PER_BATCH):
                chunk = pdf.iloc[start:start + MEDIA_ROWS_PER_BATCH]
                rows = []
                for mid, kind, content in zip(chunk["media_id"],
                                              chunk["kind"],
                                              chunk["content"]):
                    content = bytes(content) if content is not None else b""
                    row = dict(media_id=mid, kind=kind,
                               n_bytes=len(content),
                               resized=None, resized_bytes=None,
                               width=None, height=None)
                    if kind == "image":
                        try:
                            out = _resize_image_stub(content, width, height)
                            row.update(resized=out, resized_bytes=len(out),
                                       width=width, height=height)
                        except ValueError:
                            pass
                    rows.append(row)
                out_pdf = pd.DataFrame(rows)
                out_pdf["resized_bytes"] = out_pdf["resized_bytes"].astype("Int64")
                out_pdf["width"] = out_pdf["width"].astype("Int32")
                out_pdf["height"] = out_pdf["height"].astype("Int32")
                yield out_pdf

    return media.mapInPandas(
        run, schema=("media_id string, kind string, n_bytes bigint, "
                     "resized binary, resized_bytes bigint, "
                     "width int, height int"))


FRAME_SAMPLE_FPS = 1.0


def sample_video_frames(media: DataFrame, fps: float = FRAME_SAMPLE_FPS) -> DataFrame:
    """Video frame sampling as a mapInPandas UDTF shape: one INPUT video row
    fans out to N frame rows (frame_idx, t_offset_sec, frame sha) — the
    variable-arity output a frame pipeline needs; frames themselves stay
    stubbed (no codecs in this container), the Spark-side row expansion,
    schema and batch bounds are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"],
                                          pdf["content"]):
                if kind != "video":
                    continue
                content = bytes(content) if content is not None else b""
                try:
                    dur, _ = _sample_video_frames_stub(content)
                except ValueError:
                    continue
                n = int(dur * fps)
                for i in range(min(n, 3600)):
                    fh = hashlib.sha1(content + i.to_bytes(4, "big")).hexdigest()
                    rows.append((mid, i, round(i / fps, 3), fh))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "t_offset_sec", "frame_sha1"])

    return media.mapInPandas(
        run, schema=("media_id string, frame_idx int, "
                     "t_offset_sec double, frame_sha1 string"))


def normalize_exif_metadata(meta: DataFrame) -> DataFrame:
    """EXIF sidecar metadata -> typed columns, all inside whole-stage
    codegen (SURVEY S3 — the reference's per-file tag harvest,
    cellebrite/parser.py:33-95): datetime tags to ISO strings, sexagesimal
    GPS + hemisphere refs to signed decimal degrees. Expects columns
    (media_id, exif_dt, capture_time_us, gps_lat, gps_lat_ref, gps_lon,
    gps_lon_ref); malformed values become NULL, never a failed batch."""
    from pyspark.sql import functions as F

    from owl_n4j_spark.functions.exif import (
        exif_dt_to_iso,
        exif_gps_to_decimal,
        us_dt_to_iso,
    )
    return meta.select(
        "media_id",
        exif_dt_to_iso(F.col("exif_dt")).alias("taken_at"),
        us_dt_to_iso(F.col("capture_time_us")).alias("captured_at"),
        exif_gps_to_decimal(F.col("gps_lat"), F.col("gps_lat_ref")).alias("lat"),
        exif_gps_to_decimal(F.col("gps_lon"), F.col("gps_lon_ref")).alias("lon"),
    )


def synth_media(spark, n: int, seed: int = 42, n_partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 7919 + int(i)) % (2**31 - 1))
                kind = ["image", "audio", "video"][int(i) % 3]
                size = int(rng.randint(64, 4096))
                content = rng.bytes(size) if int(i) % 17 != 5 else b""
                rows.append(dict(
                    media_id=f"m-{int(i):06d}", kind=kind, content=content,
                    mime={"image": "image/jpeg", "audio": "audio/wav",
                          "video": "video/mp4"}[kind],
                    ts=pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=int(i)),
                ))
            yield pd.DataFrame(rows)

    return (spark.range(0, n, numPartitions=n_partitions)
            .mapInPandas(gen, schema=MEDIA_SCHEMA))
