"""Media feature-extraction serving query (SURVEY S5/L10 completion — the
reference's per-format media harvest: audio container probing before Whisper
in ingestion/scripts/audio_processor.py:98-128, image metadata harvest in
ingestion/scripts/cellebrite/parser.py:33-95, ingestion.py:631-655).

q_media_features proves the REAL stdlib container codecs end-to-end with an
exact DuckDB oracle: media payloads are rendered deterministically from
``documents.doc_id`` (real PNG/GIF/JPEG/WAV bytes — operators/multimodal
``media_spec`` is pure integer arithmetic on the id), the extractor parses
the format headers back, and the oracle recomputes the same arithmetic in
SQL. A parser that misreads any header byte hash-mismatches immediately.

Scale shape: render + parse are one fused narrow mapInPandas pass — media
bytes never shuffle; only the tiny typed feature rows leave the stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owl_n4j_spark.operators.multimodal import (
    extract_media_features,
    media_for_ids,
)
from owl_n4j_spark.plans.relational import load


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    media = media_for_ids(docs, "doc_id", seed=42)
    feats = extract_media_features(media)
    return (
        feats.select(
            "media_id", "kind", "fmt", "width", "height",
            F.round("duration_sec", 6).alias("duration_sec"), "n_frames")
        .orderBy("media_id")
    )


# Mirrors operators/multimodal.media_spec(i) expression by expression:
#   kind      = (image, audio, video)[i % 3]
#   empty     = i % 17 == 5                       -> all typed columns NULL
#   image fmt = (png, gif, jpeg)[(i // 3) % 3]; w = 16+(i*7)%240,
#               h = 16+(i*13)%180
#   audio     = wav, rate 8000, n_frames = 400+(i*37)%4000,
#               duration = n_frames / 8000
#   video     = mp4 (declared stub): size = 64+(i*11)%4096,
#               duration = 1 + size % 3600, n_frames = duration (1 fps)
SQL_MEDIA_FEATURES = """
WITH spec AS (
  SELECT doc_id AS i,
         'm-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS kind,
         (doc_id % 17 = 5) AS empty
  FROM documents
)
SELECT media_id, kind,
  CASE WHEN empty THEN NULL
       WHEN kind = 'image' THEN
         CASE (i // 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                           ELSE 'jpeg' END
       WHEN kind = 'audio' THEN 'wav' ELSE 'mp4' END AS fmt,
  CASE WHEN NOT empty AND kind = 'image'
       THEN CAST(16 + (i * 7) % 240 AS INTEGER) END AS width,
  CASE WHEN NOT empty AND kind = 'image'
       THEN CAST(16 + (i * 13) % 180 AS INTEGER) END AS height,
  CASE WHEN empty THEN NULL
       WHEN kind = 'audio'
       THEN round((400 + (i * 37) % 4000) / 8000.0, 6)
       WHEN kind = 'video'
       THEN round(CAST(1 + (64 + (i * 11) % 4096) % 3600 AS DOUBLE), 6)
       END AS duration_sec,
  CASE WHEN NOT empty AND kind = 'video'
       THEN CAST(1 + (64 + (i * 11) % 4096) % 3600 AS INTEGER)
       END AS n_frames
FROM spec
ORDER BY media_id
"""


MEDIA_REGISTRY = {
    "q_media_features": (q_media_features, SQL_MEDIA_FEATURES),
}
