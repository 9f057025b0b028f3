"""Multimodal plumbing: schema, determinism, error isolation, and the
no-shuffle property of the media feature extractor."""

from pyspark.sql import functions as F

from owl_n4j_spark.operators.multimodal import (
    extract_media_features,
    synth_media,
)


def test_media_features_schema_and_determinism(spark):
    media = synth_media(spark, 60, seed=42)
    feats = extract_media_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    # typed per-kind columns
    for r in rows.values():
        if r["sha1"] and r["n_bytes"] > 0:
            if r["kind"] == "image":
                assert r["width"] is not None and r["height"] is not None
            elif r["kind"] == "audio":
                assert r["transcript"] is not None
            elif r["kind"] == "video":
                assert r["n_frames"] is not None
        assert len(r["feature"]) == 8
    # deterministic across re-runs
    rows2 = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert {k: v["sha1"] for k, v in rows.items()} == \
           {k: v["sha1"] for k, v in rows2.items()}


def test_media_error_isolation(spark):
    """Empty payloads (every id % 17 == 5) must not fail the batch — their
    typed columns are null, the row survives."""
    media = synth_media(spark, 60, seed=42)
    feats = extract_media_features(media)
    bad = feats.filter((F.col("n_bytes") == 0)).collect()
    assert len(bad) > 0
    for r in bad:
        assert r["width"] is None and r["transcript"] is None


def test_media_no_shuffle(spark):
    """Media bytes must not cross a shuffle: the extractor plan has no
    Exchange."""
    media = synth_media(spark, 30, seed=1, n_partitions=3)
    feats = extract_media_features(media)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert feats.rdd.getNumPartitions() == 3
