"""Multi-format transcript sources (sources/formats.py): every format must
land on the same contract and produce the same KG as the parquet path."""

import os

import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.sources.formats import normalize_to_contract, read_transcripts
from owl_n4j_spark.synth import generate_corpus_pandas


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        generate_corpus_pandas(20, seed=3)["transcripts"])


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_roundtrip_every_format(spark, corpus_df, tmp_path_factory, fmt):
    root = str(tmp_path_factory.mktemp(f"fmt_{fmt}"))
    path = os.path.join(root, "data")
    w = corpus_df.coalesce(2).write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "orc":
        w.orc(path)
    got = read_transcripts(spark, path, fmt)
    assert [f.name for f in got.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    want = {(r["conv_id"], r["turn_idx"], r["role"], r["text"])
            for r in corpus_df.collect()}
    have = {(r["conv_id"], r["turn_idx"], r["role"], r["text"])
            for r in got.collect()}
    assert have == want


def test_contract_fills_optional_and_drops_extras(spark):
    raw = spark.createDataFrame(
        [("c1", 1, "hello", "junk")],
        "conv_id string, turn_idx long, text string, extra_col string")
    got = normalize_to_contract(raw)
    row = got.collect()[0]
    assert row["role"] is None and row["tool"] is None and row["ts"] is None
    assert "extra_col" not in got.columns
    assert dict(got.dtypes)["turn_idx"] == "int"


def test_contract_rejects_missing_required(spark):
    raw = spark.createDataFrame([("a",)], "conv_id string")
    with pytest.raises(ValueError, match="missing required"):
        normalize_to_contract(raw)


def test_unsupported_format(spark):
    with pytest.raises(ValueError, match="unsupported"):
        read_transcripts(spark, "/tmp/nowhere", "avro!")


def test_csv_source_feeds_pipeline_identically(spark, corpus_df, tmp_path_factory):
    """S4 end-to-end: a CSV transcript drop produces the same KG as the
    native DataFrame path."""
    from owl_n4j_spark.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("fmt_pipe"))
    path = os.path.join(root, "data")
    corpus_df.coalesce(2).write.mode("overwrite").option("header", True).csv(path)
    via_csv = run_pipeline(spark, read_transcripts(spark, path, "csv"),
                           with_manifest=False)
    native = run_pipeline(spark, corpus_df, with_manifest=False)
    a = sorted(map(tuple, via_csv["nodes"].select("key", "type").collect()))
    b = sorted(map(tuple, native["nodes"].select("key", "type").collect()))
    assert a == b
