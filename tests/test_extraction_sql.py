"""The JVM-only extractor must be record-for-record EQUAL to the
Arrow/pandas reference extractor on both corpora (synthetic fuzz + events-
derived), and its plan must contain no Python evaluation."""

import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.operators.extraction import extract_records
from owl_n4j_spark.operators.extraction_sql import extract_records_sql
from owl_n4j_spark.pipeline import normalize_transcripts
from owl_n4j_spark.synth import generate_corpus_pandas

COLS = ["conv_id", "turn_idx", "kind", "surface", "mention_key",
        "mention_type", "subj_key", "pred", "obj_key", "amount", "date"]


def _records_set(df):
    return {tuple(r) for r in df.select(*COLS).collect()}


def test_sql_extractor_equals_pandas_on_synth(spark):
    corpus = generate_corpus_pandas(60, seed=21)
    tr = normalize_transcripts(spark.createDataFrame(corpus["transcripts"]))
    a = _records_set(extract_records(tr))
    b = _records_set(extract_records_sql(tr))
    missing, extra = a - b, b - a
    assert not missing and not extra, (
        f"missing={list(missing)[:5]} extra={list(extra)[:5]}")


def test_sql_extractor_equals_pandas_on_events(spark):
    from owl_n4j_spark.sources.events_transcripts import transcripts_from_events
    tr = normalize_transcripts(
        transcripts_from_events(spark, "/root/testdata/sf0.001"))
    a = _records_set(extract_records(tr))
    b = _records_set(extract_records_sql(tr))
    assert a == b


def test_sql_extractor_is_jvm_only(spark):
    corpus = generate_corpus_pandas(5, seed=2)
    tr = spark.createDataFrame(corpus["transcripts"])
    plan = extract_records_sql(tr)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage in plan: {marker}"
