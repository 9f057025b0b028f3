"""End-to-end triple parity (BASELINE.md target: P/R >= 0.95 vs
reference-semantics fixtures) + the per-row invariant (per-turn text
equality under stable turn ordering) + manifest reconciliation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.pipeline import normalize_transcripts, run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas

N_CONVS = 120
SEED = 42

TRIPLE_COLS = ["subj_key", "pred", "obj_key", "conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus_pandas(N_CONVS, SEED)


@pytest.fixture(scope="module")
def result(spark, corpus):
    transcripts = spark.createDataFrame(corpus["transcripts"])
    alias_dict = spark.createDataFrame(corpus["alias_dict"])
    return run_pipeline(spark, transcripts, alias_dict=alias_dict,
                        with_manifest=True)


def _pr(got: set, want: set):
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    return precision, recall


def test_triple_parity(result, corpus):
    got_df = result["triples"].select(*TRIPLE_COLS).toPandas()
    got = set(map(tuple, got_df.values.tolist()))
    want = set(map(tuple,
                   corpus["expected_triples"][TRIPLE_COLS].values.tolist()))
    precision, recall = _pr(got, want)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"


def test_component_parity(result, corpus):
    """Every observed member key must resolve to the fixture's canonical."""
    mapping = result["mapping"].toPandas()
    expected = corpus["expected_components"].set_index("member_key")[
        "canonical_key"].to_dict()
    observed = mapping[mapping["raw_key"].isin(expected)]
    wrong = observed[observed.apply(
        lambda r: expected[r["raw_key"]] != r["canonical_key"], axis=1)]
    frac_ok = 1 - len(wrong) / max(1, len(observed))
    assert frac_ok >= 0.98, f"component parity {frac_ok:.4f}; wrong:\n{wrong.head(20)}"


def test_per_turn_text_equality_invariant(spark, corpus):
    """Per-row invariant (BASELINE.json input_hint): after normalization the
    pipeline's view of turn text under stable (conv_id, turn_idx) ordering
    equals the source's — byte-for-byte, independent of physical row order."""
    transcripts = spark.createDataFrame(corpus["transcripts"])
    clean = normalize_transcripts(transcripts)
    got = (clean.orderBy("conv_id", "turn_idx")
           .select("conv_id", "turn_idx", "text").toPandas())
    want = (corpus["transcripts"]
            .drop_duplicates(subset=["conv_id", "turn_idx"])
            .sort_values(["conv_id", "turn_idx"])
            [["conv_id", "turn_idx", "text"]].reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_manifest_reconciliation(result):
    """Reconciliation discipline (ref ingestion.py:82-131): stage totals are
    present, non-negative, and normalize accounts for every input row."""
    mf = result["manifest"].filter(F.col("partition_id") == -1).toPandas()
    stages = set(mf["stage"])
    assert {"normalize", "extract", "triples",
            "materialize_nodes"} <= stages
    norm = mf[mf["stage"] == "normalize"].iloc[0]
    assert norm["in_rows"] >= norm["out_rows"]
    assert (mf["out_rows"] >= 0).all()


def test_nodes_contract(result):
    nodes = result["nodes"]
    assert nodes.filter(F.col("node_id").isNull()).count() == 0
    assert nodes.groupBy("key").count().filter("count > 1").count() == 0
    # deterministic ids: sha1 of case|key
    row = nodes.select("node_id", "key").first()
    import hashlib
    assert row["node_id"] == hashlib.sha1(
        f"case-001|{row['key']}".encode()).hexdigest()


def test_edges_referential_integrity(result):
    nodes_keys = {r["key"] for r in result["nodes"].select("key").collect()}
    edges = result["edges"].select("src_key", "dst_key").collect()
    for e in edges:
        assert e["src_key"] in nodes_keys
        assert e["dst_key"] in nodes_keys
