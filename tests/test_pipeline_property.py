"""Property-based pipeline invariants (hypothesis over seeds): for ANY
seeded corpus the pipeline must satisfy —
  1. referential integrity: every edge endpoint is a node key;
  2. determinism: two runs produce identical node/edge sets;
  3. canonical-key stability: every canonical key maps to itself
     (idempotent mapping fixpoint);
  4. triples never reference raw keys that the mapping canonicalized away.
Seeds are drawn by hypothesis; each case is a small corpus so the whole
sweep stays fast."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas

_SPARK = {}


@pytest.fixture(scope="module", autouse=True)
def _cache_spark(spark):
    _SPARK["s"] = spark
    yield


def _run(seed: int):
    spark = _SPARK["s"]
    corpus = generate_corpus_pandas(8, seed=seed)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])
    return run_pipeline(spark, tr, alias_dict=ad, with_manifest=False)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_pipeline_invariants(seed):
    res = _run(seed)
    node_keys = {r["key"] for r in res["nodes"].select("key").collect()}
    edges = res["edges"].select("src_key", "dst_key").collect()
    # 1. referential integrity
    for e in edges:
        assert e["src_key"] in node_keys
        assert e["dst_key"] in node_keys
    # 3. mapping fixpoint: canonical keys map to themselves when observed
    mapping = {r["raw_key"]: r["canonical_key"]
               for r in res["mapping"].collect()}
    for raw, canon in mapping.items():
        if canon in mapping:
            assert mapping[canon] == canon, (raw, canon)
    # 4. triples reference only canonical keys (never a remapped-away raw)
    remapped_away = {r for r, c in mapping.items() if c != r}
    tri = res["triples"].select("subj_key", "obj_key").collect()
    for t in tri:
        assert t["subj_key"] not in remapped_away
        assert t["obj_key"] not in remapped_away


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_pipeline_deterministic(seed):
    a = _run(seed)
    b = _run(seed)
    na = sorted(map(tuple, a["nodes"].select("node_id", "key").collect()))
    nb = sorted(map(tuple, b["nodes"].select("node_id", "key").collect()))
    assert na == nb
    ea = sorted(map(tuple, a["edges"].select(
        "src_key", "dst_key", "rel_type", "weight").collect()))
    eb = sorted(map(tuple, b["edges"].select(
        "src_key", "dst_key", "rel_type", "weight").collect()))
    assert ea == eb
