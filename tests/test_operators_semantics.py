"""Semantics the reference pins operationally: owner inference (A3),
re-ingest idempotency (MERGE semantics, K2), rejected-pairs anti-join (U4)."""

import pandas as pd
from pyspark.sql import functions as F

from owl_n4j_spark.operators.linking import build_key_mapping
from owl_n4j_spark.operators.owner import infer_owners
from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas


def _tx(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                    "tool", "ts"]))


def test_owner_inference_argmax_and_tiebreak(spark):
    ts = pd.Timestamp("2024-01-01")
    rows = [
        # conv A: +12025550123 twice (once as JID), +13015550199 once
        ("A", 0, "12025550123@s.whatsapp.net", "hi", None, ts),
        ("A", 1, "+13015550199", "yo", None, ts),
        ("A", 2, "(202) 555-0123", "ok", None, ts),
        ("A", 3, "John Smith", "name only - not phone-resolvable", None, ts),
        # conv B: exact tie -> lexicographically smaller E.164 wins
        ("B", 0, "+12025550123", "x", None, ts),
        ("B", 1, "+13015550199", "y", None, ts),
        # conv C: nothing phone-resolvable -> absent from output
        ("C", 0, "alice", "z", None, ts),
    ]
    got = {r["conv_id"]: r["owner_e164"]
           for r in infer_owners(_tx(spark, rows)).collect()}
    assert got == {"A": "+12025550123", "B": "+12025550123"}


def test_reingest_idempotency(spark):
    """Feeding the pipeline the corpus UNION a re-ingested copy must produce
    byte-identical nodes/edges (the reference's MERGE-on-(case_id,key)
    semantics, neo4j_writer.py:1123-1134)."""
    corpus = generate_corpus_pandas(25, seed=3)
    tr = corpus["transcripts"]
    once = spark.createDataFrame(tr)
    twice = spark.createDataFrame(pd.concat([tr, tr.iloc[: len(tr) // 2]]))
    ad = spark.createDataFrame(corpus["alias_dict"])
    r1 = run_pipeline(spark, once, alias_dict=ad, with_manifest=False)
    r2 = run_pipeline(spark, twice, alias_dict=ad, with_manifest=False)
    n1 = sorted(map(tuple, r1["nodes"].select("node_id", "key", "type").collect()))
    n2 = sorted(map(tuple, r2["nodes"].select("node_id", "key", "type").collect()))
    assert n1 == n2
    e1 = sorted(map(tuple, r1["edges"].select("src_key", "dst_key", "rel_type",
                                              "weight").collect()))
    e2 = sorted(map(tuple, r2["edges"].select("src_key", "dst_key", "rel_type",
                                              "weight").collect()))
    assert e1 == e2


def test_rejected_pairs_suppress_fuzzy(spark):
    """A human-rejected merge pair must never be re-suggested (U4 —
    rejected_pairs_service): the fuzzy link is suppressed and the key
    self-maps."""
    mention_keys = spark.createDataFrame(
        [("jon-smyth", "Person")], "raw_key string, mention_type string")
    aliases = spark.createDataFrame(
        [("jon-smith", "phone-12025550123", "Person")],
        "alias string, canonical_key string, entity_type string")
    free = build_key_mapping(mention_keys, aliases).collect()[0]
    assert free["method"] == "fuzzy"
    assert free["canonical_key"] == "phone-12025550123"

    rejected = spark.createDataFrame(
        [("jon-smyth", "phone-12025550123")], "key_a string, key_b string")
    blocked = build_key_mapping(mention_keys, aliases,
                                rejected_pairs=rejected).collect()[0]
    assert blocked["method"] == "self"
    assert blocked["canonical_key"] == "jon-smyth"


def test_unified_contact_rollup(spark):
    """A11 — canonical Person nodes roll up every phone number and real-name
    alias of their identity component (ref unified-contacts buckets,
    neo4j_service.py:12150-12547)."""
    corpus = generate_corpus_pandas(40, seed=5)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])
    res = run_pipeline(spark, tr, alias_dict=ad, with_manifest=False)
    nodes = {r["key"]: r for r in res["nodes"].collect()}
    person_rows = [r for k, r in nodes.items() if k.startswith("phone-")]
    assert person_rows, "no canonical person nodes"
    # every canonical person node carries its E.164 in phone_numbers
    with_phone = [r for r in person_rows if r["phone_numbers"]]
    assert len(with_phone) >= len(person_rows) * 0.5
    for r in with_phone:
        assert f"+{r['key'][len('phone-'):]}" in r["phone_numbers"]
    # alias rollup: some canonical person collects >= 2 real-name aliases
    assert any(len(r["name_aliases"]) >= 2 for r in person_rows)
    # primary name is a real name, never a bare number/JID
    for r in person_rows:
        if r["name_aliases"]:
            assert "@" not in r["name"] and not r["name"].startswith("+")


def test_pii_redaction_masks_everything(spark):
    """The PII scrub must leave no residual amount/date pattern and must
    insert exactly one marker per original hit (q_pii_redact's n_residual
    column asserts the same invariant inside the driver-checked query)."""
    from owl_n4j_spark.plans.text import PII_AMOUNT_RE, PII_DATE_RE

    df = spark.createDataFrame(
        [("a", "Bob paid $12.34 to Ann on 2024-01-02."),
         ("b", "prices: $0.99 $100.00, dates 1999-12-31 2000-01-01"),
         ("c", "no pii here $12.3 12-01-2024")],
        "doc_id string, text string")
    red = F.regexp_replace(
        F.regexp_replace("text", PII_AMOUNT_RE, "[AMOUNT]"),
        PII_DATE_RE, "[DATE]")
    out = df.select(
        "doc_id",
        F.size(F.regexp_extract_all(red, F.lit(PII_AMOUNT_RE), F.lit(0)))
         .alias("resid_amt"),
        F.size(F.regexp_extract_all(red, F.lit(PII_DATE_RE), F.lit(0)))
         .alias("resid_date"),
        F.size(F.split(red, r"\[AMOUNT\]")).alias("amt_parts"),
        F.size(F.split(red, r"\[DATE\]")).alias("date_parts"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert all(r["resid_amt"] == 0 and r["resid_date"] == 0 for r in out)
    assert (by_id["a"]["amt_parts"], by_id["a"]["date_parts"]) == (2, 2)
    assert (by_id["b"]["amt_parts"], by_id["b"]["date_parts"]) == (3, 3)
    assert (by_id["c"]["amt_parts"], by_id["c"]["date_parts"]) == (1, 1)


def test_bm25_ranking_semantics(spark):
    """Planted corpus: term-dense doc ranks above single-hit doc; a doc
    with no query term is absent; a rare term outweighs a common one
    (idf monotonicity)."""
    from owl_n4j_spark.plans.text import bm25_scores

    docs = spark.createDataFrame(
        [(0, "data data data data filler filler filler"),
         (1, "data filler filler filler filler filler"),
         (2, "filler filler filler filler filler filler"),
         (3, "window filler filler filler filler filler"),
         (4, "data filler filler"),
         (5, "data filler filler filler filler filler filler filler")],
        "doc_id long, text string")
    rows = bm25_scores(docs, terms=("data", "window")).collect()
    got = {r["doc_id"]: r["bm25"] for r in rows}
    assert 2 not in got                      # no query term -> absent
    assert got[0] > got[1]                   # higher tf ranks higher
    assert got[3] > got[1]                   # rarer term (idf) outweighs
    assert got[4] > got[5]                   # shorter doc, same tf, wins
