"""Merge-audit + durable rejected-pairs surface (SURVEY U4 — reference
backend/services/rejected_pairs_service.py and the merge-history audit in
neo4j_service.py:2553-3052).

The invariant that matters operationally: once a human rejects a merge
suggestion, NO later run may re-apply it — including runs that do not pass
the rejection in again (the store is durable in the pipeline warehouse).
"""

import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas


@pytest.fixture(scope="module")
def corpus(spark):
    c = generate_corpus_pandas(60, seed=7)
    return (spark.createDataFrame(c["transcripts"]),
            spark.createDataFrame(c["alias_dict"]))


def _link_key(res, member):
    rows = (res["mapping"].filter(F.col("raw_key") == member)
            .select("link_key").collect())
    assert len(rows) == 1
    return rows[0]["link_key"]


def test_rejected_pair_never_remerges_across_reruns(spark, tmp_path, corpus):
    transcripts, alias_dict = corpus
    wh = str(tmp_path / "wh")

    res1 = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                        warehouse=wh, with_manifest=False)
    fz = (res1["merge_audit"].filter(F.col("method") == "fuzzy")
          .select("member_key").limit(1).collect())
    assert fz, "seeded corpus must produce at least one fuzzy merge"
    member = fz[0]["member_key"]
    target = _link_key(res1, member)

    # run 2: human rejects the fuzzy suggestion -> the LINK decision must
    # change (the pair may still connect via independent SAME_AS evidence;
    # rejection blocks the suggestion, not the evidence — reference
    # semantics).
    rej = spark.createDataFrame([(member, target)],
                                "key_a string, key_b string")
    res2 = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                        warehouse=wh, rejected_pairs=rej, with_manifest=False)
    assert _link_key(res2, member) != target

    # run 3: NO pairs passed — the committed store must still be consulted
    # (resume off so the mapping genuinely recomputes).
    res3 = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                        warehouse=wh, resume=False, with_manifest=False)
    assert _link_key(res3, member) != target


def test_merge_audit_methods_and_sameas_flag(spark, corpus):
    transcripts, alias_dict = corpus
    res = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                       with_manifest=False)
    audit = res["merge_audit"]
    methods = {r["method"] for r in audit.select("method").distinct().collect()}
    assert methods <= {"exact", "fuzzy", "self"}
    # every member appears exactly once
    n = audit.count()
    assert audit.select("member_key").distinct().count() == n
    # via_sameas rows are exactly the ones whose final canonical differs
    # from the link-stage canonical
    bad = (res["mapping"]
           .withColumn("expect", F.col("link_key") != F.col("canonical_key"))
           .join(audit.select(F.col("member_key").alias("raw_key"),
                              "via_sameas"), "raw_key")
           .filter(F.col("expect") != F.col("via_sameas")).count())
    assert bad == 0
