"""Warehouse resume semantics (north rule: resumable from the last committed
snapshot): committed stages are never recomputed; deleting one stage's
commit recomputes exactly that stage (and whatever reads flow from it) with
identical results."""

import os
import shutil

from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas


def _nodes_set(res):
    return sorted(map(tuple,
                      res["nodes"].select("node_id", "key", "type").collect()))


def test_partial_resume_recomputes_only_missing_stage(spark, tmp_path):
    wh = str(tmp_path / "wh")
    corpus = generate_corpus_pandas(20, seed=9)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])

    r1 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    want = _nodes_set(r1)
    stage_dirs = sorted(d for d in os.listdir(wh) if d.startswith("t0"))
    assert {"t01_normalized", "t02_records", "t03_mapping", "t04_mentions",
            "t05_triples", "t06_nodes", "t07_edges"} <= set(stage_dirs)

    # record commit mtimes, then knock out ONE downstream stage
    def mtime(stage):
        return os.path.getmtime(os.path.join(wh, stage, "_SUCCESS"))
    before = {s: mtime(s) for s in stage_dirs}
    shutil.rmtree(os.path.join(wh, "t06_nodes"))

    r2 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    assert _nodes_set(r2) == want
    # upstream commits untouched (resume trusted them); nodes re-committed
    for s in ("t01_normalized", "t02_records", "t03_mapping", "t04_mentions",
              "t05_triples"):
        assert mtime(s) == before[s], f"{s} was recomputed"
    assert mtime("t06_nodes") != before["t06_nodes"]


def test_resume_ignores_uncommitted_partial_stage(spark, tmp_path):
    """A stage directory WITHOUT _SUCCESS (crash mid-write) is not trusted:
    the stage recomputes and the run still produces correct output."""
    wh = str(tmp_path / "wh2")
    corpus = generate_corpus_pandas(12, seed=13)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])
    r1 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    want = _nodes_set(r1)
    os.remove(os.path.join(wh, "t05_triples", "_SUCCESS"))  # simulate crash
    r2 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    assert _nodes_set(r2) == want
    assert os.path.exists(os.path.join(wh, "t05_triples", "_SUCCESS"))
