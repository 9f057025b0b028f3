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


def test_stale_stage_invalidates_downstream(spark, tmp_path):
    """Mixed-lineage guard: when a committed stage is resume-INVALID (here
    an old-engine t03_mapping — no schema-version stamp, and lacking
    link_key), every stage AFTER it must recompute too — resuming
    downstream parquet built from the old mapping would silently mix two
    lineages in one result."""
    import pyspark.sql.functions as F

    wh = str(tmp_path / "wh3")
    corpus = generate_corpus_pandas(15, seed=21)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])
    r1 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    want_nodes = _nodes_set(r1)
    want_edges = sorted(map(tuple, r1["edges"]
                            .select("src_key", "dst_key", "rel_type")
                            .collect()))

    # poison a DOWNSTREAM committed stage: a resume that trusts it would
    # surface the sentinel row
    edges_path = os.path.join(wh, "t07_edges")
    poison = (spark.read.parquet(edges_path).limit(1)
              .withColumn("src_key", F.lit("phone-POISON")))
    poison.write.mode("append").parquet(edges_path)

    # simulate the old-engine warehouse: committed t03_mapping w/o link_key
    mpath = os.path.join(wh, "t03_mapping")
    tmp_m = os.path.join(wh, "t03_mapping__tmp")
    spark.read.parquet(mpath).drop("link_key").write.parquet(tmp_m)
    shutil.rmtree(mpath)
    os.rename(tmp_m, mpath)

    r2 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    got_edges = sorted(map(tuple, r2["edges"]
                           .select("src_key", "dst_key", "rel_type")
                           .collect()))
    assert _nodes_set(r2) == want_nodes
    assert got_edges == want_edges          # sentinel gone: t07 recomputed
    assert not any(s == "phone-POISON" for s, _, _ in got_edges)


def test_stage_stamp_write_never_raises():
    """A warehouse the driver cannot open() locally (an hdfs:// or s3a://
    URI) skips the stamp instead of crashing a run whose parquet write
    just succeeded; the unstamped stage is simply never resumed — the
    exact semantics non-local warehouses had before stamping existed."""
    from owl_n4j_spark.pipeline import _stage_stamp_ok, _write_stage_stamp

    bogus = "hdfs://namenode/case_wh/t01_normalized"
    _write_stage_stamp(bogus)          # must not raise
    assert _stage_stamp_ok(bogus) is False


def test_version_stamp_mismatch_invalidates_any_stage(spark, tmp_path):
    """The schema-evolution guard is GENERIC: a committed stage whose
    _ENGINE_SCHEMA_VERSION stamp differs from the current engine's (any
    stage, not just t03_mapping, and even when its columns happen to look
    right) is recomputed — never resumed."""
    from owl_n4j_spark.pipeline import _STAMP_NAME

    wh = str(tmp_path / "wh4")
    corpus = generate_corpus_pandas(12, seed=33)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])
    r1 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    want = _nodes_set(r1)

    def mtime(stage):
        return os.path.getmtime(os.path.join(wh, stage, "_SUCCESS"))
    before = mtime("t05_triples")
    with open(os.path.join(wh, "t05_triples", _STAMP_NAME), "w") as f:
        f.write("1")        # a version this engine never wrote

    r2 = run_pipeline(spark, tr, alias_dict=ad, warehouse=wh,
                      with_manifest=False)
    assert _nodes_set(r2) == want
    assert mtime("t05_triples") != before, "stale-stamped stage was resumed"
    with open(os.path.join(wh, "t05_triples", _STAMP_NAME)) as f:
        assert f.read().strip() != "1"      # re-stamped at current version


def test_manifest_snapshot_ids_stable_across_resume(spark, tmp_path):
    """Warehoused stage rows in the manifest carry the commit's snapshot
    id (the Iceberg-snapshot analog): non-null and layout-derived on a
    warehoused run, IDENTICAL on a resumed run serving the same commits,
    and null without a warehouse (a localCheckpoint is not a durable
    snapshot)."""
    wh = str(tmp_path / "whsnap")
    corpus = generate_corpus_pandas(12, seed=21)
    tr = spark.createDataFrame(corpus["transcripts"])
    ad = spark.createDataFrame(corpus["alias_dict"])

    def snap_map(res):
        return {r.stage: r.snapshot_id
                for r in res["manifest"].filter("partition_id = -1").collect()}

    s1 = snap_map(run_pipeline(spark, tr, alias_dict=ad, warehouse=wh))
    warehoused = ("normalize", "extract", "link_canonicalize", "triples",
                  "materialize_nodes", "edges_referential")
    for stage in warehoused:
        assert s1[stage], f"{stage} row has no snapshot id"
    # distinct stages are distinct commits
    assert len({s1[s] for s in warehoused}) == len(warehoused)

    s2 = snap_map(run_pipeline(spark, tr, alias_dict=ad, warehouse=wh))
    assert {s: s2[s] for s in warehoused} == {s: s1[s] for s in warehoused}

    s3 = snap_map(run_pipeline(spark, tr, alias_dict=ad))  # no warehouse
    assert all(s3[s] is None for s in warehoused)
