"""Skew hardening: degree-ordered triangle orientation and the
stop-shingle cap — fixtures with deliberate hubs/hot keys prove the
bounded-fan-out paths compute the right answers (the sf-tier oracle
parity never exercises real skew)."""

from pyspark.sql import functions as F

from owl_n4j_spark.plans.graph_algos import oriented_edges, triangle_count
from owl_n4j_spark.plans.text import SHINGLE_MAX_DOCS, _capped_shingles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangles_star_has_none(spark):
    # pure hub: star with 40 leaves — 0 triangles, and the hub must have 0
    # oriented out-edges (every leaf has lower degree)
    star = _edges(spark, [(0, i) for i in range(1, 41)])
    assert triangle_count(star).collect()[0]["n_triangles"] == 0
    o = oriented_edges(star).toPandas()
    assert (o["y"] == 0).all()  # all edges point INTO the hub
    assert (o["x"] != 0).all()


def test_triangles_wheel(spark):
    # wheel: hub 0 + cycle 1..12 -> exactly 12 triangles
    n = 12
    spokes = [(0, i) for i in range(1, n + 1)]
    rim = [(i, i % n + 1) for i in range(1, n + 1)]
    rim = [(min(a, b), max(a, b)) for a, b in rim]
    wheel = _edges(spark, spokes + rim)
    assert triangle_count(wheel).collect()[0]["n_triangles"] == n


def test_triangles_two_hubs_clique(spark):
    # K5 embedded in a double star: C(5,3) = 10 triangles, no double count
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    stars = [(0, i) for i in range(10, 40)] + [(1, i) for i in range(40, 70)]
    g = _edges(spark, clique + stars)
    assert triangle_count(g).collect()[0]["n_triangles"] == 10


def test_stop_shingle_cap_drops_hot_key(spark):
    # one shingle shared by MANY docs (the quadratic bucket) + one rare
    # shingle shared by two docs; the cap keeps only the rare one
    n_hot = SHINGLE_MAX_DOCS + 20
    rows = [(i, "the quick fox") for i in range(n_hot)]
    rows += [(10_001, "rare signal here"), (10_002, "rare signal here")]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    kept = _capped_shingles(sh).toPandas()
    assert set(kept["shingle"]) == {"rare signal here"}
    assert len(kept) == 2


def test_stop_shingle_cap_keeps_at_threshold(spark):
    rows = [(i, "s") for i in range(SHINGLE_MAX_DOCS)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    assert _capped_shingles(sh).count() == SHINGLE_MAX_DOCS


def test_winnowing_shared_passage_guarantee(spark, tmp_path_factory):
    """Winnowing's defining property: two documents sharing a passage of
    >= K + W - 1 tokens must share at least one selected fingerprint,
    regardless of the surrounding text."""
    import os
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, f"one two three {shared} four five six"),
        (1, f"completely different prefix words {shared} and a different tail"),
        (2, "nothing in common with the others at all whatsoever here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = os.path.join(str(tmp_path_factory.mktemp("win")), "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    sf_dir = os.path.dirname(path)

    from pyspark.sql import functions as F
    from owl_n4j_spark.plans.text import WINNOW_K, WINNOW_W, _tokens_col
    from owl_n4j_spark.plans.relational import load
    # recompute the raw fingerprint SETS (not the digest) for overlap checks
    grams = (f"transform(sequence(0, size(__w) - {WINNOW_K}), "
             f"i -> substring(md5(concat_ws(' ', slice(__w, i + 1, {WINNOW_K}))), 1, 8))")
    mins = (f"transform(sequence(0, size(__h) - {WINNOW_W}), "
            f"j -> array_min(slice(__h, j + 1, {WINNOW_W})))")
    fps = {r["doc_id"]: set(r["f"]) for r in
           load(spark, sf_dir, "documents")
           .withColumn("__w", _tokens_col())
           .withColumn("__h", F.expr(grams))
           .select("doc_id", F.array_distinct(F.expr(mins)).alias("f"))
           .collect()}
    assert fps[0] & fps[1], "shared passage must share a fingerprint"
    assert len(fps[0] & fps[2]) == 0  # doc 2 is unrelated
