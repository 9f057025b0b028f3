"""ANN quality: multi-probe sign-LSH recall, measured two ways.

1. On the driver embeddings — which are near-uniform random (the true
   nearest neighbors sit at cosine ~0.24, i.e. ~76 deg): per-bit agreement
   p = 1 - theta/pi ~ 0.58, so theoretical Hamming<=1 recall over 8 bits is
   ~ p^8 + 8 p^7 (1-p) ~ 0.09-0.12. The assertion pins the implementation
   at that theoretical envelope — no LSH family can do materially better on
   isotropic random data.
2. On planted clusters (points = centroid + small noise), where real
   corpora live: recall must be near-perfect.
"""

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from owl_n4j_spark.plans.relational import load
from owl_n4j_spark.plans.text import (
    ANN_K,
    N_ANN_QUERIES,
    _SPARK_DOT,
    q_ann_signlsh,
)

SF = "/root/testdata/sf0.01"


def _brute_topk(emb, k):
    q = (emb.filter(F.col("vec_id") < N_ANN_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    c = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ce"))
    dot = F.expr(_SPARK_DOT.format(a="qe", b="ce"))
    qn = F.sqrt(F.expr(_SPARK_DOT.format(a="qe", b="qe")))
    cn = F.sqrt(F.expr(_SPARK_DOT.format(a="ce", b="ce")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (F.broadcast(q).crossJoin(c).filter(F.col("qid") != F.col("nid"))
            .withColumn("cos", dot / (qn * cn))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("qid", "nid"))


def test_recall_on_isotropic_driver_data(spark):
    emb = load(spark, SF, "embeddings")
    truth = {(r["qid"], r["nid"]) for r in _brute_topk(emb, ANN_K).collect()}
    ann = {(r["qid"], r["nid"]) for r in q_ann_signlsh(spark, SF).collect()}
    recall = len(truth & ann) / len(truth)
    assert recall >= 0.08  # the theoretical envelope for this data


def test_recall_on_clustered_data(spark, tmp_path_factory):
    """Planted clusters: 40 centroids x 50 points, noise << separation.
    Multi-probe LSH must recover nearly all true neighbors here."""
    import os
    rng = np.random.RandomState(7)
    cents = rng.randn(40, 64) * 3.0
    rows = []
    vid = 0
    for c in range(40):
        for _ in range(50):
            v = cents[c] + rng.randn(64) * 0.15
            rows.append((vid, [float(x) for x in v], str(c)))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    path = os.path.join(str(tmp_path_factory.mktemp("ann")), "embeddings.parquet")
    emb.write.mode("overwrite").parquet(path)
    sf_dir = os.path.dirname(path)

    truth = {(r["qid"], r["nid"])
             for r in _brute_topk(spark.read.parquet(path), ANN_K).collect()}
    ann = {(r["qid"], r["nid"])
           for r in q_ann_signlsh(spark, sf_dir).collect()}
    recall = len(truth & ann) / len(truth)
    assert recall >= 0.9, f"clustered recall@{ANN_K} = {recall:.3f}"
