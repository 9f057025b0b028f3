"""J11 — cross-phone person projection: a person seen on two devices
(primary JID + a second number introduced via SAME_AS intro evidence)
must project to ONE canonical identity carrying both phone keys."""

from pyspark.sql import functions as F

from owl_n4j_spark.operators.canonicalize import cross_device_projection
from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas, universe_for


def test_cross_device_projection_unifies_second_phones(spark):
    n, seed = 200, 11
    corpus = generate_corpus_pandas(n, seed=seed)
    u = universe_for(n, seed)
    texts = "\n".join(corpus["transcripts"]["text"].tolist())
    observed_alt = [p for p in u.persons
                    if p.alt_e164 and p.alt_e164 in texts]
    assert observed_alt, "corpus must mention at least one second device"

    res = run_pipeline(spark,
                       spark.createDataFrame(corpus["transcripts"]),
                       alias_dict=spark.createDataFrame(corpus["alias_dict"]),
                       with_manifest=False)
    proj = cross_device_projection(res["mapping"])
    multi = {r["canonical_key"]: list(r["phone_keys"])
             for r in proj.filter(F.col("n_devices") > 1).collect()}
    for p in observed_alt:
        assert p.key in multi, f"{p.key} not multi-device"
        assert p.alt_key in multi[p.key]
        assert p.key in multi[p.key]
    # the canonical is always the PRIMARY phone (election: min phone key)
    for canon, phones in multi.items():
        assert canon == phones[0]
