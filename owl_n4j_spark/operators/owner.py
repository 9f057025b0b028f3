"""Owner-identity inference (SURVEY A3).

The reference scans every parsed model for phone-resolvable Account values
and elects the most frequent as the device owner's MSISDN, tie-broken by the
E.164 string (/root/reference/ingestion/scripts/cellebrite/neo4j_writer.py:
894-944; regression-pinned by its tests/test_cellebrite_owner_inference.py).

Spark re-expression: one pass over the transcript roles — vectorized key
cascade, groupBy count, argmax via min(struct(-cnt, e164)) (algebraic,
map-side combinable; same pattern as the node elections)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from owl_n4j_spark.functions.keys import phone_e164_udf


def infer_owners(transcripts: DataFrame) -> DataFrame:
    """transcripts -> (conv_id, owner_e164): the most frequent
    phone-resolvable speaker identity per conversation (JIDs parse through
    the same cascade), ties to the lexicographically smaller E.164."""
    jid_digits = F.regexp_extract(
        F.col("role"), r"^\+?(\d{7,15})@(?:s\.whatsapp\.net|c\.us)$", 1)
    candidate = F.when(jid_digits != "", F.concat(F.lit("+"), jid_digits)) \
                 .otherwise(F.col("role"))
    e164 = phone_e164_udf(candidate)
    return (
        transcripts.withColumn("e164", e164)
        .filter(F.col("e164").isNotNull())
        .groupBy("conv_id", "e164").agg(F.count("*").alias("cnt"))
        .groupBy("conv_id")
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                            F.col("e164").alias("v"))).alias("e"))
        .select("conv_id", F.col("e.v").alias("owner_e164"))
    )
