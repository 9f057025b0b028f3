"""spark-submit entry point for the KG-construction pipeline.

Ships with the package zipped via --py-files (north-rule deployment shape):

  zip -r /tmp/owl_n4j_spark.zip owl_n4j_spark
  spark-submit --master local[32] \\
      --py-files /tmp/owl_n4j_spark.zip \\
      scripts/kg_construct_job.py \\
      --input /path/to/transcripts_parquet \\
      --warehouse /path/to/warehouse \\
      [--events /path/to/sf_dir]      # derive transcripts from events instead
      [--synth-convs 100000]          # or generate the seeded synthetic corpus

On a real cluster, drop --master and let the cluster manager supply it; the
job only uses the session it is handed (SparkSession.builder.getOrCreate()).
Re-running with the same --warehouse resumes from the last committed stage
(the Iceberg-snapshot analog; see owl_n4j_spark/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts parquet directory")
    src.add_argument("--events", help="sf dir with events.parquet to derive transcripts from")
    src.add_argument("--synth-convs", type=int, help="generate N seeded synthetic conversations")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--case-id", default="case-001")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("owl-n4j-kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from owl_n4j_spark.pipeline import run_pipeline
    from owl_n4j_spark.sources import events_transcripts as et
    from owl_n4j_spark.synth import (
        alias_dict_pandas,
        generate_transcripts_spark,
        universe_for,
    )

    if args.events:
        transcripts = et.transcripts_from_events(spark, args.events)
        alias_dict = et.alias_dict_df(spark)
    elif args.synth_convs:
        transcripts = generate_transcripts_spark(spark, args.synth_convs)
        alias_dict = spark.createDataFrame(
            alias_dict_pandas(universe_for(args.synth_convs)))
    else:
        transcripts = spark.read.parquet(args.input)
        alias_dict = None

    t0 = time.time()
    res = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                       case_id=args.case_id, warehouse=args.warehouse)
    stats = {
        "triples": res["triples"].count(),
        "nodes": res["nodes"].count(),
        "edges": res["edges"].count(),
        "wall_sec": round(time.time() - t0, 2),
        "warehouse": args.warehouse,
    }
    print("KG_CONSTRUCT_RESULT " + json.dumps(stats))


if __name__ == "__main__":
    main()
