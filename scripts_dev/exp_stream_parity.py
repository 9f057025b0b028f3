"""Experiment: where does q_stream_parity's wall go, and does capping the
parallel-partition-discovery task count fix the listing floor?

Usage: python scripts_dev/exp_stream_parity.py [list_parallelism]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from owl_n4j_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
lp = sys.argv[1] if len(sys.argv) > 1 else None

extra = {}
if lp:
    extra["spark.sql.sources.parallelPartitionDiscovery.parallelism"] = lp
spark = get_spark(master="local[32]", app_name="exp-stream", extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")

from owl_n4j_spark.plans.kg_analytics import (
    ensure_ufed_xml, ensure_wiretap, warehouse_dir)
from owl_n4j_spark.streaming.incremental import (
    run_incremental_wiretap_ingest, run_incremental_xml_ingest)

t0 = time.time()
xml_dir = ensure_ufed_xml(spark, sf_dir)
print(f"xml fixture: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
case_dir = ensure_wiretap(spark, sf_dir)
print(f"wiretap fixture: {time.time()-t0:.1f}s", flush=True)

sx = warehouse_dir(spark, sf_dir, "stream_xml")
sw = warehouse_dir(spark, sf_dir, "stream_wt")

t0 = time.time()
run_incremental_xml_ingest(spark, xml_dir, sx, sx + "_ckpt",
                           max_files_per_trigger=100_000)
print(f"xml stream: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
run_incremental_wiretap_ingest(spark, case_dir, sw, sw + "_ckpt",
                               max_files_per_trigger=100_000)
print(f"wiretap stream: {time.time()-t0:.1f}s", flush=True)

# comparison legs
from pyspark.sql import functions as F
from owl_n4j_spark.sources.ufed_xml import read_ufed_xml
from owl_n4j_spark.plans.kg_analytics import _wiretap_sessions
from owl_n4j_spark.sources.wiretap import transcripts_from_sessions

t0 = time.time()
cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
b = read_ufed_xml(spark, xml_dir).select(*cols)
s = spark.read.parquet(sx).select(*cols)
(s.exceptAll(b).unionAll(b.exceptAll(s)).agg(F.count("*")).collect())
print(f"xml exceptAll legs: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
b = transcripts_from_sessions(_wiretap_sessions(spark, sf_dir)).select(*cols)
s = spark.read.parquet(sw).select(*cols)
(s.exceptAll(b).unionAll(b.exceptAll(s)).agg(F.count("*")).collect())
print(f"wt exceptAll legs (incl wiretap parse warehouse): {time.time()-t0:.1f}s", flush=True)
