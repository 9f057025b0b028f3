import sys
sys.path.insert(0, "/root/repo")
import pandas as pd
pd.set_option("display.width", 250)
from owl_n4j_spark.session import get_spark
from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.synth import generate_corpus_pandas

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus_pandas(40, 42)
transcripts = spark.createDataFrame(corpus["transcripts"])
alias_dict = spark.createDataFrame(corpus["alias_dict"])
res = run_pipeline(spark, transcripts, alias_dict=alias_dict, with_manifest=False)

COLS = ["subj_key", "pred", "obj_key", "conv_id", "turn_idx"]
got_df = res["triples"].select(*COLS).toPandas()
got = set(map(tuple, got_df.values.tolist()))
want = set(map(tuple, corpus["expected_triples"][COLS].values.tolist()))
tp = got & want
print(f"got={len(got)} want={len(want)} tp={len(tp)} "
      f"P={len(tp)/len(got):.4f} R={len(tp)/len(want):.4f}")

fp = sorted(got - want)[:25]
fn = sorted(want - got)[:25]
print("\n--- FALSE POSITIVES (got, not wanted) ---")
for t in fp: print(t)
print("\n--- FALSE NEGATIVES (wanted, not got) ---")
for t in fn: print(t)

# drill into one FN conversation
if fn:
    cid = fn[0][3]
    print(f"\n--- transcript of {cid} ---")
    tdf = corpus["transcripts"]
    print(tdf[tdf.conv_id == cid].sort_values("turn_idx")[["turn_idx","role","text"]].to_string())
