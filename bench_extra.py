"""Per-query isolation bench (guide §1.4) — NOT the driver bench.

Times individual registered queries in one session with the same
count() methodology as bench.py, twice each (cold = pays any shared
warehouse build; warm = steady-state serve), labels jobs, and can dump
`.explain("formatted")` plans to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--explain TAG] q_name [q_name ...]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from owl_n4j_spark.session import get_spark


def main():
    args = sys.argv[1:]
    tag = None
    if args and args[0] == "--explain":
        tag = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="owl-n4j-bench-extra",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    out = {}
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t = time.time()
        df = fn(spark, sf_dir)
        df.count()
        cold = round(time.time() - t, 3)
        spark.sparkContext.setJobDescription(f"{name}: warm")
        t = time.time()
        df = fn(spark, sf_dir)
        df.count()
        warm = round(time.time() - t, 3)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": cold, "warm": warm}
        print(f"{name}: cold={cold}s warm={warm}s", flush=True)
        if tag:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(plan)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
