"""SparkSession factory tuned for the KG-construction workload.

Design targets (SURVEY.md §4): AQE on (runtime re-plan + skew-join splitting
for the documented 70k-relationship hub entities), Arrow on (every text
operator is a vectorized pandas UDF), shuffle partitions sized to the local
core count but overridable for the cluster case.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Driver-heap default: min(16g, half of MemTotal), overridable via
    $SPARK_DRIVER_MEM. 16g is tuned to the 128 GiB bench host (removes
    measurable GC drag at bench scale); deriving from physical memory keeps
    local-mode JVMs on smaller hosts/containers GC-throttled under their
    own cap instead of growing until the OS OOM-kills them."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(1, min(16, int(total_gib // 2)))}g"
    except (OSError, ValueError, IndexError):
        pass
    return "16g"


def get_spark(
    master: str | None = None,
    app_name: str = "owl-n4j-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. On a real cluster, pass ``master=None`` with the session
    pre-configured by spark-submit; every setting here is a safe default,
    not a requirement.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of small shuffle partitions and skew-join
        # splitting — the hub-entity skew (BASELINE.md "70k+ relationships")
        # is handled here plus explicit salting in canonicalize.py.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for every pandas UDF / mapInPandas stage.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast dimension tables aggressively (alias dictionaries are
        # small); AQE will also convert to broadcast at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Single-JVM local mode: driver memory IS the executor heap. 16g
        # (vs the earlier 8g) removes measurable GC drag from the full
        # pipeline at bench scale — measured 10-30% on the heavy legs of
        # the 1-vs-4 scaling pair on a 128 GiB host — but the default is
        # capped at half of MemTotal so smaller hosts stay safe; override
        # with $SPARK_DRIVER_MEM (documented in README/OPERATORS).
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
