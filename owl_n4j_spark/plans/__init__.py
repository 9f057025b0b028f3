"""Query plans over the driver's parquet tables.

Each entry in REGISTRY maps a SURVEY.md §2 operator to:
  - a Spark implementation (spark, sf_dir) -> DataFrame
  - an equivalent DuckDB oracle SQL string (None for non-SQL-expressible
    ops, which the driver then checks rows-only)

Determinism rules used throughout (so the driver's order-insensitive
value-hash comparison holds):
  - every aggregate/computed column is aliased identically on both sides
  - double aggregations are rounded at a granularity where the true value
    sits on a decimal grid far from the rounding boundary (sums of 2-dec
    money -> round 2; 2-dec x 2-dec products -> round 4; ratios -> round 6)
  - floor()/counts are cast to BIGINT on both sides
  - dates/timestamps in group keys are emitted as strings
  - every LIMIT is preceded by a total order with a unique tie-break key
  - hash functions are md5 (identical bytes in Spark and DuckDB)
"""

from owl_n4j_spark.plans.geo import GEO_REGISTRY
from owl_n4j_spark.plans.graph_algos import GRAPH_REGISTRY
from owl_n4j_spark.plans.kg_analytics import KG_ANALYTICS_REGISTRY
from owl_n4j_spark.plans.media import MEDIA_REGISTRY
from owl_n4j_spark.plans.relational import RELATIONAL_REGISTRY
from owl_n4j_spark.plans.text import TEXT_REGISTRY

REGISTRY: dict = {}
REGISTRY.update(RELATIONAL_REGISTRY)
REGISTRY.update(TEXT_REGISTRY)
REGISTRY.update(GRAPH_REGISTRY)
REGISTRY.update(GEO_REGISTRY)
REGISTRY.update(KG_ANALYTICS_REGISTRY)
REGISTRY.update(MEDIA_REGISTRY)
