"""owl_n4j_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the computational capabilities of the reference
``conorbowles51/owl-n4j`` (forensic KG platform: LLM/deterministic triple
extraction -> entity linking -> canonicalization -> Neo4j materialization),
re-expressed as a staged DataFrame job over parquet/Iceberg-style transcript
tables.

Stages (SURVEY.md §7):
  0. synth          — deterministic transcript generator (fixtures)
  1. normalize      — clean turns, stable order, invariant checks
  2. extraction     — vectorized mention + relation extraction (mapInPandas)
  3. linking        — broadcast exact join + blocked fuzzy candidates
  4. canonicalize   — same-as edges -> iterative connected components
  5. materialize    — nodes/edges tables, deterministic sha1 IDs, manifest
  6. analytics      — the reference's ~100 serving queries as Spark SQL
"""

__version__ = "0.1.0"
