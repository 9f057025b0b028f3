"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: full KG-construction pipeline (extract →
  link → canonicalize → materialize) over transcripts derived from the
  sf0.001 ``events`` table; returns the emitted triples DataFrame.
- ``queries()``      — one entry per implemented operator (SURVEY.md §2):
  relational/window/join/set ops, text dedup + similarity + ANN, graph
  algorithms, and the end-to-end KG pipeline outputs.
- ``oracle_sql()``   — exact DuckDB SQL for every SQL-expressible query,
  including the KG pipeline itself (expected triples/nodes/edges are
  derived relationally from ``events`` — see
  owl_n4j_spark/sources/events_transcripts.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owl_n4j_spark.pipeline import run_pipeline
from owl_n4j_spark.plans.geo import GEO_REGISTRY
from owl_n4j_spark.plans.graph_algos import GRAPH_REGISTRY
from owl_n4j_spark.plans.kg_analytics import KG_ANALYTICS_REGISTRY, kg_result
from owl_n4j_spark.plans.media import MEDIA_REGISTRY
from owl_n4j_spark.plans.relational import RELATIONAL_REGISTRY
from owl_n4j_spark.plans.text import TEXT_REGISTRY
from owl_n4j_spark.sources import events_transcripts as et

# The driver's correctness gate evaluates the FIRST 50 queries() entries.
# The gate is an EXPLICIT list, rotated each round so every headline
# operator accumulates driver-hash evidence over time (r2 verdict item 8):
#   r4 priorities — (a) everything NEW or CHANGED this round: the
#   multi-model-type XML reconciliation (q_xml_reconcile) + the extended
#   dumps' existing readers (xml_ingest/attachments/intersection/case_scan),
#   the wiretap folder parse, the docx/xlsx ingest + per-format manifest,
#   the de-scaffolded rag_retrieve/answer, merge_audit and the pipeline
#   core behind it, pagerank's cache-lifecycle change; (b) the four queries
#   that never had a driver-hash row in r1-r3 (kg_cost_ledger, q_case_scan,
#   q_extraction_intersection, q_value_quantiles — r3 verdict item 4);
#   (c) the r2-green blocks rotated out in r3, back for a second row:
#   the 13 kg_* serving queries, q_ann_ivf/q_emb_neardup_pairs, the small
#   graph shapes, and the relational distinct-shape block.
# Rotated OUT (all green in CORRECTNESS_r03, shapes unchanged): the
# curation/text suite, geo suite, and big graph queries — every one stays
# exact-oracle-checked locally by scripts_dev/check_oracles.py (all sfs)
# and tests/test_oracle_parity.py. Late-r4 swap: q_wiretap_manifest (new
# S6 reconciliation statuses, degenerate-session fixture classes) in,
# q_distinct_approx (r2-green, shape unchanged) out.
_GATE_R4 = [
    # KG pipeline core (pipeline.py changed: rejected-pairs recovery,
    # resume schema guard) + new/changed serving entries
    "kg_triples", "kg_nodes", "kg_edges", "kg_manifest", "kg_merge_audit",
    "kg_rag_retrieve", "kg_rag_answer", "kg_cost_ledger",
    # new/changed ingest surface
    "q_xml_reconcile", "q_wiretap_ingest", "kg_wiretap_triples",
    "q_wiretap_manifest", "q_xml_ingest",
    "q_xml_attachments", "q_extraction_intersection", "q_case_scan",
    "q_doc_ingest_formats", "q_doc_ingest_manifest",
    # never-driver-checked relational + changed pagerank
    "q_value_quantiles", "q_pagerank",
    # kg serving block (r2-green, second driver row)
    "kg_mentioned_in", "kg_payment_facts", "kg_top_entities",
    "kg_owner_inference", "kg_unified_contacts", "kg_date_closure",
    "kg_entity_summaries", "kg_last_location", "kg_graph_summary",
    "kg_thread_stats", "kg_degree_topn", "kg_timeline_page",
    "kg_envelope_daily",
    # ANN variants rotated out in r3
    "q_ann_ivf", "q_emb_neardup_pairs",
    # small graph shapes rotated out in r3
    "q_graph_2hop", "q_lpa_communities", "q_graph_degree",
    "q_graph_triangles",
    # relational/window distinct-shape block (r2-green)
    "q_rollup_revenue", "q_json_props",
    "q_track_thinning", "q_pricing_summary", "q_top_customers",
    "q_region_revenue", "q_order_priority_pivot", "q_customer_first_order",
    "q_monthly_revenue", "q_customers_no_orders",
    "q_customers_with_orders_semi",
]

# KG pipeline over events-derived transcripts: shared across all kg_*
# queries via plans/kg_analytics.kg_result (parquet-warehouse cache keyed by
# pid+sf so the pipeline runs once per sf).
_kg_result = kg_result


def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _kg_result(spark, sf_dir)["triples"]
        .select("subj_key", "pred", "obj_key", "conv_id", "turn_idx")
        .orderBy("subj_key", "pred", "obj_key", "conv_id", "turn_idx")
    )


def kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _kg_result(spark, sf_dir)["nodes"]
        .select("key", "type")
        .orderBy("key")
    )


def kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _kg_result(spark, sf_dir)["edges"]
        .select("src_key", "dst_key", "rel_type", "weight")
        .orderBy("src_key", "dst_key", "rel_type")
    )


def kg_triples_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG pipeline over the seeded synthetic corpus (alias variants, typos,
    JIDs, EU amounts, SAME_AS evidence — the full linking/canonicalization
    exercise). No SQL oracle — parity vs generator ground truth is asserted
    in tests/test_pipeline_parity.py at P/R >= 0.95."""
    from owl_n4j_spark.synth import generate_corpus_pandas
    corpus = generate_corpus_pandas(80, seed=42)
    transcripts = spark.createDataFrame(corpus["transcripts"])
    alias_dict = spark.createDataFrame(corpus["alias_dict"])
    res = run_pipeline(spark, transcripts, alias_dict=alias_dict,
                       with_manifest=False)
    return (
        res["triples"].select("subj_key", "pred", "obj_key", "conv_id",
                              "turn_idx")
        .orderBy("subj_key", "pred", "obj_key", "conv_id", "turn_idx")
    )


def kg_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage/metrics manifest of a full pipeline run (reconciliation
    discipline — SURVEY K5). Stage-total rows only; counts are deterministic,
    timestamps/run ids excluded from the projection."""
    res = _kg_result(spark, sf_dir)
    return (
        res["manifest"]
        .filter(F.col("partition_id") == -1)
        .select("stage", "in_rows", "out_rows", "quarantined")
        .orderBy("stage")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG construction end-to-end on sf0.001."""
    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # kg_triples_synth (rows-only: the seeded fuzz corpus has no SQL oracle;
    # its P/R >= 0.95 gate runs in tests/test_pipeline_parity.py) registers
    # AFTER the 50-entry driver gate so every scored entry is hash-checked.
    all_q: dict[str, Callable] = {
        "kg_triples": kg_triples,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
        "kg_manifest": kg_manifest,
    }
    for reg in (KG_ANALYTICS_REGISTRY, GRAPH_REGISTRY, GEO_REGISTRY,
                TEXT_REGISTRY, RELATIONAL_REGISTRY, MEDIA_REGISTRY):
        for name, (fn, _) in reg.items():
            # A name collision would silently serve one registry's query
            # against the OTHER registry's oracle — a coincidental shape
            # match could then false-PASS a query nothing ever checked.
            # Fail loudly instead (tests/test_entry_contract.py runs this
            # under pytest, where asserts can't be optimized away).
            assert name not in all_q, f"duplicate registry entry: {name}"
            all_q[name] = fn
    missing = [n for n in _GATE_R4 if n not in all_q]
    # uniqueness matters, not just length: a duplicated gate name would
    # shrink the scored set to 49 and promote an arbitrary 50th
    assert not missing and len(set(_GATE_R4)) == len(_GATE_R4) == 50, (
        missing, len(_GATE_R4))
    q: dict[str, Callable] = {n: all_q[n] for n in _GATE_R4}
    for name, fn in all_q.items():
        if name not in q:
            q[name] = fn
    q["kg_triples_synth"] = kg_triples_synth
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {
        "kg_triples": et.oracle_triples_sql(),
        "kg_nodes": et.oracle_nodes_sql(),
        "kg_edges": et.oracle_edges_sql(),
        "kg_manifest": et.oracle_manifest_sql(),
        # kg_triples_synth: intentionally no oracle (non-SQL linking over
        # synthetic fuzz); covered by pytest P/R gate instead.
    }
    for reg in (KG_ANALYTICS_REGISTRY, GRAPH_REGISTRY, GEO_REGISTRY,
                TEXT_REGISTRY, RELATIONAL_REGISTRY, MEDIA_REGISTRY):
        for name, (_, sql) in reg.items():
            if sql is not None:
                o[name] = sql
    return o
