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
#   r5 priorities — (a) the three queries with NO driver row across r1-r4:
#   kg_display_contacts (r4 verdict item 4), q_media_features (real stdlib
#   codecs, new this round), q_stream_parity (batch/stream reconciliation,
#   new this round — §2.11 graduates from pytest-only to driver-hashed);
#   (b) everything CHANGED this round: kg_degree_topn/kg_top_entities
#   (distributed limit-then-rank), q_doc_ingest_formats (PDF tokenizer
#   DOTALL fix), the wiretap suite (rich-RTF fixtures + \ucN group
#   scoping + sharded listing); (c) the flagship pipeline core, every
#   round; (d) the whole r1-only relational block (oldest evidence in the
#   file set) + q_winnowing (r2-only); (e) the r3-green blocks rotated out
#   in r4, back for a second row: big graph, geo, kg analytics, and the
#   dedup/curation spine of the text suite.
# Rotated OUT (all green in CORRECTNESS_r04, shapes unchanged): the
# r2-green relational distinct-shape block, the small graph shapes, the
# ANN pair, the XML ingest/reconcile/attachments block — every one stays
# exact-oracle-checked locally by scripts_dev/check_oracles.py (all sfs)
# and tests/test_oracle_parity.py.
_GATE_R5 = [
    # (a) never driver-checked
    "kg_display_contacts", "q_media_features", "q_stream_parity",
    # (b) changed this round
    "kg_degree_topn", "kg_top_entities", "q_doc_ingest_formats",
    "q_wiretap_ingest", "q_wiretap_manifest", "kg_wiretap_triples",
    # (c) flagship pipeline core
    "kg_triples", "kg_nodes", "kg_edges", "kg_manifest",
    # (d) r1-only relational block + r2-only winnowing
    "q_asof_prior_event", "q_comm_hub", "q_copresence_pairs",
    "q_distinct_approx", "q_envelope_daily", "q_event_dedup",
    "q_event_type_counts", "q_keyset_page", "q_nation_customer_stats",
    "q_sessionize", "q_timeline_page", "q_top_parts", "q_user_thread_agg",
    "q_value_histogram", "q_winnowing",
    # (e) big graph suite (r3-green, rotated out in r4)
    "q_betweenness", "q_louvain", "q_graph_cc", "q_graph_shortest_paths",
    "q_graph_pair_paths", "q_community_supergraph",
    # (e) geo suite (r3-green)
    "q_convoys", "q_geo_copresence", "q_tower_coreg", "q_reverse_geocode",
    # (e) kg analytics (r3-green)
    "kg_fuzzy_resolve", "kg_insights", "kg_location_tiles", "kg_nl_route",
    "kg_suggest_links",
    # (e) text dedup/curation spine (r3-green)
    "q_minhash_lsh_pairs", "q_neardup_clusters", "q_neardup_survivors",
    "q_exact_dedup", "q_corpus_curation", "q_data_mix", "q_seq_pack",
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
    missing = [n for n in _GATE_R5 if n not in all_q]
    # uniqueness matters, not just length: a duplicated gate name would
    # shrink the scored set to 49 and promote an arbitrary 50th
    assert not missing and len(set(_GATE_R5)) == len(_GATE_R5) == 50, (
        missing, len(_GATE_R5))
    q: dict[str, Callable] = {n: all_q[n] for n in _GATE_R5}
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
