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
from owl_n4j_spark.plans.relational import RELATIONAL_REGISTRY
from owl_n4j_spark.plans.text import TEXT_REGISTRY
from owl_n4j_spark.sources import events_transcripts as et

# The driver's correctness gate evaluates the FIRST 50 queries() entries.
# The gate is an EXPLICIT list, rotated each round so every headline
# operator accumulates driver-hash evidence over time (r2 verdict item 8):
#   r3 priorities — (a) everything NEW or CHANGED this round (rag answer,
#   merge audit, xml ingest, pair paths, supergraph, doc-format ingest,
#   the re-planned rag_retrieve/pagerank, the fixed location_tiles and
#   data_mix), (b) the curation suite that had no driver row in r1/r2
#   (pii_redact, decontaminate, corpus_curation, seq_pack,
#   neardup_clusters, doc_keywords, url_terms, embedding_centroids),
#   (c) distinct-shape representatives of each suite.
# Rotated OUT (all green in CORRECTNESS_r02, shapes unchanged): 13 kg_*
# serving rows, q_ann_ivf, q_emb_neardup_pairs, and the relational
# distinct-shape block — every one stays exact-oracle-checked locally by
# scripts_dev/check_oracles.py (all sfs) and tests/test_oracle_parity.py.
_GATE_R3 = [
    # KG pipeline core + new/changed serving entries
    "kg_triples", "kg_nodes", "kg_edges", "kg_manifest",
    "kg_rag_retrieve", "kg_rag_answer", "kg_merge_audit", "q_xml_ingest",
    "kg_location_tiles", "kg_suggest_links", "kg_insights",
    "kg_fuzzy_resolve", "kg_nl_route",
    # graph suite (pagerank re-planned; pair paths + supergraph new;
    # degree/2hop rotate out — r2-green trivial shapes)
    "q_xml_attachments",
    "q_pagerank", "q_graph_pair_paths", "q_community_supergraph",
    "q_graph_cc", "q_betweenness", "q_louvain",
    "q_graph_shortest_paths",
    # geo suite
    "q_reverse_geocode", "q_geo_copresence", "q_convoys", "q_tower_coreg",
    # curation suite — first driver rows (verdict item 8) + changed data_mix
    "q_pii_redact", "q_decontaminate", "q_corpus_curation", "q_data_mix",
    "q_seq_pack", "q_neardup_clusters", "q_doc_keywords", "q_url_terms",
    "q_embedding_centroids", "q_doc_ingest_formats",
    # text/dedup/ANN distinct shapes
    "q_doc_chunks", "q_doc_summary", "q_doc_search", "q_bm25_search",
    "q_neardup_survivors", "q_doc_token_stats", "q_doc_quality",
    "q_lang_id", "q_doc_fingerprint", "q_exact_dedup",
    "q_ngram_jaccard_pairs", "q_minhash_lsh_pairs", "q_simhash",
    "q_knn_bruteforce", "q_ann_signlsh",
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
                TEXT_REGISTRY, RELATIONAL_REGISTRY):
        for name, (fn, _) in reg.items():
            all_q[name] = fn
    missing = [n for n in _GATE_R3 if n not in all_q]
    assert not missing and len(_GATE_R3) == 50, (missing, len(_GATE_R3))
    q: dict[str, Callable] = {n: all_q[n] for n in _GATE_R3}
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
                TEXT_REGISTRY, RELATIONAL_REGISTRY):
        for name, (_, sql) in reg.items():
            if sql is not None:
                o[name] = sql
    return o
