"""Driver-contract invariants of __spark_entry__ — the registry merge and
gate guards must hold under pytest (where asserts cannot be compiled
away), because a silent violation invalidates the whole correctness
gate: a registry name collision pairs a query with another entry's
oracle, and a duplicated gate name shrinks the scored set to 49."""

import __spark_entry__ as e
from __spark_entry__ import _GATE_R5


def test_gate_is_50_unique_and_first():
    assert len(_GATE_R5) == 50
    assert len(set(_GATE_R5)) == 50
    qs = e.queries()
    assert list(qs)[:50] == _GATE_R5


def test_registries_are_disjoint_and_oracles_consistent():
    qs = e.queries()          # raises on any registry collision
    oracles = e.oracle_sql()
    # every oracle belongs to a registered query, every gate entry exists
    assert set(oracles) <= set(qs)
    # the single rows-only entry is the declared one
    assert set(qs) - set(oracles) == {"kg_triples_synth"}


def test_hand_entries_not_shadowed():
    # the four hand-rolled flagship entries must never be silently
    # overwritten by a registry entry of the same name
    from owl_n4j_spark.plans.geo import GEO_REGISTRY
    from owl_n4j_spark.plans.graph_algos import GRAPH_REGISTRY
    from owl_n4j_spark.plans.kg_analytics import KG_ANALYTICS_REGISTRY
    from owl_n4j_spark.plans.relational import RELATIONAL_REGISTRY
    from owl_n4j_spark.plans.text import TEXT_REGISTRY

    hand = {"kg_triples", "kg_nodes", "kg_edges", "kg_manifest",
            "kg_triples_synth"}
    for reg in (KG_ANALYTICS_REGISTRY, GRAPH_REGISTRY, GEO_REGISTRY,
                TEXT_REGISTRY, RELATIONAL_REGISTRY):
        assert not (hand & set(reg)), hand & set(reg)
