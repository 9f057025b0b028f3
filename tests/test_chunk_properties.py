"""Property-based invariants for the chunking rule (plans/text.chunk_spans)
and the haversine column (plans/geo.haversine_m) — randomized inputs via
hypothesis; the Spark/SQL parity checks prove the engines agree, these
prove the RULE itself is coherent."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from owl_n4j_spark.plans.text import CHUNK_STRIDE, CHUNK_TOKENS, chunk_spans


@given(n=st.integers(min_value=1, max_value=5000))
@settings(max_examples=300, deadline=None)
def test_chunk_spans_invariants(n):
    # n >= 1 always: whitespace-splitting even an empty text yields ['']
    spans = chunk_spans(n)
    assert len(spans) >= 1
    # full coverage: every token index is inside some span
    covered = set()
    for s, e in spans:
        assert 0 <= s < e <= n
        covered.update(range(s, e))
    assert covered == set(range(n))
    # consecutive chunks overlap by exactly size - stride (except a short tail)
    for (s1, e1), (s2, _) in zip(spans, spans[1:]):
        assert s2 - s1 == CHUNK_STRIDE
        assert e1 - s2 == min(CHUNK_TOKENS - CHUNK_STRIDE, e1 - s2)
        assert e1 > s2  # genuine overlap
    # no chunk is fully contained in its predecessor
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e2 > e1


def _hav(lat1, lon1, lat2, lon2):
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlam = math.radians(lon2 - lon1)
    a = (math.sin(dphi / 2) ** 2
         + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2)
    return 2 * 6_371_000 * math.asin(math.sqrt(min(1.0, a)))


coord = st.tuples(st.floats(-85, 85), st.floats(-180, 180))


@given(a=coord, b=coord)
@settings(max_examples=200, deadline=None)
def test_haversine_properties(a, b):
    d_ab = _hav(*a, *b)
    # symmetry, identity, bounds (half circumference)
    assert abs(d_ab - _hav(*b, *a)) <= 1e-6 * max(1.0, d_ab)
    assert _hav(*a, *a) == 0.0
    assert 0.0 <= d_ab <= math.pi * 6_371_000 + 1
