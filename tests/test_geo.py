"""Spatio-temporal co-presence operators (plans/geo.py): haversine math,
blocked-join completeness vs brute force, and planted convoy/tower
scenarios with hand-computed expectations (the driver-tier oracle parity
runs at sf0.01; these fixtures pin the semantics at boundary conditions
the uniform synthetic data never hits)."""

import math

import pytest
from pyspark.sql import functions as F

from owl_n4j_spark.plans.geo import (
    CONVOY_GAP_S,
    TILE_DEG,
    _blocked_pairs,
    convoy_sessions,
    haversine_m,
)


def _dist(spark, p1, p2):
    df = spark.createDataFrame([p1 + p2], "a double, b double, c double, d double")
    return df.select(haversine_m(F.col("a"), F.col("b"), F.col("c"),
                                 F.col("d")).alias("m")).collect()[0]["m"]


def test_haversine_known_distances(spark):
    # 1 degree of latitude ~ 111.19 km everywhere
    assert _dist(spark, (0.0, 0.0), (1.0, 0.0)) == pytest.approx(111194.9, abs=20)
    # 1 degree of longitude at 60N ~ half the equatorial value
    at_eq = _dist(spark, (0.0, 0.0), (0.0, 1.0))
    at_60 = _dist(spark, (60.0, 0.0), (60.0, 1.0))
    assert at_60 == pytest.approx(at_eq / 2, rel=0.01)
    assert _dist(spark, (45.0, 45.0), (45.0, 45.0)) == 0.0


def test_blocked_pairs_equals_bruteforce(spark):
    """The 27-key (tile +-1, bucket +-1) expansion must find EXACTLY the
    pairs the naive cross join finds — including pairs straddling tile and
    bucket boundaries, which this grid of points is built to produce."""
    rows = []
    uid = 0
    base = 1_700_000_000
    for i in range(48):
        # points scattered around a tile corner (multiples of TILE_DEG) and
        # around bucket boundaries (multiples of max_dt_s)
        lat = 10.0 + (i % 5) * (TILE_DEG / 3) - TILE_DEG / 2
        lon = 20.0 + (i % 7) * (TILE_DEG / 4) - TILE_DEG / 2
        t = base + (i % 6) * 1800 - 900
        rows.append((uid, t, lat, lon))
        uid += 1
    pts = spark.createDataFrame(
        rows, "user_id long, tsec long, lat double, lon double")

    max_d, max_t = 8000.0, 3600
    got = {(r["ua"], r["ub"], r["t"]) for r in
           _blocked_pairs(pts, max_d, max_t).collect()}

    a = pts.toPandas()
    want = set()
    for i in range(len(a)):
        for j in range(len(a)):
            ra, rb = a.iloc[i], a.iloc[j]
            if ra.user_id >= rb.user_id or abs(ra.tsec - rb.tsec) > max_t:
                continue
            phi1, phi2 = math.radians(ra.lat), math.radians(rb.lat)
            dphi = math.radians(rb.lat - ra.lat)
            dlam = math.radians(rb.lon - ra.lon)
            h = (math.sin(dphi / 2) ** 2
                 + math.cos(phi1) * math.cos(phi2) * math.sin(dlam / 2) ** 2)
            if 2 * 6_371_000 * math.asin(math.sqrt(h)) <= max_d:
                want.add((ra.user_id, rb.user_id, min(ra.tsec, rb.tsec)))
    assert len(want) > 10  # the fixture must be non-trivial
    assert got == want


def test_convoy_sessionization_planted(spark):
    """Pair (1,2): 4 hits an hour apart -> one 4-sample run. Pair (3,4):
    2 hits more than CONVOY_GAP_S apart -> two 1-sample runs, both dropped
    at min_samples=2. Pair (5,6): 2 hits within the gap -> one run."""
    base = 1_700_000_000
    hits = [(1, 2, base + i * 3600) for i in range(4)]
    hits += [(3, 4, base), (3, 4, base + CONVOY_GAP_S + 10)]
    hits += [(5, 6, base), (5, 6, base + 500)]
    df = spark.createDataFrame(hits, "ua long, ub long, t long")
    got = {(r["user_a"], r["user_b"], r["start_t"], r["n_samples"],
            r["duration_s"])
           for r in convoy_sessions(df, min_samples=2).collect()}
    assert got == {
        (1, 2, base, 4, 3 * 3600),
        (5, 6, base, 2, 500),
    }


def test_geo_queries_run_on_driver_data(spark):
    """Smoke + shape at sf0.001 (exact value parity vs DuckDB is covered by
    tests/test_oracle_parity.py once registered)."""
    from owl_n4j_spark.plans.geo import GEO_REGISTRY
    for name, (fn, sql) in GEO_REGISTRY.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0
        assert sql is not None
