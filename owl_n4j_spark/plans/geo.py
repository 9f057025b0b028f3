"""Spatio-temporal co-presence operators (SURVEY.md J7/J8/W5 proper) over
the ``events`` table.

Reference analogs (/root/reference/backend/services/
cellebrite_intersection_service.py):

- ``detect_spatial`` (:100-186) — devices within ``max_distance_m`` metres
  AND ``max_time_delta_s`` seconds, via an in-Python forward sweep over ALL
  geolocated events pulled from Neo4j (capped at 20k rows).
- ``detect_cell_tower`` (:201-298) — devices registered on the same cell
  identity tuple within a time window.
- ``detect_convoy`` (:600-670) — the same device set staying co-located
  across >= min_samples spatial matches spanning >= min_duration.

Spark re-expression: the sweep becomes a BLOCKED EQUI-JOIN — each point is
keyed by (geo tile, time bucket) and one side is expanded to the 3x3x3
neighborhood (tile +-1 in lat/lon, bucket +-1), so every qualifying pair
meets on exactly one composite key and the exact haversine/time predicates
run as column filters AFTER the join. Cost is bounded by per-block density,
never all-pairs — the 100 TB shape (at cluster scale the block key is the
shuffle key; AQE splits hot city-blocks). The haversine itself (reference
``_haversine_m``, :33-42) is pure column math inside whole-stage codegen.

Geo positions are synthesized deterministically from the driver tables
(click events + the broadcast gazetteer of kg_analytics.CITY_COORDS, plus an
integer-arithmetic jitter), so every operator has an exact DuckDB oracle —
the oracle runs the NAIVE theta-join (fine at oracle scale), which also
proves the blocked join loses no pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from owl_n4j_spark.functions.keys import normalise_key as _nk
from owl_n4j_spark.localrel import local_df
from owl_n4j_spark.plans.kg_analytics import CITY_COORDS
from owl_n4j_spark.plans.relational import load
from owl_n4j_spark.synth import CITIES as _CITIES_RAW

# Gazetteer in the CITIES index order used by transcripts_from_events
# (city = CITIES[event_id % 20]) so positions and TRAVELED_TO keys agree.
_CITY_KEYS = [_nk(c) for c in _CITIES_RAW]

EARTH_R_M = 6_371_000.0

# Spatial co-presence (detect_spatial's 250 m / 600 s, scaled to the sparse
# synthetic event stream — the operators are parameterized; these are the
# constants the driver queries pin).
GEO_MAX_DIST_M = 5000.0
GEO_MAX_DT_S = 3600
# Blocking geometry: tile must be >= max radius in degrees at every latitude
# in the data (|lat| <= 60 -> 1 lon degree >= 55.6 km; 5 km <= 0.09 deg).
TILE_DEG = 0.2

# Convoy: repeated co-location runs of the same pair (detect_convoy's
# 5 samples / 30 min on dense GPS pings; scaled to sparse events).
CONVOY_HIT_DT_S = 14400      # base co-presence window for convoy samples
CONVOY_GAP_S = 86400         # samples <= 1 day apart chain into one run
CONVOY_MIN_SAMPLES = 2

# Tower co-registration (detect_cell_tower's 900 s window, widened for
# event sparsity). Tower identity is synthesized from event_id.
N_TOWERS = 23
TOWER_MAX_DT_S = 3600


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in metres — the column mirror of the
    reference's ``_haversine_m`` (cellebrite_intersection_service.py:33-42)."""
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = (F.sin(dphi / 2) * F.sin(dphi / 2)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlam / 2) * F.sin(dlam / 2))
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.sqrt(a))


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (f"2 * {EARTH_R_M} * asin(sqrt("
            f"sin(radians({lat2} - {lat1})/2)^2 + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"sin(radians({lon2} - {lon1})/2)^2))")


def geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geolocated pings: click events placed at their city's gazetteer
    coordinates plus a deterministic integer-arithmetic jitter (so distances
    are non-trivial and identical in Spark and DuckDB). Broadcast gazetteer
    join — never a per-row geocode call (the reference caches geocodes for
    the same reason, geocoding.py:17-27)."""
    ev = load(spark, sf_dir, "events")
    geo = local_df(
        spark,
        [(i, CITY_COORDS[k][0], CITY_COORDS[k][1])
         for i, k in enumerate(_CITY_KEYS)],
        "cidx int, clat double, clon double")
    jlat = ((F.col("event_id") % 97) - 48) * 0.0003
    jlon = (((F.col("event_id") * 13) % 89) - 44) * 0.0003
    return (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(geo),
              (F.col("event_id") % len(_CITY_KEYS)).cast("int") == F.col("cidx"))
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("tsec"),
            (F.col("clat") + jlat).alias("lat"),
            (F.col("clon") + jlon).alias("lon"),
        )
    )


_DUCK_GEO_CTE = None


def _duck_geo_cte() -> str:
    global _DUCK_GEO_CTE
    if _DUCK_GEO_CTE is None:
        rows = ", ".join(
            f"({i}, {CITY_COORDS[k][0]}, {CITY_COORDS[k][1]})"
            for i, k in enumerate(_CITY_KEYS))
        _DUCK_GEO_CTE = f"""
geo(cidx, clat, clon) AS (VALUES {rows}),
g AS (
  -- floor(epoch) -> BIGINT mirrors Spark unix_timestamp's truncate-to-second
  -- (DuckDB epoch() is fractional double; a bare CAST would ROUND)
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
         clat + ((event_id % 97) - 48) * 0.0003 AS lat,
         clon + (((event_id * 13) % 89) - 44) * 0.0003 AS lon
  FROM events JOIN geo ON cidx = event_id % {len(_CITY_KEYS)}
  WHERE event_type = 'click'
)"""
    return _DUCK_GEO_CTE


def _blocked_pairs(pts: DataFrame, max_dist_m: float, max_dt_s: int) -> DataFrame:
    """All cross-user point pairs (user_a < user_b) within ``max_dist_m``
    metres and ``max_dt_s`` seconds, via the (tile, bucket) blocked join.

    One side is expanded to its 27-key neighborhood (3 lat tiles x 3 lon
    tiles x 3 time buckets); the other keeps its single key, so every
    qualifying pair meets on EXACTLY one key — no post-join dedup needed.
    Returns (user_a, user_b, t, dist_m) at hit granularity."""
    keyed = pts.select(
        "user_id", "tsec", "lat", "lon",
        F.floor(F.col("lat") / TILE_DEG).alias("tlat"),
        F.floor(F.col("lon") / TILE_DEG).alias("tlon"),
        F.floor(F.col("tsec") / max_dt_s).alias("tb"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    a = (keyed
         .withColumn("dlat", off).withColumn("dlon", off).withColumn("dt", off)
         .select(F.col("user_id").alias("ua"), F.col("tsec").alias("ta"),
                 F.col("lat").alias("lata"), F.col("lon").alias("lona"),
                 (F.col("tlat") + F.col("dlat")).alias("tlat"),
                 (F.col("tlon") + F.col("dlon")).alias("tlon"),
                 (F.col("tb") + F.col("dt")).alias("tb")))
    b = keyed.select(F.col("user_id").alias("ub"), F.col("tsec").alias("tb_s"),
                     F.col("lat").alias("latb"), F.col("lon").alias("lonb"),
                     "tlat", "tlon", "tb")
    d = haversine_m(F.col("lata"), F.col("lona"), F.col("latb"), F.col("lonb"))
    return (
        a.join(b, on=["tlat", "tlon", "tb"])
        .filter((F.col("ua") < F.col("ub"))
                & (F.abs(F.col("ta") - F.col("tb_s")) <= max_dt_s))
        .withColumn("dist_m", d)
        .filter(F.col("dist_m") <= max_dist_m)
        .select("ua", "ub", F.least("ta", "tb_s").alias("t"), "dist_m")
    )


def q_geo_copresence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial co-presence pairs (J7 with the haversine leg): users with
    >= 1 ping pair within GEO_MAX_DIST_M metres and GEO_MAX_DT_S seconds,
    rolled up per pair."""
    hits = _blocked_pairs(geo_points(spark, sf_dir),
                          GEO_MAX_DIST_M, GEO_MAX_DT_S)
    return (
        hits.groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(F.count("*").alias("n_hits"),
             F.round(F.min("dist_m"), 1).alias("min_dist_m"),
             F.min("t").alias("first_t"),
             F.max("t").alias("last_t"))
        .orderBy("user_a", "user_b")
    )


def _sql_geo_copresence() -> str:
    d = _haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    return f"""
WITH {_duck_geo_cte()},
hits AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         least(a.tsec, b.tsec) AS t, {d} AS dist_m
  FROM g a JOIN g b
    ON a.user_id < b.user_id AND abs(a.tsec - b.tsec) <= {GEO_MAX_DT_S}
  WHERE {d} <= {GEO_MAX_DIST_M}
)
SELECT user_a, user_b, COUNT(*) AS n_hits,
       round(MIN(dist_m), 1) AS min_dist_m,
       MIN(t) AS first_t, MAX(t) AS last_t
FROM hits
GROUP BY user_a, user_b
ORDER BY user_a, user_b
"""


def convoy_sessions(hits: DataFrame, gap_s: int = CONVOY_GAP_S,
                    min_samples: int = CONVOY_MIN_SAMPLES) -> DataFrame:
    """(ua, ub, t) pair hit stream -> co-location runs: consecutive hits of
    the same pair chain while <= gap_s apart; runs shorter than min_samples
    are dropped. Lag-gap sessionization — one shuffle on the pair key."""
    w = Window.partitionBy("ua", "ub").orderBy("t")
    brk = F.when(F.col("t") - F.lag("t").over(w) <= gap_s, 0).otherwise(1)
    sess = F.sum(F.col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        hits.withColumn("brk", brk)
        .withColumn("sess", sess)
        .groupBy(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"), "sess")
        .agg(F.count("*").alias("n_samples"),
             F.min("t").alias("start_t"),
             (F.max("t") - F.min("t")).alias("duration_s"))
        .filter(F.col("n_samples") >= min_samples)
        .select("user_a", "user_b", "start_t", "n_samples", "duration_s")
        .orderBy("user_a", "user_b", "start_t")
    )


def q_convoys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convoy detection (W5 proper): the same user pair co-located across
    >= CONVOY_MIN_SAMPLES distinct sample times chaining within
    CONVOY_GAP_S — lag-gap sessionization over the pair hit stream (the
    reference chains its spatial matches per device set the same way,
    cellebrite_intersection_service.py:600-670)."""
    hits = (_blocked_pairs(geo_points(spark, sf_dir),
                           GEO_MAX_DIST_M, CONVOY_HIT_DT_S)
            .select("ua", "ub", "t").dropDuplicates())
    return convoy_sessions(hits)


def _sql_convoys() -> str:
    d = _haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")
    return f"""
WITH {_duck_geo_cte()},
hits AS (
  SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, least(a.tsec, b.tsec) AS t
  FROM g a JOIN g b
    ON a.user_id < b.user_id AND abs(a.tsec - b.tsec) <= {CONVOY_HIT_DT_S}
  WHERE {d} <= {GEO_MAX_DIST_M}
),
s AS (
  SELECT ua, ub, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY ua, ub ORDER BY t)
                   <= {CONVOY_GAP_S} THEN 0 ELSE 1 END AS brk
  FROM hits
),
s2 AS (
  SELECT ua, ub, t,
         SUM(brk) OVER (PARTITION BY ua, ub ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM s
)
SELECT ua AS user_a, ub AS user_b, MIN(t) AS start_t,
       COUNT(*) AS n_samples, MAX(t) - MIN(t) AS duration_s
FROM s2
GROUP BY ua, ub, sess
HAVING COUNT(*) >= {CONVOY_MIN_SAMPLES}
ORDER BY user_a, user_b, start_t
"""


def q_tower_coreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tower co-registration (J8): users registered on the same synthetic
    cell identity within TOWER_MAX_DT_S seconds. Registration pings are the
    'error' events; tower = event_id % N_TOWERS. Blocked equi-join on
    (tower, time bucket) with one side expanded to buckets +-1 — the tower
    key replaces the geo tile (the reference groups by the cell identity
    tuple then sweeps, cellebrite_intersection_service.py:222-298)."""
    ev = load(spark, sf_dir, "events")
    pings = (ev.filter(F.col("event_type") == "error")
             .select("user_id",
                     F.unix_timestamp("ts").alias("tsec"),
                     (F.col("event_id") % N_TOWERS).alias("tower"),
                     F.floor(F.unix_timestamp("ts") / TOWER_MAX_DT_S).alias("tb")))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    a = (pings.withColumn("dt", off)
         .select(F.col("user_id").alias("ua"), F.col("tsec").alias("ta"),
                 "tower", (F.col("tb") + F.col("dt")).alias("tb")))
    b = pings.select(F.col("user_id").alias("ub"),
                     F.col("tsec").alias("tb_s"), "tower", "tb")
    return (
        a.join(b, on=["tower", "tb"])
        .filter((F.col("ua") < F.col("ub"))
                & (F.abs(F.col("ta") - F.col("tb_s")) <= TOWER_MAX_DT_S))
        .groupBy("tower", F.col("ua").alias("user_a"), F.col("ub").alias("user_b"))
        .agg(F.count("*").alias("n_coreg"),
             F.min(F.least("ta", "tb_s")).alias("first_t"))
        .orderBy("tower", "user_a", "user_b")
    )


SQL_TOWER_COREG = f"""
WITH p AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
         event_id % {N_TOWERS} AS tower
  FROM events WHERE event_type = 'error'
)
SELECT a.tower, a.user_id AS user_a, b.user_id AS user_b,
       COUNT(*) AS n_coreg, MIN(least(a.tsec, b.tsec)) AS first_t
FROM p a JOIN p b
  ON a.tower = b.tower AND a.user_id < b.user_id
 AND abs(a.tsec - b.tsec) <= {TOWER_MAX_DT_S}
GROUP BY a.tower, user_a, user_b
ORDER BY a.tower, user_a, user_b
"""


def q_reverse_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse geocoding (SURVEY S8): every geolocated ping resolves to its
    NEAREST gazetteer city by haversine. The gazetteer is a module
    constant, so the per-ping argmin runs entirely MAP-SIDE as an
    array_min over per-city (distance, city) structs — no crossJoin row
    expansion and no per-ping re-aggregation shuffle (the earlier shape
    exploded every ping x |gazetteer| and re-grouped by a synthetic ping
    id: one full shuffle of the expanded stream for the same argmin; same
    struct-min tie-break, identical output). Only the O(cities) rollup
    shuffles. The reference calls a reverse-geocode service per point and
    caches; this is that cache as codegen'd column math."""
    pts = geo_points(spark, sf_dir)
    arr = F.array(*[
        F.struct(
            haversine_m(F.col("lat"), F.col("lon"),
                        F.lit(CITY_COORDS[k][0]),
                        F.lit(CITY_COORDS[k][1])).alias("d"),
            F.lit(k).alias("c"))
        for k in sorted(_CITY_KEYS)])
    return (
        pts.select(F.array_min(arr).alias("e"))
        .groupBy(F.col("e.c").alias("city"))
        .agg(F.count("*").alias("n_pings"),
             F.round(F.min("e.d"), 1).alias("min_dist_m"),
             F.round(F.max("e.d"), 1).alias("max_dist_m"))
        .orderBy("city")
    )


def _sql_reverse_geocode() -> str:
    d = _haversine_sql("g.lat", "g.lon", "geo2.clat", "geo2.clon")
    rows = ", ".join(f"('{k}', {CITY_COORDS[k][0]}, {CITY_COORDS[k][1]})"
                     for k in sorted(_CITY_KEYS))
    return f"""
WITH {_duck_geo_cte()},
geo2(city, clat, clon) AS (VALUES {rows}),
pts AS (SELECT row_number() OVER () AS pid, lat, lon FROM g),
scored AS (
  SELECT pts.pid, geo2.city,
         {_haversine_sql('pts.lat', 'pts.lon', 'geo2.clat', 'geo2.clon')} AS d
  FROM pts CROSS JOIN geo2
),
nearest AS (
  SELECT pid, city, d,
         row_number() OVER (PARTITION BY pid ORDER BY d, city) AS rn
  FROM scored
)
SELECT city, COUNT(*) AS n_pings,
       round(MIN(d), 1) AS min_dist_m,
       round(MAX(d), 1) AS max_dist_m
FROM nearest WHERE rn = 1
GROUP BY city
ORDER BY city
"""


GEO_REGISTRY = {
    "q_reverse_geocode": (q_reverse_geocode, _sql_reverse_geocode()),
    "q_geo_copresence": (q_geo_copresence, _sql_geo_copresence()),
    "q_convoys": (q_convoys, _sql_convoys()),
    "q_tower_coreg": (q_tower_coreg, SQL_TOWER_COREG),
}
