"""Engine-stable rounding (functions/numeric.py): Spark's native round
HALF-UPs the shortest-decimal rendering while DuckDB rounds the binary
double, so ratios of small ints landing on decimal-halfway points (e.g.
201/3200 = 0.0628125) round differently — the latent value-hash-mismatch
class for every avg/ratio column. stable_round must agree with the SQL
mirror formula bit-for-bit on exactly those inputs."""

import duckdb
from pyspark.sql import functions as F

from owl_n4j_spark.functions.numeric import sql_stable_round, stable_round

# (numerator, denominator) pairs whose ratio is decimal-halfway at 1e-6
TIES = [(201, 3200), (1, 1600), (3, 6400), (5, 3200), (127, 2000),
        (63, 1600), (999, 6400), (7, 3200)]


def test_stable_round_matches_sql_mirror_on_ties(spark):
    rows = [(float(n) / d,) for n, d in TIES]
    got = (spark.createDataFrame(rows, "x double")
           .select(stable_round(F.col("x"), 6).alias("r"))
           .collect())
    want = [duckdb.sql(
        f"SELECT {sql_stable_round(f'{n} / {d}', 6)}").fetchone()[0]
        for n, d in TIES]
    assert [r.r for r in got] == want


def test_native_round_actually_diverges(spark):
    """Documents WHY stable_round exists: on the 201/3200 tie DuckDB's
    native round and Spark's native round give DIFFERENT values."""
    duck = duckdb.sql("SELECT round(201 / 3200, 6)").fetchone()[0]
    spk = (spark.createDataFrame([(201.0 / 3200.0,)], "x double")
           .select(F.round("x", 6).alias("r")).collect()[0].r)
    assert spk == 0.062813 and duck == 0.062812
    assert spk != duck
