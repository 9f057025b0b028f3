"""Engine-stable decimal rounding for tie-prone rational values.

Native round() disagrees across engines exactly on decimal-halfway
values: Spark rounds the shortest-decimal RENDERING of the double
(BigDecimal.valueOf -> HALF_UP), DuckDB rounds the BINARY value — so
a ratio like 201/3200 = 0.0628125 renders 0.062813 in Spark and
0.062812 in DuckDB. For continuous quantities (distances, cosines)
the halfway set has measure zero and native round is fine; for
RATIOS OF SMALL INTEGERS (sum/count averages, percentages, jaccard,
token-quality scores) halfway points are routine, and every such
column in a (queries, oracle_sql) pair must round identically in both
engines or the value hash diverges at some scale factor.

stable_round computes floor(x * 10^s + 0.5) / 10^s in plain IEEE
double arithmetic — the same bit-exact result in ANY engine that
evaluates doubles, at the cost of rounding halfway-below-representable
cases down instead of "decimal half up". The SQL mirror is the literal
same formula: floor((x) * 1e6 + 0.5) / 1e6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(c: Column, scale: int) -> Column:
    p = F.lit(float(10 ** scale))
    return F.floor(c * p + F.lit(0.5)) / p


def sql_stable_round(expr: str, scale: int) -> str:
    p = float(10 ** scale)
    return f"floor(({expr}) * {p!r} + 0.5) / {p!r}"
