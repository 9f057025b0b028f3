"""Driver-contract guard: every queries() entry with an oracle must match
DuckDB exactly at sf0.001 (row count, column names, order-insensitive
values). This is the same comparison the driver runs at sf0.01."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from scripts_dev.check_oracles import TABLES, normalize

SF_DIR = "/root/testdata/sf0.001"

# slow entries whose full-pipeline correctness is covered elsewhere
# (test_pipeline_parity covers the synthetic-fuzz corpus)
SKIP = {"kg_triples_synth"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


_oracles = entrymod.oracle_sql()
_queries = entrymod.queries()
NAMES = [n for n in _queries if n in _oracles and n not in SKIP]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    got = normalize(_queries[name](spark, SF_DIR).toPandas())
    want = normalize(duck.execute(_oracles[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-5)
