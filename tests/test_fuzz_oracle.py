"""Adversarial-fixture twin of the oracle gate (tools/fuzz_oracle.py).

test_queries_oracle.py proves Spark == DuckDB on the BENIGN sf0.001
fixtures; this file proves it on a HOSTILE fixture — duplicate
(key, ts) rows, NULL values, zero-variance series, single-point
series, bucket-boundary microsecond ties, counter resets, empty and
whitespace-only documents, zero/duplicate/one-hot vectors. Round 3's
ADVICE items (EWMA tiebreak, Gopher empty-doc NULL, PSI NULL totals)
and the round-4 fuzz finds (PSI bin-0 NULL absorption via DuckDB's
NULL-ignoring greatest(), ANSI DIVIDE_BY_ZERO on zero-norm cosine)
were all of exactly this class — divergences invisible on benign
data.
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
from fuzz_oracle import DEFAULT_QUERIES, build_fuzz_dir  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


@pytest.fixture(scope="module")
def fuzz_dir():
    return build_fuzz_dir()


@pytest.fixture(scope="module")
def con(fuzz_dir):
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(fuzz_dir, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(DEFAULT_QUERIES))
def test_query_matches_oracle_on_hostile_fixture(spark, fuzz_dir, con, name):
    fn = {**entrymod.queries(), **entrymod.queued_queries()}[name]
    got = normalize(fn(spark, fuzz_dir).toPandas())
    oracles = {**entrymod.oracle_sql(), **entrymod.queued_oracle_sql()}
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, mirrors the driver
        return
    want = normalize(con.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )


# Queries whose inputs the hostile fixture deliberately does NOT model:
# TPC-H relational tables (lineitem/orders/customer/nation families) and
# kernel-invariant gates over generated sequences/media. Everything else
# with an oracle MUST be fuzz-listed — this guard catches the silent
# omission class (the DEFAULT_QUERIES list is hand-maintained).
FUZZ_EXEMPT = {
    # TPC-H tables, not in the fuzz dir
    "lineitem_pricing_summary",
    "revenue_per_nation",
    "topk_orders_per_customer",
    "semi_anti_resume",
    "parity_diff",
    # kernel-invariant gates over sequences/media fixtures
    "cluster_invariants",
    "dba_identical_recovery",
    "dtw_pruned_check",
    "dtw_selfcheck",
    "frame_sample",
    "lttb_invariants",
    "multimodal_invariants",
}


def test_every_oracle_gated_query_is_fuzzed_or_exempt():
    all_oracle = set(entrymod.oracle_sql()) | set(
        entrymod.queued_oracle_sql()
    )
    missing = all_oracle - set(DEFAULT_QUERIES) - FUZZ_EXEMPT
    assert not missing, (
        f"oracle-gated queries missing from tools/fuzz_oracle.py "
        f"DEFAULT_QUERIES (add them or document an exemption): "
        f"{sorted(missing)}"
    )
    stale = FUZZ_EXEMPT - all_oracle
    assert not stale, f"stale exemptions: {sorted(stale)}"
