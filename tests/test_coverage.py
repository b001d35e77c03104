"""Unit tests: tier coverage / completeness report."""

from datetime import datetime, timedelta

import pytest

from tsclust_spark.operators.coverage import coverage_report


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts", "value"])


@pytest.mark.spark
def test_coverage_counts_gaps_without_materializing(spark):
    t0 = datetime(2024, 1, 1)
    # present days: 0,1,2, 6, 10,11 -> expected 12, present 6,
    # gaps: 3..5 (len 3) and 7..9 (len 3) -> n_gaps 2, max 3
    days = [0, 1, 2, 6, 10, 11]
    rows = [
        ("a", t0 + timedelta(days=d, hours=h), 1.0)
        for d in days
        for h in (0, 12)  # two points per day: dedup to one bucket
    ]
    r = coverage_report(_mk(spark, rows)).collect()[0]
    assert r["n_days_expected"] == 12
    assert r["n_days_present"] == 6
    assert r["coverage"] == pytest.approx(0.5)
    assert r["max_gap_days"] == 3
    assert r["n_gaps"] == 2


@pytest.mark.spark
def test_full_coverage_and_single_day(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("full", t0 + timedelta(days=d), 1.0) for d in range(5)
    ] + [("solo", t0, 2.0)]
    got = {
        r["key"]: r for r in coverage_report(_mk(spark, rows)).collect()
    }
    assert got["full"]["coverage"] == pytest.approx(1.0)
    assert got["full"]["max_gap_days"] == 0
    assert got["full"]["n_gaps"] == 0
    assert got["solo"]["n_days_expected"] == 1
    assert got["solo"]["coverage"] == pytest.approx(1.0)
    assert got["solo"]["max_gap_days"] == 0


@pytest.mark.spark
def test_null_values_do_not_count_as_presence(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + timedelta(days=1), None),  # NULL-only day: absent
        ("a", t0 + timedelta(days=2), 3.0),
    ]
    r = coverage_report(_mk(spark, rows)).collect()[0]
    assert r["n_days_expected"] == 3
    assert r["n_days_present"] == 2
    assert r["max_gap_days"] == 1
    assert r["n_gaps"] == 1
