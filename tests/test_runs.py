"""Unit tests: plateau-run (stuck-sensor) detection."""

from datetime import datetime, timedelta

import pytest

from tsclust_spark.operators.runs import plateau_runs


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )


@pytest.mark.spark
def test_longest_plateau_found(spark):
    t0 = datetime(2024, 1, 1)
    vals = [1.2, 3.4, 5.0, 5.1, 4.9, 5.04, 2.0, 5.0, 5.0]
    # at decimals=0 the quantized stream is 1,3,5,5,5,5,2,5,5:
    # longest island is the four 5s starting at index 2
    rows = [
        (i, t0 + timedelta(minutes=i), "a", v)
        for i, v in enumerate(vals)
    ]
    r = plateau_runs(_mk(spark, rows)).collect()[0]
    assert r["run_value"] == 5.0
    assert r["run_len"] == 4
    assert r["run_start"] == t0 + timedelta(minutes=2)
    assert r["run_end"] == t0 + timedelta(minutes=5)


@pytest.mark.spark
def test_runs_not_merged_across_interruption(spark):
    t0 = datetime(2024, 1, 1)
    # 7,7 | 1 | 7,7,7 -> longest 7-run is 3, not 5
    vals = [7.0, 7.0, 1.0, 7.0, 7.0, 7.0]
    rows = [
        (i, t0 + timedelta(minutes=i), "a", v)
        for i, v in enumerate(vals)
    ]
    r = plateau_runs(_mk(spark, rows)).collect()[0]
    assert r["run_len"] == 3
    assert r["run_start"] == t0 + timedelta(minutes=3)


@pytest.mark.spark
def test_run_len_tie_breaks_on_earliest_start(spark):
    t0 = datetime(2024, 1, 1)
    vals = [2.0, 2.0, 9.0, 4.0, 4.0]
    rows = [
        (i, t0 + timedelta(minutes=i), "a", v)
        for i, v in enumerate(vals)
    ]
    r = plateau_runs(_mk(spark, rows)).collect()[0]
    assert r["run_len"] == 2
    assert r["run_value"] == 2.0
    assert r["run_start"] == t0


@pytest.mark.spark
def test_every_key_yields_one_row_and_duplicate_ts_ordered(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "a", 1.0),
        # duplicate ts on key b: event_id tiebreak makes 8,8 adjacent
        (2, t0, "b", 8.0),
        (3, t0, "b", 8.0),
        (4, t0 + timedelta(minutes=1), "b", 3.0),
    ]
    got = {r["key"]: r for r in plateau_runs(_mk(spark, rows)).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["run_len"] == 1
    assert got["b"]["run_len"] == 2
    assert got["b"]["run_value"] == 8.0
