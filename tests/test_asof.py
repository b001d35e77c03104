"""As-of join + sessionization semantics (operators/asof.py)."""

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return f"2024-01-01 00:{s}"


@pytest.mark.spark
def test_asof_join_semantics(spark):
    from tsclust_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("d1", _ts("00:05"), 1.0),  # before any right row -> null
            ("d1", _ts("00:10"), 2.0),  # exact ts match visible
            ("d1", _ts("00:45"), 3.0),  # latest right <= 00:45 is 00:30
            ("d2", _ts("01:00"), 4.0),  # other key: only its own rights
        ],
        "doc_id string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("d1", _ts("00:10"), 10.0),
            ("d1", _ts("00:30"), 30.0),
            ("d2", _ts("00:50"), 50.0),
        ],
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.to_timestamp("ts"))

    out = {
        (r.doc_id, str(r.ts)): (r.asof_value, r.asof_ts and str(r.asof_ts))
        for r in asof_join(
            left, right, key_col="doc_id", ts_col="ts", right_value_col="rv"
        ).collect()
    }
    assert out[("d1", "2024-01-01 00:00:05")] == (None, None)
    assert out[("d1", "2024-01-01 00:00:10")] == (10.0, "2024-01-01 00:00:10")
    assert out[("d1", "2024-01-01 00:00:45")] == (30.0, "2024-01-01 00:00:30")
    assert out[("d2", "2024-01-01 00:01:00")] == (50.0, "2024-01-01 00:00:50")

    # tolerance: a match older than 10s is nulled out
    tol = {
        (r.doc_id, str(r.ts)): r.asof_value
        for r in asof_join(
            left, right, key_col="doc_id", ts_col="ts",
            right_value_col="rv", tolerance_seconds=10,
        ).collect()
    }
    assert tol[("d1", "2024-01-01 00:00:10")] == 10.0  # 0s old
    assert tol[("d1", "2024-01-01 00:00:45")] is None  # 15s old
    assert tol[("d2", "2024-01-01 00:01:00")] == 50.0  # 10s old, inclusive


@pytest.mark.spark
def test_sessionize_boundaries(spark):
    from tsclust_spark.operators.asof import session_stats, sessionize

    pts = spark.createDataFrame(
        [
            ("d1", _ts("00:00")),
            ("d1", _ts("00:30")),   # 30s gap, same session
            ("d1", _ts("02:00")),   # 90s gap > 60 -> new session
            ("d1", _ts("02:30")),
            ("d2", _ts("00:00")),   # other key: its own numbering
        ],
        "doc_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    s = {
        (r.doc_id, str(r.ts)): r.session_id
        for r in sessionize(pts, gap_seconds=60).collect()
    }
    assert s[("d1", "2024-01-01 00:00:00")] == 0
    assert s[("d1", "2024-01-01 00:00:30")] == 0
    assert s[("d1", "2024-01-01 00:02:00")] == 1
    assert s[("d1", "2024-01-01 00:02:30")] == 1
    assert s[("d2", "2024-01-01 00:00:00")] == 0

    stats = {
        (r.doc_id, r.session_id): (r.n_events, r.duration_sec)
        for r in session_stats(pts, gap_seconds=60).collect()
    }
    assert stats[("d1", 0)] == (2, 30)
    assert stats[("d1", 1)] == (2, 30)
    assert stats[("d2", 0)] == (1, 0)


@pytest.mark.spark
def test_asof_join_single_shuffle_plan(spark):
    """The union-tag as-of join must plan exactly one Exchange (the key
    shuffle) — no range/nested-loop join."""
    from tsclust_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("d1", "2024-01-01 00:00:05", 1.0)],
        "doc_id string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("d1", "2024-01-01 00:00:01", 2.0)],
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = (
        asof_join(left, right, right_value_col="rv")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


@pytest.mark.spark
def test_asof_join_null_right_value_stays_paired(spark):
    """A right row with a NULL value must NOT desync (value, ts): the
    as-of match is the latest right ROW; its value may be null."""
    from tsclust_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("d1", _ts("00:20"), 1.0)], "doc_id string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("d1", _ts("00:05"), 7.0), ("d1", _ts("00:10"), None)],
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = asof_join(left, right, right_value_col="rv").collect()[0]
    assert str(r.asof_ts) == "2024-01-01 00:00:10"
    assert r.asof_value is None  # NOT the stale 7.0 from 00:05


def _skewed(spark, n_hot=400, n_cold=5, step=97, with_value=True):
    """One hot key with n_hot points spanning many day-buckets + cold
    keys. Deterministic arithmetic timestamps/values (no RNG)."""
    rows = []
    for i in range(n_hot):
        rows.append(("hot", 1704067200 + i * step * 60, float((i * 31) % 50)))
    for k in range(n_cold):
        for i in range(7):
            rows.append(
                (f"c{k}", 1704067200 + (i * 211 + k * 13) * 60,
                 float((i + k) % 9))
            )
    df = spark.createDataFrame(rows, "doc_id string, epoch long, value double")
    df = df.withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    return df if with_value else df.drop("value")


@pytest.mark.spark
def test_asof_join_bucketed_equals_unsplit(spark):
    """Hot-key pre-split: bucketed as-of == unsplit as-of row-for-row,
    including carries across empty buckets and tolerance."""
    from tsclust_spark.operators.asof import asof_join, asof_join_bucketed

    pts = _skewed(spark)
    parity = F.pmod(F.minute("ts"), F.lit(2))
    left = pts.filter(parity == 1)
    right = (
        pts.filter(parity == 0)
        .select("doc_id", "ts", F.col("value").alias("rv"))
    )
    for tol in (None, 3600):
        ref = asof_join(
            left, right, right_value_col="rv", tolerance_seconds=tol
        )
        got = asof_join_bucketed(
            left, right, right_value_col="rv",
            bucket_seconds=86400, tolerance_seconds=tol,
        )
        key = lambda r: (r.doc_id, str(r.ts))  # noqa: E731
        ref_m = {key(r): (r.asof_value, r.asof_ts and str(r.asof_ts))
                 for r in ref.collect()}
        got_m = {key(r): (r.asof_value, r.asof_ts and str(r.asof_ts))
                 for r in got.collect()}
        assert got_m == ref_m and len(got_m) == left.count()


@pytest.mark.spark
def test_asof_join_bucketed_splits_hot_key(spark):
    """The heavy window must partition by (key, bucket): the hot key's
    timeline spans many buckets, so no single window partition holds the
    whole hot key."""
    from tsclust_spark.operators.asof import asof_join_bucketed

    pts = _skewed(spark)
    left = pts.filter(F.pmod(F.minute("ts"), F.lit(2)) == 1)
    right = pts.select("doc_id", "ts", F.col("value").alias("rv"))
    out = asof_join_bucketed(left, right, right_value_col="rv",
                             bucket_seconds=86400)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the as-of window partitions on the composite struct, not the bare key
    assert "_kb" in plan
    n_buckets = (
        left.filter(F.col("doc_id") == "hot")
        .select(F.floor(F.unix_timestamp("ts") / 86400))
        .distinct()
        .count()
    )
    assert n_buckets > 10  # the hot key genuinely spans many partitions


@pytest.mark.spark
def test_sessionize_bucketed_equals_unsplit(spark):
    """Bucketed sessionization == unsplit, including sessions that span
    bucket boundaries and fully-merging buckets."""
    from tsclust_spark.operators.asof import sessionize, sessionize_bucketed

    pts = _skewed(spark, with_value=False)
    # gap chosen so some sessions span the 1h test buckets and some don't
    for gap, bucket in ((1800, 3600), (5400, 3600), (60 * 97, 86400)):
        ref = {
            (r.doc_id, str(r.ts)): r.session_id
            for r in sessionize(pts, gap_seconds=gap).collect()
        }
        got = {
            (r.doc_id, str(r.ts)): r.session_id
            for r in sessionize_bucketed(
                pts, gap_seconds=gap, bucket_seconds=bucket
            ).collect()
        }
        assert got == ref


@pytest.mark.spark
def test_asof_join_equal_ts_tiebreak_deterministic(spark):
    """Several right rows at the same (key, ts): the greatest value wins,
    under any input ordering."""
    from tsclust_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("d1", _ts("00:10"), 1.0)], "doc_id string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    for order in ([7.0, 9.0, 3.0], [9.0, 3.0, 7.0], [3.0, 7.0, 9.0]):
        right = spark.createDataFrame(
            [("d1", _ts("00:10"), v) for v in order],
            "doc_id string, ts string, rv double",
        ).withColumn("ts", F.to_timestamp("ts"))
        r = asof_join(left, right, right_value_col="rv").collect()[0]
        assert r.asof_value == 9.0
