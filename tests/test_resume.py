"""Resume/checkpoint semantics (SURVEY.md §5.2.6, FIXTURES.md §4):
an interrupted run + resume produces byte-identical tier tables to a
clean full run, and completed units are not recomputed."""

import os

import pytest
from pyspark.sql import functions as F

from tsclust_spark.plans.manifest import Manifest
from tsclust_spark.plans.rollup_job import run_rollup
from tsclust_spark.sources.datagen import read_sequences

N_UNITS = 8


@pytest.fixture(scope="module")
def seq(spark):
    # 200 docs is plenty to populate all 8 units
    return read_sequences(spark, "smoke").limit(200).cache()


def _read_tier(spark, out, tier):
    return spark.read.parquet(f"{out}/agg_{tier}").drop("unit", "bucket_date")


@pytest.mark.spark
def test_interrupted_then_resumed_equals_clean(spark, seq, tmp_path_factory):
    clean = str(tmp_path_factory.mktemp("clean"))
    resumed = str(tmp_path_factory.mktemp("resumed"))

    s_clean = run_rollup(spark, seq, clean, n_units=N_UNITS, write_raw=False)
    assert s_clean["units_processed"] == N_UNITS
    assert s_clean["points"] > 0

    # simulate a kill after 3 units, then resume
    s1 = run_rollup(
        spark, seq, resumed, n_units=N_UNITS, max_units=3, write_raw=False
    )
    assert s1["units_processed"] == 3
    s2 = run_rollup(spark, seq, resumed, n_units=N_UNITS, write_raw=False)
    # resume processed ONLY the remaining units
    assert s2["units_processed"] == N_UNITS - 3

    for tier in ["1m", "1h", "1d"]:
        a = _read_tier(spark, clean, tier)
        b = _read_tier(spark, resumed, tier)
        assert a.count() == b.count(), tier
        assert a.exceptAll(b).count() == 0, tier
        assert b.exceptAll(a).count() == 0, tier

    # a further rerun is a no-op (all units complete)
    s3 = run_rollup(spark, seq, resumed, n_units=N_UNITS, write_raw=False)
    assert s3["units_processed"] == 0


@pytest.mark.spark
def test_manifest_metrics_recorded(spark, seq, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("metrics"))
    run_rollup(spark, seq, out, n_units=4, write_raw=False)
    m = Manifest(spark, f"{out}/_manifest").metrics().collect()
    assert len(m) == 4
    for r in m:
        assert r.status == "done"
        assert r.points_per_sec > 0 or r.points == 0
        assert '"n_units": 4' in r.lineage


@pytest.mark.spark
def test_raw_tier_blocks_written(spark, seq, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("raw"))
    run_rollup(spark, seq.limit(50), out, n_units=2, write_raw=True)
    raw = spark.read.parquet(f"{out}/raw")
    assert raw.count() == 50
    assert set(["doc_id", "n", "t0", "dod", "xor"]).issubset(set(raw.columns))
    # compressed payloads beat raw 8B/value overall on the token walk
    tot = raw.agg(
        F.sum(F.length("xor")).alias("xb"), F.sum("n").alias("n")
    ).collect()[0]
    assert tot.xb < tot.n * 8


@pytest.mark.spark
def test_tier_parity_vs_direct_rollup(spark, seq, tmp_path_factory):
    """The unit-sliced, merged output equals a direct whole-table rollup."""
    from tsclust_spark.operators.explode import explode_to_points
    from tsclust_spark.plans.rollup_job import build_tiers_with_rep

    out = str(tmp_path_factory.mktemp("parity"))
    run_rollup(spark, seq, out, n_units=N_UNITS, write_raw=False)
    points = explode_to_points(seq, keep_source=False)
    direct = build_tiers_with_rep(points)
    for tier in ["1m", "1h", "1d"]:
        got = _read_tier(spark, out, tier)
        want = direct[tier]
        cols = sorted(want.columns)
        got, want = got.select(*cols), want.select(*cols)
        assert got.exceptAll(want).count() == 0, tier
        assert want.exceptAll(got).count() == 0, tier


@pytest.mark.spark
def test_manifest_latest_record_wins(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lww"))
    m = Manifest(spark, f"{out}/_manifest")
    m.record("7", "failed")
    assert m.pending_units(["7", "8"]) == ["7", "8"]
    m.record("7", "done", rows=1, points=10, wall_ms=5.0)
    assert m.pending_units(["7", "8"]) == ["8"]


@pytest.mark.spark
def test_failed_unit_recorded_and_retried(spark, seq, tmp_path_factory, monkeypatch):
    import tsclust_spark.plans.rollup_job as rj

    out = str(tmp_path_factory.mktemp("fail"))
    calls = {"n": 0}
    real = rj.run_unit

    def flaky(spark_, s, unit, n_units, out_dir, write_raw):
        calls["n"] += 1
        if calls["n"] == 2:  # second unit blows up once
            raise RuntimeError("injected")
        return real(spark_, s, unit, n_units, out_dir, write_raw)

    monkeypatch.setattr(rj, "run_unit", flaky)
    with pytest.raises(RuntimeError):
        rj.run_rollup(spark, seq, out, n_units=4, write_raw=False)
    statuses = {
        r.unit_id: r.status
        for r in Manifest(spark, f"{out}/_manifest").metrics().collect()
    }
    assert statuses["0"] == "done" and statuses["1"] == "failed"
    # retry completes only the remaining units (incl. the failed one)
    s2 = rj.run_rollup(spark, seq, out, n_units=4, write_raw=False)
    assert s2["units_processed"] == 3


@pytest.mark.spark
def test_staged_units_prune_input_scan(spark, seq, tmp_path_factory):
    """run_rollup stages the input once, unit-partitioned; each unit's
    scan then carries a PartitionFilter on unit= (pruned, not a full
    rescan of the input per unit)."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("staged"))
    run_rollup(spark, seq, out, n_units=4, write_raw=False)
    assert os.path.exists(f"{out}/_staged_n4/_SUCCESS")

    staged = spark.read.parquet(f"{out}/_staged_n4")
    assert staged.count() == seq.count()
    plan = (
        staged.filter(F.col("unit") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "unit" in plan


@pytest.mark.spark
def test_stage_false_keeps_predicate_path(spark, seq, tmp_path_factory):
    import os

    out = str(tmp_path_factory.mktemp("nostage"))
    run_rollup(spark, seq, out, n_units=2, write_raw=False, stage=False)
    assert not os.path.exists(f"{out}/_staged_n2")
    assert spark.read.parquet(f"{out}/agg_1d").count() > 0


@pytest.mark.spark
def test_resume_restages_when_input_changes(spark, seq, tmp_path_factory):
    """A resume pointed at a DIFFERENT input than the one staged must
    restage (input fingerprint mismatch), not silently process the
    stale snapshot."""
    base = str(tmp_path_factory.mktemp("fpr"))
    in_a, in_b, out = f"{base}/in_a", f"{base}/in_b", f"{base}/out"

    seq.limit(40).write.parquet(in_a)
    # in_b: same docs plus one distinctive extra
    extra = spark.createDataFrame(
        [("zz-new-doc", [1, 2, 3], 3, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    spark.read.parquet(in_a).unionByName(extra).write.parquet(in_b)

    run_rollup(spark, spark.read.parquet(in_a), out, n_units=N_UNITS,
               max_units=3, write_raw=False)
    staged = f"{out}/_staged_n{N_UNITS}"
    assert spark.read.parquet(staged).filter(
        F.col("doc_id") == "zz-new-doc"
    ).count() == 0

    # resume against in_b: fingerprint mismatch -> restaged from in_b
    run_rollup(spark, spark.read.parquet(in_b), out, n_units=N_UNITS,
               write_raw=False)
    assert spark.read.parquet(staged).filter(
        F.col("doc_id") == "zz-new-doc"
    ).count() == 1

    # and an unchanged-input resume reuses the snapshot (fingerprint file
    # still present and matching)
    from tsclust_spark.plans.rollup_job import _hadoop_read_text, _input_fingerprint

    rec = _hadoop_read_text(spark, f"{staged}/_INPUT_FPR")
    assert rec == _input_fingerprint(spark.read.parquet(in_b))
    assert rec is not None and rec.startswith("files:")
