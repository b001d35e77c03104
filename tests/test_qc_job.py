"""End-to-end: the QC report job over the sf0.001 events fixture."""

import json

import pytest

from jobs.qc import build_report, main


@pytest.mark.spark
def test_build_report_joins_all_components(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    rep = build_report(df)
    rows = {r["key"]: r for r in rep.collect()}
    assert len(rows) == 5  # the five event types
    for key, r in rows.items():
        assert r["coverage"] is not None and 0 < r["coverage"] <= 1
        assert r["plateau_len"] is not None and r["plateau_len"] >= 1
        assert r["ar1_phi"] is not None
        assert r["perm_entropy"] is not None
        assert 0.0 <= r["value_entropy"] <= 1.0
        assert r["burstiness"] is not None
        assert isinstance(r["flag_stuck"], bool)
        assert isinstance(r["flag_gappy"], bool)


@pytest.mark.spark
def test_qc_job_cli_writes_parquet_and_summary(
    spark, sf_dir, tmp_path, capsys
):
    out = str(tmp_path / "qc")
    rc = main(
        [
            "--input", f"{sf_dir}/events.parquet",
            "--output", out,
            "--plateau-min", "3",
            "--coverage-min", "0.99",
        ],
        spark=spark,
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    assert summary["n_keys"] == 5
    assert 0 <= summary["n_stuck"] <= 5
    assert summary["worst_coverage"] is not None
    written = spark.read.parquet(out)
    assert written.count() == 5
    assert "flag_stuck" in written.columns
