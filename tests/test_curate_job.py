"""jobs/curate.py end-to-end: attrition JSON + written corpus agree."""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tests.conftest import SMOKE_SF


def _run(spark, capsys, argv):
    from jobs.curate import main

    assert main(argv, spark=spark) == 0
    out = [
        line
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    return json.loads(out[-1])


def test_curate_job_attrition_and_output(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "curated")
    rep = _run(
        spark,
        capsys,
        [
            "--input", os.path.join(SMOKE_SF, "documents.parquet"),
            "--output", out_dir,
        ],
    )
    assert rep["job"] == "curate"
    assert rep["n_input"] == 500
    assert rep["n_kept"] + sum(rep["drops"].values()) == rep["n_input"]
    written = spark.read.parquet(out_dir)
    assert written.count() == rep["n_kept"]
    assert set(written.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_curate_job_gopher_dry_run(spark, tmp_path, capsys):
    rep = _run(
        spark,
        capsys,
        [
            "--input", os.path.join(SMOKE_SF, "documents.parquet"),
            "--output", str(tmp_path / "never"),
            "--gopher", "--dry-run",
        ],
    )
    assert rep["output"] is None
    assert not (tmp_path / "never").exists()
    assert rep["n_input"] == 500
    # gopher rules strictly tighten the base curation
    assert any(k.startswith("gopher_") for k in rep["drops"]) or (
        rep["n_kept"] <= 500
    )
