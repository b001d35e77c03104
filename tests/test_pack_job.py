"""End-to-end jobs/pack.py: chunk + pack the smoke sequence table,
write the packed output, verify metrics and the written layout."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))

import pack as pack_job  # noqa: E402

pytestmark = pytest.mark.spark


def _run(spark, capsys, argv):
    rc = pack_job.main(argv, spark=spark)
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    return rc, json.loads(line)


def test_pack_job_dry_run(spark, capsys):
    rc, m = _run(
        spark, capsys,
        ["--input", "smoke", "--output", "/tmp/x", "--capacity", "8192",
         "--n-buckets", "4", "--dry-run"],
    )
    assert rc == 0
    assert m["n_docs"] == 1000 and m["n_units"] == 1000
    assert m["invariant_violations"] == 0
    assert m["n_oversize"] == 0  # smoke max len 512 < 8192
    assert m["output"] is None
    assert m["fill_efficiency"] > 0.9


def test_pack_job_chunked_write(spark, capsys, tmp_path):
    out = str(tmp_path / "packed")
    rc, m = _run(
        spark, capsys,
        ["--input", "smoke", "--output", out, "--capacity", "256",
         "--chunk", "--n-buckets", "4"],
    )
    assert rc == 0
    assert m["chunked"] and m["n_units"] > m["n_docs"] * 0.9
    assert m["invariant_violations"] == 0
    assert m["n_oversize"] == 0  # chunking removes oversize by definition

    written = spark.read.parquet(out)
    # every unit written exactly once with its assignment + payload
    assert written.count() == m["n_units"]
    assert {"unit_id", "tokens", "pack_id", "pack_offset", "bucket"} <= set(
        written.columns
    )
    # no pack exceeds capacity; token payload matches the recorded length
    over = (
        written.groupBy("pack_id")
        .agg(F.sum("n_tok").alias("tot"))
        .filter(F.col("tot") > 256)
        .count()
    )
    assert over == 0
    mism = written.filter(F.size("tokens") != F.col("n_tok")).count()
    assert mism == 0
