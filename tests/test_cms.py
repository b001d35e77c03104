"""Unit tests: count-min sketch build / estimate / merge."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.cms import cms_build, cms_estimate


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def _toks(texts):
    out = []
    for t in texts:
        out += t.lower().strip().split()
    return Counter(out)


TEXTS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "a cat and a dog and a bird",
    "zebra " * 30,
]


@pytest.mark.spark
def test_estimates_overestimate_and_hit_heavy(spark):
    sketch = cms_build(_docs(spark, TEXTS), d=4, w=64)
    truth = _toks(TEXTS)
    q = spark.createDataFrame(
        [(t,) for t in truth], ["token"]
    )
    est = {
        r["token"]: r["cms_count"]
        for r in cms_estimate(sketch, q, d=4, w=64).collect()
    }
    for t, n in truth.items():
        assert est[t] >= n, t  # one-sided guarantee, always
    # with 14 distinct tokens in 4x64 cells, collisions are unlikely
    # in every one of the 4 rows simultaneously: the top token is exact
    top, n_top = truth.most_common(1)[0]
    assert est[top] == n_top


@pytest.mark.spark
def test_total_count_per_row_is_stream_length(spark):
    sketch = cms_build(_docs(spark, TEXTS), d=4, w=64)
    n_stream = sum(_toks(TEXTS).values())
    per_row = {
        r["row_idx"]: r["s"]
        for r in sketch.groupBy("row_idx")
        .agg(F.sum("c").alias("s"))
        .collect()
    }
    assert set(per_row) == {0, 1, 2, 3}
    assert all(v == n_stream for v in per_row.values())


@pytest.mark.spark
def test_merge_equals_sketch_of_union(spark):
    a, b = TEXTS[:2], TEXTS[2:]
    sk_a = cms_build(_docs(spark, a), d=4, w=64)
    sk_b = cms_build(_docs(spark, b), d=4, w=64)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = cms_build(_docs(spark, a + b), d=4, w=64)
    m = {(r["row_idx"], r["bucket"]): r["c"] for r in merged.collect()}
    w_ = {(r["row_idx"], r["bucket"]): r["c"] for r in whole.collect()}
    assert m == w_


@pytest.mark.spark
def test_unknown_token_estimates_from_collisions_only(spark):
    sketch = cms_build(_docs(spark, ["x y z"]), d=4, w=64)
    q = spark.createDataFrame([("neverseen",)], ["token"])
    est = cms_estimate(sketch, q, d=4, w=64).collect()[0]
    # 3 tokens in 64 buckets: odds all 4 rows collide are tiny
    assert est["cms_count"] == 0
