"""int8 quantization: roundtrip error bound, degenerate vectors, and
candidate-quality (quantized cosine ranks close to full-precision)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.similarity import dequantize_int8, quantize_int8


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


@pytest.mark.spark
def test_roundtrip_error_bounded(spark):
    rng = random.Random(5)
    vecs = [[rng.uniform(-3, 3) for _ in range(16)] for _ in range(50)]
    out = dequantize_int8(quantize_int8(_emb(spark, vecs))).collect()
    for r in out:
        # float32 storage already perturbs the input by ~1e-7 per
        # component; the quantization bound is scale/2 on the float32
        # value, so allow a hair over
        orig = [float(x) for x in r.embedding]
        for o, d in zip(orig, r.dqvec):
            assert abs(o - d) <= r.scale / 2 + 1e-6, (o, d, r.scale)


@pytest.mark.spark
def test_zero_vector_and_codes_in_range(spark):
    vecs = [[0.0] * 8, [1.0, -1.0, 0.5, -0.5, 0.0, 2.0, -2.0, 1.5]]
    rows = {r.vec_id: r for r in quantize_int8(_emb(spark, vecs)).collect()}
    assert rows[0].scale == 0.0 and rows[0].qvec == [0] * 8
    assert all(-127 <= q <= 127 for q in rows[1].qvec)
    # max-magnitude component always maps to +-127
    assert max(abs(q) for q in rows[1].qvec) == 127


@pytest.mark.spark
def test_quantized_cosine_close_to_full(spark):
    rng = random.Random(11)
    vecs = [[rng.gauss(0, 1) for _ in range(32)] for _ in range(60)]
    rows = dequantize_int8(quantize_int8(_emb(spark, vecs))).collect()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    base = [[float(x) for x in r.embedding] for r in rows]
    deq = [list(r.dqvec) for r in rows]
    # pairwise cosine drift stays tiny -> candidate sets survive
    drifts = [
        abs(cos(base[i], base[j]) - cos(deq[i], deq[j]))
        for i in range(0, 60, 7)
        for j in range(1, 60, 11)
        if i != j
    ]
    assert max(drifts) < 0.02, max(drifts)


@pytest.mark.spark
def test_quantize_map_only_plan(spark):
    rng = random.Random(13)
    df = quantize_int8(
        _emb(spark, [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(20)])
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
