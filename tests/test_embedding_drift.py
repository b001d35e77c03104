"""Embedding centroid drift: cosine distance between slice centroids."""

import numpy as np


def _df(spark, a_vecs, b_vecs):
    rows = [("a", [float(x) for x in v]) for v in a_vecs] + [
        ("b", [float(x) for x in v]) for v in b_vecs
    ]
    return spark.createDataFrame(rows, "slice string, embedding array<double>")


def test_identical_centroids_no_drift(spark):
    from tsclust_spark.operators.drift import embedding_centroid_drift

    vecs = [[1.0, 0.0, 2.0], [0.0, 1.0, 2.0]]
    r = embedding_centroid_drift(
        _df(spark, vecs, vecs), "slice", "a", "b"
    ).collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert abs(r["cosine_sim"] - 1.0) < 1e-12
    assert r["cosine_dist"] == 0.0 and not r["drifted"]


def test_matches_numpy_reference(spark):
    from tsclust_spark.operators.drift import embedding_centroid_drift

    rng = np.random.default_rng(17)
    a = rng.normal(0, 1, size=(50, 16))
    b = rng.normal(0.3, 1, size=(40, 16))
    r = embedding_centroid_drift(
        _df(spark, a, b), "slice", "a", "b"
    ).collect()[0]
    ca, cb = a.mean(axis=0), b.mean(axis=0)
    want = float(
        ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
    )
    assert abs(r["cosine_sim"] - want) < 1e-9
    assert abs(r["cosine_dist"] - round(1.0 - want, 6)) < 1e-6
    assert r["drifted"]  # a 0.3-sigma mean shift moves the centroid


def test_orthogonal_centroids_full_drift(spark):
    from tsclust_spark.operators.drift import embedding_centroid_drift

    r = embedding_centroid_drift(
        _df(spark, [[1.0, 0.0]], [[0.0, 1.0]]), "slice", "a", "b"
    ).collect()[0]
    assert abs(r["cosine_dist"] - 1.0) < 1e-9 and r["drifted"]


def test_zero_norm_centroid_flags_false(spark):
    from tsclust_spark.operators.drift import embedding_centroid_drift

    a = [[1.0, -1.0], [-1.0, 1.0]]  # centroid is the zero vector
    r = embedding_centroid_drift(
        _df(spark, a, [[1.0, 1.0]]), "slice", "a", "b"
    ).collect()[0]
    assert r["cosine_sim"] is None and not r["drifted"]
