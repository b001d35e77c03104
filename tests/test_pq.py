"""Unit tests: product quantization (train / encode / ADC search)."""

import numpy as np
import pytest

from tsclust_spark.operators.pq import pq_adc_topk, pq_encode, pq_train


def _mk(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _np_train(x, m, ksub, iters):
    """Numpy twin with the engine's exact tie/seed/empty rules."""
    n, d = x.shape
    sd = d // m
    books = np.stack(
        [x[:ksub, s * sd : (s + 1) * sd].copy() for s in range(m)]
    )  # (m, ksub, sd)
    for _ in range(iters):
        codes = _np_encode(x, books, m)
        for s in range(m):
            for c in range(ksub):
                mask = codes[:, s] == c
                if mask.any():
                    books[s, c] = x[mask, s * sd : (s + 1) * sd].mean(axis=0)
    return books


def _np_encode(x, books, m):
    n, d = x.shape
    sd = d // m
    codes = np.empty((n, m), dtype=int)
    for s in range(m):
        sub = x[:, s * sd : (s + 1) * sd]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)  # first min = lowest code
    return codes


@pytest.mark.spark
def test_train_and_encode_match_numpy(spark):
    rng = np.random.default_rng(12)
    x = rng.normal(size=(60, 16))
    df = _mk(spark, x)
    books = pq_train(df, dim=16, m=4, ksub=8, lloyd_iters=2)
    got = {
        (r["sub_idx"], r["code_id"]): np.array(r["cvec"])
        for r in books.collect()
    }
    ref = _np_train(x, 4, 8, 2)
    assert len(got) == 4 * 8
    for (s, c), v in got.items():
        np.testing.assert_allclose(v, ref[s, c], rtol=1e-9)

    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df, books, dim=16, m=4).collect()
    }
    ref_codes = _np_encode(x, ref, 4)
    for i in range(60):
        assert codes[i] == list(ref_codes[i]), f"vec {i}"


@pytest.mark.spark
def test_adc_matches_numpy_table_sum(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 16))
    df = _mk(spark, x)
    books = pq_train(df, dim=16, m=4, ksub=8, lloyd_iters=1)
    codes = pq_encode(df, books, dim=16, m=4)
    out = pq_adc_topk(
        books, codes, _mk(spark, x[:3]), dim=16, m=4, k=40
    ).collect()

    ref_books = _np_train(x, 4, 8, 1)
    ref_codes = _np_encode(x, ref_books, 4)
    for r in out:
        qi, ci = r["query_id"], r["cand_id"]
        dist = 0.0
        for s in range(4):
            sub = x[qi, s * 4 : (s + 1) * 4]
            dist += float(
                ((sub - ref_books[s, ref_codes[ci, s]]) ** 2).sum()
            )
        assert r["adc_dist"] == pytest.approx(dist, rel=1e-9)


@pytest.mark.spark
def test_pq_exact_when_every_vector_is_a_centroid(spark):
    # ksub = n, zero Lloyd iters: every database vector's subvectors
    # are their own (distance-0) codes, so ADC == exact squared L2 and
    # the ranking equals brute force.
    rng = np.random.default_rng(7)
    x = rng.normal(size=(20, 8))
    df = _mk(spark, x)
    books = pq_train(df, dim=8, m=2, ksub=20, lloyd_iters=0)
    codes = pq_encode(df, books, dim=8, m=2)
    out = pq_adc_topk(books, codes, _mk(spark, x[:5]), dim=8, m=2, k=3)
    got = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["adc_dist"])
        for r in out.collect()
    }
    d2 = ((x[:5, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    for q in range(5):
        order = [
            j for j in np.argsort(d2[q], kind="stable") if j != q
        ][:3]
        for rank, j in enumerate(order, start=1):
            cand, dist = got[(q, rank)]
            assert cand == j
            assert dist == pytest.approx(float(d2[q, j]), rel=1e-9)


@pytest.mark.spark
def test_pq_recall_on_clustered_data(spark):
    # 4 well-separated clusters; PQ@m=2 must put same-cluster
    # neighbors first
    rng = np.random.default_rng(5)
    centers = rng.normal(scale=20.0, size=(4, 16))
    # interleave clusters by id: the deterministic lowest-id seeding
    # then spans all clusters (all-one-cluster seeds would need many
    # more Lloyd iterations — the IVF seeding note applies here too)
    x = np.stack(
        [
            centers[i % 4] + rng.normal(scale=0.5, size=16)
            for i in range(40)
        ]
    )
    df = _mk(spark, x)
    books = pq_train(df, dim=16, m=2, ksub=8, lloyd_iters=2)
    codes = pq_encode(df, books, dim=16, m=2)
    out = pq_adc_topk(books, codes, df, dim=16, m=2, k=5).collect()
    hits = sum(
        1 for r in out if r["cand_id"] % 4 == r["query_id"] % 4
    )
    assert hits / len(out) > 0.95
