"""Dedup / similarity / text-stats semantics beyond the DuckDB oracle:
LSH-vs-exact containment and recall properties."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.mark.spark
def test_minhash_lsh_subset_of_direct(spark, docs):
    from tsclust_spark.operators.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_pairs,
    )

    direct = ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    lsh = minhash_near_duplicates(
        docs, k=3, num_hashes=16, bands=4, rows_per_band=4, threshold=0.5
    )
    d = {(r.id_a, r.id_b): r.jaccard for r in direct.collect()}
    l = {(r.id_a, r.id_b): r.jaccard for r in lsh.collect()}
    # verification guarantees: every LSH pair is a true pair with the
    # same exact jaccard
    for pair, j in l.items():
        assert pair in d
        assert abs(d[pair] - j) < 1e-12
    # recall on this corpus should be high (banding 4x4 at j>=0.5)
    if d:
        assert len(l) / len(d) >= 0.8


@pytest.mark.spark
def test_exact_dedup_finds_seeded_copies(spark, docs):
    from tsclust_spark.operators.dedup import distinct_by_text, exact_duplicates

    seeded = docs.unionByName(
        docs.filter(F.col("doc_id") < 3).select(
            (F.col("doc_id") + 9000).alias("doc_id"), "text"
        )
    )
    dups = exact_duplicates(seeded).collect()
    assert sorted(r.dup_id for r in dups) == [9000, 9001, 9002]
    assert all(r.canonical_id == r.dup_id - 9000 for r in dups)
    survivors = distinct_by_text(seeded)
    assert survivors.count() == docs.count()


@pytest.mark.spark
def test_lsh_topk_recall_vs_exact(spark, emb):
    from tsclust_spark.operators.similarity import cosine_topk, lsh_cosine_topk

    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, q, k=5).collect()
    approx = lsh_cosine_topk(emb, q, k=5, n_planes=2).collect()
    exact_set = {(r.query_id, r.cand_id) for r in exact}
    approx_set = {(r.query_id, r.cand_id) for r in approx}
    # 2 planes -> 4 buckets -> recall well above chance; sanity floor
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3
    # every approx hit must carry the exact cosine of that pair
    exact_all = {
        (r.query_id, r.cand_id): r.cosine
        for r in cosine_topk(emb, q, k=10**6).collect()
    }
    for r in approx:
        if (r.query_id, r.cand_id) in exact_all:
            assert abs(exact_all[(r.query_id, r.cand_id)] - r.cosine) < 1e-9


@pytest.mark.spark
def test_simhash_identical_docs_zero_distance(spark, docs):
    from tsclust_spark.operators.dedup import simhash

    seeded = docs.limit(5).unionByName(
        docs.limit(5).select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    )
    sigs = {r.doc_id: r.simhash for r in simhash(seeded).collect()}
    for i in range(5):
        if i in sigs and i + 9000 in sigs:
            assert sigs[i] == sigs[i + 9000]


@pytest.mark.spark
def test_token_count_simple(spark):
    from tsclust_spark.operators.textstats import token_count

    df = spark.createDataFrame(
        [(1, "hello world abcdefgh"), (2, "a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in token_count(df).collect()}
    assert rows[1].ws_tokens == 3
    # ceil(5/4)+ceil(5/4)+ceil(8/4) = 2+2+2
    assert rows[1].bpe_est_tokens == 6
    assert rows[2].ws_tokens == 1 and rows[2].bpe_est_tokens == 1


@pytest.mark.spark
def test_ivf_recall_and_exactness(spark, emb):
    from tsclust_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk

    centroids, assignments = ivf_build(emb, n_lists=4, lloyd_iters=1)
    assert centroids.count() == 4
    assert assignments.count() == emb.count()

    q = emb.filter(F.col("vec_id") < 10)
    approx = ivf_topk(centroids, assignments, q, k=5, nprobe=2).collect()
    exact = cosine_topk(emb, q, k=5).collect()
    exact_set = {(r.query_id, r.cand_id) for r in exact}
    approx_set = {(str(r.query_id), str(r.cand_id)) for r in approx} | {
        (r.query_id, r.cand_id) for r in approx
    }
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3
    # nprobe = n_lists ==> exact equality of the neighbor sets
    full = ivf_topk(centroids, assignments, q, k=5, nprobe=4).collect()
    full_set = {(r.query_id, r.cand_id) for r in full}
    assert full_set == exact_set


@pytest.mark.spark
def test_ivf_build_seed_plan_no_global_window(spark, emb):
    """Seed selection must plan TakeOrderedAndProject (per-partition
    top-N), never a global row_number window that funnels every vector
    through one partition (the round-1 scale-killer)."""
    from tsclust_spark.operators.similarity import ivf_build

    centroids, _ = ivf_build(emb, n_lists=4, lloyd_iters=0)
    plan = centroids._sc._jvm.PythonSQLUtils.explainString(
        centroids._jdf.queryExecution(), "extended"
    )
    assert "TakeOrderedAndProject" in plan
    # the only Window left runs over the n_lists seed rows, AFTER the
    # limit — i.e. downstream of TakeOrderedAndProject in the plan text
    phys = plan[plan.index("== Physical Plan =="):]
    assert phys.index("Window") < phys.index("TakeOrderedAndProject")


@pytest.mark.spark
def test_ivf_assignment_map_only_no_exchange(spark, emb):
    """Lloyd/probe assignment must be row-local: fold over ONE broadcast
    centroid row, no Exchange of |vectors| x n_lists scored rows (the
    round-2 scale nit)."""
    from tsclust_spark.operators.similarity import _nearest_centroid, ivf_build

    centroids, _ = ivf_build(emb, n_lists=4, lloyd_iters=0)
    base = emb.select("vec_id", "embedding")
    assigned = _nearest_centroid(base, centroids, "embedding", "vec_id")
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # the vector side reaches the join with zero shuffles; the only
    # Exchanges allowed are on the tiny centroid/seed side (upstream of
    # the 1-row broadcast aggregate). Plan print order: nodes above the
    # join, then the streamed (vector) child, then BroadcastExchange +
    # the centroid side — so everything before BroadcastExchange must be
    # Exchange- and Window-free.
    streamed = plan.split("BroadcastExchange")[0]
    assert "BroadcastNestedLoopJoin" in streamed  # sanity: split kept the join
    assert "Exchange" not in streamed
    assert "Window" not in streamed
