"""Incremental MinHash dedup index: build, ingest, grow, re-ingest."""

import pytest
from pyspark.sql import functions as F

BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different content about spark engines and token streams"),
    (3, "a third unrelated document mentioning tokens clusters and tiers"),
]
# 101: near-dup of doc 1 (one word changed); 102: fresh; 103: exact dup
# of 102 within the same batch; 104: fresh
BATCH1 = [
    (101, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (102, "brand new crawl content that matches nothing in the kept corpus"),
    (103, "brand new crawl content that matches nothing in the kept corpus"),
    (104, "yet another genuinely novel document with its own vocabulary"),
]
# 201: near-dup of the KEPT 102 from batch 1 (tests index growth);
# 202: near-dup of the DROPPED 103 (must still be caught, via 102)
BATCH2 = [
    (201, "brand new crawl content that matches nothing in the kept corpus"),
    (202, "brand new crawl content that matches nothing in the kept corpus today"),
]

SCHEMA = "doc_id long, text string"


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "ddidx")


def test_build_ingest_and_grow(spark, index_dir):
    from tsclust_spark.plans.dedup_index import build_index, ingest

    stats = build_index(spark.createDataFrame(BASE, SCHEMA), index_dir)
    assert stats["docs_indexed"] == 3

    d1 = {
        r["doc_id"]: r.asDict()
        for r in ingest(
            spark, spark.createDataFrame(BATCH1, SCHEMA), index_dir,
            threshold=0.5,
        ).collect()
    }
    assert not d1[101]["kept"] and d1[101]["matched_id"] == 1
    assert d1[102]["kept"]
    assert not d1[103]["kept"] and d1[103]["matched_id"] == 102
    assert d1[104]["kept"]

    # index grew by exactly the kept docs
    import os
    sig = spark.read.parquet(os.path.join(index_dir, "signatures"))
    indexed = {r["doc_id"] for r in sig.select("doc_id").distinct().collect()}
    assert indexed == {1, 2, 3, 102, 104}

    d2 = {
        r["doc_id"]: r.asDict()
        for r in ingest(
            spark, spark.createDataFrame(BATCH2, SCHEMA), index_dir,
            threshold=0.5,
        ).collect()
    }
    assert not d2[201]["kept"] and d2[201]["matched_id"] == 102
    assert not d2[202]["kept"] and d2[202]["matched_id"] == 102
    indexed2 = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(index_dir, "signatures"))
        .select("doc_id").distinct().collect()
    }
    assert indexed2 == indexed  # nothing kept, nothing appended


def test_incremental_matches_batch_operator(spark, index_dir):
    """The pairs the incremental path flags are the ones the batch
    operator finds on the union corpus (for pairs touching the batch)."""
    import os
    from tsclust_spark.operators.dedup import minhash_near_duplicates
    from tsclust_spark.plans.dedup_index import build_index, ingest

    build_index(spark.createDataFrame(BASE, SCHEMA), index_dir)
    dec = ingest(
        spark, spark.createDataFrame(BATCH1, SCHEMA), index_dir,
        threshold=0.5,
    )
    dropped = {
        (r["matched_id"], r["doc_id"])
        for r in dec.filter(~F.col("kept")).collect()
    }
    full = spark.createDataFrame(BASE + BATCH1, SCHEMA)
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(full, threshold=0.5).collect()
        if r["id_b"] > 100  # pairs whose later doc is in the batch
    }
    # every incremental drop corresponds to a batch-detected pair
    assert dropped <= batch_pairs
    # and the batch's flagged new docs are exactly the dropped ones
    assert {b for _, b in dropped} == {b for _, b in batch_pairs}
