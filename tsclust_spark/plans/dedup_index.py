"""Incremental near-duplicate index: dedup NEW documents against an
ever-growing corpus without re-shingling the corpus.

Batch near-dup (operators/dedup.py) answers "which pairs in THIS set
are near-dups"; a training-corpus pipeline needs the incremental
question — "is this new crawl batch a near-dup of ANYTHING we already
kept?" — answered per ingest without touching the kept corpus' text.
The standard answer is a persisted MinHash index:

- ``signatures/``  (doc_id, seed, minhash)   — num_hashes rows per doc
- ``bands/``       (band, bucket, doc_id)    — partitioned by band

``ingest`` shingles ONLY the new batch, probes its band buckets against
the index (plus itself, for within-batch dups), estimates Jaccard as
the fraction of agreeing minhash components (the textbook unbiased
MinHash estimator — the kept corpus' shingles are never stored, which
is what makes the index ~1e2 bytes/doc instead of the corpus itself),
keeps earliest-id-wins survivors, and appends ONLY the kept docs'
signatures and bands back to the index.

Scale shape: every join is keyed on (band, bucket) or (pair, seed) —
linear in candidate volume, never all-pairs; the index side of the
bucket probe is partition-pruned to the bands directory (on Iceberg the
same layout is `bucket(band, N)` + MERGE append).  The decision
(earliest-id-wins inside a batch) is deterministic under any
partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsclust_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)

SIG_DIR = "signatures"
BAND_DIR = "bands"


def _banded(signatures: DataFrame, rows_per_band: int) -> DataFrame:
    """(doc_id, band, bucket) — one bucket hash per band per doc."""
    return (
        signatures.withColumn(
            "band", (F.col("seed") / rows_per_band).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws("|", F.sort_array(F.collect_list("minhash")))
            ).alias("bucket")
        )
    )


def build_index(
    docs: DataFrame,
    index_dir: str,
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
) -> dict:
    """Create the index from an initial (already deduplicated) corpus."""
    sigs = minhash_signatures(shingles(docs, k=k), num_hashes=num_hashes)
    bands = _banded(sigs, rows_per_band)
    sigs.write.mode("overwrite").parquet(os.path.join(index_dir, SIG_DIR))
    bands.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(index_dir, BAND_DIR)
    )
    return {"docs_indexed": docs.count()}


def ingest(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Dedup ``new_docs`` against the index AND within the batch; append
    the survivors' signatures/bands to the index.

    Returns the decision table: ``(doc_id, kept boolean, matched_id)``
    — ``matched_id`` is the smallest indexed-or-earlier doc whose
    estimated Jaccard cleared ``threshold`` (NULL when kept).  Within a
    batch the policy is greedy earliest-id-wins, so ``matched_id`` may
    itself be a dropped within-batch doc (the chain still ends at a
    kept representative); resolve chains with
    ``operators.dedup.connected_components`` when group ids matter.
    """
    sig_path = os.path.join(index_dir, SIG_DIR)
    band_path = os.path.join(index_dir, BAND_DIR)
    old_sigs = spark.read.parquet(sig_path)
    old_bands = spark.read.parquet(band_path)

    new_sigs = minhash_signatures(
        shingles(new_docs, k=k), num_hashes=num_hashes
    ).localCheckpoint(eager=True)  # reused 4x below; re-shingling is the
    # expensive stage, and lineage re-execution would also race the
    # index append at the end
    new_bands = _banded(new_sigs, rows_per_band).localCheckpoint(eager=True)

    # candidates vs the INDEX: probe bucket equality per band
    vs_index = (
        new_bands.join(
            old_bands.select(
                "band", "bucket", F.col("doc_id").alias("matched_id")
            ),
            ["band", "bucket"],
        )
        .select("doc_id", "matched_id")
        .distinct()
    )
    # candidates WITHIN the batch: earliest id is the survivor
    within = lsh_candidate_pairs(new_sigs, rows_per_band=rows_per_band).select(
        F.col("id_b").alias("doc_id"), F.col("id_a").alias("matched_id")
    )
    cands = vs_index.unionByName(within)

    # estimated Jaccard = fraction of agreeing minhash components
    sa = new_sigs.select("doc_id", "seed", F.col("minhash").alias("mh_a"))
    sb = old_sigs.unionByName(new_sigs).select(
        F.col("doc_id").alias("matched_id"), "seed", F.col("minhash").alias("mh_b")
    )
    est = (
        cands.join(sa, "doc_id")
        .join(sb, ["matched_id", "seed"])
        .groupBy("doc_id", "matched_id")
        .agg(
            (
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
                / F.count(F.lit(1))
            ).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    best = Window.partitionBy("doc_id").orderBy("matched_id")
    dups = (
        est.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "matched_id")
    )
    decisions = (
        new_docs.select("doc_id")
        .join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.col("matched_id").isNull().alias("kept"),
            "matched_id",
        )
        .localCheckpoint(eager=True)  # decide BEFORE mutating the index
    )

    kept = decisions.filter("kept").select("doc_id")
    new_sigs.join(kept, "doc_id", "left_semi").write.mode("append").parquet(
        sig_path
    )
    new_bands.join(kept, "doc_id", "left_semi").write.mode("append").partitionBy(
        "band"
    ).parquet(band_path)
    return decisions
