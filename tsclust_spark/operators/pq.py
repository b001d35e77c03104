"""Product quantization (PQ) for embedding compression + ADC search.

Jégou, Douze & Schmid, "Product quantization for nearest neighbor
search" (IEEE TPAMI 33(1), 2011 — public literature): split each
d-dim vector into ``m`` subvectors, vector-quantize each subspace
with its own ``ksub``-entry codebook, and store each vector as ``m``
small integer codes (m bytes for ksub<=256 vs 4d bytes of floats —
32x at d=64, m=8).  Query-time asymmetric distance computation (ADC)
precomputes, per query, an (m x ksub) table of subspace distances;
each database vector's L2 distance is then ``m`` table lookups + adds
instead of ``d`` multiplies — the candidate-stage workhorse of every
large ANN system, one level beyond this repo's int8 scalar
quantization (4x) on the compression axis.

Spark-first shapes (zero Python, no UDFs anywhere):

- **train** (:func:`pq_train`): deterministic seeds (the ksub
  lowest-id vectors' subvectors per subspace — the IVF discipline),
  refined by Lloyd iterations where BOTH steps are DataFrame ops:
  assignment is a row-local argmin fold over the broadcast codebook
  (m-row broadcast hash join on sub_idx, no per-iteration shuffle of
  scored pairs), mean recomputation is posexplode + groupBy.
- **encode** (:func:`pq_encode`): same row-local argmin, then one
  groupBy(id) to re-nest the m codes — codes are exact integers, so
  the encoding is engine- and partitioning-invariant given the
  codebook.
- **search** (:func:`pq_adc_topk`): per-query distance table built
  against the broadcast codebook (m x ksub doubles — metadata scale),
  then one broadcast join of the tables onto the codes and an
  ``F.transform(codes, (c, i) -> dtab[i][c])`` fold in codegen.  The
  scan is linear in the database like every ADC candidate stage; the
  win is bytes-per-candidate (codes, not vectors) and adds-per-
  candidate (m, not d).  Compose with IVF lists to cut the scan
  factor as well — the standard IVFPQ layering.

Determinism: subspace assignment breaks ties to the lowest code id
(strictly-greater fold, IVF discipline); distances are float but the
CODES are integers, so any last-ulp distance ambiguity would have to
land exactly on a tie to matter, and ties are broken by integer id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _l2sq(a, b):
    """Squared L2 between two equal-length double arrays, as one fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(base: DataFrame, m: int, subdim: int) -> DataFrame:
    """(vec_id, sub_idx, subvec) — m rows per vector, sliced row-side."""
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(F.col("vec"), s * subdim + 1, subdim),
    )
    return base.select(
        "vec_id", F.posexplode(subs).alias("sub_idx", "subvec")
    )


def _grouped_codebook(codebooks: DataFrame) -> DataFrame:
    """m rows: (sub_idx, carr) with carr the code-id-sorted entries."""
    return codebooks.groupBy("sub_idx").agg(
        F.sort_array(
            F.collect_list(F.struct("code_id", "cvec"))
        ).alias("carr")
    )


def _assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Row-local argmin-L2 code per (vec_id, sub_idx): broadcast the
    m-row grouped codebook, fold over its entries — no scored-pair
    shuffle, ties to the lowest code_id (the fold keeps the incumbent
    on equality and carr is id-ascending)."""
    scored = F.transform(
        F.col("carr"),
        lambda c: F.struct(
            _l2sq(F.col("subvec"), c["cvec"]).alias("d"),
            c["code_id"].alias("code_id"),
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(None).cast("double").alias("d"),
            F.lit(-1).alias("code_id"),
        ),
        lambda acc, s: F.when(acc["code_id"] < 0, s)
        .when(s["d"] < acc["d"], s)
        .otherwise(acc),
    )
    return (
        subs.join(F.broadcast(cents), "sub_idx")
        .withColumn("_best", best)
        .select(
            "vec_id",
            "sub_idx",
            "subvec",
            F.col("_best")["code_id"].alias("code_id"),
        )
    )


def _prep(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("vec"),
    )


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks: ``(sub_idx, code_id, cvec)``,
    ksub rows per subspace.  ``dim`` must be divisible by ``m``.

    Seeds are the ksub lowest-id vectors' subvectors (deterministic,
    partitioning-invariant); ``lloyd_iters`` k-means steps refine
    them.  An emptied cluster keeps its previous centroid (no
    re-seeding heuristics — determinism over marginal quality).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    subdim = dim // m
    base = _prep(df, id_col, vec_col)
    subs = _subvectors(base, m, subdim)

    seeds = (
        _subvectors(base.orderBy("vec_id").limit(ksub), m, subdim)
        .withColumn(
            "code_id",
            F.row_number().over(
                Window.partitionBy("sub_idx").orderBy("vec_id")
            )
            - 1,
        )
        .select("sub_idx", "code_id", F.col("subvec").alias("cvec"))
    )
    codebooks = seeds
    for _ in range(lloyd_iters):
        assigned = _assign(subs, _grouped_codebook(codebooks))
        means = (
            assigned.select(
                "sub_idx",
                "code_id",
                F.posexplode("subvec").alias("pos", "comp"),
            )
            .groupBy("sub_idx", "code_id", "pos")
            .agg(F.avg("comp").alias("mc"))
            .groupBy("sub_idx", "code_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mc"))),
                    lambda s: s["mc"],
                ).alias("cvec")
            )
        )
        # empty clusters fall out of `means`; keep their old centroid
        codebooks = (
            codebooks.select("sub_idx", "code_id", F.col("cvec").alias("_old"))
            .join(means, ["sub_idx", "code_id"], "left")
            .select(
                "sub_idx",
                "code_id",
                F.coalesce("cvec", "_old").alias("cvec"),
            )
        )
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes: array<int>)`` — m codes per vector, ordered
    by subspace."""
    subdim = dim // m
    assigned = _assign(
        _subvectors(_prep(df, id_col, vec_col), m, subdim),
        _grouped_codebook(codebooks),
    )
    return assigned.groupBy("vec_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("sub_idx", "code_id"))),
            lambda s: s["code_id"],
        ).alias("codes")
    )


def pq_adc_topk(
    codebooks: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: ``(query_id, cand_id, adc_dist,
    rank)`` — smallest approximate squared-L2 first, self excluded,
    ties to the lowest cand_id.

    The per-query (m x ksub) distance table is computed once against
    the broadcast codebook and carried as an array column; each
    candidate costs m integer lookups + adds in codegen.
    """
    subdim = dim // m
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qvec"),
    )
    # one row per query: dtab[sub][code] = ||qsub - cvec||^2
    cents_row = _grouped_codebook(codebooks).agg(
        F.sort_array(F.collect_list(F.struct("sub_idx", "carr"))).alias(
            "_cb"
        )
    )
    dtab = F.transform(
        F.col("_cb"),
        lambda sub: F.transform(
            sub["carr"],
            lambda c: _l2sq(
                F.slice(F.col("qvec"), sub["sub_idx"] * subdim + 1, subdim),
                c["cvec"],
            ),
        ),
    )
    qt = (
        q.join(F.broadcast(cents_row))  # 1-row dim
        .withColumn("dtab", dtab)
        .select("query_id", "dtab")
    )
    scored = (
        codes.join(F.broadcast(qt))  # broadcast the query tables
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "adc_dist",
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.get(F.get(F.col("dtab"), i), c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), "adc_dist", "rank"
        )
    )
