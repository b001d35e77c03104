"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k neighbors, the
  correctness baseline. JVM-only arithmetic (``zip_with`` dot product +
  ``aggregate`` norms), broadcast of the query side.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  buckets (sign of deterministic pseudo-random projections), candidate
  generation per bucket, exact re-rank of candidates only.
- :func:`embedding_near_duplicates` — near-dup pairs by cosine >=
  threshold within LSH buckets.

Deterministic everywhere: the "random" hyperplanes come from a seeded
arithmetic hash of (plane, dim), so results are reproducible and
SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast each operand BEFORE multiplying: float32*float32 then cast
    # differs from the oracle's double math by ~1e-8 — enough to flip a
    # rounding boundary
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _cosine(a, b):
    """Cosine similarity; NULL when either norm is zero (cosine is
    undefined for a zero vector, and under ANSI mode the raw division
    raises DIVIDE_BY_ZERO — caught by tools/fuzz_oracle.py's zero-vector
    row). NULL matches the DuckDB oracle exactly: x/0 is NULL there,
    and both engines sort NULLs last under ORDER BY ... DESC."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom)


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    ``queries`` (small) is broadcast against the corpus; per-query
    ranking is a window top-k. Cost: |queries| x |corpus| dot products,
    all inside whole-stage codegen — the right baseline, and the right
    tool when |queries| is small.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = df.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            _cosine(F.col("qvec"), F.col("cvec")),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _hyperplane_component(plane: int, dim_idx, mod: int = 2147483647):
    """Deterministic pseudo-random weight in [-1, 1): explicit integer
    arithmetic -> reproducible in any engine."""
    h = (
        (F.lit(plane) * 2654435761 + (dim_idx + 1) * 40503 + 12345) % mod
    )
    return (h.cast("double") / F.lit(float(mod))) * 2.0 - 1.0


def lsh_bucket(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): bucket = sign bits of n_planes projections."""
    vec = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: (x.cast("double") * _hyperplane_component(p, i)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        bucket.cast("int").alias("bucket"),
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs (cosine >= threshold) via same-bucket candidates +
    exact verify. Linear in bucket sizes; high-cosine pairs land in the
    same bucket with probability (1 - theta/pi)^n_planes."""
    b = lsh_bucket(df, n_planes, id_col, vec_col)
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket"
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _cosine(F.col("va"), F.col("vb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def lsh_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Recall is tunable via n_planes (fewer planes -> bigger buckets ->
    higher recall, more compute). The exact :func:`cosine_topk` is the
    oracle for recall measurement.
    """
    b = lsh_bucket(df, n_planes, id_col, vec_col)
    q = lsh_bucket(queries, n_planes, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        "bucket",
    )
    cand = b.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"), "bucket"
    )
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            _cosine(F.col("qvec"), F.col("cvec")),
        )
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def _nearest_centroid(vec_df, centroids, vec_col: str, id_name: str):
    """Assign each vector to its max-cosine centroid, row-locally.

    Centroids fold into ONE broadcast row (an id-sorted array of n_lists
    structs); the argmax runs inside ``F.aggregate`` on each vector row.
    Zero Exchange — the previous version shuffled |vectors| x n_lists
    scored rows through a window per Lloyd iteration, which at 100 TB is
    the dominant cost of the build. Ties break to the lowest centroid_id
    (strictly-greater fold over the id-ascending array == the old
    ``cscore DESC, centroid_id ASC`` window ordering), and the fold seeds
    from the first element so an all-NULL-score row (zero vector) still
    gets a deterministic assignment.
    """
    cents = centroids.agg(
        F.sort_array(F.collect_list(F.struct("centroid_id", "cvec"))).alias("_cents")
    )
    scored_arr = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            # guarded like _cosine: NULL cscore for a zero-norm vector
            # or centroid (ANSI-safe); the fold below still assigns the
            # first (lowest-id) centroid deterministically
            F.when(
                (F.col("_vnorm") * _norm(c["cvec"])) > 0,
                _dot(F.col(vec_col), c["cvec"])
                / (F.col("_vnorm") * _norm(c["cvec"])),
            ).alias("cscore"),
            c["centroid_id"].alias("centroid_id"),
        ),
    )
    best = F.aggregate(
        scored_arr,
        F.struct(
            F.lit(None).cast("double").alias("cscore"),
            F.lit(-1).alias("centroid_id"),
        ),
        lambda acc, s: F.when(acc["centroid_id"] < 0, s)
        .when(s["cscore"] > acc["cscore"], s)
        .otherwise(acc),
    )
    return (
        vec_df.withColumn("_vnorm", _norm(F.col(vec_col)))
        .join(F.broadcast(cents))  # 1-row dim -> BroadcastNestedLoopJoin
        .withColumn("_best", best)
        .withColumn("cscore", F.col("_best")["cscore"])
        .withColumn("centroid_id", F.col("_best")["centroid_id"])
        .drop("_cents", "_vnorm", "_best")
    )


def ivf_build(
    df: DataFrame,
    n_lists: int = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: (centroids, assignments).

    Deterministic coarse quantizer: seeds = the n_lists lowest-id
    vectors, refined by ``lloyd_iters`` k-means steps (assign via
    broadcast-join argmax, recompute means via posexplode + groupBy —
    all DataFrame ops, no UDFs). Assignments = the inverted lists:
    ``(vec_id, embedding, centroid_id)``.
    """
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("embedding"),
    )
    # seed selection: orderBy + limit plans TakeOrderedAndProject (per-
    # partition top-N, merged on the driver) — no single monster
    # partition, unlike a global row_number window. The row_number below
    # runs over n_lists rows only (tiny by construction).
    seeds = base.orderBy("vec_id").limit(n_lists)
    w0 = Window.orderBy("vec_id")
    centroids = seeds.select(
        (F.row_number().over(w0) - 1).alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    for _ in range(lloyd_iters):
        assigned = _nearest_centroid(base, centroids, "embedding", "vec_id")
        centroids = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "comp")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("comp").alias("mean_comp"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mean_comp"))),
                    lambda s: s["mean_comp"],
                ).alias("cvec")
            )
        )
    assignments = _nearest_centroid(base, centroids, "embedding", "vec_id").select(
        "vec_id", "embedding", "centroid_id"
    )
    return centroids, assignments


def ivf_topk(
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in each query's ``nprobe``
    nearest inverted lists. Compute = |queries| x (nprobe/n_lists) of
    brute force; recall tunable via nprobe (exact when nprobe = n_lists).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qvec"),
    )
    qscored = q.join(F.broadcast(centroids)).withColumn(
        "cscore",
        _cosine(F.col("qvec"), F.col("cvec")),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qvec", "centroid_id")
    )
    cand = probes.join(assignments, "centroid_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.withColumn(
        "cosine",
        _cosine(F.col("qvec"), F.col("embedding")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("cand_id"), "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (embedding compression)
# ---------------------------------------------------------------------------

def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: 4x smaller vectors for
    the ANN candidate stage (rerank on full precision afterwards).

    ``scale = max|v| / 127``; ``q_i = clamp(floor(v_i/scale + 0.5),
    -127, 127)``. floor(x + 0.5) (not banker's round) keeps the result
    bit-identical across engines — same discipline as the oracle
    rounding helpers. All-zero vectors get scale 0 and all-zero codes.

    Scale notes (100 TB): map-only — pure array expressions inside
    whole-stage codegen, no shuffle, no UDF; the int8 codes cut the
    shuffle/cache footprint of every downstream candidate join by ~4x.

    Output: input columns plus ``qvec: array<int>`` (int8-ranged) and
    ``scale: double``.
    """
    amax = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    scale = amax / F.lit(127.0)
    q = F.transform(
        vec_col,
        lambda x: F.when(
            scale > 0,
            F.least(
                F.greatest(
                    F.floor(x.cast("double") / scale + F.lit(0.5)),
                    F.lit(-127),
                ),
                F.lit(127),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return df.withColumn("scale", scale).withColumn("qvec", q)


def dequantize_int8(
    df: DataFrame, qvec_col: str = "qvec", scale_col: str = "scale"
) -> DataFrame:
    """Reconstruct ``array<double>`` from int8 codes; per-component
    error is bounded by scale/2."""
    return df.withColumn(
        "dqvec",
        F.transform(qvec_col, lambda x: x.cast("double") * F.col(scale_col)),
    )
