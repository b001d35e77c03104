"""Deterministic sampling for training-data pipelines.

Every sample here is a pure function of (seed, row id) — re-running the
pipeline, on any cluster size or partitioning, selects byte-identical
rows. That property is what makes a 100-TB sample auditable and
resumable; ``df.sample()`` (partition-seeded RNG) does not have it.
The selector is a lexicographic comparison on an md5 prefix, a
primitive both Spark and DuckDB evaluate identically, so every operator
has an oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(id_col: str, seed: str):
    """Deterministic per-row draw: md5(seed | id), lowercase hex."""
    return F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))


def threshold_hex(fraction: float) -> str:
    """8-hex-digit threshold such that P(md5_prefix < threshold) == fraction
    (to within 2^-32). Comparing hex strings lexicographically equals
    comparing their integer values — both engines agree byte-for-byte."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(fraction * float(2**32))
    if v >= 2**32:
        # 9 hex digits would sort BEFORE "ffffffff" lexicographically;
        # 'g' > 'f' keeps the 8-char compare and admits every key
        return "g0000000"
    return format(v, "08x")


def sample_fraction_by_hash(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "tsclust",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash — deterministic
    Bernoulli sampling.

    Scale notes (100 TB): map-only — a scan plus one filter expression,
    no shuffle, no RNG state, no driver involvement. Different seeds
    give independent samples (disjoint-ish subsets for train/valid
    splits); the same seed is reproducible across runs, cluster sizes,
    and engines.
    """
    key = F.substring(_hash_key(id_col, seed), 1, 8)
    return df.filter(key < F.lit(threshold_hex(fraction)))


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "tsclust-split",
) -> DataFrame:
    """Disjoint, exhaustive train/valid/test split: adds a ``split``
    column assigning each row to exactly one named bucket with the given
    weights (must sum to 1). Same determinism contract as
    ``sample_fraction_by_hash``; map-only.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = F.substring(_hash_key(id_col, seed), 1, 8)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = key < F.lit(threshold_hex(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def cap_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "tsclust-cap",
) -> DataFrame:
    """At most ``n`` rows per group, chosen deterministically (the n
    smallest hash draws): source-balancing a skewed corpus.

    Output: the input columns plus ``sample_rank`` (1..n within the
    group). Ties are impossible — ``id_col`` is part of the ordering.

    Scale notes (100 TB): one shuffle on ``group_col``. A single giant
    group serializes its window into one task; when n/|group| is small,
    pre-filter with ``sample_fraction_by_hash`` at a safe multiple of
    the target fraction first (e.g. 4x n/|group|) so the window only
    ranks a sliver — the exact-n guarantee is preserved because the
    pre-filter keeps a superset of the n smallest draws with
    overwhelming probability, and the rank then trims to exactly n.
    """
    key = F.substring(_hash_key(id_col, seed), 1, 8)
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "tsclust-mix",
) -> DataFrame:
    """Sample ~``total`` rows whose ``group_col`` composition matches a
    target mixture — the domain-reweighting step of a training-data
    pipeline ("40% web, 30% code, ..."). Groups absent from
    ``weights`` are dropped.

    Per-group acceptance rate: ``r_g = min(1, w_g * total / n_g)`` —
    capped at 1, so a group smaller than its target contributes all it
    has (the shortfall is reported honestly rather than silently
    re-normalized; upsampling/repetition is a separate policy
    decision). Acceptance is the same deterministic md5 draw as
    ``sample_fraction_by_hash``: a pure function of (seed, id) given
    the exact group counts, reproducible across engines, cluster
    sizes, and partitionings.

    Scale notes (100 TB): one group-cardinality aggregate (metadata
    scale — groups, not rows, come back to the driver), then a
    broadcast join of per-group thresholds and a map-only filter. The
    sampled output is ~Binomial(n_g, r_g) per group; for exact-count
    targets compose with ``cap_per_group`` downstream.
    """
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total_w}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).count().collect()
    }
    rows = [
        (g, threshold_hex(min(1.0, w * float(total) / float(counts[g]))))
        for g, w in weights.items()
        if counts.get(g)
    ]
    if not rows:
        return df.filter(F.lit(False))
    thr = df.sparkSession.createDataFrame(
        rows, f"{group_col} string, _thr string"
    )
    key = F.substring(_hash_key(id_col, seed), 1, 8)
    return (
        df.join(F.broadcast(thr), group_col, "inner")
        .filter(key < F.col("_thr"))
        .drop("_thr")
    )
