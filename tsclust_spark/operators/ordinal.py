"""Permutation (ordinal-pattern) entropy per series.

Bandt & Pompe's complexity measure (PRL 88:174102, 2002, public
literature): slide an order-3 window over the series, map each window
to the PERMUTATION its values realize (which of the 3! orderings), and
report the Shannon entropy of the pattern distribution, normalized by
``ln 6`` into [0, 1].  Low entropy = the series keeps repeating the
same local shape (monotone ramps, strict periodicity); entropy near 1
= locally patternless (white noise).  It complements every
distribution-level gate in this repo: a sensor that alternates
0,1,0,1 has maximal variance-level health but near-zero permutation
entropy, and a shuffled copy of any series keeps its histogram while
jumping to entropy ~1.

Engine shape: one hash aggregate collapses raw points to the hourly
tier, two ``lag`` windows form (v_{t-2}, v_{t-1}, v_t) triples, a
CASE expression maps each triple to its pattern code via three
comparisons, and one aggregate per (key, pattern) + one per key
computes the entropy.  Entirely Catalyst expressions — zero Python,
two key-partitioned Exchanges, everything whole-stage-codegen; keys
parallelize and nothing is ordered globally.

Only triples over CONSECUTIVE hourly buckets count (both lag deltas
exactly one hour) — a gap breaks the "local shape" relation, the same
guard as :mod:`tsclust_spark.operators.ar1`.

Determinism: ties are broken by time order (the earlier element of an
equal pair ranks smaller — the standard Bandt-Pompe convention), so
the pattern code is pure integer logic with no float ambiguity.  The
code is ``4*[v1<=v2] + 2*[v1<=v3] + [v2<=v3]``: the three pairwise
"earlier-ranks-smaller" bits.  Two of the 8 codes (0b010, 0b101) are
impossible by transitivity, leaving exactly the 3! = 6 patterns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def permutation_entropy(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    min_windows: int = 4,
) -> DataFrame:
    """``(key, n_windows, n_patterns, perm_entropy)`` per key.

    ``perm_entropy`` is normalized to [0, 1] by ``ln 6``;
    ``n_patterns`` counts the distinct ordinal patterns observed.
    Keys with fewer than ``min_windows`` consecutive-hour triples are
    omitted (the plug-in entropy estimate is meaningless below that).
    """
    from tsclust_spark.operators.tiering import value_tier

    tier = value_tier(
        df, "hour", key_col=key_col, ts_col=ts_col, value_col=value_col
    )

    w = Window.partitionBy("key").orderBy("bucket")
    hour = F.unix_timestamp("bucket") / F.lit(3600)
    triples = (
        tier.withColumn("v1", F.lag("v", 2).over(w))
        .withColumn("v2", F.lag("v", 1).over(w))
        .withColumn("h0", hour)
        .withColumn("h1", F.lag(hour, 2).over(w))
        .withColumn("h2", F.lag(hour, 1).over(w))
        .filter(
            F.col("v1").isNotNull()
            & (F.col("h0") - F.col("h2") == 1)
            & (F.col("h2") - F.col("h1") == 1)
        )
    )

    pattern = (
        F.when(F.col("v1") <= F.col("v2"), F.lit(4)).otherwise(F.lit(0))
        + F.when(F.col("v1") <= F.col("v"), F.lit(2)).otherwise(F.lit(0))
        + F.when(F.col("v2") <= F.col("v"), F.lit(1)).otherwise(F.lit(0))
    )

    counts = (
        triples.select("key", pattern.alias("pattern"))
        .groupBy("key", "pattern")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # plug-in entropy: H = ln(n) - sum(c*ln c)/n, normalized by ln 6.
    # The ln(n)-based form needs only per-pattern c and the key total,
    # avoiding a join back for p = c/n.
    agg = counts.groupBy("key").agg(
        F.sum("c").alias("n_windows"),
        F.count(F.lit(1)).alias("n_patterns"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
    )
    h = (
        F.log(F.col("n_windows")) - F.col("clogc") / F.col("n_windows")
    ) / F.lit(math.log(6.0))
    return (
        agg.filter(F.col("n_windows") >= min_windows)
        .select(
            "key",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_patterns").cast("long").alias("n_patterns"),
            h.alias("perm_entropy"),
        )
    )
