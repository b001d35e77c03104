"""Count-min sketch over token streams: mergeable heavy-hitter counts.

Cormode & Muthukrishnan (J. Algorithms 55(1), 2005 — public
literature): a (d x w) integer array where each of d hash rows
increments one of w buckets per item; a point query reads the MIN of
the d bucket counts — always an OVERestimate, within eps*N with
probability 1-delta for w = e/eps, d = ln(1/delta).  The value at
100 TB is MERGEABILITY: sketches of shards/tiers combine by
element-wise addition (exactly like this repo's histogram tier), so
per-partition/per-day token sketches roll up without ever re-reading
text — the mechanism behind every streaming top-k dashboard.

Everything here is deterministic and engine-portable: the hash is
``conv(substring(md5(row_idx | token), 1, 8), 16, 10) % w`` — the
repo's only sanctioned content hash (README cross-engine rule), so a
DuckDB oracle can rebuild the IDENTICAL sketch and the gate compares
estimates value-for-value, not just error bounds.

Engine shape: explode tokens once, ONE (row_idx, bucket) hash
aggregate of d*w cells (metadata scale — d*w integers regardless of
corpus size), then point queries join the queried tokens against the
cells with a broadcast.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def _bucket(row_idx: int, token_col, w: int):
    """Deterministic bucket of ``token_col`` in hash row ``row_idx``."""
    h = F.md5(F.concat(F.lit(f"{row_idx}|"), token_col))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(w)
    ).cast("int")


def cms_build(
    df: DataFrame,
    d: int = 4,
    w: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: ``(row_idx, bucket, c)`` — d*w cells (absent
    cells are zero).  Merging two sketches = unionByName + groupBy
    sum, the histogram-tier discipline."""
    toks = df.select(
        F.explode(
            F.filter(_words(F.col(text_col)), lambda t: F.length(t) > 0)
        ).alias("token")
    )
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        _bucket(i, F.col("token"), w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_c")
    )
    return (
        cells.groupBy("_c.row_idx", "_c.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("row_idx", "bucket", F.col("c").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    tokens: DataFrame,
    d: int = 4,
    w: int = 64,
    token_col: str = "token",
) -> DataFrame:
    """Point-query the sketch: input tokens get ``cms_count`` — the
    min over the d hash rows' buckets (missing cell = 0, though a
    token actually present in the stream always has all d cells).

    The estimate is >= the true count always, and equals it for
    heavy hitters whose buckets saw no heavier colliders — the
    classic one-sided guarantee, pytest-asserted; the driver gate
    compares the ESTIMATES themselves against an oracle-built twin
    sketch, so the hash placement is verified cell-exact.
    """
    q = tokens.select(F.col(token_col).alias("token")).distinct()
    probes = q.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        _bucket(i, F.col("token"), w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_p"),
    ).select("token", "_p.row_idx", "_p.bucket")
    joined = probes.join(
        F.broadcast(sketch), ["row_idx", "bucket"], "left"
    ).withColumn("c", F.coalesce("c", F.lit(0)))
    return joined.groupBy("token").agg(
        F.min("c").cast("long").alias("cms_count")
    )
