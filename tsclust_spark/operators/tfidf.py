"""TF-IDF keyword extraction: top-k characteristic terms per document.

Plan shape (all linear, vocabulary-bounded where possible):
- tokenization is the shared ``textstats._words`` split, map-only;
- document frequencies aggregate the EXPLODED corpus map-side first,
  so the Exchange carries distinct (token) partials — vocabulary-sized,
  never the exploded token stream;
- the tf table joins df counts on the token hash (linear shuffle; at a
  small vocabulary Spark's AQE converts it to a broadcast join);
- the per-doc top-k is a bounded row_number window.

Ranking determinism: the score is quantized (engine-wide
floor-rounding) BEFORE ranking and ties break on the token string, so
two engines whose ``ln`` differs in the last ulp still rank
identically.

The corpus size N is a driver-side scalar (`df.count()`), the one
action — a metadata-scale number, same pattern as the manifest counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantize_digits: int = 6,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF:
    ``tf/len * (ln((N+1)/(df+1)) + 1)``.

    Output: ``(id, token, tf bigint, df bigint, tfidf double, rank)``
    with tfidf quantized to ``quantize_digits``.
    """
    n_docs = df.count()
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    toks = (
        df.select(F.col(id_col), words.alias("_w"))
        .withColumn("_len", F.size("_w"))
        .select(F.col(id_col), F.col("_len"), F.explode("_w").alias("token"))
    )
    tf = toks.groupBy(id_col, "_len", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # document frequency as a window count over the token partition:
    # tf is unique per (doc, token), so count-per-token IS df. A
    # groupBy+join would re-aggregate the tf subplan from the scan
    # (Spark computes a twice-referenced DataFrame twice) and shuffle a
    # second time; the window reuses the single tf table with one
    # Exchange on the token.
    dfw = Window.partitionBy("token")
    s = float(10**quantize_digits)
    raw = (
        F.col("tf").cast("double") / F.col("_len")
        * (
            F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0)))
            + F.lit(1.0)
        )
    )
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(dfw)
    ).withColumn("tfidf", F.floor(raw * s + F.lit(0.5)) / F.lit(s))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "tfidf", "rank")
    )
