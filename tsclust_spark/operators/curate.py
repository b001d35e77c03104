"""End-to-end document curation: keep/drop with a reason, one pass.

The decision every training-data pipeline ends with: combine exact-dup
status, language ID, token-count bounds, and the composite quality
score into a per-document verdict. Rules are evaluated in a fixed
order and the FIRST failing rule names the drop reason, so the output
doubles as a per-stage attrition report (`groupBy(reason).count()`).

Scale notes (100 TB): all feature expressions are map-only and fused
into a single select over the scan (no joins between feature
operators — joining `quality_score(df)` to `language_id(df)` would
shuffle the corpus once per feature). The only shuffle is the
exact-dup check, a window over md5(text) — the same hash-groupBy shape
as `dedup.exact_duplicates`, linear in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curate_documents(
    df: DataFrame,
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Output: ``(doc_id, keep, reason, ws_tokens, lang_pred, quality)``.

    Reasons, in evaluation order: ``dup`` (a byte-identical copy of an
    earlier doc — min id per md5 group survives), ``lang``,
    ``too_short``, ``too_long``, ``low_quality``; kept rows carry
    ``reason = 'kept'``.
    """
    from tsclust_spark.operators.textstats import (
        language_pred_expr,
        quality_expr,
        ws_token_count_expr,
    )

    text = F.col(text_col)
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(text).alias("_md5"),
        ws_token_count_expr(text).alias("ws_tokens"),
        language_pred_expr(text).alias("lang_pred"),
        quality_expr(text).alias("quality"),
    )
    w = Window.partitionBy("_md5")
    feats = feats.withColumn("_canon", F.min("doc_id").over(w))
    reason = (
        F.when(F.col("doc_id") != F.col("_canon"), F.lit("dup"))
        .when(F.col("lang_pred") != F.lit(lang), F.lit("lang"))
        .when(F.col("ws_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("ws_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return feats.select(
        "doc_id",
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
        "ws_tokens",
        "lang_pred",
        "quality",
    )
