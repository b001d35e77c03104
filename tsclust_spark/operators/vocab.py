"""Corpus vocabulary statistics: type-token ratio, hapax share, and
pairwise source-vocabulary overlap.

Two corpus-curation questions the per-doc text stats can't answer:

- :func:`ttr_sources` — lexical richness per source: type-token
  ratio (distinct words / running words) and the hapax share
  (fraction of the vocabulary seen exactly once).  Boilerplate-heavy
  or template-generated sources show an anomalously LOW ttr and hapax
  share; OCR-noise sources show anomalously HIGH ones (every
  corruption mints a new "type").  The standard screen before
  weighting sources in a training mixture.

- :func:`vocab_overlap_sources` — Jaccard overlap of the VOCABULARIES
  of every source pair.  Near-1 overlap between two "different"
  sources flags a mirrored crawl that slipped past doc-level dedup
  (the documents differ, the vocabulary doesn't); near-0 overlap
  flags a language/domain split worth routing separately.

Tokenization is the repo-wide convention (textstats.py): lowercase,
trim, split on whitespace runs, drop empties — so these numbers are
directly comparable with the Zipf/TF-IDF/surprisal tables.

Engine shape, ttr: explode tokens, one (source, token) count
aggregate, one per-source aggregate — the classic two-level word
count; everything after the first aggregate is vocabulary-scale.
Engine shape, overlap: the DISTINCT (source, token) set, then pairs
via sorted per-token source lists expanded map-side (i < j slices,
the series_corr_pairs trick) — never a vocab x vocab self-join, and
the pair aggregate's cardinality is #source-pairs.  With k sources a
token shared by all contributes k(k-1)/2 pair rows: cost is bounded
by k, not by corpus size, and k is small by construction (sources
are a curated enum).  Zero Python throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def _token_counts(
    df: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    toks = F.filter(
        _words(F.col(text_col)), lambda t: F.length(t) > 0
    )
    return (
        df.select(
            F.col(source_col).cast("string").alias("source"),
            F.explode(toks).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ttr_sources(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """``(source, n_tokens, n_types, ttr, hapax_share)`` per source.

    ``ttr = n_types / n_tokens`` (NULL-safe: sources whose documents
    are all empty produce no tokens and no row); ``hapax_share`` is
    the fraction of types with count exactly 1.
    """
    freq = _token_counts(df, source_col, text_col)
    agg = freq.groupBy("source").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        (F.col("n_types") / F.col("n_tokens")).alias("ttr"),
        (F.col("n_hapax") / F.col("n_types")).alias("hapax_share"),
    )


def vocab_overlap_sources(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """``(source_a, source_b, n_types_a, n_types_b, n_shared,
    jaccard)`` for every source pair sharing at least one type,
    with ``source_a < source_b``.

    ``jaccard = n_shared / (n_types_a + n_types_b - n_shared)`` —
    exact integers except the final ratio.
    """
    vocab = _token_counts(df, source_col, text_col).select(
        "source", "token"
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types")
    )

    # per-token sorted source list, expanded to i<j pairs map-side —
    # the self-join alternative would rescan and re-aggregate the
    # vocab subplan (Spark does not dedupe a DataFrame reused twice
    # in one plan)
    per_tok = vocab.groupBy("token").agg(
        F.array_sort(F.collect_list("source")).alias("_srcs")
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("_srcs"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_srcs"),
                    i + F.lit(2),
                    F.greatest(F.size("_srcs") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    shared = (
        per_tok.select(F.explode(pair_expr).alias("_p"))
        .groupBy("_p.source_a", "_p.source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"),
        F.col("n_types").alias("n_types_a"),
    )
    sb = sizes.select(
        F.col("source").alias("source_b"),
        F.col("n_types").alias("n_types_b"),
    )
    out = (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
    )
    union = (
        F.col("n_types_a") + F.col("n_types_b") - F.col("n_shared")
    )
    return out.select(
        "source_a",
        "source_b",
        F.col("n_types_a").cast("long").alias("n_types_a"),
        F.col("n_types_b").cast("long").alias("n_types_b"),
        F.col("n_shared").cast("long").alias("n_shared"),
        (F.col("n_shared") / union).alias("jaccard"),
    )
