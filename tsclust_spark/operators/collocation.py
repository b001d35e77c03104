"""PMI collocation extraction: adjacent-token pairs that co-occur far
more than chance — the classic signal for multi-word expressions when
building tokenizer vocabularies and phrase tables.

    PMI(a, b) = ln( p(ab) / (p(a) * p(b)) )

with p(ab) = count(ab) / N_bigrams over ADJACENT pairs and p(a), p(b)
unigram MLEs over the token stream.  A ``min_count`` floor on the
bigram keeps the scores out of the hapax-legomena noise floor (PMI is
maximized by pairs seen exactly once).

Plan shape: both frequency tables aggregate map-side partials over the
exploded corpus (vocabulary-sized Exchanges); the bigram table joins
its two unigram lookups on the head/tail token — broadcast at small
vocabularies, linear hash joins otherwise.  Nothing past the scan
scales with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation table.

    Output: ``(head, tail, pair_cnt, pmi)`` for every adjacent pair
    with ``pair_cnt >= min_count``; pmi in nats.
    """
    w = F.filter(_words(F.col(text_col)), lambda t: F.length(t) > 0)
    toks = df.select(w.alias("_w"))
    uni = (
        toks.select(F.explode("_w").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_starts = F.size(F.col("_w")) - F.lit(1)
    pairs = toks.select(
        F.explode(
            F.when(
                n_starts >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_starts),
                    lambda i: F.struct(
                        F.element_at("_w", i).alias("head"),
                        F.element_at("_w", i + 1).alias("tail"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<head:string,tail:string>>"))
        ).alias("p")
    ).select("p.head", "p.tail")
    bf = (
        pairs.groupBy("head", "tail")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_count)
    )
    # scalar totals (metadata-scale aggregates, not data collects)
    n_tok = uni.agg(F.sum("cnt")).first()[0]
    n_big = pairs.count()
    ua = uni.select(F.col("token").alias("head"), F.col("cnt").alias("head_cnt"))
    ub = uni.select(F.col("token").alias("tail"), F.col("cnt").alias("tail_cnt"))
    n_tok_d = F.lit(float(n_tok))
    pmi = F.log(
        (F.col("pair_cnt").cast("double") / F.lit(float(n_big)))
        / (
            (F.col("head_cnt").cast("double") / n_tok_d)
            * (F.col("tail_cnt").cast("double") / n_tok_d)
        )
    )
    return (
        bf.join(ua, "head")
        .join(ub, "tail")
        .select("head", "tail", "pair_cnt", pmi.alias("pmi"))
    )
