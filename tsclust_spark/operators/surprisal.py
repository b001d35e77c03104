"""Unigram surprisal scoring: corpus-LM perplexity proxy per document.

The quality signal big-corpus curation pipelines use between cheap
heuristics (Gopher rules, operators/gopher.py) and a real LM: score
each document by the mean negative log-probability of its tokens
under the corpus' own unigram distribution. Gibberish and
wrong-language documents sit in the high-surprisal tail; boilerplate
sits in the low tail — both are standard filter targets.

    p(w)       = count(w) / total_tokens          (corpus unigram MLE)
    surprisal  = -(1/n) * sum_i ln p(w_i)         (per document)

Plan shape (all vocabulary-bounded past the scan):
- tokenization is the shared ``textstats._words`` split, map-only;
- the unigram table aggregates the exploded corpus MAP-SIDE first, so
  the Exchange carries distinct-token partials (vocabulary-sized);
- token instances join the unigram table on the token hash — linear
  shuffle, AQE-broadcast at small vocabularies;
- the per-doc mean is one more hash aggregate on doc_id.

Empty / whitespace-only documents have no tokens and emit no row
(consistent on both engines — the fuzz fixture gates this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def bigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean conditional bigram surprisal.

        p(w_i | w_{i-1}) = c(w_{i-1} w_i) / c_head(w_{i-1})
        surprisal        = -(1/(n-1)) * sum_{i>=2} ln p(w_i | w_{i-1})

    ``c_head`` counts occurrences of a token as the FIRST element of a
    bigram (not raw token frequency), so the conditional distribution
    sums to exactly 1 per context and every probability is <= 1.  The
    LM is trained on the scored corpus itself, so every observed bigram
    has count >= 1 — no smoothing needed for self-scoring.

    Plan shape: bigrams are built map-side (transform/sequence/slice,
    zero Python); the bigram table aggregates map-side partials; the
    head-context table is a second vocabulary-sized aggregate of the
    bigram table (NOT a rescan of the corpus); instance scoring is one
    linear join on md5(bigram) plus a broadcast-sized join on the head
    token.  Documents with fewer than 2 tokens emit no row.

    Output: ``(id, n_bigrams, surprisal)`` in nats.
    """
    w = F.filter(_words(F.col(text_col)), lambda t: F.length(t) > 0)
    n_starts = F.size(w) - F.lit(1)
    grams = F.when(
        n_starts >= 1,
        F.transform(
            F.sequence(F.lit(1), n_starts),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    toks = df.select(F.col(id_col), F.explode(grams).alias("bigram"))
    bf = toks.groupBy("bigram").agg(F.count(F.lit(1)).alias("bg_cnt"))
    hf = (
        bf.withColumn("head", F.split("bigram", " ")[0])
        .groupBy("head")
        .agg(F.sum("bg_cnt").alias("head_cnt"))
    )
    scored = (
        toks.join(bf, "bigram")
        .withColumn("head", F.split("bigram", " ")[0])
        .join(hf, "head")
        .select(
            id_col,
            F.log(
                F.col("bg_cnt").cast("double") / F.col("head_cnt").cast("double")
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("_lp")).alias("surprisal"),
    )


def unigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram surprisal.

    Output: ``(id, n_tokens, surprisal)`` — surprisal in nats; higher
    = less like the corpus.
    """
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    toks = df.select(F.col(id_col), words.alias("_w")).select(
        F.col(id_col), F.explode("_w").alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt")).first()[0]  # scalar, metadata-scale
    scored = toks.join(freq, "token").select(
        id_col,
        # ln(cnt/total) with the division spelled out — the same
        # expression the SQL twin runs, 1-ulp-stable under round-6
        F.log(F.col("cnt").cast("double") / F.lit(float(total))).alias("_lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("_lp")).alias("surprisal"),
    )
