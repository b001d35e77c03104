"""Train/eval n-gram decontamination: flag training documents that
share any word n-gram with an evaluation/benchmark set.

The standard pre-training hygiene step (published recipe: GPT-3
appendix C used 13-grams, PaLM and Llama used 8-grams): a training
document that contains any n-gram from a held-out benchmark leaks the
benchmark into the training set and inflates downstream eval numbers.
At corpus scale this must be a *join on n-gram identity*, never a
pairwise document comparison.

Plan shape (the map-reduce decontamination recipe):
- n-grams are built MAP-SIDE with higher-order functions over the
  shared ``textstats._words`` split — ``transform(sequence(...))`` +
  ``slice`` + ``concat_ws``, zero Python, zero shuffle;
- each side deduplicates its n-grams per document (``array_distinct``)
  before exploding, so the join probe carries distinct (doc, gram)
  pairs only;
- the join key is ``md5(ngram)`` — fixed 32-char key, so the Exchange
  width is independent of n-gram length (an 8-gram of long tokens can
  be hundreds of bytes); 128-bit collisions are ignorable at any
  corpus size;
- the eval side is globally distinct and typically small (benchmarks
  are ~1e5 grams) → AQE broadcasts it; at adversarial eval sizes it
  degrades to a plain shuffle join on the hash, still linear;
- per-doc totals are two hash aggregates; documents shorter than n
  tokens re-enter via a left join with ``n_ngrams = 0`` so the output
  has exactly one row per training document.

At 10^12-document scale the same shape runs unchanged: the n-gram
explode is bounded by corpus token count, and nothing ever holds more
than one document's grams in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsclust_spark.operators.textstats import _words


def doc_ngrams(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct_within_doc: bool = True,
) -> DataFrame:
    """Explode each document into its word ``n``-grams (space-joined).

    Map-only: tokenization, windowing and joining are all JVM
    higher-order functions.  Documents with fewer than ``n`` tokens
    produce no rows (explode drops the empty array).
    """
    w = F.filter(_words(F.col(text_col)), lambda t: F.length(t) > 0)
    n_starts = F.size(w) - F.lit(n - 1)
    grams = F.when(
        n_starts >= 1,
        F.transform(
            F.sequence(F.lit(1), n_starts),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if distinct_within_doc:
        grams = F.array_distinct(grams)
    return df.select(F.col(id_col), grams.alias("_g")).select(
        id_col, F.explode("_g").alias("ngram")
    )


def contaminated_ids_stream(
    stream_docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming decontamination: emit the ids of arriving documents
    that share any n-gram with the STATIC eval set.

    Shape: the stream side is map-only (gram build + explode); the
    eval side is a static DataFrame, so this is a stream-static inner
    join — no streaming state beyond the ``dropDuplicates`` on the
    flagged ids (bounded by the number of contaminated docs in flight;
    add a watermark upstream to bound it by time at production scale).
    The batch twin (:func:`ngram_contamination`) is the certification
    path; this is the filter you put in the live ingest topology.
    """
    tg = doc_ngrams(stream_docs, n, id_col, text_col).select(
        id_col, F.md5("ngram").alias("_h")
    )
    eg = (
        doc_ngrams(eval_df, n, id_col, text_col)
        .select(F.md5("ngram").alias("_h"))
        .distinct()
    )
    return tg.join(eg, "_h").select(id_col).dropDuplicates([id_col])


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document: distinct n-gram count, how many of those
    n-grams appear anywhere in ``eval_df``, and the contaminated flag.

    Output: ``(id, n_ngrams, n_hit, contaminated)`` — one row per
    training document, including documents too short to form a single
    n-gram (``n_ngrams = 0``, clean).
    """
    tg = doc_ngrams(train, n, id_col, text_col).select(
        id_col, F.md5("ngram").alias("_h")
    )
    eg = (
        doc_ngrams(eval_df, n, id_col, text_col)
        .select(F.md5("ngram").alias("_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the train grams: a left join against the (distinct)
    # eval set marks hits, and a single aggregate produces both the
    # total and the hit count — the naive per_doc ⋈ hits formulation
    # generates and shuffles the train grams twice.
    per_doc = (
        tg.join(eg, "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("_hit").alias("n_hit"),
        )
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )
