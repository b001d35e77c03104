"""Distributed BPE tokenizer training and application (Sennrich-style
byte-pair encoding over word-internal character symbols).

The classic scale trick makes this tractable at corpus size: BPE never
needs the raw corpus after one pass — it operates on the DISTINCT-WORD
HISTOGRAM ``(word, freq)``, which is vocabulary-sized (~1e6-1e8 rows at
web scale, vs 1e12 corpus tokens).  Training is then N merge rounds,
each one a vocabulary-sized Spark job:

1. explode each word's adjacent symbol pairs weighted by word freq,
2. hash-aggregate pair counts and take the argmax (count desc, then
   (left, right) lexicographic — the DETERMINISTIC tie-break, so any
   partitioning and any engine learns the same vocabulary),
3. rewrite the symbol arrays with the merged pair (an Arrow-batched
   pandas pass over the histogram — vocabulary-sized, the one place
   per-row Python is the right tool because the merge rewrite is an
   inherently sequential left-to-right scan per word).

``localCheckpoint`` truncates lineage every few rounds (the iterative
plan would otherwise grow by one join per merge — the same discipline
as operators/dedup.connected_components).

Application (``apply_bpe``) reuses the histogram trick in reverse:
segment only the batch's DISTINCT words with the learned merge ranks,
then broadcast-join segmentations back onto the corpus — the corpus
itself is touched exactly twice (histogram + join), both linear scans.

End-of-word marker: the final symbol of every word carries ``</w>``
(suffix form), distinguishing "er" in "higher</w>" from "er</w>" — the
original Sennrich convention.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsclust_spark.operators.textstats import _words

EOW = "</w>"


def _word_symbols(word: str) -> list[str]:
    if not word:
        return []
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return chars


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the only corpus-sized stage."""
    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_in(symbols: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge of (left, right) -> left+right."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _select_merge_batch(
    top: list, max_batch: int, min_pair_freq: int
) -> list[tuple[str, str]]:
    """Longest prefix of the count-ordered candidate list that sequential
    BPE would PROVABLY pick in exactly this order (so k merges can share
    one Spark round — VERDICT r4 item 6 — with zero equivalence risk).

    ``top`` is the exact sequential ordering (count desc, then (l, r)
    lexicographic), so element 1 is always safe.  Element i (0-based) is
    accepted iff both:

    - symbol-disjoint from every earlier accepted pair j — its symbols
      avoid {l_j, r_j, l_j + r_j}.  Then merging p_j can neither destroy
      (needs v = l_j or u = r_j) nor create (created pairs contain the
      string l_j + r_j) an occurrence of p_i, so p_i's count is UNCHANGED
      when sequential reaches step i;
    - c_i > c_{i+1} + sum(c_j, j < i).  One merge of c_j occurrences
      creates at most c_j new pairs, so NO other pair (collected, beyond
      the collected horizon — all bounded by c_{i+1} since the list is
      sorted — or brand-new, bounded by 0) can exceed
      c_{i+1} + sum(c_j): p_i stays the strict argmax, no tie-break
      reasoning needed.

    Degenerate corpora fail the margin test and fall back to one merge
    per round — never a wrong batch, only a smaller one.
    """
    batch: list[tuple[str, str]] = [(top[0]["l"], top[0]["r"])]
    taken = {top[0]["l"], top[0]["r"], top[0]["l"] + top[0]["r"]}
    s_prev = int(top[0]["cnt"])
    for i in range(1, min(max_batch, len(top) - 1)):
        row, nxt = top[i], top[i + 1]
        if row["cnt"] < min_pair_freq:
            break
        if row["l"] in taken or row["r"] in taken:
            break
        if row["cnt"] <= nxt["cnt"] + s_prev:
            break
        batch.append((row["l"], row["r"]))
        taken.update({row["l"], row["r"], row["l"] + row["r"]})
        s_prev += int(row["cnt"])
    return batch


def train_bpe(
    histogram: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
    max_batch: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` histogram.

    Returns the ordered merge list [(left, right), ...].  Stops early
    when no pair reaches ``min_pair_freq``.  Each round runs ONE
    vocabulary-sized aggregate; the argmax is a small top-``max_batch``
    collect (metadata-scale, not a data collect), from which up to
    ``max_batch`` provably-order-safe merges are folded into one rewrite
    pass (``_select_merge_batch`` — output is bit-identical to
    ``max_batch=1``, asserted in tests/test_bpe.py), cutting driver
    round-trips from n_merges toward n_merges/max_batch on Zipfian
    corpora.
    """
    sym_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("syms", T.ArrayType(T.StringType())),
        ]
    )

    def to_syms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy(deep=False)
            pdf["syms"] = pdf["word"].map(_word_symbols)
            yield pdf[["word", "freq", "syms"]]

    state = histogram.mapInPandas(to_syms, schema=sym_schema).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
        pair = F.explode(
            F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        ).alias("p")
        want = min(max(1, max_batch), n_merges - len(merges))
        top = (
            state.select("freq", pair)
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(want + 1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        batch = (
            _select_merge_batch(top, want, min_pair_freq)
            if want > 1 and len(top) > 1
            else [(top[0]["l"], top[0]["r"])]
        )
        merges.extend(batch)

        def apply_merges(
            batches: Iterator[pd.DataFrame], _batch=tuple(batch)
        ) -> Iterator[pd.DataFrame]:
            def rewrite(s):
                syms = list(s)
                for _l, _r in _batch:
                    syms = _merge_pair_in(syms, _l, _r)
                return syms

            for pdf in batches:
                pdf = pdf.copy(deep=False)
                pdf["syms"] = pdf["syms"].map(rewrite)
                yield pdf[["word", "freq", "syms"]]

        state = state.mapInPandas(apply_merges, schema=sym_schema)
        if rounds % checkpoint_every == 0 or len(merges) >= n_merges:
            state = state.localCheckpoint(eager=True)
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank adjacent pair — the standard BPE inference loop."""
    syms = _word_symbols(word)
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with the learned merges.

    Output: ``(id, bpe_tokens array<string>, n_bpe_tokens)``.  Only the
    batch's DISTINCT words run the sequential inference loop; the
    corpus gets its segmentations by a join on the word (broadcast at
    small vocabularies).
    """
    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    words = F.filter(_words(F.col(text_col)), lambda w: F.length(w) > 0)
    toks = df.select(
        F.col(id_col),
        F.posexplode(words).alias("pos", "word"),
    )
    distinct_words = toks.select("word").distinct()

    seg_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
        ]
    )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = b_ranks.value
        for pdf in batches:
            pdf = pdf.copy(deep=False)
            pdf["pieces"] = pdf["word"].map(lambda w: segment_word(w, rk))
            yield pdf[["word", "pieces"]]

    seg = distinct_words.mapInPandas(segment, schema=seg_schema)
    return (
        toks.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda s: s["pieces"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )
