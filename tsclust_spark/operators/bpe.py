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


def _context_bounds(
    state: DataFrame, cands: list[tuple[str, str]]
) -> dict[tuple[str, str], int]:
    """Per candidate pair (l, r): the max freq-weighted count of any
    SINGLE context triple (x, l, r) or (l, r, y) in the current corpus.

    Why this is the right statistic: every pair occurrence CREATED by
    merging (l, r) has the merged symbol l+r as a member, and each
    created occurrence of a fixed pair (x, l+r) / (l+r, y) maps to a
    distinct original triple occurrence with that same fixed context
    symbol.  So no single pair can gain more than this bound from the
    merge — the margin rule in :func:`_select_merge_batch` builds on it.

    One candidate-filtered aggregate: the triple explode is corpus-wide
    but the broadcast semi-join on (l, r) prunes to <= max_batch pairs
    before the shuffle, so the aggregate state is context-vocabulary
    sized, not corpus sized.
    """
    if not cands:
        return {}
    spark = state.sparkSession
    cdf = spark.createDataFrame(cands, "l string, r string")
    # F.get is 0-based and NULL-safe on both ends (try_element_at still
    # throws INVALID_INDEX_OF_ZERO for the first pair's left context)
    mk = lambda i: F.struct(  # noqa: E731  (inline position -> triple struct)
        F.element_at("syms", i).alias("l"),
        F.element_at("syms", i + 1).alias("r"),
        F.get("syms", i - 2).alias("lctx"),
        F.get("syms", i + 1).alias("rctx"),
    )
    trip = (
        state.where(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("syms") - 1), mk)
            ).alias("t"),
        )
        .select("freq", "t.*")
        .join(F.broadcast(cdf), ["l", "r"])
        .select(
            "l",
            "r",
            "freq",
            F.posexplode(F.array("lctx", "rctx")).alias("side", "ctx"),
        )
        .where(F.col("ctx").isNotNull())
        .groupBy("l", "r", "side", "ctx")
        .agg(F.sum("freq").alias("c"))
        .groupBy("l", "r")
        .agg(F.max("c").alias("t_max"))
        .collect()
    )
    return {(r["l"], r["r"]): int(r["t_max"]) for r in trip}


def _select_merge_batch(
    top: list,
    max_batch: int,
    min_pair_freq: int,
    t_bounds: dict[tuple[str, str], int],
) -> list[tuple[str, str]]:
    """Longest prefix of the count-ordered candidate list that sequential
    BPE would PROVABLY pick in exactly this order (so k merges can share
    one Spark round — VERDICT r4 item 6 — with zero equivalence risk).

    ``top`` is the exact sequential ordering (count desc, then (l, r)
    lexicographic), so element 0 is always safe.  Element i (0-based) is
    accepted iff both:

    - symbol-disjoint from every earlier accepted pair j — its symbols
      avoid {l_j, r_j, l_j + r_j}.  Then merging p_j can neither destroy
      (needs r_i = l_j or l_i = r_j) nor create (created pairs contain
      the string l_j + r_j) an occurrence of p_i, so p_i's count is
      UNCHANGED when sequential reaches step i;
    - c_i > c_{i+1} + sum(T_j, j < i), where T_j is the candidate's max
      single-context triple bound from :func:`_context_bounds`.  Any
      competitor at step i is either an existing pair — bounded by its
      current count (<= c_{i+1} past position i, with ties already
      broken in ``top``'s own (count desc, l, r) order, which IS the
      sequential tie-break) — plus what it can GAIN from the earlier
      merges (<= sum T_j, since each gained occurrence has some l_j+r_j
      member), or a brand-new pair (<= sum T_j outright).  Strict >
      removes any tie-break reasoning about pairs beyond the collected
      horizon or newly created.

    When ``top`` has no row past position i (the limit(want+1) collect
    exhausted every existing pair), the beyond-horizon bound is 0.

    Degenerate corpora fail the margin test and fall back to one merge
    per round — never a wrong batch, only a smaller one.
    """
    batch: list[tuple[str, str]] = [(top[0]["l"], top[0]["r"])]
    taken = {top[0]["l"], top[0]["r"], top[0]["l"] + top[0]["r"]}
    s_gain = t_bounds.get((top[0]["l"], top[0]["r"]), 0)
    for i in range(1, min(max_batch, len(top))):
        row = top[i]
        nxt_cnt = int(top[i + 1]["cnt"]) if i + 1 < len(top) else 0
        if row["cnt"] < min_pair_freq:
            break
        if (
            row["l"] in taken
            or row["r"] in taken
            or (row["l"] + row["r"]) in taken
        ):
            break
        if row["cnt"] <= nxt_cnt + s_gain:
            break
        batch.append((row["l"], row["r"]))
        taken.update({row["l"], row["r"], row["l"] + row["r"]})
        s_gain += t_bounds.get((row["l"], row["r"]), 0)
    return batch


def train_bpe(
    histogram: DataFrame,
    n_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 4,
    max_batch: int = 8,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, freq)`` histogram.

    Returns the ordered merge list [(left, right), ...].  Stops early
    when no pair reaches ``min_pair_freq``.  Each round runs one
    vocabulary-sized pair aggregate plus (when ``max_batch > 1``) one
    candidate-filtered context aggregate (:func:`_context_bounds`); the
    argmax is a small top-``max_batch`` collect (metadata-scale, not a
    data collect), from which up to ``max_batch`` provably-order-safe
    merges are folded into one rewrite pass (``_select_merge_batch`` —
    output is bit-identical to ``max_batch=1``, asserted in
    tests/test_bpe.py), cutting merge ROUNDS (each a full histogram
    rewrite + lineage step) by the realized batch factor.  Context-heavy
    or tie-heavy corpora fail the provable margin and fall back toward
    one merge per round — correctness never depends on the corpus shape.

    Pass ``stats={}`` to receive ``stats["batch_sizes"]`` (one entry per
    round) for observability; tests use it to assert real batching.
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
        # INVARIANT: this collect takes the raw limit(want+1) head with
        # NO count filter (no .where(cnt >= min_pair_freq)).
        # _select_merge_batch's exhausted-horizon rule (nxt_cnt = 0 when
        # i+1 >= len(top)) is sound ONLY under this invariant: a short
        # result must mean "no other pairs exist", not "the rest were
        # filtered out". Add any pre-filter here and that rule silently
        # turns unsound.
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
        # prescreen (free): the i=1 margin test needs
        # top[1].cnt > top[2].cnt + s_gain with s_gain >= 0, so when
        # top[1].cnt <= top[2].cnt the batch can only ever be
        # [top[0]] — skip the corpus-wide _context_bounds job that a
        # tie-heavy corpus would otherwise pay every round for nothing
        nxt2 = int(top[2]["cnt"]) if len(top) > 2 else 0
        if want > 1 and len(top) > 1 and int(top[1]["cnt"]) > nxt2:
            t_bounds = _context_bounds(
                state, [(r["l"], r["r"]) for r in top[:want]]
            )
            batch = _select_merge_batch(top, want, min_pair_freq, t_bounds)
        else:
            batch = [(top[0]["l"], top[0]["r"])]
        merges.extend(batch)
        if stats is not None:
            stats.setdefault("batch_sizes", []).append(len(batch))

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
