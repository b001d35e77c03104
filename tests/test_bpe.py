"""Distributed BPE training == pure-Python reference (same tie-break);
application reconstructs words and respects merge order."""

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.bpe import (
    EOW,
    _merge_pair_in,
    _word_symbols,
    apply_bpe,
    segment_word,
    train_bpe,
    word_histogram,
)

# the Sennrich-paper toy corpus
CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _ref_train(word_freqs: dict[str, int], n_merges: int, min_pair_freq=2):
    state = {w: _word_symbols(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freqs[w]
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append(pair)
        state = {w: _merge_pair_in(s, *pair) for w, s in state.items()}
    return merges


def _docs(spark):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_reference(spark):
    hist = word_histogram(_docs(spark))
    got = train_bpe(hist, n_merges=10)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _ref_train(freqs, 10)
    assert got == want
    # the famous first merges on this corpus: (e,s) then (es,t</w>)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", f"t{EOW}")


def test_train_early_stop_on_min_freq(spark):
    hist = word_histogram(
        spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    )
    # every pair occurs once < min_pair_freq=2 -> zero merges
    assert train_bpe(hist, n_merges=5) == []


def test_apply_reconstructs_and_merges(spark):
    docs = _docs(spark)
    hist = word_histogram(docs)
    merges = train_bpe(hist, n_merges=10)
    out = {r["doc_id"]: r.asDict() for r in apply_bpe(docs, merges).collect()}
    assert len(out) == len(CORPUS)
    for i, w in enumerate(CORPUS):
        pieces = out[i]["bpe_tokens"]
        assert "".join(pieces) == w + EOW  # lossless
        assert out[i]["n_bpe_tokens"] == len(pieces)
        # greedy reference inference agrees
        ranks = {p: k for k, p in enumerate(merges)}
        assert pieces == segment_word(w, ranks)
    # frequent whole words collapse to few symbols
    assert out[CORPUS.index("newest")]["n_bpe_tokens"] <= 2


def test_batched_training_identical_to_sequential(spark):
    """max_batch>1 folds provably-order-safe merges into one Spark round;
    the learned merge LIST must be bit-identical to max_batch=1 (which
    is itself reference-identical)."""
    hist = word_histogram(_docs(spark))
    seq = train_bpe(hist, n_merges=10, max_batch=1)
    assert train_bpe(hist, n_merges=10, max_batch=8) == seq
    assert train_bpe(hist, n_merges=10, max_batch=3) == seq


def test_batched_training_identical_on_zipfian_corpus(spark):
    """Stress the batch-selection rule on a larger Zipf-weighted corpus
    with shared stems (overlapping pairs, near-tie counts)."""
    import random

    rng = random.Random(42)
    stems = ["run", "walk", "jump", "light", "night", "right", "read",
             "lead", "deep", "keep", "seen", "teen", "test", "rest"]
    sufs = ["", "s", "er", "ing", "est", "ed"]
    vocab = [s + x for s in stems for x in sufs]
    freqs = {w: max(1, int(200 / (i + 1))) for i, w in enumerate(
        sorted(vocab, key=lambda w: rng.random()))}
    # feed the histogram directly (train_bpe's actual input contract)
    hist = spark.createDataFrame(
        list(freqs.items()), "word string, freq long"
    )
    seq = train_bpe(hist, n_merges=25, max_batch=1)
    assert train_bpe(hist, n_merges=25, max_batch=8) == seq
    assert seq == _ref_train(freqs, 25)


def test_select_merge_batch_margin_rule():
    """Unit cases for the prefix-safety rule: symbol overlap and
    insufficient count margin both stop the batch."""
    from tsclust_spark.operators.bpe import _select_merge_batch

    def row(l, r, cnt):
        return {"l": l, "r": r, "cnt": cnt}

    # clean margins, disjoint symbols -> both taken
    top = [row("a", "b", 100), row("c", "d", 50), row("e", "f", 10)]
    assert _select_merge_batch(top, 2, 2) == [("a", "b"), ("c", "d")]
    # second overlaps first's created symbol "ab" -> batch stops at 1
    top = [row("a", "b", 100), row("ab", "d", 50), row("e", "f", 10)]
    assert _select_merge_batch(top, 2, 2) == [("a", "b")]
    # margin too thin: 50 <= 45 + 100 -> stops at 1
    top = [row("a", "b", 100), row("c", "d", 50), row("e", "f", 45)]
    assert _select_merge_batch(top, 2, 2) == [("a", "b")]
    # second under min_pair_freq -> stops at 1
    top = [row("a", "b", 100), row("c", "d", 1), row("e", "f", 0)]
    assert _select_merge_batch(top, 2, 2) == [("a", "b")]


def test_apply_handles_unseen_words(spark):
    docs = _docs(spark)
    merges = train_bpe(word_histogram(docs), n_merges=10)
    new = spark.createDataFrame([(99, "zzz newest")], "doc_id long, text string")
    row = apply_bpe(new, merges).collect()[0]
    toks = row["bpe_tokens"]
    assert "".join(toks) == "zzz" + EOW + "newest" + EOW
    # unseen word falls back to characters
    assert toks[:2] == ["z", "z"]


def test_multiword_order_preserved(spark):
    merges = [("a", f"b{EOW}")]
    df = spark.createDataFrame(
        [(1, "ab xy ab")], "doc_id long, text string"
    )
    row = apply_bpe(df, merges).collect()[0]
    assert row["bpe_tokens"] == [f"ab{EOW}", "x", f"y{EOW}", f"ab{EOW}"]
