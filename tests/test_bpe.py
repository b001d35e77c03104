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


def test_batched_training_all_ties_refuses_and_matches(spark):
    """An all-ties corpus (every adjacent pair appears exactly once per
    word, uniform freq) can never satisfy the strict margin
    ``c_i > c_{i+1} + ...``, so batching must degrade to one merge per
    round — and the merge list (pure tie-break territory) must still be
    bit-identical to max_batch=1 and the pure-Python reference."""
    words = ["abcd", "efgh", "ijkl", "mnop", "qrst", "uvwx",
             "badc", "fehg", "jilk", "nmpo", "rqts", "vuxw"]
    freqs = {w: 3 for w in words}
    hist = spark.createDataFrame(
        list(freqs.items()), "word string, freq long"
    )
    seq = train_bpe(hist, n_merges=10, max_batch=1)
    stats: dict = {}
    bat = train_bpe(hist, n_merges=10, max_batch=8, stats=stats)
    assert bat == seq == _ref_train(freqs, 10)
    assert stats["batch_sizes"] == [1] * 10, stats["batch_sizes"]


def test_select_merge_batch_margin_rule():
    """Unit cases for the prefix-safety rule: symbol overlap, the
    context-gain margin, the beyond-horizon guard, and min_pair_freq
    all stop the batch exactly where the proof requires."""
    from tsclust_spark.operators.bpe import _select_merge_batch

    def row(l, r, cnt):
        return {"l": l, "r": r, "cnt": cnt}

    # disjoint symbols, margin clears the successor + context gain:
    # 50 > 10 + T(a,b)=30 -> both taken
    top = [row("a", "b", 100), row("c", "d", 50), row("e", "f", 10)]
    assert _select_merge_batch(top, 2, 2, {("a", "b"): 30}) == [
        ("a", "b"),
        ("c", "d"),
    ]
    # context gain too large: a single created pair (x, ab) could reach
    # 45 and an existing pair at 10 could climb to 55 >= 50 -> stop at 1
    assert _select_merge_batch(top, 2, 2, {("a", "b"): 45}) == [("a", "b")]
    # second overlaps first's created symbol "ab" -> batch stops at 1
    top2 = [row("a", "b", 100), row("ab", "d", 50), row("e", "f", 10)]
    assert _select_merge_batch(top2, 2, 2, {("a", "b"): 0}) == [("a", "b")]
    # zero context gain: only the successor bound applies, 50 > 45 -> take
    top3 = [row("a", "b", 100), row("c", "d", 50), row("e", "f", 45)]
    assert _select_merge_batch(top3, 2, 2, {("a", "b"): 0}) == [
        ("a", "b"),
        ("c", "d"),
    ]
    # successor + even a small gain defeats the margin: 50 <= 45 + 5
    assert _select_merge_batch(top3, 2, 2, {("a", "b"): 5}) == [("a", "b")]
    # second under min_pair_freq -> stops at 1
    top4 = [row("a", "b", 100), row("c", "d", 1), row("e", "f", 0)]
    assert _select_merge_batch(top4, 2, 2, {("a", "b"): 0}) == [("a", "b")]
    # collect exhausted every pair (no horizon row): last element may be
    # taken against a zero beyond-horizon bound
    top5 = [row("a", "b", 100), row("c", "d", 50)]
    assert _select_merge_batch(top5, 4, 2, {}) == [("a", "b"), ("c", "d")]
    # destroyed-count aliasing: second pair's left member equals the
    # first's RIGHT member (merging (a,b) consumes b's) -> stop at 1
    top6 = [row("a", "b", 100), row("b", "z", 50), row("e", "f", 10)]
    assert _select_merge_batch(top6, 2, 2, {("a", "b"): 0}) == [("a", "b")]


def test_batched_training_actually_batches(spark):
    """Context-free corpus (every word is a single pair): T bounds are
    all zero, margins are clean, so max_batch folds the whole merge list
    into one round — and the merges still equal sequential's."""
    hist = spark.createDataFrame(
        [("ab", 100), ("cd", 60), ("ef", 30), ("gh", 10)],
        "word string, freq long",
    )
    stats: dict = {}
    batched = train_bpe(hist, n_merges=4, max_batch=8, stats=stats)
    assert batched == train_bpe(hist, n_merges=4, max_batch=1)
    assert stats["batch_sizes"] == [4], stats


def test_batched_training_stops_at_overlap_then_batches(spark):
    """Corpus where the top pair's own context pair ranks second:
    "xab" gives ("a","b</w>") and ("x","a") both count 100 — the prefix
    rule must stop round 1 at a single merge (merging the first consumes
    the second's occurrences), then round 2 may fold the rest.  Batched
    output must be bit-identical to sequential throughout."""
    hist = spark.createDataFrame(
        [("xab", 100), ("qr", 60), ("st", 30)],
        "word string, freq long",
    )
    stats: dict = {}
    batched = train_bpe(hist, n_merges=4, max_batch=8, stats=stats)
    seq = train_bpe(hist, n_merges=4, max_batch=1)
    assert batched == seq
    assert ("x", "ab" + EOW) in batched
    assert stats["batch_sizes"][0] == 1, stats


def test_batched_training_context_margin_refuses(spark):
    """Corpus where the second-ranked pair is symbol-disjoint but the
    top pair carries a large single-context bound: T("a","b</w>") = 50
    from "zab", so accepting ("q","y</w>") at 51 would need
    51 > nxt + 50.  The margin must refuse (conservative bound), and
    batched output must still equal sequential's."""
    hist = spark.createDataFrame(
        [("zab", 50), ("ab", 50), ("qy", 51)],
        "word string, freq long",
    )
    stats: dict = {}
    batched = train_bpe(hist, n_merges=3, max_batch=8, stats=stats)
    seq = train_bpe(hist, n_merges=3, max_batch=1)
    assert batched == seq
    assert stats["batch_sizes"][0] == 1, stats


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
