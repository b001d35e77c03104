"""Unigram surprisal vs a brute-force python oracle."""

import math

import numpy as np
import pytest

from tsclust_spark.operators.surprisal import unigram_surprisal


def test_matches_bruteforce_and_ranks_gibberish(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the mat"),
        (2, "zqxv jkwp qmzr zqxv"),          # gibberish: rare tokens
        (3, "the the the the the the"),      # boilerplate: common token
        (4, ""),                             # empty -> no row
        (5, "   \t  "),                      # whitespace-only -> no row
        (6, "The THE the"),                  # case folds together
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}

    # brute force over the same tokenization (lower + whitespace split)
    corpus = []
    per_doc = {}
    for i, text in docs:
        words = [w for w in text.lower().strip().split() if w]
        if words:
            per_doc[i] = words
            corpus.extend(words)
    freq = {}
    for w in corpus:
        freq[w] = freq.get(w, 0) + 1
    total = len(corpus)

    assert set(got) == set(per_doc)
    for i, words in per_doc.items():
        want = -np.mean([math.log(freq[w] / total) for w in words])
        assert got[i]["n_tokens"] == len(words)
        assert got[i]["surprisal"] == pytest.approx(want, rel=1e-12)

    # the ordering a curation filter relies on
    assert got[2]["surprisal"] > got[0]["surprisal"] > got[3]["surprisal"]
