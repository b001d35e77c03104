"""Gopher quality rules: each rule triggered by a constructed document."""

import pytest

from tsclust_spark.operators.gopher import gopher_flags


DOCS = {
    "good": "the quick brown fox jumps over a lazy dog near the river bank "
            "and keeps running to the far side of town with great speed",
    "too_short": "the a of",
    "long_words": "the a incomprehensibilities antidisestablishmentarianism "
                  "floccinaucinihilipilification electroencephalographically "
                  "pseudopseudohypoparathyroidism spectrophotofluorometrically "
                  "hepaticocholangiogastrostomy pneumonoultramicroscopicsilico "
                  "otorhinolaryngological immunoelectrophoretically",
    "numeric": "the a 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18",
    "no_stop": "quick brown fox jumps over lazy dog near river bank keeps "
               "running far side town with great speed every single day",
    "repeat_word": "the a spam spam spam spam spam spam spam spam spam spam "
                   "spam spam spam spam spam spam spam spam spam spam spam",
    "repeat_gram": "the a one two one two one two one two one two one two "
                   "one two one two one two one two one two one two",
}


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id string, text string"
    )
    return {r["doc_id"]: r.asDict() for r in gopher_flags(df).collect()}


def test_good_doc_passes(flags):
    assert flags["good"]["gopher_pass"] is True


@pytest.mark.parametrize(
    "doc,failing_flag",
    [
        ("too_short", "ok_word_count"),
        ("long_words", "ok_mean_word_len"),
        ("numeric", "ok_alpha_words"),
        ("no_stop", "ok_stopwords"),
        ("repeat_word", "ok_top_word"),
        ("repeat_gram", "ok_dup_2gram"),
    ],
)
def test_each_rule_fires(flags, doc, failing_flag):
    assert flags[doc][failing_flag] is False, flags[doc]
    assert flags[doc]["gopher_pass"] is False


def test_empty_doc_matches_duckdb_twin(spark):
    """Empty/whitespace-only documents: Spark's F.aggregate seed gives
    mean_word_len 0.0 while DuckDB's list_sum returns NULL on an empty
    list — the oracle twin coalesces it, and this test pins the two
    engines together on exactly that edge (ADVICE r3)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    docs = [
        ("empty", ""),
        ("spaces", "   \t  \n "),
        ("one", "word"),
        ("ok", "the cat and the hat sat on a mat with a bat in the flat"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_flags(sdf)
        .select(
            "doc_id",
            "n_words",
            "mean_word_len",
            "alpha_frac",
            "n_stop",
            "top_word_frac",
            "dup_2gram_frac",
            "gopher_pass",
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = {
        row["doc_id"]: row
        for row in con.execute(entry._make_sql_gopher_flags())
        .fetchdf()
        .to_dict("records")
    }
    for doc_id, g in got.items():
        w = want[doc_id]
        assert g["n_words"] == w["n_words"], doc_id
        # the twin SQL quantizes to 6 decimals (the gate's _sql_round);
        # the raw operator does not — compare at that quantum
        for col in ("mean_word_len", "alpha_frac", "dup_2gram_frac"):
            assert g[col] == pytest.approx(w[col], abs=5.1e-7), (doc_id, col)
        # empty docs: top_word_frac is NULL on BOTH engines (max of an
        # empty list) — assert the NULL-ness agrees, values when present
        g_top, w_top = g["top_word_frac"], w["top_word_frac"]
        if g_top is None or (isinstance(w_top, float) and w_top != w_top):
            assert g_top is None and (w_top is None or w_top != w_top), doc_id
        else:
            assert g_top == pytest.approx(w_top, abs=5.1e-7), doc_id


def test_metric_values(flags):
    g = flags["good"]
    words = DOCS["good"].lower().split()
    assert g["n_words"] == len(words)
    assert g["mean_word_len"] == pytest.approx(
        sum(len(w) for w in words) / len(words)
    )
    assert g["alpha_frac"] == 1.0
    assert g["dup_2gram_frac"] == 0.0
    r = flags["repeat_word"]
    assert r["top_word_frac"] == pytest.approx(21 / 23)
