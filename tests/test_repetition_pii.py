"""Unit tests: char-weighted repetition signals + PII redaction.

The oracle gates (tests/test_queries_oracle.py, test_fuzz_oracle.py)
prove Spark == DuckDB; these prove both == a plain-Python reference,
and pin the operator-level semantics the gates cannot see (column
parametrization, mask chain order, regex edge behavior).
"""

import re
from collections import Counter

import pytest

from tsclust_spark.operators.pii import (
    EMAIL_RE,
    ID_RE,
    IPV4_RE,
    redact_pii,
)
from tsclust_spark.operators.repetition import repetition_signals


def _ref_signals(text: str, n: int) -> tuple[float, float]:
    words = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    denom = max(len(" ".join(words)), 1)
    grams = (
        [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if len(words) >= n
        else []
    )
    c = Counter(grams)
    best = max((v * len(g) for g, v in c.items()), default=0)
    dup = sum((v - 1) * len(g) for g, v in c.items() if v > 1)
    return best / denom, dup / denom


DOCS = [
    (0, "a b a b a b"),
    (1, "x y z x y z x y z w"),
    (2, "one two three four five six seven"),
    (3, ""),
    (4, "   \t  "),
    (5, "word"),
    (6, " ".join(["spark shuffle"] * 15)),
    (7, "naïve café naïve café 東京 データ 東京 データ"),
    (8, "aa aa aa"),  # run spanning the whole sorted array (no flush)
]


@pytest.mark.spark
def test_repetition_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(
            df, top_ns=(2, 3, 4), dup_ns=(2, 5, 10)
        ).collect()
    }
    for doc_id, text in DOCS:
        for n in (2, 3, 4):
            best, _ = _ref_signals(text, n)
            assert out[doc_id][f"top{n}_char_frac"] == pytest.approx(
                best, abs=1e-12
            ), (doc_id, n)
        for n in (2, 5, 10):
            _, dup = _ref_signals(text, n)
            assert out[doc_id][f"dup{n}_char_frac"] == pytest.approx(
                dup, abs=1e-12
            ), (doc_id, n)


@pytest.mark.spark
def test_repetition_short_doc_is_zero_not_descending_sequence(spark):
    # F.sequence(1, m) DESCENDS for m < 1 — the guard must return 0.0,
    # not n-grams built from a [1, 0, ...] index sequence.
    df = spark.createDataFrame([(0, "one two")], ["doc_id", "text"])
    row = repetition_signals(df, top_ns=(4,), dup_ns=(4,)).collect()[0]
    assert row["top4_char_frac"] == 0.0
    assert row["dup4_char_frac"] == 0.0


@pytest.mark.spark
def test_redact_pii_counts_and_masks(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob@example.com and bob@example.com again"),
            (1, "host 10.0.0.1 ssn 123-45-6789"),
            (2, "clean text, no pii at all"),
            (3, "edge 192.168.255.254and x@y.zz 12-345-678"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert out[0]["n_email"] == 2 and out[0]["pii_total"] == 2
    assert out[0]["redacted_text"] == "mail <EMAIL> and <EMAIL> again"
    assert out[1]["n_ipv4"] == 1 and out[1]["n_id"] == 1
    assert out[1]["redacted_text"] == "host <IP> ssn <ID>"
    assert out[2]["pii_total"] == 0
    assert out[2]["redacted_text"] == out[2]["text"]
    # '4and' has no word boundary -> NOT an IP; x@y.zz IS an email;
    # 12-345-678 is not SSN-shaped
    assert out[3]["n_ipv4"] == 0
    assert out[3]["n_email"] == 1
    assert out[3]["n_id"] == 0
    assert out[4]["pii_total"] == 0 and out[4]["redacted_text"] == ""


def test_pii_regexes_are_re2_compatible():
    # The DuckDB oracle compiles the same strings under RE2: no
    # lookarounds, no backreferences allowed in the patterns.
    for pat in (EMAIL_RE, IPV4_RE, ID_RE):
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        assert not re.search(r"\\[1-9]", pat)
        re.compile(pat)  # still a valid Java-style/Python regex
