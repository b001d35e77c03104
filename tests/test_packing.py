"""Sequence packing (operators/packing.py) and domain-mixture sampling
(operators/sampling.py::mixture_sample).

Packing value-gate strategy: the Spark kernel and a pure-Python
reference share `ffd_pack`, so the test recomputes every bucket's
expected assignment independently and asserts row-level identity —
plus the driver-gateable invariants, an FFD fill-efficiency floor, and
partitioning-invariance (the 100-TB determinism contract).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.packing import (
    ffd_pack,
    pack_invariants,
    pack_sequences,
)
from tsclust_spark.operators.sampling import mixture_sample

pytestmark = pytest.mark.spark

CAP = 50


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, n_tok long")


def _reference_packing(rows, capacity, n_buckets, seed="tsclust-pack"):
    """Pure-Python twin of pack_sequences: bucket by md5, FFD per
    bucket over (length desc, id asc), emit {id: (pack_id, pos, off)}."""
    buckets = {}
    for doc_id, n in rows:
        h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8]
        b = int(h, 16) % n_buckets
        buckets.setdefault(b, []).append((doc_id, n))
    out = {}
    for b, items in buckets.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        small = [t for t in items if t[1] <= capacity]
        for doc_id, n in items:
            if n > capacity:
                out[doc_id] = (f"{b}:ovr:{doc_id}", 0, 0, True)
        bins = ffd_pack([n for _, n in small], capacity)
        offsets, positions = {}, {}
        for (doc_id, n), bin_idx in zip(small, bins):
            out[doc_id] = (
                f"{b}:{bin_idx}",
                positions.get(bin_idx, 0),
                offsets.get(bin_idx, 0),
                False,
            )
            offsets[bin_idx] = offsets.get(bin_idx, 0) + n
            positions[bin_idx] = positions.get(bin_idx, 0) + 1
    return out


def _rows(k=120):
    # deterministic pseudo-random lengths, includes two oversize docs
    rows = [(f"d{i:03d}", 1 + (i * 7919) % (CAP - 1)) for i in range(k)]
    rows += [("big1", CAP + 10), ("big2", CAP * 3)]
    return rows


def test_spark_matches_reference(spark):
    rows = _rows()
    got = {
        r["id"]: (r["pack_id"], r["pack_pos"], r["pack_offset"], r["oversize"])
        for r in pack_sequences(
            _mk(spark, rows), CAP, len_col="n_tok", id_col="doc_id",
            n_buckets=4,
        ).collect()
    }
    want = _reference_packing(rows, CAP, 4)
    assert got == want


def test_invariants_all_true(spark):
    packed = pack_sequences(
        _mk(spark, _rows()), CAP, len_col="n_tok", id_col="doc_id",
        n_buckets=4,
    )
    inv = pack_invariants(packed, CAP)
    bad = inv.filter(
        ~F.col("ok_fits") | ~F.col("ok_offset") | ~F.col("ok_once")
    ).count()
    assert bad == 0
    assert inv.count() == len(_rows())


def test_partitioning_invariance(spark):
    rows = _rows()
    a = pack_sequences(
        _mk(spark, rows), CAP, len_col="n_tok", id_col="doc_id", n_buckets=4
    )
    b = pack_sequences(
        _mk(spark, rows).repartition(13), CAP, len_col="n_tok",
        id_col="doc_id", n_buckets=4,
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fill_efficiency_floor(spark):
    rows = [(f"d{i:03d}", 1 + (i * 7919) % (CAP - 1)) for i in range(200)]
    packed = pack_sequences(
        _mk(spark, rows), CAP, len_col="n_tok", id_col="doc_id", n_buckets=2
    )
    stats = packed.agg(
        F.sum("length").alias("tok"),
        F.countDistinct("pack_id").alias("packs"),
    ).first()
    eff = stats["tok"] / (stats["packs"] * CAP)
    # FFD on uniform lengths fills far better than this; the floor
    # guards against a regression to one-doc-per-pack
    assert eff > 0.7, f"fill efficiency {eff:.3f}"


def test_oversize_are_flagged_singletons(spark):
    packed = pack_sequences(
        _mk(spark, _rows()), CAP, len_col="n_tok", id_col="doc_id",
        n_buckets=4,
    )
    ovr = packed.filter("oversize").collect()
    assert sorted(r["id"] for r in ovr) == ["big1", "big2"]
    for r in ovr:
        assert r["pack_pos"] == 0 and r["pack_offset"] == 0
    # nobody shares a pack with an oversize doc
    ovr_packs = [r["pack_id"] for r in ovr]
    assert (
        packed.filter(F.col("pack_id").isin(ovr_packs)).count() == 2
    )


def test_capacity_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_mk(spark, [("a", 1)]), 0)


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


def _docs(spark, per_source=200, sources=("a", "b", "c", "junk")):
    rows = [
        (f"{s}{i}", s) for s in sources for i in range(per_source)
    ]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_mixture_composition_and_determinism(spark):
    df = _docs(spark)
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    out = mixture_sample(df, w, total=100).cache()
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in by  # unweighted sources dropped
    # Binomial(200, w*100/200): expect 50/30/20 +- ~4 sigma
    for s, frac in w.items():
        exp = frac * 100
        assert abs(by.get(s, 0) - exp) < 25, (s, by)
    again = mixture_sample(_docs(spark).repartition(7), w, total=100)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_mixture_caps_small_groups(spark):
    # source 'c' has 5 rows but the target asks for ~33 -> keep all 5
    rows = [(f"a{i}", "a") for i in range(200)] + [
        (f"c{i}", "c") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = mixture_sample(df, {"a": 0.67, "c": 0.33}, total=100)
    assert out.filter("source = 'c'").count() == 5


def test_mixture_weight_validation(spark):
    with pytest.raises(ValueError):
        mixture_sample(_docs(spark), {"a": 0.5, "b": 0.2}, total=10)


# ---------------------------------------------------------------------------
# chunk_sequences
# ---------------------------------------------------------------------------


def _chunk_reference(tokens, chunk_size, stride, min_tokens=1):
    out = []
    starts = range(0, max(len(tokens) - 1, 0) + 1, stride)
    for idx, s in enumerate(starts):
        c = tokens[s : s + chunk_size]
        if len(c) >= min_tokens:
            out.append((idx, s, len(c), c))
    return out


def test_chunk_matches_reference(spark):
    from tsclust_spark.operators.packing import chunk_sequences

    rows = [
        ("d0", [i for i in range(100)]),   # multiple chunks + short tail
        ("d1", [1, 2, 3]),                 # single partial chunk
        ("d2", []),                        # empty -> no chunks
        ("d3", [7] * 32),                  # exactly one full chunk (+tail at 24)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {}
    for r in chunk_sequences(df, 32, stride=24).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_pos"], r["n_chunk"], r["chunk_tokens"])
        )
    for doc_id, toks in rows:
        want = _chunk_reference(toks, 32, 24)
        assert sorted(got.get(doc_id, [])) == want, doc_id


def test_chunk_no_overlap_default_reconstructs(spark):
    from pyspark.sql import functions as FF

    from tsclust_spark.operators.packing import chunk_sequences

    toks = list(range(75))
    df = spark.createDataFrame(
        [("d", toks)], "doc_id string, tokens array<int>"
    )
    out = (
        chunk_sequences(df, 32)  # stride defaults to chunk_size
        .orderBy("chunk_idx")
        .agg(FF.flatten(FF.collect_list("chunk_tokens")).alias("rt"))
        .first()["rt"]
    )
    assert out == toks  # disjoint chunks cover the doc exactly once


def test_chunk_validation(spark):
    from tsclust_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame([("d", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError):
        chunk_sequences(df, 0)
    with pytest.raises(ValueError):
        chunk_sequences(df, 8, stride=0)


# ---------------------------------------------------------------------------
# span_dedup_corpus (lives in operators/dedup.py; chunking composition)
# ---------------------------------------------------------------------------


def test_span_dedup_keeps_first_occurrence(spark):
    from tsclust_spark.operators.dedup import span_dedup_corpus

    rows = [
        (1, "a b c d e f g h i j"),    # spans: "a b c d e", "f g h i j"
        (2, "a b c d e x y"),          # first span duplicates doc 1's
        (3, ""),                        # empty doc -> zeros row
        (4, "f g h i j"),               # whole doc is a dup span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup_corpus(df, span=5).collect()}
    assert len(got) == 4
    assert got[1]["text_clean"] == "a b c d e f g h i j"
    assert (got[1]["n_spans"], got[1]["n_kept"]) == (2, 2)
    # doc 2 loses its duplicated first span, keeps the "x y" tail span
    assert got[2]["text_clean"] == "x y"
    assert (got[2]["n_spans"], got[2]["n_kept"]) == (2, 1)
    assert (got[3]["n_spans"], got[3]["n_kept"], got[3]["text_clean"]) == (
        0, 0, "",
    )
    assert got[4]["text_clean"] == "" and got[4]["n_kept"] == 0


def test_span_dedup_partitioning_invariance(spark):
    from tsclust_spark.operators.dedup import span_dedup_corpus

    words = ["w%d" % (i % 9) for i in range(60)]
    rows = [
        (i, " ".join(words[i % 7 :] + words[: i % 7])) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = span_dedup_corpus(df, span=5)
    b = span_dedup_corpus(df.repartition(11), span=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
