"""znormalize / PAA / SAX against hand-computed numpy oracles."""

import numpy as np
import pytest

from tsclust_spark.operators.symbolic import (
    gaussian_breakpoints,
    paa,
    sax,
    sax_words,
    znormalize,
)


def _series_df(spark, series: dict):
    rows = [
        (sid, pos, float(v))
        for sid, vals in series.items()
        for pos, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "doc_id string, pos int, value double")


def test_breakpoints_classic_values():
    # the published SAX table (Lin et al. 2003, Table 3)
    assert gaussian_breakpoints(4) == [-0.6744898, 0.0, 0.6744898]
    bp5 = gaussian_breakpoints(5)
    assert bp5 == pytest.approx([-0.8416212, -0.2533471, 0.2533471, 0.8416212])
    with pytest.raises(ValueError):
        gaussian_breakpoints(1)


def test_znormalize_moments(spark):
    rng = np.random.default_rng(7)
    series = {"a": rng.normal(5, 3, 40).tolist(), "b": [2.0] * 10}
    out = znormalize(_series_df(spark, series)).collect()
    a = np.array([r["zvalue"] for r in out if r["doc_id"] == "a"])
    b = np.array([r["zvalue"] for r in out if r["doc_id"] == "b"])
    assert abs(a.mean()) < 1e-9 and abs(a.std() - 1.0) < 1e-9
    # constant series maps to all-zero, not NaN/null
    assert np.all(b == 0.0)


def test_paa_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(size=10).tolist()
    out = paa(_series_df(spark, {"s": vals}), n_segments=5).collect()
    got = {r["segment"]: (r["paa_value"], r["seg_n"]) for r in out}
    arr = np.asarray(vals)
    for seg in range(5):
        idx = [i for i in range(10) if i * 5 // 10 == seg]
        assert got[seg][0] == pytest.approx(arr[idx].mean())
        assert got[seg][1] == len(idx)


def test_paa_ragged_lengths(spark):
    series = {"x": list(range(7)), "y": list(range(12))}
    out = paa(_series_df(spark, series), n_segments=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], {})[r["segment"]] = r["seg_n"]
    assert sum(by_id["x"].values()) == 7 and len(by_id["x"]) == 4
    assert sum(by_id["y"].values()) == 12 and by_id["y"] == {0: 3, 1: 3, 2: 3, 3: 3}


def test_sax_known_mapping(spark):
    # monotonically increasing series: symbols must be non-decreasing and
    # span the alphabet ends after z-normalization
    vals = [float(i) for i in range(32)]
    out = sax(_series_df(spark, {"m": vals}), n_segments=8, alphabet_size=4)
    rows = sorted(out.collect(), key=lambda r: r["segment"])
    syms = [r["symbol"] for r in rows]
    assert syms == sorted(syms)
    assert syms[0] == 0 and syms[-1] == 3
    assert all(0 <= s <= 3 for s in syms)


def test_sax_words_concat(spark):
    rng = np.random.default_rng(3)
    series = {f"d{i}": rng.normal(size=24).tolist() for i in range(4)}
    df = _series_df(spark, series)
    sym = sax(df, n_segments=6, alphabet_size=5)
    words = {r["doc_id"]: r["sax_word"] for r in sax_words(df, 6, 5).collect()}
    per_seg = {}
    for r in sym.collect():
        per_seg.setdefault(r["doc_id"], {})[r["segment"]] = r["symbol"]
    for sid, segs in per_seg.items():
        expect = "".join(chr(97 + segs[k]) for k in sorted(segs))
        assert words[sid] == expect
        assert len(words[sid]) == 6
