"""Map-only 1m fast path == explode-based generic path, bit-exact."""

import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.explode import explode_to_points
from tsclust_spark.operators.rollup import rollup_sequences_1m_fast
from tsclust_spark.plans.rollup_job import (
    build_tiers_from_sequences,
    build_tiers_with_rep,
)
from tsclust_spark.sources.datagen import read_sequences


@pytest.mark.spark
def test_fast_1m_equals_exploded(spark):
    seq = read_sequences(spark, "smoke").limit(300).cache()
    fast = rollup_sequences_1m_fast(seq, with_rep=False).drop("rep_value")
    points = explode_to_points(seq, keep_source=False)
    from tsclust_spark.operators.rollup import rollup_tier

    generic = rollup_tier(points, "1m", integer_values=True)
    cols = sorted(fast.columns)
    a, b = fast.select(*cols), generic.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.mark.spark
def test_fast_tiers_equal_generic_tiers(spark):
    seq = read_sequences(spark, "smoke").limit(300).cache()
    fast = build_tiers_from_sequences(seq)
    generic = build_tiers_with_rep(explode_to_points(seq, keep_source=False))
    for tier in ["1m", "1h", "1d"]:
        cols = sorted(fast[tier].columns)
        a = fast[tier].select(*cols)
        b = generic[tier].select(*cols)
        assert a.exceptAll(b).count() == 0, tier
        assert b.exceptAll(a).count() == 0, tier


@pytest.mark.spark
def test_fast_1m_no_shuffle_in_plan(spark):
    """The scale property itself: the 1m tier plan contains NO exchange."""
    seq = read_sequences(spark, "smoke")
    plan = rollup_sequences_1m_fast(seq)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.spark
def test_fast_path_partial_last_bucket(spark):
    # a 70-token doc: bucket 0 has 60 points, bucket 1 has 10
    df = spark.createDataFrame(
        [("d1", list(range(70)), 70, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    rows = {r.bucket_ts.minute: r for r in rollup_sequences_1m_fast(df).collect()}
    assert rows[0].count_value == 60 and rows[1].count_value == 10
    assert rows[0].min_value == 0 and rows[0].max_value == 59
    assert rows[1].min_value == 60 and rows[1].max_value == 69
    assert rows[0].sum_value == sum(range(60))
    # lower medoid of 0..59 is element 30 (1-based idx (60+1)//2 = 30 -> 29)
    assert rows[0].rep_value == 29
    assert rows[1].rep_value == 64


@pytest.mark.spark
def test_arrow_1m_kernel_equals_jvm_fast_path(spark):
    from tsclust_spark.kernels.rollup_arrow import rollup_sequences_1m_arrow

    seq = read_sequences(spark, "smoke").limit(300).cache()
    jvm = rollup_sequences_1m_fast(seq)
    arrow = rollup_sequences_1m_arrow(seq)
    cols = sorted(jvm.columns)
    a, b = arrow.select(*cols), jvm.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.mark.spark
def test_arrow_1m_no_shuffle_in_plan(spark):
    """The mapInArrow kernel must also be map-only: no Exchange."""
    from tsclust_spark.kernels.rollup_arrow import rollup_sequences_1m_arrow

    seq = read_sequences(spark, "smoke")
    plan = (
        rollup_sequences_1m_arrow(seq)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInArrow" in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            min_size=0,
            max_size=200,
        ),
        min_size=0,
        max_size=8,
    )
)
def test_rollup_flat_property_vs_naive(rows):
    """rollup_1m_flat == a naive per-bucket python oracle, for ANY int32
    input (including empty rows, full-int32 range, ragged tails)."""
    import numpy as np

    from tsclust_spark.kernels.rollup_arrow import rollup_1m_flat

    lengths = np.array([len(r) for r in rows], dtype=np.int64)
    nonempty = [np.array(r, dtype=np.int32) for r in rows if r]
    flat = (
        np.concatenate(nonempty) if nonempty else np.empty(0, dtype=np.int32)
    )
    got = rollup_1m_flat(flat, lengths, per_bucket=60)
    out = {
        (int(r), int(b)): (mi, ma, s, c, rep)
        for r, b, mi, ma, s, c, rep in zip(
            got["row_idx"], got["bucket_idx"], got["min"], got["max"],
            got["sum"], got["count"], got["rep"],
        )
    }
    want = {}
    for ri, row in enumerate(rows):
        for b in range(0, (len(row) + 59) // 60):
            seg = sorted(row[b * 60 : (b + 1) * 60])
            want[(ri, b)] = (
                min(seg), max(seg), sum(seg), len(seg),
                seg[(len(seg) + 1) // 2 - 1],
            )
    assert {k: tuple(int(x) for x in v) for k, v in out.items()} == want
