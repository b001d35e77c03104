"""Connected components over dup-pair graphs.

The driver gate (`dedup_groups_cc`) checks the full MinHash->CC pipeline
against a recursive-CTE oracle; these tests hit the shapes the gate's
near-clique dup graph can't produce: long chains (worst-case diameter),
stars, multi-component forests, and self/duplicate edges.
"""

import pytest

from tsclust_spark.operators.dedup import connected_components


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = connected_components(edges, **kw)
    return {r.node: r.component_id for r in out.collect()}


@pytest.mark.spark
def test_chain_collapses_to_min(spark):
    # path 0-1-2-...-9: diameter 9, pointer jumping must still converge
    # within the iteration budget and label everything 0
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


@pytest.mark.spark
def test_multiple_components_and_star(spark):
    pairs = [
        (5, 1), (5, 2), (5, 3),          # star, min=1
        (10, 11), (11, 12),              # chain, min=10
        (20, 21),                        # pair, min=20
    ]
    got = _cc(spark, pairs)
    assert got == {5: 1, 1: 1, 2: 1, 3: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


@pytest.mark.spark
def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.spark
def test_bridged_cliques(spark):
    # two cliques joined by one bridge edge -> single component
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    got = _cc(spark, a + b + [(3, 10)])
    assert set(got.values()) == {0}


@pytest.mark.spark
def test_long_chain_log_rounds(spark):
    # 64-node path: plain min-propagation needs ~63 rounds; propagation
    # fused with pointer jumping must finish within max_iter=10
    got = _cc(spark, [(i, i + 1) for i in range(63)], max_iter=10)
    assert got == {i: 0 for i in range(64)}
