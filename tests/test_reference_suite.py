"""The reference's own pytest suite, reproduced against the shim
(reference tests/test_simple.py:1-17), plus its commented-out doctests
promoted to assertions (reference tsclust/example.py:84-111)."""

import unittest

import numpy as np

import tsclust_compat as tsclust
from tsclust_compat import example


class TestSimple(unittest.TestCase):
    # reference tests/test_simple.py:15-17, verbatim semantics
    def test_add_one(self):
        self.assertEqual(example.add_one(5), 6)


def test_reference_doctest_chain():
    rng = np.random.RandomState(0)
    s1, s2 = rng.rand(5, 2), rng.rand(6, 2)
    path, sim = example.dtw_path_from_metric(s1, s2, metric="sqeuclidean")
    assert path == [(0, 0), (0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    assert repr(sim).startswith("1.117")


def test_shim_surface():
    assert tsclust.create_array(7).tolist() == [7]
    np.testing.assert_array_equal(
        tsclust.stepattern.symmetric2.to_numpy(),
        np.array([[1, 1, 2], [0, 1, 1], [1, 0, 1]]),
    )
    tsclust.main()  # prints, must not raise
