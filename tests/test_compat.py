"""Reference pytest/doctest parity (SURVEY.md §5.2 item 1, FIXTURES.md §2)."""

import numpy as np

from tsclust_spark.compat import (
    Step,
    StepPattern,
    add_one,
    asymmetric,
    create_array,
    rigid,
    symmetric1,
    symmetric2,
)


def test_add_one():
    # reference tests/test_simple.py:16-17
    assert add_one(5) == 6


def test_create_array():
    # reference tsclust/example.py:133-134
    out = create_array(7)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.array([7]))


def test_step_to_numpy():
    # reference tsclust/stepattern.py:71-72
    np.testing.assert_array_equal(Step(1, 2, 3).to_numpy(), np.array([1, 2, 3]))


def test_pattern_constants():
    # reference tsclust/stepattern.py:130-144 values, verbatim
    np.testing.assert_array_equal(
        symmetric1.to_numpy(), np.array([[1, 1, 1], [0, 1, 1], [1, 0, 1]])
    )
    assert symmetric1.norm == "NA"
    np.testing.assert_array_equal(
        symmetric2.to_numpy(), np.array([[1, 1, 2], [0, 1, 1], [1, 0, 1]])
    )
    assert symmetric2.norm == "N+M"
    np.testing.assert_array_equal(
        asymmetric.to_numpy(), np.array([[1, 0, 1], [1, 1, 1], [1, 2, 1]])
    )
    assert asymmetric.norm == "N"
    np.testing.assert_array_equal(rigid.to_numpy(), np.array([[1, 1, 1]]))
    assert rigid.norm == "N"


def test_pattern_shapes():
    for p, shape in [
        (symmetric1, (3, 3)),
        (symmetric2, (3, 3)),
        (asymmetric, (3, 3)),
        (rigid, (1, 3)),
    ]:
        assert p.to_numpy().shape == shape


def test_no_shared_default_steps():
    # the reference's mutable-default bug (stepattern.py:79) must NOT exist
    a = StepPattern("a")
    b = StepPattern("b")
    a.add_step(Step(1, 1, 1))
    assert len(b.steps) == 0


def test_add_del_step():
    p = StepPattern("p")
    s = Step(1, 1, 1)
    p.add_step(s)
    assert p.steps == [s]
    p.del_step(s)
    assert p.steps == []


def test_str_contains_header():
    out = str(symmetric2)
    assert "StepPattern: symmetric2" in out
    assert "Normalization: N+M" in out
