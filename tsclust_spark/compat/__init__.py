"""Reference-parity Python surface of imartinezl/tsclust.

Reproduces the reference's two implemented entry points
(``add_one`` — reference tsclust/example.py:4,130; ``create_array`` —
reference tsclust/example.py:133-134) and the step-pattern algebra
(reference tsclust/stepattern.py:34-144) with identical observable
behavior, re-written from scratch.

Deliberate divergences from the reference (bugs we do not replicate):
- ``StepPattern`` does not share a mutable default steps list across
  instances (reference tsclust/stepattern.py:79).
- No tables are printed at import time (reference
  tsclust/stepattern.py:140-141).
"""

import numpy as np

from tsclust_spark.compat.stepattern import (  # noqa: F401
    Step,
    StepPattern,
    asymmetric,
    rigid,
    symmetric1,
    symmetric2,
)


def add_one(number):
    """Return ``number + 1``.

    Parity with reference tsclust/example.py:130 (asserted by the
    reference's only unit test, tests/test_simple.py:16-17). The
    reference attaches its full DTW API spec to this stub's docstring
    (example.py:5-129); the real DTW lives in
    :mod:`tsclust_spark.kernels.dtw`.
    """
    return number + 1


def create_array(n):
    """Return ``np.array([n])`` — parity with reference tsclust/example.py:133-134."""
    return np.array([n])
