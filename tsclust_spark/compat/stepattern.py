"""DTW step-pattern algebra — semantics of reference tsclust/stepattern.py.

A :class:`Step` is one admissible DP move ``(dx, dy, cost)``: consume
``dx`` columns of series 2 and ``dy`` rows of series 1, weighting the
local distance by ``cost`` (reference stepattern.py:34-72). A
:class:`StepPattern` is a named bag of steps plus a normalization tag
``norm in {"NA", "N", "N+M"}`` (reference stepattern.py:78-125,133-144).

``StepPattern.to_numpy()`` yields the ``(n_steps, 3)`` float array that
is the kernel ABI — it is broadcast into the vectorized DTW kernel
(:mod:`tsclust_spark.kernels.dtw`) exactly as the reference intended for
its (never-used) numba kernel (reference stepattern.py:24-31,124-125).

Re-written from scratch as dataclasses; values of the four canonical
patterns are bit-identical to reference stepattern.py:130-144.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

VALID_NORMS = ("NA", "N", "N+M")


@dataclass
class Step:
    """One admissible DP move. Parity: reference stepattern.py:34-72."""

    dx: int
    dy: int
    cost: int

    def __post_init__(self) -> None:
        self.dx = int(self.dx)
        self.dy = int(self.dy)
        self.cost = int(self.cost)

    def to_numpy(self) -> np.ndarray:
        """``[dx, dy, cost]`` — parity: reference stepattern.py:71-72."""
        return np.array([self.dx, self.dy, self.cost])


@dataclass
class StepPattern:
    """Named bag of steps + normalization tag. Parity: reference stepattern.py:78-125.

    Unlike the reference (stepattern.py:79), the default steps list is
    per-instance, not shared.
    """

    name: str
    steps: list[Step] = field(default_factory=list)
    norm: str = "NA"

    def __post_init__(self) -> None:
        if self.norm not in VALID_NORMS:
            raise ValueError(f"norm must be one of {VALID_NORMS}, got {self.norm!r}")

    def add_step(self, step: Step) -> None:
        self.steps.append(step)

    def del_step(self, step: Step) -> None:
        self.steps.remove(step)

    def __str__(self) -> str:
        # Byte-identical to the reference's tabulate(tablefmt="github",
        # showindex="always") rendering (reference stepattern.py:114-122)
        # without the tabulate dependency: per-column width =
        # max(header, cells) + 2 (tabulate MIN_PADDING), numeric columns
        # right-aligned, separator dashes = width + 2.
        headers = ["Step", "dX", "dY", "Cost"]
        rows = [
            [str(i), str(s.dx), str(s.dy), str(s.cost)]
            for i, s in enumerate(self.steps)
        ]
        widths = [
            max(len(h), *(len(r[c]) for r in rows)) + 2 if rows else len(h) + 2
            for c, h in enumerate(headers)
        ]
        def line(cells):
            return "|" + "|".join(
                f" {cell.rjust(w)} " for cell, w in zip(cells, widths)
            ) + "|"
        out = [
            f"StepPattern: {self.name}",
            f"Normalization: {self.norm}",
            line(headers),
            "|" + "|".join("-" * (w + 2) for w in widths) + "|",
        ]
        out.extend(line(r) for r in rows)
        return "\n".join(out)

    def to_numpy(self) -> np.ndarray:
        """``(n_steps, 3)`` float array — the jit/UDF kernel encoding.

        Parity: reference stepattern.py:124-125.
        """
        return np.stack([s.to_numpy() for s in self.steps])

    def normalize(self, cumulative_cost: float, n: int, m: int) -> float:
        """Apply the pattern's normalization to a final cumulative cost.

        ``N`` divides by len(s1); ``N+M`` by len(s1)+len(s2); ``NA`` is
        identity (reference stepattern.py:79,133-144 norm tags).
        """
        if self.norm == "N":
            return cumulative_cost / n
        if self.norm == "N+M":
            return cumulative_cost / (n + m)
        return cumulative_cost


# Canonical patterns — values identical to reference stepattern.py:130-144.
# White-Neely quasi-symmetric (the default).
symmetric1 = StepPattern("symmetric1", [Step(1, 1, 1), Step(0, 1, 1), Step(1, 0, 1)])
# Normal symmetric: diagonal move weighted 2, normalized by N+M.
symmetric2 = StepPattern(
    "symmetric2", [Step(1, 1, 2), Step(0, 1, 1), Step(1, 0, 1)], "N+M"
)
# Classic asymmetric: max slope 2, min slope 0, normalized by N.
asymmetric = StepPattern(
    "asymmetric", [Step(1, 0, 1), Step(1, 1, 1), Step(1, 2, 1)], "N"
)
# Fixed slope 1 (open-begin/open-end use), normalized by N.
rigid = StepPattern("rigid", [Step(1, 1, 1)], "N")

PATTERNS: dict[str, StepPattern] = {
    "symmetric1": symmetric1,
    "symmetric2": symmetric2,
    "asymmetric": asymmetric,
    "rigid": rigid,
}
