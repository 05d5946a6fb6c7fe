"""Sufficient-statistic block: the unit of the driver-side binning algorithm.

A block summarizes a contiguous x-range by algebraic aggregates
``(n, sum, sum2, ymin, ymax)``. Merging two blocks is O(1) and associative —
the same property Catalyst's partial+final hash aggregation exploits, which
is why the Spark side can compute candidate blocks fully distributed and the
driver only ever touches k-row summaries.

Semantics match the reference's ``_Block``/``Block``
(/root/reference/src/MOBPY/core/pava.py:26-137,
 /root/reference/src/MOBPY/core/merge.py:34-176), including the exact
variance formula and non-negativity clamp required for allclose parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict


@dataclass
class Block:
    """Half-open interval [left, right) with pooled y statistics."""

    left: float
    right: float
    n: int
    sum: float
    sum2: float
    ymin: float
    ymax: float

    @property
    def mean(self) -> float:
        return self.sum / self.n if self.n > 0 else 0.0

    @property
    def var(self) -> float:
        """Unbiased sample variance from pooled sums, clamped non-negative.

        var = max(0, (sum2/n - (sum/n)^2) * n / (n-1))
        (reference: core/pava.py:73-82 and core/merge.py:86-95 — both use
        this exact expression; the clamp absorbs catastrophic cancellation.)
        """
        if self.n <= 1:
            return 0.0
        mean_of_sq = self.sum2 / self.n
        mean_sq = (self.sum / self.n) ** 2
        return max(0.0, (mean_of_sq - mean_sq) * self.n / (self.n - 1))

    @property
    def std(self) -> float:
        return math.sqrt(self.var)

    def merge_with(self, other: "Block") -> "Block":
        """Pool statistics with an adjacent right-neighbor block (O(1))."""
        return Block(
            left=self.left,
            right=other.right,
            n=self.n + other.n,
            sum=self.sum + other.sum,
            sum2=self.sum2 + other.sum2,
            ymin=min(self.ymin, other.ymin),
            ymax=max(self.ymax, other.ymax),
        )

    def as_dict(self) -> Dict[str, Any]:
        n = float(self.n)
        return {
            "left": float(self.left),
            "right": float(self.right),
            # weighted fits carry fractional effective counts; integral
            # counts stay ints so unweighted history snapshots are unchanged
            "n": int(n) if n == int(n) else n,
            "sum": float(self.sum),
            "sum2": float(self.sum2),
            "ymin": float(self.ymin),
            "ymax": float(self.ymax),
            "mean": float(self.mean),
            "var": float(self.var),
            "std": float(self.std),
        }
