"""Driver-side Pool-Adjacent-Violators pass over pre-aggregated groups.

Division of labor (SURVEY.md §3.1): the cluster computes the per-unique-x
sufficient statistics with one ``groupBy(x).agg(...)`` (partial+final hash
aggregation — the only pass that touches raw rows); this module consumes the
collected k-row groups table and runs the inherently sequential left-to-right
stack pooling on the driver. k is bounded by distinct-x (or by quantile
pre-binning at scale), so this is microseconds regardless of input row count.

Algorithm semantics match /root/reference/src/MOBPY/core/pava.py:
  - stack pooling with epsilon tolerance (pava.py:358-406)
  - optional strict pass merging equal-mean plateaus (pava.py:408-439)
  - sign='auto' via Pearson corr of x vs group mean (pava.py:296-312)
  - ±inf widening of the extreme edges BEFORE pooling (pava.py:336-339)
  - right edge of each initial block = next group's x (pava.py:319-333)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig
from ..exceptions import DataError, FittingError
from .blocks import Block
from .stats import pearson_corr


@dataclass(frozen=True)
class GroupStats:
    """One row of the pre-binning aggregate: stats of y for one unique x."""

    x: float
    count: int
    sum: float
    sum2: float
    ymin: float
    ymax: float

    @property
    def mean(self) -> float:
        return self.sum / self.count if self.count > 0 else 0.0


@dataclass
class PavaResult:
    blocks: List[Block]
    resolved_sign: str
    n_merges: int
    n_initial_groups: int


def resolve_sign(groups: Sequence[GroupStats], sign: str) -> str:
    """Resolve 'auto' to '+'/'-' via Pearson corr(x, group_mean) >= 0.

    Matches /root/reference/src/MOBPY/core/pava.py:296-312 (corr guards in
    stats.pearson_corr match core/utils.py:388-438).
    """
    if sign in ("+", "-"):
        return sign
    xs = np.array([g.x for g in groups], dtype=float)
    means = np.array([g.mean for g in groups], dtype=float)
    corr = pearson_corr(xs, means)
    return "+" if corr >= 0 else "-"


def build_initial_blocks(groups: Sequence[GroupStats]) -> List[Block]:
    """One block per unique x; right edge = next x; extremes widened to ±inf."""
    blocks: List[Block] = []
    n = len(groups)
    for i, g in enumerate(groups):
        right = groups[i + 1].x if i < n - 1 else g.x
        blocks.append(
            Block(
                left=float(g.x),
                right=float(right),
                # weighted fits pass fractional effective counts through
                n=int(g.count) if float(g.count) == int(g.count) else float(g.count),
                sum=float(g.sum),
                sum2=float(g.sum2),
                ymin=float(g.ymin),
                ymax=float(g.ymax),
            )
        )
    if blocks:
        blocks[0].left = float("-inf")
        blocks[-1].right = float("inf")
    return blocks


def apply_pava(
    blocks: List[Block], sign: str, epsilon: float = DEFAULT_CONFIG.epsilon
) -> tuple[List[Block], int]:
    """Stack-based PAVA pooling; O(k), each block pushed/popped at most once.

    Violation test (reference pava.py:382-393):
      '+': merge while top.mean <  prev.mean - epsilon
      '-': merge while top.mean >  prev.mean + epsilon
    """
    if not blocks:
        return [], 0
    stack: List[Block] = []
    n_merges = 0
    for block in blocks:
        stack.append(block)
        while len(stack) >= 2:
            b2 = stack[-1]
            b1 = stack[-2]
            if sign == "+":
                violates = b2.mean < b1.mean - epsilon
            else:
                violates = b2.mean > b1.mean + epsilon
            if violates:
                merged = b1.merge_with(b2)
                stack.pop()
                stack.pop()
                stack.append(merged)
                n_merges += 1
            else:
                break
    return stack, n_merges


def enforce_strict_monotonicity(
    blocks: List[Block], epsilon: float = DEFAULT_CONFIG.epsilon
) -> tuple[List[Block], int]:
    """Merge adjacent equal-mean blocks (|Δmean| <= epsilon) to kill plateaus.

    Matches /root/reference/src/MOBPY/core/pava.py:408-439. Sign-independent.
    """
    if not blocks:
        return blocks, 0
    result: List[Block] = [blocks[0]]
    n_merges = 0
    for block in blocks[1:]:
        last = result[-1]
        if abs(block.mean - last.mean) <= epsilon:
            result[-1] = last.merge_with(block)
            n_merges += 1
        else:
            result.append(block)
    return result, n_merges


def validate_monotonicity(
    blocks: Sequence[Block], sign: str, tolerance: float = 1e-10
) -> bool:
    """Non-decreasing ('+') / non-increasing ('-') means within tolerance.

    Matches /root/reference/src/MOBPY/core/pava.py:471-508.
    """
    if len(blocks) <= 1:
        return True
    means = [b.mean for b in blocks]
    for i in range(1, len(means)):
        if sign == "+" and means[i] < means[i - 1] - tolerance:
            return False
        if sign == "-" and means[i] > means[i - 1] + tolerance:
            return False
    return True


def fit_pava(
    groups: Sequence[GroupStats],
    sign: str = "auto",
    strict: bool = True,
    config: EngineConfig = DEFAULT_CONFIG,
) -> PavaResult:
    """Full PAVA pass over sorted group statistics.

    ``groups`` must be sorted ascending by x (the Spark side guarantees this
    by collecting ``groupBy(x)`` output ordered by x).
    """
    if not groups:
        raise DataError("No groups provided to PAVA (empty clean partition?)")
    xs = [g.x for g in groups]
    if any(xs[i] >= xs[i + 1] for i in range(len(xs) - 1)):
        raise DataError("PAVA groups must be strictly increasing in x")

    resolved = resolve_sign(groups, sign)
    blocks = build_initial_blocks(groups)
    blocks, merges_pava = apply_pava(blocks, resolved, config.epsilon)
    merges_strict = 0
    if strict and len(blocks) > 1:
        blocks, merges_strict = enforce_strict_monotonicity(blocks, config.epsilon)

    if not validate_monotonicity(blocks, resolved):
        raise FittingError("PAVA failed to produce monotonic blocks")

    return PavaResult(
        blocks=blocks,
        resolved_sign=resolved,
        n_merges=merges_pava + merges_strict,
        n_initial_groups=len(groups),
    )
