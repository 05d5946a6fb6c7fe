"""Property-based tests (hypothesis) for the pure-Python driver core.

No SparkSession needed: fit_pava / merge_adjacent / Block / woe_iv /
_detect_binary_from_stats are plain functions over sufficient statistics,
so hypothesis can hammer them with thousands of generated inputs in
milliseconds. The reference claims property-based testing in its changelog
but ships none (/root/reference/CHANGELOG.md:29 vs zero hypothesis imports
in /root/reference/tests); this suite makes the claim real for the engine.
"""

from __future__ import annotations

import math
import sys
import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monotonic_optimal_binning_spark.core.blocks import Block
from monotonic_optimal_binning_spark.core.constraints import BinningConstraints
from monotonic_optimal_binning_spark.core.merge import MergeStrategy, merge_adjacent
from monotonic_optimal_binning_spark.core.pava import GroupStats, fit_pava
from monotonic_optimal_binning_spark.core.stats import woe_iv
from monotonic_optimal_binning_spark.operators.binning import (
    _detect_binary_from_stats,
)

EPS = 1e-9


# --------------------------------------------------------------- builders --


def groups_from_values(xs, ys_per_x):
    """Exact GroupStats from raw per-x y-value lists (the ground truth the
    distributed aggregation computes)."""
    out = []
    for x, ys in zip(xs, ys_per_x):
        a = np.asarray(ys, dtype=float)
        out.append(
            GroupStats(
                x=float(x),
                count=len(a),
                sum=float(a.sum()),
                sum2=float((a * a).sum()),
                ymin=float(a.min()),
                ymax=float(a.max()),
            )
        )
    return out


@st.composite
def group_stats_lists(draw, max_groups=30, binary=False):
    n_groups = draw(st.integers(min_value=1, max_value=max_groups))
    xs = sorted(
        draw(
            st.lists(
                st.integers(min_value=-1000, max_value=1000),
                min_size=n_groups,
                max_size=n_groups,
                unique=True,
            )
        )
    )
    if binary:
        val = st.integers(min_value=0, max_value=1)
    else:
        val = st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        )
    ys_per_x = [
        draw(st.lists(val, min_size=1, max_size=8)) for _ in range(n_groups)
    ]
    return groups_from_values(xs, ys_per_x), ys_per_x


# ------------------------------------------------------------------ tests --


@settings(max_examples=200, deadline=None)
@given(group_stats_lists())
def test_pava_blocks_monotone_and_mass_preserving(gs):
    groups, _ = gs
    res = fit_pava(groups, sign="auto", strict=True)
    blocks = res.blocks
    assert blocks, "PAVA must emit at least one block"

    # monotone means in the resolved direction (within epsilon)
    means = [b.mean for b in blocks]
    if res.resolved_sign == "+":
        assert all(means[i + 1] >= means[i] - EPS for i in range(len(means) - 1))
    else:
        assert all(means[i + 1] <= means[i] + EPS for i in range(len(means) - 1))

    # mass conservation: total n / sum / sum2 preserved exactly
    assert sum(b.n for b in blocks) == sum(g.count for g in groups)
    assert math.isclose(
        sum(b.sum for b in blocks), sum(g.sum for g in groups), rel_tol=1e-9, abs_tol=1e-6
    )
    assert math.isclose(
        sum(b.sum2 for b in blocks), sum(g.sum2 for g in groups), rel_tol=1e-9, abs_tol=1e-6
    )

    # full-line contiguous coverage: -inf first left, +inf last right,
    # each right == next left
    assert blocks[0].left == float("-inf")
    assert blocks[-1].right == float("inf")
    for a, b in zip(blocks, blocks[1:]):
        assert a.right == b.left

    # extrema envelope: block min/max bound its mean
    for b in blocks:
        assert b.ymin - EPS <= b.mean <= b.ymax + EPS


@settings(max_examples=150, deadline=None)
@given(group_stats_lists(binary=True), st.sampled_from(list(MergeStrategy)))
def test_merge_respects_structure(gs, strategy):
    groups, _ = gs
    res = fit_pava(groups, sign="auto", strict=True)
    constraints = BinningConstraints(max_bins=4, min_bins=2)
    constraints.resolve(
        total_n=sum(g.count for g in groups),
        total_pos=int(sum(g.sum for g in groups)),
    )
    merged = merge_adjacent(res.blocks, constraints, True, strategy=strategy)

    assert 1 <= len(merged) <= max(4, len(res.blocks))
    # mass conserved through merging
    assert sum(b.n for b in merged) == sum(g.count for g in groups)
    # contiguity preserved
    assert merged[0].left == float("-inf")
    assert merged[-1].right == float("inf")
    for a, b in zip(merged, merged[1:]):
        assert a.right == b.left
    # monotonicity preserved by adjacent pooling (pooling adjacent blocks of
    # a monotone sequence keeps it monotone)
    means = [b.mean for b in merged]
    if res.resolved_sign == "+":
        assert all(means[i + 1] >= means[i] - 1e-6 for i in range(len(means) - 1))
    else:
        assert all(means[i + 1] <= means[i] + 1e-6 for i in range(len(means) - 1))


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=3,
        max_size=3,
    )
)
def test_block_merge_associative(parts):
    def mk(i, nv):
        n, v = nv
        return Block(
            left=float(i), right=float(i + 1), n=n, sum=v * n, sum2=v * v * n,
            ymin=v, ymax=v,
        )

    a, b, c = (mk(i, nv) for i, nv in enumerate(parts))
    ab_c = a.merge_with(b).merge_with(c)
    a_bc = a.merge_with(b.merge_with(c))
    for attr in ("n", "sum", "sum2", "ymin", "ymax", "left", "right"):
        x, y = getattr(ab_c, attr), getattr(a_bc, attr)
        assert math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-9), attr


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_woe_iv_bounds_and_degenerates(cells):
    goods = np.array([g for g, _ in cells], dtype=float)
    bads = np.array([b for _, b in cells], dtype=float)
    comp = woe_iv(goods, bads, smoothing=0.5, return_components=True)
    woe, iv = np.asarray(comp["woe"]), np.asarray(comp["iv"])
    if goods.sum() == 0 or bads.sum() == 0:
        # degenerate: all-good / all-bad => zeros (reference utils.py:205-214)
        assert np.all(woe == 0.0) and np.all(iv == 0.0)
    else:
        assert np.all(np.isfinite(woe))
        # per-bucket iv = (g_rate - b_rate) * ln(g_rate / b_rate) >= 0
        assert np.all(iv >= -1e-12)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from([0.0, 1.0]), min_size=1, max_size=6
        ),
        min_size=1,
        max_size=10,
    )
)
def test_detect_binary_true_on_binary(groups_ys):
    rows = []
    for i, ys in enumerate(groups_ys):
        a = np.asarray(ys)
        rows.append(
            {
                "n_y": len(a),
                "sum_y": float(a.sum()),
                "sum_y2": float((a * a).sum()),
                "ymin": float(a.min()),
                "ymax": float(a.max()),
            }
        )
    is_binary, recode = _detect_binary_from_stats(rows)
    assert is_binary
    assert recode is None  # {0,1} needs no recode


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from([0.0, 0.5, 1.0]), min_size=1, max_size=6
        ),
        min_size=1,
        max_size=10,
    ).filter(lambda gs: any(0.5 in g for g in gs))
)
def test_detect_binary_false_with_interior_value(groups_ys):
    """0.5 values — even when never a group min/max — must defeat detection
    (the two-point moment check is what catches the hidden interior case)."""
    rows = []
    for ys in groups_ys:
        a = np.asarray(ys)
        rows.append(
            {
                "n_y": len(a),
                "sum_y": float(a.sum()),
                "sum_y2": float((a * a).sum()),
                "ymin": float(a.min()),
                "ymax": float(a.max()),
            }
        )
    is_binary, _ = _detect_binary_from_stats(rows)
    assert not is_binary


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=9))
def test_detect_binary_single_value_and_noninteger(v):
    # single integer-like value => binary per reference flexible mode
    rows = [{"n_y": 3, "sum_y": 3.0 * v, "sum_y2": 3.0 * v * v,
             "ymin": float(v), "ymax": float(v)}]
    is_binary, recode = _detect_binary_from_stats(rows)
    assert is_binary and recode is None
    # two non-integer values => not binary (int coercion check)
    rows = [{"n_y": 2, "sum_y": 0.5 + 1.5, "sum_y2": 0.25 + 2.25,
             "ymin": 0.5, "ymax": 1.5}]
    is_binary, _ = _detect_binary_from_stats(rows)
    assert not is_binary
