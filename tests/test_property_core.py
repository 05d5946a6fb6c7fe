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


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_pearson_matches_pandas(pairs):
    """calculate_correlation('pearson') reproduces pandas' corr (the
    reference's backend, /root/reference/src/MOBPY/core/utils.py:420-425)
    including the zero-variance/NaN -> 0.0 guards. (pandas delegates
    spearman/kendall to scipy, which this runtime lacks — those get exact
    hand-computed spot checks below instead.)"""
    import pandas as pd

    from monotonic_optimal_binning_spark.core.stats import calculate_correlation

    x = pd.Series([float(a) for a, _ in pairs])
    y = pd.Series([float(b) for _, b in pairs])
    ours = calculate_correlation(x.to_numpy(), y.to_numpy(), method="pearson")
    if x.std() == 0 or y.std() == 0:
        assert ours == 0.0
        return
    theirs = x.corr(y, method="pearson")
    theirs = 0.0 if (theirs != theirs) else float(theirs)
    assert math.isclose(ours, theirs, rel_tol=1e-9, abs_tol=1e-9)


def test_spearman_kendall_exact_values():
    from monotonic_optimal_binning_spark.core.stats import (
        calculate_correlation,
        kendall_corr,
        spearman_corr,
    )

    # perfect monotone (nonlinear) relations
    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert spearman_corr(x, x**3) == pytest.approx(1.0)
    assert kendall_corr(x, -(x**3)) == pytest.approx(-1.0)

    # one swap: spearman 0.8, kendall tau 2/3 (hand-computed)
    y = np.array([1.0, 3.0, 2.0, 4.0])
    assert spearman_corr(x, y) == pytest.approx(0.8)
    assert kendall_corr(x, y) == pytest.approx(2.0 / 3.0)

    # ties on both sides: spearman 3.75/4.5, tau-b 4/5 (hand-computed)
    xt = np.array([1.0, 1.0, 2.0, 3.0])
    yt = np.array([1.0, 2.0, 2.0, 3.0])
    assert spearman_corr(xt, yt) == pytest.approx(3.75 / 4.5)
    assert kendall_corr(xt, yt) == pytest.approx(0.8)

    # guards: <2 pairs and zero variance -> 0.0
    assert calculate_correlation(np.array([1.0]), np.array([2.0]), "spearman") == 0.0
    assert calculate_correlation(
        np.array([1.0, 1.0, 1.0]), np.array([1.0, 2.0, 3.0]), "kendall"
    ) == 0.0
    with pytest.raises(ValueError):
        calculate_correlation(x, y, "nope")


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-8, max_value=8),
            st.integers(min_value=-8, max_value=8),
        ),
        min_size=2,
        max_size=25,
    )
)
def test_kendall_matches_bruteforce(pairs):
    """tau-b against an independent O(n^2) pure-Python reference."""
    from monotonic_optimal_binning_spark.core.stats import kendall_corr

    x = [float(a) for a, _ in pairs]
    y = [float(b) for _, b in pairs]
    n = len(x)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (x[i] > x[j]) - (x[i] < x[j])
            sy = (y[i] > y[j]) - (y[i] < y[j])
            if sx == 0 and sy == 0:
                tx += 1
                ty += 1
            elif sx == 0:
                tx += 1
            elif sy == 0:
                ty += 1
            elif sx == sy:
                conc += 1
            else:
                disc += 1
    n0 = n * (n - 1) / 2.0
    denom = math.sqrt((n0 - tx) * (n0 - ty))
    expected = 0.0 if denom == 0 else (conc - disc) / denom
    assert kendall_corr(np.array(x), np.array(y)) == pytest.approx(expected, abs=1e-12)


# ------------------------------------------------- weighted-solve property --


@st.composite
def weighted_group_table(draw):
    """Per-x y-value lists with positive integer weights per value."""
    k = draw(st.integers(min_value=2, max_value=8))
    xs = sorted(
        draw(
            st.lists(
                st.integers(min_value=-50, max_value=50),
                min_size=k, max_size=k, unique=True,
            )
        )
    )
    ys, ws = [], []
    for _ in xs:
        m = draw(st.integers(min_value=1, max_value=4))
        ys.append(draw(st.lists(
            st.integers(min_value=0, max_value=1), min_size=m, max_size=m
        )))
        ws.append(draw(st.lists(
            st.integers(min_value=1, max_value=3), min_size=m, max_size=m
        )))
    return xs, ys, ws


@given(weighted_group_table())
@settings(max_examples=200, deadline=None)
def test_weighted_stats_solve_equals_replication(table):
    """PAVA + merge over WEIGHTED sufficient statistics equals the solve
    over the k-fold replicated raw values — the core-level twin of the
    Spark-side replication tests, across thousands of generated shapes."""
    xs, ys, ws = table

    def _groups(weighted):
        out = []
        for x, yv, wv in zip(xs, ys, ws):
            y = np.asarray(yv, dtype=float)
            w = np.asarray(wv, dtype=float)
            if weighted:
                n = float(w.sum())
                out.append(GroupStats(
                    x=float(x), count=int(n) if n == int(n) else n,
                    sum=float((w * y).sum()), sum2=float((w * y * y).sum()),
                    ymin=float(y.min()), ymax=float(y.max()),
                ))
            else:
                rep = np.repeat(y, wv)
                out.append(GroupStats(
                    x=float(x), count=len(rep), sum=float(rep.sum()),
                    sum2=float((rep * rep).sum()),
                    ymin=float(rep.min()), ymax=float(rep.max()),
                ))
        return out

    cons_a = BinningConstraints(max_bins=4, min_bins=2)
    cons_b = BinningConstraints(max_bins=4, min_bins=2)
    pava_w = fit_pava(_groups(True), sign="auto", strict=True)
    pava_r = fit_pava(_groups(False), sign="auto", strict=True)
    total = sum(int(sum(w)) for w in ws)
    pos = sum(int(np.dot(w, y)) for w, y in zip(ws, ys))
    cons_a.resolve(total_n=total, total_pos=pos)
    cons_b.resolve(total_n=total, total_pos=pos)
    merged_w = merge_adjacent(pava_w.blocks, cons_a, True)
    merged_r = merge_adjacent(pava_r.blocks, cons_b, True)
    assert pava_w.resolved_sign == pava_r.resolved_sign
    assert len(merged_w) == len(merged_r)
    for a, b in zip(merged_w, merged_r):
        assert a.left == b.left and a.right == b.right
        assert float(a.n) == pytest.approx(float(b.n))
        assert a.sum == pytest.approx(b.sum)
        assert a.sum2 == pytest.approx(b.sum2)
