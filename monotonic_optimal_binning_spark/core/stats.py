"""Pure-Python statistical primitives used by the driver-side merge pass.

The reference scores candidate merges with a Welch two-sample t-test whose
two-tailed p-value comes from ``scipy.stats.t.cdf``
(/root/reference/src/MOBPY/core/merge.py:230-284). scipy is not available in
this runtime, and shipping it to executors would be pointless anyway — the
merge pass runs on the driver over at most a few hundred sufficient-statistic
blocks. We therefore implement the Student-t survival function directly via
the regularized incomplete beta function (continued-fraction evaluation,
standard Numerical-Recipes-style algorithm), which agrees with scipy to
~1e-12 over the ranges the merge loop exercises.

Also hosts the WoE/IV math (/root/reference/src/MOBPY/core/utils.py:152-237)
on plain numpy — the bins table is tiny (k rows), so this runs driver-side.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple, Union

import numpy as np

_MAX_CF_ITER = 300
_CF_EPS = 3.0e-15
_FPMIN = 1.0e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_CF_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _CF_EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(x: float, df: float) -> float:
    """CDF of Student's t distribution with ``df`` degrees of freedom."""
    if df <= 0:
        raise ValueError(f"df must be positive, got {df}")
    if math.isnan(x):
        return float("nan")
    if math.isinf(x):
        return 1.0 if x > 0 else 0.0
    ib = betainc_reg(df / 2.0, 0.5, df / (df + x * x))
    if x >= 0:
        return 1.0 - 0.5 * ib
    return 0.5 * ib


def norm_cdf(x: float) -> float:
    """Standard normal CDF (scipy.stats.norm.cdf equivalent)."""
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def welch_two_tailed_pvalue(t_stat: float, df: float) -> float:
    """Two-tailed p-value ``2 * (1 - t.cdf(|t|, df))``.

    Matches /root/reference/src/MOBPY/core/merge.py:278.
    """
    p = 2.0 * (1.0 - t_cdf(abs(t_stat), df))
    return float(min(max(p, 0.0), 1.0))


def woe_iv(
    goods: np.ndarray,
    bads: np.ndarray,
    smoothing: float = 0.5,
    epsilon: float = 1e-12,
    return_components: bool = False,
) -> Union[Tuple[np.ndarray, np.ndarray], Dict[str, np.ndarray]]:
    """Weight of Evidence and Information Value per bin.

    Semantics match /root/reference/src/MOBPY/core/utils.py:152-237:
      good_rate = (g + s) / (G + s*k);  bad_rate = (b + s) / (B + s*k)
      woe = ln(clip(good_rate / bad_rate, eps, 1/eps))
      iv  = (good_rate - bad_rate) * woe
    Degenerate all-good / all-bad targets return zeros.
    """
    goods = np.asarray(goods, dtype=float)
    bads = np.asarray(bads, dtype=float)
    total_goods = goods.sum()
    total_bads = bads.sum()

    if total_goods == 0 or total_bads == 0:
        n_bins = len(goods)
        zeros = np.zeros(n_bins)
        if return_components:
            return {
                "woe": zeros,
                "iv": zeros,
                "good_rate": zeros if total_goods == 0 else goods / total_goods,
                "bad_rate": zeros if total_bads == 0 else bads / total_bads,
            }
        return zeros, zeros

    good_rate = (goods + smoothing) / (total_goods + smoothing * len(goods))
    bad_rate = (bads + smoothing) / (total_bads + smoothing * len(bads))
    woe = np.log(np.clip(good_rate / bad_rate, epsilon, 1.0 / epsilon))
    iv_groups = (good_rate - bad_rate) * woe

    if return_components:
        return {
            "woe": woe,
            "iv": iv_groups,
            "good_rate": good_rate,
            "bad_rate": bad_rate,
            "total_iv": iv_groups.sum(),
        }
    return woe, iv_groups


def pearson_corr(x: np.ndarray, y: np.ndarray) -> float:
    """Pearson correlation with the reference's edge-case guards.

    Matches /root/reference/src/MOBPY/core/utils.py:388-438: pairs with a
    null member are dropped; <2 valid pairs or zero sample-std (ddof=1) in
    either series returns 0.0; a NaN result returns 0.0.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = ~(np.isnan(x) | np.isnan(y))
    xc, yc = x[mask], y[mask]
    if len(xc) < 2:
        return 0.0
    if np.std(xc, ddof=1) == 0 or np.std(yc, ddof=1) == 0:
        return 0.0
    corr = float(np.corrcoef(xc, yc)[0, 1])
    if math.isnan(corr):
        return 0.0
    return corr


def _rank_average_ties(a: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties sharing their mean rank — the same
    ranking pandas uses for Spearman."""
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=float)
    ranks[order] = np.arange(1, len(a) + 1, dtype=float)
    sa = a[order]
    i = 0
    while i < len(sa):
        j = i
        while j + 1 < len(sa) and sa[j + 1] == sa[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    return ranks


def spearman_corr(x: np.ndarray, y: np.ndarray) -> float:
    """Spearman rho: Pearson over average-tie ranks (pandas-compatible)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = ~(np.isnan(x) | np.isnan(y))
    xc, yc = x[mask], y[mask]
    if len(xc) < 2:
        return 0.0
    return pearson_corr(_rank_average_ties(xc), _rank_average_ties(yc))


def kendall_corr(x: np.ndarray, y: np.ndarray) -> float:
    """Kendall tau-b (tie-corrected, pandas-compatible). O(k^2) via numpy
    broadcast — fine for the k-row driver tables this runs on."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = ~(np.isnan(x) | np.isnan(y))
    xc, yc = x[mask], y[mask]
    n = len(xc)
    if n < 2:
        return 0.0
    dx = np.sign(xc[:, None] - xc[None, :])
    dy = np.sign(yc[:, None] - yc[None, :])
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    concordant = float((prod > 0).sum())
    discordant = float((prod < 0).sum())
    n0 = n * (n - 1) / 2.0
    tx = n0 - float((dx[iu] != 0).sum())
    ty = n0 - float((dy[iu] != 0).sum())
    denom = math.sqrt((n0 - tx) * (n0 - ty))
    if denom == 0:
        return 0.0
    tau = (concordant - discordant) / denom
    return 0.0 if math.isnan(tau) else float(tau)


def calculate_correlation(
    x: np.ndarray, y: np.ndarray, method: str = "pearson"
) -> float:
    """Correlation with the reference's utility surface
    (/root/reference/src/MOBPY/core/utils.py:388-438): pearson (default,
    the one PAVA sign resolution uses, core/pava.py:301-304), spearman,
    kendall; all share the drop-null / <2-pairs / zero-variance -> 0.0
    guards."""
    if method == "pearson":
        return pearson_corr(x, y)
    if method == "spearman":
        return spearman_corr(x, y)
    if method == "kendall":
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        mask = ~(np.isnan(x) | np.isnan(y))
        xc, yc = x[mask], y[mask]
        if len(xc) < 2 or np.std(xc, ddof=1) == 0 or np.std(yc, ddof=1) == 0:
            return 0.0
        return kendall_corr(xc, yc)
    raise ValueError(f"Unknown correlation method: {method}")
