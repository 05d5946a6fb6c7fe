"""Pairwise feature correlation + redundancy pruning — the step AFTER
IV screening.

A scorecard keeps at most one of each highly-correlated feature pair
(the higher-IV one); computing that k×k correlation matrix with k²
``df.stat.corr`` calls is k² scans. :func:`correlation_matrix` computes
every pairwise-complete Pearson correlation in **ONE scan**:

1. ``mapInPandas`` folds each partition's Arrow batches into four k×k
   Gram partials (pairwise-valid counts N, per-pair sums S, squared sums
   Q, cross products P) with numpy matmuls — nulls are handled by a 0/1
   validity mask, so every pair uses exactly the rows where BOTH columns
   are non-null (the same pairwise-complete semantics as
   :func:`core.stats.pearson_corr` / DuckDB's ``corr``);
2. each partition emits ONE flattened partial row; ``posexplode`` +
   ``groupBy(pos).sum`` reduces the partials distributed (never a
   single-task fold), and only the final 4k²-element vector reaches the
   driver, where the correlation matrix is finished in closed form.

Numerator/denominator use the textbook sufficient-statistics identity
``r = (n·P − Sᵢ·Sⱼ) / √(n·Qᵢ − Sᵢ²) / √(n·Qⱼ − Sⱼ²)`` with the
reference's edge-case guards (/root/reference/src/MOBPY/core/utils.py:
388-438, mirrored in :func:`core.stats.pearson_corr`): fewer than two
pairwise-valid rows, zero variance on either side, or a NaN result all
yield 0.0.

100 TB note: the reduce traffic is ``n_partitions × 4k²`` doubles —
negligible for the designed k (≤ ~500 screened candidates) at any
partition count; for very wide k on the full corpus, screen on a
``hash_sample`` slice first (IV/correlation estimates converge long
before 25G rows) or raise ``spark.sql.files.maxPartitionBytes``. The
operator refuses k > 2048 (the k² driver matrix would stop being "a
small artifact").

:func:`corr_prune` is the driver-side greedy that consumes the matrix:
walk features in descending-IV order, drop any feature whose |corr|
with an already-kept feature exceeds the threshold — k² work on k-row
artifacts, no cluster involvement.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_MAX_COLS = 2048


def _gram_partials(cols: Sequence[str], k: int):
    """Per-partition fold: Arrow batches → one row holding the four k×k
    Gram partials flattened to a single array<double>."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        N = np.zeros((k, k))
        S = np.zeros((k, k))
        Q = np.zeros((k, k))
        P = np.zeros((k, k))
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            X = pdf[list(cols)].to_numpy(dtype=np.float64, na_value=np.nan)
            M = (~np.isnan(X)).astype(np.float64)
            Z = np.nan_to_num(X, nan=0.0, posinf=np.inf, neginf=-np.inf)
            N += M.T @ M
            S += Z.T @ M  # S[i, j] = Σ xᵢ over rows where i AND j valid
            Q += (Z * Z).T @ M
            P += Z.T @ Z
        if seen:
            yield pd.DataFrame(
                {"g": [np.concatenate([N.ravel(), S.ravel(),
                                       Q.ravel(), P.ravel()])]}
            )

    return fn


def correlation_gram(df: DataFrame, cols: Sequence[str]) -> np.ndarray:
    """The reduced (4, k, k) Gram stack [N, S, Q, P] — one scan."""
    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("correlation_matrix: need at least 2 columns")
    if k > _MAX_COLS:
        raise ValueError(
            f"correlation_matrix: {k} columns exceeds the {_MAX_COLS} "
            "driver-matrix bound; screen on fewer candidates"
        )
    src = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    partials = src.mapInPandas(_gram_partials(cols, k), "g array<double>")
    reduced = (
        partials.select(F.posexplode("g").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(4 * k * k)
    for r in reduced:
        flat[r["pos"]] = r["v"]
    return flat.reshape(4, k, k)


def correlation_matrix(
    df: DataFrame,
    cols: Sequence[str],
    *,
    round_to: int = 6,
) -> DataFrame:
    """Upper-triangle pairwise-complete Pearson correlations in ONE scan.

    Returns a small DataFrame (k·(k−1)/2 rows): ``feature_a``,
    ``feature_b`` (in ``cols`` order, a before b), ``n`` pairwise-valid
    rows, ``corr`` rounded to ``round_to`` decimals.
    """
    cols = list(cols)
    k = len(cols)
    N, S, Q, P = correlation_gram(df, cols)
    rows: List[Tuple[str, str, int, float]] = []
    for i in range(k):
        for j in range(i + 1, k):
            n = N[i, j]
            if n < 2:
                c = 0.0
            else:
                num = n * P[i, j] - S[i, j] * S[j, i]
                var_i = n * Q[i, j] - S[i, j] * S[i, j]
                var_j = n * Q[j, i] - S[j, i] * S[j, i]
                if var_i <= 0 or var_j <= 0:
                    c = 0.0
                else:
                    c = float(num / np.sqrt(var_i) / np.sqrt(var_j))
                    if not np.isfinite(c):
                        c = 0.0
                    # fp noise can push |r| a hair past 1
                    c = float(np.clip(c, -1.0, 1.0))
            rows.append((cols[i], cols[j], int(n), round(c, round_to)))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "feature_a string, feature_b string, n long, corr double"
    )


def corr_prune(
    ranked: Sequence[Tuple[str, float]],
    corr: "DataFrame | pd.DataFrame",
    threshold: float = 0.8,
) -> Dict[str, object]:
    """Greedy redundancy prune over driver-side artifacts.

    ``ranked``: (feature, score) pairs, best first (e.g. iv_screen output
    sorted by IV descending — the order IS the priority). ``corr``: the
    :func:`correlation_matrix` output (Spark or pandas). A feature is
    dropped when |corr| with any already-KEPT feature exceeds
    ``threshold``; ties in ``ranked`` order keep the earlier entry.

    Returns ``{"kept": [...], "dropped": [{"feature", "dropped_for",
    "corr"}...]}`` — both in ``ranked`` order.
    """
    if isinstance(corr, DataFrame):
        corr = corr.toPandas()
    cmap: Dict[Tuple[str, str], float] = {}
    for r in corr.itertuples(index=False):
        cmap[(r.feature_a, r.feature_b)] = float(r.corr)
        cmap[(r.feature_b, r.feature_a)] = float(r.corr)
    kept: List[str] = []
    dropped: List[Dict[str, object]] = []
    for feat, _score in ranked:
        hit = None
        for kf in kept:
            c = cmap.get((feat, kf))
            if c is not None and abs(c) > threshold:
                hit = (kf, c)
                break
        if hit is None:
            kept.append(feat)
        else:
            dropped.append(
                {"feature": feat, "dropped_for": hit[0], "corr": hit[1]}
            )
    return {"kept": kept, "dropped": dropped}
