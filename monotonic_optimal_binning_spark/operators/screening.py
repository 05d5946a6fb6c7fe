"""Multi-feature IV screening — the step BEFORE monotone binning.

A scorecard/feature-engineering workflow over hundreds of candidate
features does not fit one :class:`SparkMonotonicBinner` per column: k
separate fits are k full passes over the raw table. ``iv_screen`` ranks
all k features in **at most two passes total, independent of k**:

1. (optional) ONE multi-column ``approxQuantile`` pass derives
   per-feature bucket cut points — Spark computes all k quantile
   sketches in a single scan;
2. ONE aggregation pass: each row explodes into k ``(feature, bucket)``
   pairs (Generate is deliberate — it is also a Catalyst project-collapse
   barrier, so each bucket CASE evaluates once per row), then a single
   ``groupBy(feature, bucket)`` with map-side partial aggregation
   collapses everything to ≤ k·(n_buckets+1) rows before the shuffle.

WoE/IV per bucket then reduces over that tiny aggregate with two more
(k·buckets-row) shuffles — nothing downstream of the first aggregation
ever touches data proportional to the input, so the operator's cost at
100 TB is one scan + one bounded shuffle regardless of feature count.
With ``group_col`` the same single scan screens every feature within
every group (one output row per (group, feature)); the post-aggregate
windows partition on (group, feature) with ≤ n_buckets+1 rows each, so
group skew cannot pin a task.

The smoothed WoE formula matches :func:`core.stats.woe_iv` /
/root/reference/src/MOBPY/core/utils.py:152-237:
``rate = (n + s) / (N + s·k)`` per class, ``woe = ln(g_rate/b_rate)``,
``iv = Σ (g_rate − b_rate)·woe`` — the same arithmetic
``q_fixed_bucket_woe`` cross-checks against DuckDB.

Null feature values land in their own ``bucket = -1`` (missing) group and
contribute to IV like any other bucket, mirroring the reference's
separate missing-bin summary row.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _bucket_expr(col: str, cuts: Sequence[float]) -> Column:
    """0-based bucket index for interior cut points (right-open intervals);
    NULL → -1 (missing bucket). Pure CASE chain — whole-stage codegen."""
    expr = F.lit(len(cuts))  # above the last cut
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(F.col(col) < F.lit(float(cuts[i])), F.lit(i)).otherwise(
            expr
        )
    return F.when(F.col(col).isNull(), F.lit(-1)).otherwise(expr)


def quantile_cuts(
    df: DataFrame,
    features: Sequence[str],
    n_buckets: int = 10,
    relative_error: float = 0.001,
) -> Dict[str, List[float]]:
    """Per-feature interior cut points from ONE multi-column
    ``approxQuantile`` pass (Greenwald-Khanna sketches, all k features in
    a single scan). Duplicate quantiles collapse, so constant-ish
    features yield fewer buckets rather than empty ones."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_q = df.approxQuantile(list(features), probs, relative_error)
    out: Dict[str, List[float]] = {}
    for feat, qs in zip(features, all_q):
        seen: List[float] = []
        for q in qs:
            if not seen or q > seen[-1]:
                seen.append(q)
        out[feat] = seen
    return out


def iv_screen(
    df: DataFrame,
    features: Sequence[str],
    y_col: str,
    *,
    cuts: Optional[Dict[str, Sequence[float]]] = None,
    n_buckets: int = 10,
    smoothing: float = 0.5,
    relative_error: float = 0.001,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Rank k candidate features by Information Value in ≤2 passes.

    Parameters
    ----------
    cuts : explicit interior cut points per feature (deterministic path,
        used by the oracle harness). When omitted, derived by
        :func:`quantile_cuts` in one extra scan. With ``group_col`` the
        cuts are GLOBAL (shared across groups), which keeps per-group IVs
        comparable on the same bucketing.
    y_col : binary target column (castable to int, 1 = "bad").
    group_col : screen every feature within every group of this column
        (e.g. ``source``) in the same single scan; adds the group column
        to the output.

    Returns one row per feature (or per (group, feature)): ``feature``,
    ``n_buckets`` (non-empty, missing bucket included), ``iv``, and
    ``bad_rate_monotone`` — whether the per-bucket bad rate is monotone
    over the NON-missing buckets in cut order (the cheap screen for
    "will a monotone binning fit this feature without heavy merging").
    """
    features = list(features)
    if not features:
        raise ValueError("iv_screen: empty feature list")
    if cuts is None:
        cuts = quantile_cuts(df, features, n_buckets, relative_error)
    missing = [f for f in features if f not in cuts]
    if missing:
        raise ValueError(f"iv_screen: no cuts for features {missing}")

    gcols = [group_col] if group_col else []
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f).alias("feature"),
                    _bucket_expr(f, cuts[f]).alias("bucket"),
                )
                for f in features
            ]
        )
    ).alias("fb")
    y = F.col("__y").cast("long")
    agg = (
        df.select(*gcols, pairs, F.col(y_col).cast("int").alias("__y"))
        .select(*gcols, "fb.feature", "fb.bucket", "__y")
        .groupBy(*gcols, "feature", "bucket")
        .agg(F.count(F.lit(1)).alias("count"), F.sum(y).alias("bads"))
    )

    # everything below runs over ≤ n_groups·k·(n_buckets+1) rows, and every
    # window partition holds ≤ n_buckets+1 of them
    from pyspark.sql import Window

    pkeys = gcols + ["feature"]
    w = Window.partitionBy(*pkeys)
    s = float(smoothing)
    tc = F.sum("count").over(w)
    tb = F.sum("bads").over(w)
    k = F.count(F.lit(1)).over(w)
    goods = F.col("count") - F.col("bads")
    g_rate = (goods + s) / ((tc - tb) + s * k)
    b_rate = (F.col("bads") + s) / (tb + s * k)
    woe = F.log(g_rate / b_rate)
    bad_rate = F.col("bads") / F.col("count")

    wo = Window.partitionBy(*pkeys).orderBy("bucket")
    # bad rate with the missing bucket (-1) nulled out: lag-based steps are
    # then NULL at the missing row AND at the first real bucket (whose lag
    # is the missing row), so monotonicity is judged over real buckets only
    br_nm = F.when(F.col("bucket") < 0, F.lit(None)).otherwise(bad_rate)
    per_bucket = agg.select(
        *pkeys,
        "bucket",
        ((g_rate - b_rate) * woe).alias("iv_term"),
        br_nm.alias("__br"),
    ).withColumn("__br_step", F.col("__br") - F.lag("__br").over(wo))
    return (
        per_bucket.groupBy(*pkeys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.round(F.sum("iv_term"), 6).alias("iv"),
            (
                (F.max("__br_step") <= 1e-12)
                | (F.min("__br_step") >= -1e-12)
                | (F.count("__br_step") == 0)
            ).alias("bad_rate_monotone"),
        )
        .orderBy(*gcols, F.col("iv").desc(), "feature")
    )
