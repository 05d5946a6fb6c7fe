"""Plot-data layer: the tidy tables the reference's 11 plot functions
consume (SURVEY.md §2.10), without any rendering dependency.

The reference's plotting module (/root/reference/src/MOBPY/plot/
__init__.py:45-60) draws matplotlib figures from a handful of small data
shapes — group means + PAVA blocks (csd_gcm.py:167 plot_gcm, :344
plot_pava_process, :549 plot_pava_animation, :595 plot_pava_comparison),
the fitted summary table (mob_plot.py:25 plot_woe_bars, :163
plot_event_rate, :319 plot_bin_statistics, :418 plot_sample_distribution),
cut points (:525 plot_bin_boundaries), and train-vs-test per-bin
comparisons (:691 plot_binning_stability). matplotlib is not available in
this engine's runtime (and rendering is out of engine scope), so this
module emits exactly those DATA tables as pandas frames — every plot the
reference can draw is reproducible from them with any charting library.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd


def gcm_data(binner) -> Dict[str, pd.DataFrame]:
    """Inputs of plot_gcm / plot_pava_comparison (csd_gcm.py:167,595):
    ``groups`` (x, group_mean, count — the cumulative-sum-diagram points)
    and ``blocks`` (the PAVA greatest-convex-minorant step function as
    [left, right) intervals with pooled means). Thin views over the
    public ``pava_groups_()`` / ``pava_blocks_()`` accessors — the pooled
    mean/var definitions live in ONE place (core/blocks.py Block)."""
    groups = binner.pava_groups_()[["x", "group_mean", "count"]]
    return {"groups": groups, "blocks": pava_blocks_data(binner)}


def pava_blocks_data(binner) -> pd.DataFrame:
    """The PAVA fit's pooled blocks (csd_gcm.py:344 plot_pava_process
    input): one row per monotone block BEFORE statistical merging.
    Raises NotFittedError before fit (same contract as every accessor)."""
    return pd.DataFrame(binner.pava_blocks_())[
        ["left", "right", "n", "mean", "var", "ymin", "ymax"]
    ]


def merge_animation_data(binner) -> pd.DataFrame:
    """Long-format per-iteration block snapshots (csd_gcm.py:549
    plot_pava_animation frames): (iteration, left, right, n, mean) — one
    frame per greedy-merge step, from the fit's ``merge_history_``."""
    rows: List[Dict[str, Any]] = []
    for it, snap in enumerate(getattr(binner, "merge_history_", []) or []):
        for b in snap:
            rows.append(
                {"iteration": it, "left": b["left"], "right": b["right"],
                 "n": b["n"], "mean": b["mean"]}
            )
    return pd.DataFrame(rows, columns=["iteration", "left", "right", "n", "mean"])


def woe_bar_data(binner) -> pd.DataFrame:
    """plot_woe_bars input (mob_plot.py:25): bucket, woe, iv, count_pct
    for the fitted (non-special) bins. Raises for a non-binary target —
    there is no WoE to plot (same contract as transform(assign='woe'))."""
    s = binner.summary_()
    if "woe" not in s.columns:
        raise ValueError(
            "WoE bars require a binary target (no woe column in summary)"
        )
    mask = ~s["bucket"].astype(str).str.contains("Missing|Excluded")
    cols = [c for c in ("bucket", "woe", "iv", "count", "count_pct") if c in s.columns]
    return s.loc[mask, cols].reset_index(drop=True)


def event_rate_data(binner) -> pd.DataFrame:
    """plot_event_rate input (mob_plot.py:163): bucket, event rate (bin
    mean), count, count_pct — including the Missing/Excluded rows."""
    s = binner.summary_()
    cols = [c for c in ("bucket", "mean", "count", "count_pct") if c in s.columns]
    out = s[cols].rename(columns={"mean": "event_rate"})
    return out.reset_index(drop=True)


def sample_distribution_data(binner) -> pd.DataFrame:
    """plot_sample_distribution input (mob_plot.py:418): bucket, count,
    count_pct."""
    s = binner.summary_()
    cols = [c for c in ("bucket", "count", "count_pct") if c in s.columns]
    return s[cols].reset_index(drop=True)


def bin_boundary_data(binner) -> pd.DataFrame:
    """plot_bin_boundaries input (mob_plot.py:525): the fitted cut points
    as (boundary index, value) — interior edges only (±inf are the
    full-line endpoints, not drawable boundaries)."""
    import math

    m = binner.model_
    if m is None:
        raise ValueError("fit the binner first")
    edges = [v for v in m.lefts if math.isfinite(v)]
    return pd.DataFrame({"boundary": range(len(edges)), "value": edges})


def binning_stability_data(
    binner, test_df, *, input_col: Optional[str] = None
) -> pd.DataFrame:
    """plot_binning_stability input (mob_plot.py:691): per-bin train
    vs test sample fractions + test event rate, computed DISTRIBUTED over
    the (possibly huge) test DataFrame — one small aggregate, not a
    collected Series like the reference."""
    from pyspark.sql import functions as F

    s = binner.summary_()
    mask = ~s["bucket"].astype(str).str.contains("Missing|Excluded")
    train = s.loc[mask, ["bucket", "count"]].rename(
        columns={"count": "train_count"}
    )
    train["train_pct"] = train["train_count"] / train["train_count"].sum() * 100

    labeled = binner.transform(
        test_df, assign="interval",
        input_col=input_col or binner.x, output_col="__bucket",
    )
    # compare non-special bins on BOTH sides: train_pct is computed over
    # fitted bins only, so Missing/Excluded labels must leave the test
    # denominator too or an identical population with nulls would show a
    # uniform fake shift
    labeled = labeled.filter(
        F.col("__bucket").isNotNull()
        & ~F.col("__bucket").rlike("Missing|Excluded")
    )
    agg = labeled.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("test_count"),
        F.avg(F.col(binner.y).cast("double")).alias("test_event_rate"),
    )
    test = agg.toPandas().rename(columns={"__bucket": "bucket"})
    test["test_pct"] = test["test_count"] / test["test_count"].sum() * 100
    return train.merge(test, on="bucket", how="left").reset_index(drop=True)
