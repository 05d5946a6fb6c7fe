"""Plot-data layer: the tidy tables the reference's 11 plot functions
consume (SURVEY §2.10), emitted without any rendering dependency."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import BinningConstraints, SparkMonotonicBinner
from monotonic_optimal_binning_spark import plot_data as PD


def _fit(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 50).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < F.col("id") % 50 + 20).cast("int").alias("y"),
    )
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=3)
    ).fit(df)
    return b, df


def test_plot_data_tables(spark):
    b, df = _fit(spark)

    g = PD.gcm_data(b)
    assert set(g["groups"].columns) == {"x", "group_mean", "count"}
    assert len(g["groups"]) == 50
    assert (g["groups"]["group_mean"].between(0, 1)).all()
    blocks = g["blocks"]
    # PAVA blocks are monotone in mean and tile the full line
    assert blocks["mean"].is_monotonic_increasing or blocks["mean"].is_monotonic_decreasing
    assert blocks["left"].iloc[0] == -np.inf and blocks["right"].iloc[-1] == np.inf
    assert (blocks["right"].iloc[:-1].to_numpy() == blocks["left"].iloc[1:].to_numpy()).all()

    anim = PD.merge_animation_data(b)
    if len(anim):
        assert set(anim.columns) == {"iteration", "left", "right", "n", "mean"}

    woe = PD.woe_bar_data(b)
    assert "woe" in woe.columns and len(woe) == len(b.bins_())
    er = PD.event_rate_data(b)
    assert "event_rate" in er.columns
    dist = PD.sample_distribution_data(b)
    assert abs(dist.loc[~dist["bucket"].str.contains("Missing|Excluded"),
                        "count"].sum() - 20_000) < 1

    bounds = PD.bin_boundary_data(b)
    assert (bounds["value"].to_numpy() == np.array(
        [v for v in b.model_.lefts if np.isfinite(v)])).all()

    stab = PD.binning_stability_data(b, df)
    assert {"bucket", "train_pct", "test_pct", "test_event_rate"} <= set(stab.columns)
    # identical train/test frame -> identical distribution
    np.testing.assert_allclose(
        stab["train_pct"].to_numpy(), stab["test_pct"].to_numpy(), atol=1e-9
    )
    np.testing.assert_allclose(stab["train_pct"].sum(), 100.0)


def test_stability_data_nulls_dont_fake_shift(spark):
    """An identical population with 20% null x must show train_pct ==
    test_pct (Missing rows leave both numerator and denominator)."""
    b, df = _fit(spark)
    with_nulls = df.select(
        F.when(F.pmod(F.monotonically_increasing_id(), F.lit(5)) != 0,
               F.col("x")).alias("x"),
        "y",
    )
    stab = PD.binning_stability_data(b, with_nulls)
    np.testing.assert_allclose(
        stab["train_pct"].to_numpy(), stab["test_pct"].to_numpy(), atol=1.5
    )
    np.testing.assert_allclose(stab["test_pct"].sum(), 100.0)
