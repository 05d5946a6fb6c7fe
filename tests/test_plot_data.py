"""Plot-data layer: the tidy tables the reference's 11 plot functions
consume (SURVEY §2.10), emitted without any rendering dependency."""

import os

import numpy as np
import pandas as pd
import pytest
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


GERMAN_CSV = "/root/reference/data/german_data_credit_cat.csv"


@pytest.mark.skipif(not os.path.exists(GERMAN_CSV),
                    reason="reference data not present")
def test_plot_data_golden_vs_reference_german(spark):
    """Golden plot-data parity on the german-credit fixture: every table
    the engine's plot_data layer emits matches the reference's own plot
    input accessors (MOB_PLOT consumes pava_groups_/pava_blocks_/summary_
    — /root/reference/src/MOBPY/plot/csd_gcm.py:167, mob_plot.py:25,163)
    allclose, labels byte-exact."""
    pdf = pd.read_csv(GERMAN_CSV)
    pdf = pd.DataFrame({
        "x": pdf["Durationinmonth"].astype(float),
        "y": (pdf["default"] - 1).astype(int),
    })

    from MOBPY import BinningConstraints as RefConstraints
    from MOBPY.binning.mob import MonotonicBinner

    ref = MonotonicBinner(
        pdf.copy(), x="x", y="y",
        constraints=RefConstraints(
            min_bins=4, max_bins=6, min_samples=0.05, min_positives=0.01
        ),
    )
    ref.fit()

    eng = SparkMonotonicBinner(
        "x", "y", prebins="exact",
        constraints=BinningConstraints(
            min_bins=4, max_bins=6, min_samples=0.05, min_positives=0.01
        ),
    ).fit(spark.createDataFrame(pdf))

    # --- gcm: CSD points + PAVA blocks (csd_gcm.py plot_gcm inputs) ---
    gcm = PD.gcm_data(eng)
    ref_groups = ref.pava_groups_()
    for col in ("x", "group_mean", "count"):
        np.testing.assert_allclose(
            gcm["groups"][col].to_numpy(float),
            ref_groups[col].to_numpy(float),
            rtol=1e-9, atol=1e-12, err_msg=f"gcm groups {col}",
        )
    ref_blocks = pd.DataFrame(ref.pava_blocks_())
    eng_blocks = gcm["blocks"]
    assert len(eng_blocks) == len(ref_blocks)
    for col in ("left", "right", "n", "mean", "var", "ymin", "ymax"):
        np.testing.assert_allclose(
            eng_blocks[col].to_numpy(float),
            ref_blocks[col].to_numpy(float),
            rtol=1e-9, atol=1e-12, err_msg=f"pava blocks {col}",
        )

    # --- woe bars (mob_plot.py:25 input) ---
    woe = PD.woe_bar_data(eng)
    ref_s = ref.summary_()
    ref_woe = ref_s[~ref_s["bucket"].astype(str).str.contains(
        "Missing|Excluded")].reset_index(drop=True)
    assert list(woe["bucket"]) == list(ref_woe["bucket"])  # byte-exact
    for col in ("woe", "iv", "count", "count_pct"):
        np.testing.assert_allclose(
            woe[col].to_numpy(float), ref_woe[col].to_numpy(float),
            rtol=1e-9, atol=1e-9, err_msg=f"woe_bar {col}",
        )

    # --- event rate / sample distribution (mob_plot.py:163,418) ---
    er = PD.event_rate_data(eng)
    assert list(er["bucket"]) == list(ref_s["bucket"])
    np.testing.assert_allclose(
        er["event_rate"].to_numpy(float),
        ref_s["mean"].to_numpy(float), rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        er["count"].to_numpy(float), ref_s["count"].to_numpy(float)
    )
    dist = PD.sample_distribution_data(eng)
    np.testing.assert_allclose(
        dist["count_pct"].to_numpy(float),
        ref_s["count_pct"].to_numpy(float), rtol=1e-9, atol=1e-9,
    )

    # --- bin boundaries (mob_plot.py:525): interior edges only ---
    bounds = PD.bin_boundary_data(eng)
    ref_bins = ref.bins_()
    ref_edges = [v for v in ref_bins["left"] if np.isfinite(v)]
    np.testing.assert_allclose(bounds["value"].to_numpy(float), ref_edges)
