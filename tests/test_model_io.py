"""Model save/load round-trip: a persisted FittedBins/GroupedBins must
serve identical assignments without refitting (pure-Python check on
assign_batch — no Spark needed for the round-trip itself)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monotonic_optimal_binning_spark.operators.binning import FittedBins, GroupedBins


def _fit_small(spark):
    from pyspark.sql import functions as F

    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select(
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )
    return SparkMonotonicBinner(
        "x", "y", exclude_values=[1.0],
        constraints=BinningConstraints(max_bins=5, min_bins=3),
    ).fit(df)


def test_fitted_bins_json_roundtrip(spark, tmp_path):
    b = _fit_small(spark)
    model = b.model_
    p = str(tmp_path / "model.json")
    model.save_json(p)
    loaded = FittedBins.load_json(p)

    vals = pd.Series([0.5, 1.0, 7.0, 25.0, 49.9, 50.0, 1e9, np.nan])
    for mode in ("interval", "left", "right", "woe"):
        a = model.assign_batch(vals, mode)
        c = loaded.assign_batch(vals, mode)
        if mode == "interval":
            assert list(a) == list(c)
        else:
            np.testing.assert_allclose(
                a.to_numpy(dtype=float), c.to_numpy(dtype=float), equal_nan=True
            )

    pd.testing.assert_frame_equal(model.bins_df, loaded.bins_df)
    assert list(model.summary_df["bucket"]) == list(loaded.summary_df["bucket"])
    np.testing.assert_allclose(
        model.summary_df["woe"].to_numpy(dtype=float),
        loaded.summary_df["woe"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_grouped_bins_json_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        fit_binners_per_group,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )
    grouped = fit_binners_per_group(
        df, "l_returnflag", "x", "y",
        constraints=BinningConstraints(max_bins=4, min_bins=2),
    )
    p = str(tmp_path / "grouped.json")
    grouped.save_json(p)
    loaded = GroupedBins.load_json(p)

    assert set(loaded.models) == set(grouped.models)
    vals = pd.Series([2.0, 10.0, 30.0, np.nan])
    for g in grouped.models:
        a = grouped[g].assign_batch(vals, "woe")
        c = loaded[g].assign_batch(vals, "woe")
        np.testing.assert_allclose(
            a.to_numpy(dtype=float), c.to_numpy(dtype=float), equal_nan=True
        )

    # loaded model drives the distributed transform identically
    out_a = grouped.transform(df, assign="woe", input_col="x").select("x_woe")
    out_b = loaded.transform(df, assign="woe", input_col="x").select("x_woe")
    assert out_a.collect() == out_b.collect()
