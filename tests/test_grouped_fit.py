"""Fused per-group fit: one scan must equal N independent fits exactly."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import (
    BinningConstraints,
    SparkMonotonicBinner,
    fit_binners_per_group,
)


def make_grouped_frame(seed=0, n_per=400):
    rng = np.random.default_rng(seed)
    frames = []
    for i, src in enumerate(["web", "books", "code"]):
        x = np.linspace(-2, 3, n_per) + rng.normal(0, 0.15, n_per)
        p = 1.0 / (1.0 + np.exp(-(0.8 + 0.4 * i) * x))
        y = (rng.random(n_per) < p).astype(np.int64)
        frames.append(pd.DataFrame({"src": src, "x": x, "y": y}))
    return pd.concat(frames, ignore_index=True)


def test_fused_equals_independent_fits(spark):
    pdf = make_grouped_frame()
    sdf = spark.createDataFrame(pdf)
    ckw = dict(constraints=BinningConstraints(max_bins=5, min_bins=2),
               prebins="exact")

    grouped = fit_binners_per_group(sdf, "src", "x", "y", **ckw)
    for src in ["web", "books", "code"]:
        solo = SparkMonotonicBinner("x", "y", **ckw).fit(
            sdf.filter(F.col("src") == src)
        )
        fused = grouped[src]
        pd.testing.assert_frame_equal(solo.model_.bins_df, fused.bins_df)
        pd.testing.assert_frame_equal(solo.model_.summary_df, fused.summary_df)
        assert solo.model_.resolved_sign == fused.resolved_sign


def test_grouped_binary_continuous_mix(spark):
    """Groups may independently be binary or continuous; 'web' uses a
    non-{0,1} pair which the reference's binary check rejects
    (/root/reference/src/MOBPY/core/utils.py:119 — only {0,1}-coercible
    pairs count), so it must be treated as continuous in both paths."""
    pdf = make_grouped_frame(seed=5)
    pdf.loc[pdf["src"] == "web", "y"] = pdf.loc[pdf["src"] == "web", "y"].map(
        {0: 3, 1: 9}
    )
    rng = np.random.default_rng(6)
    cont = pdf["src"] == "code"
    pdf.loc[cont, "y"] = pdf.loc[cont, "y"] * 10.0 + rng.normal(0, 1, cont.sum())
    sdf = spark.createDataFrame(pdf.astype({"y": float}))
    ckw = dict(constraints=BinningConstraints(max_bins=5, min_bins=2),
               prebins="exact")

    grouped = fit_binners_per_group(sdf, "src", "x", "y", **ckw)
    assert grouped["books"].is_binary
    assert not grouped["web"].is_binary
    assert not grouped["code"].is_binary
    for src in ["web", "books", "code"]:
        solo = SparkMonotonicBinner("x", "y", **ckw).fit(
            sdf.filter(F.col("src") == src)
        )
        pd.testing.assert_frame_equal(solo.model_.bins_df, grouped[src].bins_df)


def test_grouped_transform_matches_per_model(spark):
    pdf = make_grouped_frame(seed=9)
    sdf = spark.createDataFrame(pdf)
    grouped = fit_binners_per_group(
        sdf, "src", "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=2)
    )
    out = (
        grouped.transform(sdf, assign="woe", input_col="x", group_col="src")
        .toPandas()
        .sort_values(["src", "x"])
        .reset_index(drop=True)
    )
    for src in ["web", "books", "code"]:
        model = grouped[src]
        sub = out[out["src"] == src]
        expected = model.assign_batch(sub["x"], "woe")
        np.testing.assert_allclose(
            sub["x_woe"].to_numpy(), expected.to_numpy(), rtol=1e-12
        )
    # interval mode too
    out2 = grouped.transform(sdf, assign="interval", input_col="x", group_col="src")
    assert out2.filter(F.col("x_interval").isNull()).count() == 0


def test_grouped_fit_scan_count(spark):
    """The fused fit's Spark-job count must not scale with group count
    (binary-detect + stats agg, each a couple of jobs — never one per
    group). 3 groups here; a per-group implementation would need ~3x."""
    pdf = make_grouped_frame(seed=11)
    sdf = spark.createDataFrame(pdf)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    fit_binners_per_group(
        sdf, "src", "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=2)
    )
    after = len(tracker.getJobIdsForGroup() or [])
    # auto mode on this high-cardinality frame runs: exact-agg count,
    # approxQuantile probe, re-bucket collect + M/E collect off the cache
    # (plus AQE sub-jobs) — a CONSTANT, group-count-independent number.
    # A per-group implementation would add ~3 jobs per extra group.
    assert after - before <= 10, f"too many Spark jobs: {after - before}"


def test_numeric_transform_codegen_equals_pandas_udf(spark):
    """r8: the numeric assign modes compile to a JVM when-chain; it must
    be value-identical (NaN-for-NaN) to the pandas-UDF assign_batch path
    on nulls, NaNs, excluded values, bin edges, ±inf, unseen groups and
    non-binary groups."""
    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
        fit_binners_per_group,
    )
    from monotonic_optimal_binning_spark.operators.binning import FittedBins

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 600),
            "x": rng.normal(10, 4, 600).round(1),
            "y": rng.integers(0, 2, 600),
        }
    )
    # group 'c' gets a continuous target -> non-binary under woe
    pdf.loc[pdf["g"] == "c", "y"] = rng.normal(size=(pdf["g"] == "c").sum())
    probe = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "zzz", None, "c", "a"],
            "x": [None, float("nan"), float("inf"), float("-inf"),
                  7.0, 5.0, 5.0, 5.0, 99.0],
        }
    )
    full = pd.concat(
        [pdf[["g", "x"]], probe], ignore_index=True
    )
    sdf = spark.createDataFrame(full)

    gb = fit_binners_per_group(
        spark.createDataFrame(pdf), "g", "x", "y",
        constraints=BinningConstraints(max_bins=5, min_bins=2),
    )
    # also hit a model's exact bin edges
    edges = [float(r) for r in gb["a"].rights[:-1]]
    sdf = sdf.union(
        spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * len(edges), "x": edges})
        )
    )

    for mode in ("woe", "left", "right"):
        fast = gb.transform(sdf, assign=mode, input_col="x",
                            output_col="o").select("g", "x", "o")
        plan = fast._jdf.queryExecution().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        # force the UDF path by lowering the codegen guard
        orig = FittedBins.CODEGEN_MAX_BINS
        try:
            FittedBins.CODEGEN_MAX_BINS = 0
            slow = gb.transform(sdf, assign=mode, input_col="x",
                                output_col="o").select("g", "x", "o")
        finally:
            FittedBins.CODEGEN_MAX_BINS = orig
        a = fast.toPandas().sort_values(["g", "x"]).reset_index(drop=True)
        b = slow.toPandas().sort_values(["g", "x"]).reset_index(drop=True)
        np.testing.assert_array_equal(
            a["o"].to_numpy(float), b["o"].to_numpy(float)
        )

    # single-model path with excluded values, same contract
    bx = SparkMonotonicBinner(
        "x", "y", exclude_values=[7.0],
        constraints=BinningConstraints(max_bins=5, min_bins=2),
    ).fit(spark.createDataFrame(pdf[pdf["g"] != "c"][["x", "y"]]))
    sx = spark.createDataFrame(full[["x"]])
    for mode in ("woe", "left", "right"):
        fast = bx.model_.transform(sx, assign=mode, output_col="o")
        plan = fast._jdf.queryExecution().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        orig = FittedBins.CODEGEN_MAX_BINS
        try:
            FittedBins.CODEGEN_MAX_BINS = 0
            slow = bx.model_.transform(sx, assign=mode, output_col="o")
        finally:
            FittedBins.CODEGEN_MAX_BINS = orig
        a = fast.toPandas().sort_values(["x"]).reset_index(drop=True)
        b = slow.toPandas().sort_values(["x"]).reset_index(drop=True)
        np.testing.assert_array_equal(
            a["o"].to_numpy(float), b["o"].to_numpy(float)
        )
