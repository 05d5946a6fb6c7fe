"""Model-shift analysis: woe_shift_table interval algebra and the
one-scan transform_churn promotion metrics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import FittedBins
from monotonic_optimal_binning_spark.operators.model_diff import (
    transform_churn,
    woe_shift_table,
)


@pytest.fixture(scope="module")
def old_model():
    return FittedBins.from_cuts("x", [10.0, 20.0], [1.0, 0.0, -1.0])


@pytest.fixture(scope="module")
def new_model():
    # boundary 20 moved to 25; WoE of the middle bin shifted by -0.2
    return FittedBins.from_cuts("x", [10.0, 25.0], [1.0, -0.2, -1.0])


def test_identical_models_zero_shift(old_model):
    t = woe_shift_table(old_model, old_model)
    assert (t["woe_delta"] == 0.0).all()
    assert not t["label_changed"].any()
    assert t.attrs["max_abs_woe_delta"] == 0.0


def test_shift_table_refined_partition(old_model, new_model):
    t = woe_shift_table(old_model, new_model)
    # union edges {10, 20, 25} -> 4 refined intervals
    assert list(t["left"]) == [-np.inf, 10.0, 20.0, 25.0]
    assert list(t["right"]) == [10.0, 20.0, 25.0, np.inf]
    # (-inf,10): 1.0 -> 1.0; [10,20): 0.0 -> -0.2;
    # [20,25): -1.0 -> -0.2 (old last bin, new middle); [25,inf): -1 -> -1
    np.testing.assert_allclose(t["woe_delta"], [0.0, -0.2, 0.8, 0.0])
    assert t.attrs["max_abs_woe_delta"] == pytest.approx(0.8)
    # label identity: the moved boundary renames BOTH adjacent bins
    assert list(t["label_changed"]) == [False, True, True, True]


def test_comparability_guards(old_model):
    other = FittedBins.from_cuts("z", [1.0], [0.5, -0.5])
    with pytest.raises(ValueError, match="different features"):
        woe_shift_table(old_model, other)


def test_transform_churn_matches_truth(spark, old_model, new_model):
    rng = np.random.default_rng(29)
    vals = rng.uniform(0, 40, 2000)
    pdf = pd.DataFrame({"x": vals})
    pdf.loc[pdf.index % 50 == 0, "x"] = np.nan
    df = spark.createDataFrame(pdf)
    got = transform_churn(df, old_model, new_model)

    x = pdf["x"].dropna()
    old_woe = np.select(
        [x < 10, x < 20], [1.0, 0.0], -1.0
    )
    new_woe = np.select(
        [x < 10, x < 25], [1.0, -0.2], -1.0
    )
    delta = np.abs(new_woe - old_woe)
    # every row at or above the first moved/renamed boundary gets a
    # differently-labelled bin (label identity semantics)
    label_changed = (x >= 10).sum()
    assert got["n"] == len(x)
    assert got["n_label_changed"] == int(label_changed)
    assert got["n_woe_changed"] == int((delta > 1e-12).sum())
    assert got["label_churn"] == pytest.approx(label_changed / len(x))
    assert got["max_abs_woe_delta"] == pytest.approx(delta.max())
    assert got["mean_abs_woe_delta"] == pytest.approx(delta.mean())


def test_transform_churn_identical_zero(spark, old_model):
    df = spark.range(100).select(
        (F.col("id") % 40).cast("double").alias("x")
    )
    got = transform_churn(df, old_model, old_model)
    assert got["label_churn"] == 0.0 and got["woe_churn"] == 0.0
    assert got["max_abs_woe_delta"] == 0.0


def test_shift_on_real_refit(spark):
    """End-to-end: fit on a slice, refit on slice+shifted data, compare."""
    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
    )

    rng = np.random.default_rng(41)
    base = pd.DataFrame({"x": rng.integers(0, 10, 2000).astype(float)})
    base["y"] = (rng.uniform(0, 1, 2000) < 0.1 + 0.08 * base["x"]).astype(int)
    drifted = base.copy()
    drifted["y"] = (
        rng.uniform(0, 1, 2000) < 0.05 + 0.09 * drifted["x"]
    ).astype(int)

    def _fit(p):
        return (
            SparkMonotonicBinner(
                "x", "y", prebins="exact",
                constraints=BinningConstraints(max_bins=4, min_bins=2),
            )
            .fit(spark.createDataFrame(p))
            .model_
        )

    old, new = _fit(base), _fit(pd.concat([base, drifted]))
    t = woe_shift_table(old, new)
    assert len(t) >= max(len(old.labels), len(new.labels))
    churn = transform_churn(spark.createDataFrame(base), old, new)
    assert churn["n"] == len(base)
    # WoE values refit on more data necessarily moved a little
    assert churn["max_abs_woe_delta"] == pytest.approx(
        t.attrs["max_abs_woe_delta"], rel=1e-9
    ) or churn["max_abs_woe_delta"] <= t.attrs["max_abs_woe_delta"]


# -------------------------------------------------------- bin_stability ----


def _stab_frame(spark, n=6000, deterministic=True, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 5, n).astype("float64")
    if deterministic:
        y = (rng.uniform(size=n) < 0)  # overwritten below: pure fn of x
        y = ((np.arange(n) % 100) < (x + 1) * 15).astype("int32")
    else:
        y = (rng.uniform(size=n) < 0.2 + 0.1 * x).astype("int32")
    pdf = pd.DataFrame({"rid": np.arange(n), "x": x, "y": y})
    return spark.createDataFrame(pdf).repartition(6), pdf


def test_bin_stability_equals_independent_fold_fits(spark):
    """One grouped scan + k solves must equal k fully independent fits on
    the fold slices (prebins='exact'), with folds reproduced by the same
    md5-threshold assignment."""
    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
    )
    from monotonic_optimal_binning_spark.operators.encoding import (
        fold_assignment,
    )
    from monotonic_optimal_binning_spark.operators.model_diff import (
        bin_stability,
    )

    df, _ = _stab_frame(spark, deterministic=False)
    cons = BinningConstraints(max_bins=10, min_bins=2)
    long_df, models = bin_stability(
        df, "x", "y", "rid", n_folds=3, prebins="exact", constraints=cons
    )
    withf = df.withColumn("__f", fold_assignment(F.col("rid"), 3, "binstab"))
    for f, m in models.items():
        ind = SparkMonotonicBinner(
            "x", "y", prebins="exact", constraints=cons
        ).fit(withf.filter(F.col("__f") == f))
        np.testing.assert_allclose(m.lefts, ind.model_.lefts)
        np.testing.assert_allclose(m.rights, ind.model_.rights)
        np.testing.assert_allclose(m.woes, ind.model_.woes, rtol=1e-12)
    pdf = long_df.toPandas()
    assert set(pdf["fold"]) == set(models)
    assert (pdf.groupby("fold").size() == pdf.groupby("fold")["n_bins"].first()).all()


def test_bin_stability_deterministic_y_is_stable(spark):
    """y a pure function of x -> every fold's group means coincide ->
    identical bins in every fold; summarize shows zero dispersion."""
    from monotonic_optimal_binning_spark import BinningConstraints
    from monotonic_optimal_binning_spark.operators.model_diff import (
        bin_stability,
        summarize_bin_stability,
    )

    df, _ = _stab_frame(spark, deterministic=True)
    long_df, models = bin_stability(
        df, "x", "y", "rid", n_folds=3, prebins="exact",
        constraints=BinningConstraints(max_bins=10, min_bins=2),
    )
    s = summarize_bin_stability(long_df.toPandas())
    assert (s["folds_present"] == 3).all()
    assert (s["left_range"] == 0).all()
    # per-fold label composition is noisy (folds hash rid, y depends on
    # rid%100), so WoE wiggles — the STRUCTURE (bins/edges) is what the
    # construction pins exactly
    assert (s["woe_range"].abs() < 0.5).all()
