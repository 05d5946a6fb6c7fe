"""Sample-weighted MOB fit (``weight_col``).

Frequency-weight semantics throughout the one-scan sufficient statistics:
every count becomes a weight sum, so an integer weight k is EXACTLY
k-fold row replication — the strongest possible correctness oracle, and
the property these tests pin. The reference has no weighted path
(/root/reference/src/MOBPY/binning/mob.py fits from raw rows only); this
is an engine-new capability for downsample-reweighted / importance-
sampled training data, where rescanning at the true row multiplicity
would be the 100 TB anti-pattern.
"""

import numpy as np
import pandas as pd
import pytest

from monotonic_optimal_binning_spark import (
    BinningConstraints,
    BinStats,
    DataError,
    SparkMonotonicBinner,
)
from monotonic_optimal_binning_spark.operators.binning import (
    collect_group_stats,
    fit_binners_per_group,
    fit_groups_from_stats,
)

import pyspark.sql.functions as F


def _make_pdf(n=3000, seed=11, with_specials=True):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 30, n).astype(float)
    p = 0.1 + 0.8 * (x / 30.0)
    y = (rng.uniform(0, 1, n) < p).astype(int)
    w = rng.choice([1.0, 1.0, 2.0, 3.0], n)
    pdf = pd.DataFrame({"x": x, "y": y, "w": w})
    if with_specials:
        pdf.loc[pdf.index % 17 == 0, "x"] = np.nan  # missing
        pdf.loc[pdf.index % 23 == 0, "x"] = -999.0  # excluded
    return pdf


def _binner(**kw):
    kw.setdefault("prebins", "exact")
    kw.setdefault("exclude_values", [-999.0])
    kw.setdefault("constraints", BinningConstraints(max_bins=6, min_bins=2))
    return SparkMonotonicBinner("x", "y", **kw)


def test_weight_one_equals_unweighted(spark):
    pdf = _make_pdf()
    df = spark.createDataFrame(pdf)
    plain = _binner().fit(df)
    weighted = _binner(weight_col="w").fit(df.withColumn("w", F.lit(1.0)))
    # byte-identical output incl. integer count dtypes (_count_val keeps
    # integral weighted counts as Python ints)
    pd.testing.assert_frame_equal(
        plain.model_.summary_df, weighted.model_.summary_df
    )
    pd.testing.assert_frame_equal(plain.model_.bins_df, weighted.model_.bins_df)
    assert plain.model_.labels == weighted.model_.labels


def test_integer_weights_equal_replication(spark):
    pdf = _make_pdf()
    df = spark.createDataFrame(pdf)
    replicated = df.withColumn(
        "dup", F.explode(F.expr("sequence(1, cast(w as int))"))
    ).drop("dup", "w")
    by_rows = _binner().fit(replicated)
    by_weight = _binner(weight_col="w").fit(df)
    assert by_weight.model_.is_binary
    assert by_rows.model_.labels == by_weight.model_.labels
    pd.testing.assert_frame_equal(
        by_rows.model_.bins_df, by_weight.model_.bins_df, rtol=1e-9
    )
    pd.testing.assert_frame_equal(
        by_rows.model_.summary_df, by_weight.model_.summary_df, rtol=1e-9
    )
    np.testing.assert_allclose(by_rows.model_.woes, by_weight.model_.woes)


def test_fractional_uniform_weight_scales_counts_only(spark):
    pdf = _make_pdf()
    df = spark.createDataFrame(pdf)
    plain = _binner().fit(df)
    halved = _binner(weight_col="w").fit(df.withColumn("w", F.lit(0.5)))
    # same cuts and same per-bin means/WoE; effective counts halve
    assert plain.model_.labels == halved.model_.labels
    np.testing.assert_allclose(
        plain.model_.bins_df["mean"], halved.model_.bins_df["mean"]
    )
    np.testing.assert_allclose(
        plain.model_.bins_df["n"] * 0.5, halved.model_.bins_df["n"]
    )
    # WoE uses additive smoothing (+0.5 per bucket) which deliberately does
    # NOT rescale with the weights, so halved counts shift WoE by O(1/n)
    np.testing.assert_allclose(plain.model_.woes, halved.model_.woes, rtol=0.02)
    # count_pct is scale-invariant
    np.testing.assert_allclose(
        plain.model_.summary_df["count_pct"],
        halved.model_.summary_df["count_pct"],
    )


def test_zero_weight_rows_are_invisible(spark):
    pdf = _make_pdf(with_specials=False)
    df = spark.createDataFrame(pdf)
    # poison rows that would shift every bin if counted — x beyond the
    # real range, inverted target, zero weight
    poison = spark.createDataFrame(
        pd.DataFrame(
            {"x": [1e6, -1e6, 15.0], "y": [0, 1, 1], "w": [0.0, 0.0, 0.0]}
        )
    )
    clean = _binner(exclude_values=None, weight_col="w").fit(df)
    poisoned = _binner(exclude_values=None, weight_col="w").fit(
        df.unionByName(poison)
    )
    assert clean.model_.labels == poisoned.model_.labels
    pd.testing.assert_frame_equal(
        clean.model_.summary_df, poisoned.model_.summary_df
    )


@pytest.mark.parametrize("bad", [-1.0, float("nan"), float("inf"), None])
def test_bad_weights_raise(spark, bad):
    pdf = _make_pdf(n=200, with_specials=False)
    df = spark.createDataFrame(pdf)
    poison = spark.createDataFrame(
        pd.DataFrame({"x": [5.0], "y": [1], "w": [np.nan]})
    )
    if bad is not None:
        poison = poison.withColumn("w", F.lit(float(bad)))
    else:
        poison = poison.withColumn("w", F.lit(None).cast("double"))
    with pytest.raises(DataError, match="weight column"):
        _binner(exclude_values=None, weight_col="w").fit(
            df.unionByName(poison)
        )


def test_weighted_specials_in_summary(spark):
    pdf = _make_pdf()
    df = spark.createDataFrame(pdf)
    model = _binner(weight_col="w").fit(df).model_
    summary = model.summary_df.set_index("bucket")
    raw = pdf.copy()
    missing_w = raw.loc[raw["x"].isna(), "w"].sum()
    excluded_w = raw.loc[raw["x"] == -999.0, "w"].sum()
    assert summary.loc["Missing", "count"] == pytest.approx(missing_w)
    assert summary.loc["Excluded:-999.0", "count"] == pytest.approx(excluded_w)
    diag = model.diagnostics["partition_summary"]
    assert diag["missing"] == pytest.approx(missing_w)
    assert diag["excluded"] == pytest.approx(excluded_w)


def test_weighted_continuous_target_not_binary(spark):
    pdf = _make_pdf(with_specials=False)
    pdf["y"] = pdf["y"] + 0.25 * np.random.default_rng(3).uniform(size=len(pdf))
    df = spark.createDataFrame(pdf)
    model = _binner(exclude_values=None, weight_col="w").fit(df).model_
    assert not model.is_binary
    assert model.woes is None


def test_weighted_incremental_matches_full_fit(spark):
    pdf = _make_pdf()
    half1, half2 = pdf.iloc[: len(pdf) // 2], pdf.iloc[len(pdf) // 2 :]
    b = _binner(weight_col="w")
    s1 = b.collect_stats(spark.createDataFrame(half1), label="p1")
    assert s1.weight_col == "w"
    merged = b.collect_stats(spark.createDataFrame(half2), prior=s1, label="p2")
    inc = _binner(weight_col="w").fit_from_stats(merged)
    full = _binner(weight_col="w").fit(spark.createDataFrame(pdf))
    assert inc.model_.labels == full.model_.labels
    pd.testing.assert_frame_equal(
        inc.model_.summary_df, full.model_.summary_df, rtol=1e-9
    )
    # the artifact round-trips its weightedness through strict JSON
    back = BinStats.from_dict(merged.to_dict())
    assert back.weight_col == "w"
    again = _binner(weight_col="w").fit_from_stats(back)
    assert again.model_.labels == full.model_.labels


def test_weight_col_mismatch_refuses_merge(spark):
    pdf = _make_pdf(n=400)
    df = spark.createDataFrame(pdf)
    s_w = _binner(weight_col="w").collect_stats(df)
    s_plain = _binner().collect_stats(df)
    with pytest.raises(ValueError, match="weighted by"):
        s_w.merge(s_plain)
    with pytest.raises(ValueError, match="weighted by"):
        _binner().collect_stats(df, prior=s_w)


def test_weighted_grouped_fit_matches_per_group(spark):
    pdf = _make_pdf(with_specials=False)
    pdf["src"] = np.where(np.arange(len(pdf)) % 2 == 0, "a", "b")
    df = spark.createDataFrame(pdf)
    grouped = fit_binners_per_group(
        df,
        "src",
        "x",
        "y",
        prebins="exact",
        weight_col="w",
        constraints=BinningConstraints(max_bins=6, min_bins=2),
    )
    for g in ("a", "b"):
        solo = _binner(exclude_values=None, weight_col="w").fit(
            df.filter(F.col("src") == g)
        )
        assert grouped.models[g].labels == solo.model_.labels
        pd.testing.assert_frame_equal(
            grouped.models[g].summary_df, solo.model_.summary_df, rtol=1e-9
        )
    # grouped incremental: artifact carries the weight col and refuses a
    # mismatched solve
    stats = collect_group_stats(
        df, "src", "x", "y", prebins="exact", weight_col="w"
    )
    assert stats.weight_col == "w"
    re = fit_groups_from_stats(
        stats,
        prebins="exact",
        weight_col="w",
        constraints=BinningConstraints(max_bins=6, min_bins=2),
    )
    assert re.models["a"].labels == grouped.models["a"].labels
    with pytest.raises(ValueError, match="weighted by"):
        fit_groups_from_stats(stats, prebins="exact")


def test_zero_weight_nonfinite_y_is_invisible(spark):
    """w=0 rows with y=inf must neither poison the sums with 0*inf=NaN
    nor trip the non-finite-y DataError — zero weight means the row does
    not exist."""
    pdf = _make_pdf(n=300, with_specials=False)
    df = spark.createDataFrame(pdf)
    poison = spark.createDataFrame(
        pd.DataFrame({"x": [5.0], "y": [np.inf], "w": [0.0]})
    )
    clean = _binner(exclude_values=None, weight_col="w").fit(df)
    with_poison = _binner(exclude_values=None, weight_col="w").fit(
        df.unionByName(poison)
    )
    assert clean.model_.labels == with_poison.model_.labels
    pd.testing.assert_frame_equal(
        clean.model_.summary_df, with_poison.model_.summary_df
    )
    # a POSITIVE-weight non-finite y still fails loudly
    from monotonic_optimal_binning_spark import DataError

    bad = poison.withColumn("w", F.lit(1.0))
    with pytest.raises(DataError, match="non-finite"):
        _binner(exclude_values=None, weight_col="w").fit(
            df.unionByName(bad)
        )


def test_fit_from_stats_weight_mismatch_raises(spark):
    pdf = _make_pdf(n=300)
    df = spark.createDataFrame(pdf)
    stats_plain = _binner().collect_stats(df)
    with pytest.raises(ValueError, match="weighted by"):
        _binner(weight_col="w").fit_from_stats(stats_plain)
    stats_w = _binner(weight_col="w").collect_stats(df)
    with pytest.raises(ValueError, match="weighted by"):
        _binner().fit_from_stats(stats_w)
