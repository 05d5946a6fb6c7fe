"""FeatureStats artifact + serve-side scaling transforms.

Invariants pinned: fit statistics match pandas on the same data (exact
mode); the JSON artifact round-trips; transforms built from a LOADED
artifact equal transforms from the fresh fit (train/serve consistency);
null/NaN semantics are explicit; and the transform plan stays a single
codegen projection — no exchange, no Python UDF.
"""

import json
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.scaling import (
    FeatureStats,
    clip,
    fit_feature_stats,
    impute,
    robust_scale,
    standardize,
)


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(17)
    d = pd.DataFrame(
        {
            "a": rng.normal(10, 4, 500),
            "b": rng.integers(0, 100, 500).astype(float),
            "k": np.full(500, 7.0),  # constant column: zero std/IQR
        }
    )
    d.loc[d.index % 11 == 0, "a"] = np.nan
    d.loc[d.index % 13 == 0, "b"] = None
    return d


@pytest.fixture(scope="module")
def stats(spark, pdf):
    return fit_feature_stats(
        spark.createDataFrame(pdf), ["a", "b", "k"], exact=True
    )


def test_fit_matches_pandas(stats, pdf):
    for c in ("a", "b"):
        col = pdf[c].dropna()
        s = stats.stats[c]
        assert s["count"] == len(col)
        assert s["n_null"] == len(pdf) - len(col)
        assert s["mean"] == pytest.approx(col.mean())
        assert s["std"] == pytest.approx(col.std(ddof=1))
        assert s["min"] == col.min() and s["max"] == col.max()
        # Spark exact percentile and numpy 'linear' share the
        # interpolated-quantile definition
        assert s["median"] == pytest.approx(np.percentile(col, 50))
        assert s["q_lo"] == pytest.approx(np.percentile(col, 25))
        assert s["q_hi"] == pytest.approx(np.percentile(col, 75))
    assert stats.stats["k"]["std"] == 0.0
    assert stats.iqr("k") == 0.0


def test_artifact_round_trip(stats, tmp_path):
    p = str(tmp_path / "stats.json")
    stats.save_json(p)
    back = FeatureStats.load_json(p)
    assert back.stats == stats.stats
    assert back.quantile_probs == stats.quantile_probs
    assert back.exact_quantiles == stats.exact_quantiles
    with open(p) as f:
        assert json.load(f)["kind"] == "mob_feature_stats"
    with pytest.raises(ValueError, match="not a FeatureStats"):
        FeatureStats.from_dict({"kind": "other"})


def test_impute_strategies(spark, stats, pdf):
    df = spark.createDataFrame(pdf)
    med = impute(df, stats, ["a"], strategy="median").toPandas()["a"]
    assert not med.isna().any()
    filled = med[pdf["a"].isna().values]
    np.testing.assert_allclose(filled, stats.stats["a"]["median"])
    const = impute(df, stats, ["a"], strategy=-1.0).toPandas()["a"]
    assert (const[pdf["a"].isna().values] == -1.0).all()
    with pytest.raises(ValueError, match="unknown impute strategy"):
        impute(df, stats, ["a"], strategy="mode")


def test_clip_bounds_and_passthrough(spark, stats, pdf):
    df = spark.createDataFrame(pdf)
    out = clip(df, stats, ["a"], k_iqr=1.5, suffix="_c").toPandas()
    s = stats.stats["a"]
    lo = s["q_lo"] - 1.5 * stats.iqr("a")
    hi = s["q_hi"] + 1.5 * stats.iqr("a")
    vals = out["a_c"]
    mask = ~pdf["a"].isna().values
    assert vals[mask].between(lo, hi).all()
    # NaN input passes through as NaN, never clipped to the upper fence
    assert vals[~mask].isna().all()
    expected = pdf["a"][mask].clip(lo, hi)
    np.testing.assert_allclose(vals[mask], expected)
    # quantile-bound mode
    q = clip(df, stats, ["a"], lower="q_lo", upper="q_hi", suffix="_q")
    qv = q.toPandas()["a_q"]
    assert qv[mask].between(s["q_lo"], s["q_hi"]).all()


def test_standardize_and_robust(spark, stats, pdf):
    df = spark.createDataFrame(pdf)
    out = standardize(robust_scale(df, stats, ["a", "k"]), stats, ["a", "k"])
    got = out.toPandas()
    s = stats.stats["a"]
    mask = ~pdf["a"].isna().values
    np.testing.assert_allclose(
        got.loc[mask, "a_z"], (pdf["a"][mask] - s["mean"]) / s["std"]
    )
    np.testing.assert_allclose(
        got.loc[mask, "a_r"],
        (pdf["a"][mask] - s["median"]) / stats.iqr("a"),
    )
    # null/NaN inputs yield null derived values
    assert got.loc[~mask, "a_z"].isna().all()
    assert got.loc[~mask, "a_r"].isna().all()
    # constant column: zero signal, zero output
    assert (got["k_z"] == 0.0).all() and (got["k_r"] == 0.0).all()


def test_serve_from_loaded_artifact(spark, stats, pdf, tmp_path):
    p = str(tmp_path / "serve.json")
    stats.save_json(p)
    served = FeatureStats.load_json(p)
    df = spark.createDataFrame(pdf)
    fresh = standardize(df, stats, ["a"]).toPandas()["a_z"]
    loaded = standardize(df, served, ["a"]).toPandas()["a_z"]
    pd.testing.assert_series_equal(fresh, loaded)


def test_transform_plan_is_codegen_only(spark, stats, pdf, tmp_path):
    src = str(tmp_path / "scaling_plan.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    df = spark.read.parquet(src)
    out = standardize(
        clip(impute(df, stats, ["a", "b"]), stats, ["a"], k_iqr=1.5,
             suffix="_c"),
        stats,
        ["a", "b"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "*(1)" in plan  # the whole-stage-codegen star marker


def test_missing_column_raises(stats):
    with pytest.raises(KeyError, match="no fitted statistics"):
        stats._col("zzz")


def test_approx_mode_close_to_exact(spark, pdf):
    df = spark.createDataFrame(pdf)
    approx = fit_feature_stats(df, ["a"], relative_error=1e-4)
    exact = fit_feature_stats(df, ["a"], exact=True)
    # GK sketch at 1e-4 on 500 rows is rank-exact; values may differ only
    # by the interpolation convention (sketch returns an observed value)
    assert abs(
        approx.stats["a"]["median"] - exact.stats["a"]["median"]
    ) <= np.diff(np.sort(pdf["a"].dropna()))[:-1].max()


def test_weighted_stats_equal_replication(spark):
    rng = np.random.default_rng(71)
    pdf2 = pd.DataFrame(
        {
            "a": rng.normal(3, 2, 700),
            "w": rng.choice([1.0, 2.0, 3.0], 700),
        }
    )
    pdf2.loc[pdf2.index % 10 == 0, "a"] = np.nan
    df = spark.createDataFrame(pdf2)
    rep = df.withColumn(
        "dup", F.explode(F.expr("sequence(1, cast(w as int))"))
    ).drop("dup", "w")
    ws = fit_feature_stats(df, ["a"], weight_col="w")
    rs = fit_feature_stats(rep, ["a"], exact=True)
    for k in ("count", "n_null", "mean", "std", "min", "max",
              "q_lo", "median", "q_hi"):
        assert ws.stats["a"][k] == pytest.approx(rs.stats["a"][k]), k
    # fractional weights are rejected (weighted quantiles need ints)
    with pytest.raises(Exception, match="INTEGER"):
        fit_feature_stats(
            df.withColumn("w", F.lit(0.5)), ["a"], weight_col="w"
        )
