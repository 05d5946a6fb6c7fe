"""correlation_matrix / corr_prune: one-scan pairwise-complete Pearson
correlations + greedy redundancy pruning (operators/correlation.py)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.correlation import (
    corr_prune,
    correlation_matrix,
)


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.RandomState(7)
    n = 4000
    a = rng.normal(size=n)
    pdf = pd.DataFrame(
        {
            "a": a,
            "b": a * 2.0 + rng.normal(scale=0.3, size=n),  # strongly corr w/ a
            "c": rng.normal(size=n),                        # independent
            "d": -a + rng.normal(scale=0.5, size=n),        # negative corr
        }
    )
    # deterministic nulls in two columns -> pairwise-complete semantics
    pdf.loc[pdf.index % 7 == 0, "b"] = np.nan
    pdf.loc[pdf.index % 5 == 0, "c"] = np.nan
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_matches_pandas_pairwise(toy):
    df, pdf = toy
    out = {
        (r["feature_a"], r["feature_b"]): r
        for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(out) == 6
    for (i, j), r in out.items():
        sub = pdf[[i, j]].dropna()
        want = float(sub[i].corr(sub[j]))
        assert r["corr"] == pytest.approx(want, abs=2e-6), (i, j)
        assert r["n"] == len(sub), (i, j)
    # sanity on the planted structure
    assert out[("a", "b")]["corr"] > 0.9
    assert out[("a", "d")]["corr"] < -0.7
    assert abs(out[("a", "c")]["corr"]) < 0.1


def test_degenerate_pairs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "x": [1.0, 2.0, 3.0, 4.0],
                "const": [5.0, 5.0, 5.0, 5.0],
                # only one pairwise-valid row with x
                "sparse": [1.0, None, None, None],
            }
        )
    )
    out = {
        (r["feature_a"], r["feature_b"]): r
        for r in correlation_matrix(df, ["x", "const", "sparse"]).collect()
    }
    assert out[("x", "const")]["corr"] == 0.0       # zero variance
    assert out[("x", "sparse")]["corr"] == 0.0      # n < 2
    assert out[("x", "sparse")]["n"] == 1


def test_empty_partitions_and_all_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [None, None, None]})
    ).repartition(16)  # most partitions empty
    out = correlation_matrix(df, ["x", "y"]).collect()
    assert out[0]["n"] == 0 and out[0]["corr"] == 0.0


def test_single_scan_distributed_reduce(toy):
    """One input scan; the partial-Gram reduce is a groupBy (distributed),
    never a single-task global fold."""
    df, _ = toy
    from monotonic_optimal_binning_spark.operators.correlation import (
        correlation_gram,
    )
    cols = ["a", "b", "c", "d"]
    src = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    from monotonic_optimal_binning_spark.operators.correlation import (
        _gram_partials,
    )
    partials = src.mapInPandas(_gram_partials(cols, 4), "g array<double>")
    reduced = (
        partials.select(F.posexplode("g").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
    )
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    n_scans = (
        plan.count("Scan ExistingRDD")
        + plan.count("FileScan")
        + plan.count("LocalTableScan")
    )
    assert n_scans == 1, plan
    assert "HashAggregate" in plan, plan
    g = correlation_gram(df, cols)
    assert g.shape == (4, 4, 4)


def test_errors(toy):
    df, _ = toy
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])
    with pytest.raises(ValueError):
        correlation_matrix(df, [f"c{i}" for i in range(3000)])


def test_corr_prune_greedy(spark):
    corr = pd.DataFrame(
        {
            "feature_a": ["f1", "f1", "f1", "f2", "f2", "f3"],
            "feature_b": ["f2", "f3", "f4", "f3", "f4", "f4"],
            "n": [100] * 6,
            "corr": [0.95, 0.10, -0.85, 0.05, 0.20, 0.92],
        }
    )
    ranked = [("f1", 0.5), ("f2", 0.4), ("f3", 0.3), ("f4", 0.2)]
    out = corr_prune(ranked, corr, threshold=0.8)
    # f2 dropped for f1 (0.95), f4 dropped for f1 (|-0.85|); f3 kept
    assert out["kept"] == ["f1", "f3"]
    assert [d["feature"] for d in out["dropped"]] == ["f2", "f4"]
    assert out["dropped"][0]["dropped_for"] == "f1"
    assert out["dropped"][1]["corr"] == -0.85
    # Spark-DataFrame input works too
    sdf = spark.createDataFrame(corr)
    assert corr_prune(ranked, sdf, threshold=0.8)["kept"] == ["f1", "f3"]
    # missing pair = uncorrelated = kept
    assert corr_prune([("f9", 1.0), ("f1", 0.5)], corr)["kept"] == ["f9", "f1"]
