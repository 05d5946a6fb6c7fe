"""PSI drift monitoring vs a numpy reference."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import BinningConstraints, SparkMonotonicBinner
from monotonic_optimal_binning_spark.operators.drift import binner_psi, psi


def _psi_ref(ne, na, smoothing=0.5):
    ne, na = np.asarray(ne, float), np.asarray(na, float)
    k = len(ne)
    pe = (ne + smoothing) / (ne.sum() + smoothing * k)
    pa = (na + smoothing) / (na.sum() + smoothing * k)
    return ((pa - pe) * np.log(pa / pe))


def test_psi_matches_reference_and_handles_empty_bins(spark):
    e = spark.createDataFrame(pd.DataFrame(
        {"b": ["a"] * 50 + ["b"] * 30 + ["c"] * 20}))
    a = spark.createDataFrame(pd.DataFrame(
        {"b": ["a"] * 10 + ["b"] * 70 + ["d"] * 20}))  # c empty, d new
    out = psi(e, a, "b").toPandas().sort_values("bucket").reset_index(drop=True)
    assert out["bucket"].tolist() == ["a", "b", "c", "d"]
    exp = _psi_ref([50, 30, 20, 0], [10, 70, 0, 20])
    np.testing.assert_allclose(out["psi_term"].to_numpy(), exp, rtol=1e-12)
    assert np.isfinite(out["psi_term"]).all()
    assert out["psi_term"].sum() > 0.25  # clearly shifted


def test_binner_psi_identical_sample_is_stable(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 40).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < F.col("id") % 40 + 20).cast("int").alias("y"),
    )
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=3)
    ).fit(df)
    same = binner_psi(b, df).toPandas()
    assert abs(same["psi_term"].sum()) < 1e-12  # identical distribution
    assert (same["n_expected"] == same["n_actual"]).all()
    # a genuinely shifted sample scores above the 0.25 alert bar
    shifted = df.filter(F.col("x") < 10)
    drift = binner_psi(b, shifted).toPandas()
    assert drift["psi_term"].sum() > 0.25


def test_psi_null_bucket_is_one_bin(spark):
    e = spark.createDataFrame(
        pd.DataFrame({"b": ["a"] * 50 + [None] * 50})).fillna({})  # keep None
    a = spark.createDataFrame(
        pd.DataFrame({"b": ["a"] * 50 + [None] * 50}))
    out = psi(e, a, "b").toPandas()
    assert len(out) == 2  # null matched null-safe: one bin, no phantoms
    np.testing.assert_allclose(out["psi_term"].sum(), 0.0, atol=1e-12)


def test_binner_psi_nulls_dont_fake_drift(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 30).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < 40).cast("int").alias("y"),
    )
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=4, min_bins=2)
    ).fit(df)
    # identical distribution + 20% nulls must NOT read as drift
    with_nulls = spark.range(20_000).select(
        F.when(F.pmod("id", F.lit(5)) != 0, (F.col("id") % 30).cast("double")).alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < 40).cast("int").alias("y"),
    )
    out = binner_psi(b, with_nulls).toPandas()
    assert abs(out["psi_term"].sum()) < 0.01
    assert not out["bucket"].astype(str).str.contains("Missing").any()
