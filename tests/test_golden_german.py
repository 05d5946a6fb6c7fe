"""Golden-output test: the reference README's german-credit example
(/root/reference/README.md:36-77) publishes the exact 4-bin summary for
Durationinmonth vs default under the default-documented constraints.
The engine, reading the same CSV through spark.read.csv (the engine's CSV
source path, SURVEY.md SS2.1), must reproduce every number."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monotonic_optimal_binning_spark import BinningConstraints, SparkMonotonicBinner

CSV = "/root/reference/data/german_data_credit_cat.csv"

# README.md:70-77 (count_pct implied by count/1000; std/min/max also shown)
GOLDEN = [
    # bucket,      count, sum,   mean,     woe,       iv
    ("(-inf, 9)",  94,    10.0,  0.106383, 1.241870,  0.106307),
    ("[9, 16)",    337,   79.0,  0.234421, 0.335632,  0.035238),
    ("[16, 45)",   499,   171.0, 0.342685, -0.193553, 0.019342),
    ("[45, +inf)", 70,    40.0,  0.571429, -1.127082, 0.102180),
]


@pytest.mark.skipif(not os.path.exists(CSV), reason="reference data not present")
def test_german_credit_golden(spark):
    from pyspark.sql import functions as F

    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(CSV)
        .select(
            F.col("Durationinmonth").cast("double").alias("x"),
            (F.col("default") - 1).cast("int").alias("y"),
        )
    )
    binner = SparkMonotonicBinner(
        "x", "y",
        constraints=BinningConstraints(
            min_bins=4, max_bins=6, min_samples=0.05, min_positives=0.01
        ),
    ).fit(df)
    s = binner.summary_()
    assert list(s["bucket"]) == [g[0] for g in GOLDEN]
    np.testing.assert_array_equal(s["count"].to_numpy(), [g[1] for g in GOLDEN])
    np.testing.assert_allclose(s["sum"].to_numpy(float), [g[2] for g in GOLDEN])
    np.testing.assert_allclose(
        s["mean"].to_numpy(float), [g[3] for g in GOLDEN], atol=1e-6
    )
    np.testing.assert_allclose(
        s["woe"].to_numpy(float), [g[4] for g in GOLDEN], atol=1e-6
    )
    np.testing.assert_allclose(
        s["iv"].to_numpy(float), [g[5] for g in GOLDEN], atol=1e-6
    )
    # total IV quoted in README.md:119-124 as ~0.263
    assert s["iv"].sum() == pytest.approx(0.263, abs=5e-3)
