"""profile(): one-scan per-column stats, exact and approx modes
(operators/profile.py)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.profile import profile


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.RandomState(5)
    n = 3000
    pdf = pd.DataFrame(
        {
            "num": rng.normal(10.0, 3.0, n),
            "cat": rng.choice(["alpha", "beta", "gamma"], n, p=[0.5, 0.3, 0.2]),
            "intc": rng.randint(0, 50, n).astype("int64"),
        }
    )
    pdf.loc[pdf.index % 9 == 0, "num"] = np.nan
    pdf.loc[pdf.index % 7 == 0, "cat"] = None
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_exact_matches_pandas(toy):
    df, pdf = toy
    out = {r["column"]: r for r in profile(df).collect()}
    assert list(out) == ["cat", "intc", "num"]

    r = out["num"]
    valid = pdf["num"].dropna()
    assert r["n"] == len(pdf)
    assert r["nulls"] == pdf["num"].isna().sum()
    assert r["n_distinct"] == valid.nunique()
    assert r["min_num"] == pytest.approx(valid.min())
    assert r["max_num"] == pytest.approx(valid.max())
    assert r["mean"] == pytest.approx(valid.mean(), abs=2e-6)
    assert r["std"] == pytest.approx(valid.std(ddof=0), abs=2e-6)
    assert r["dtype"] == "double"

    c = out["cat"]
    vc = pdf["cat"].value_counts()
    assert c["nulls"] == pdf["cat"].isna().sum()
    assert c["n_distinct"] == 3
    assert c["top_value"] == vc.index[0] and c["top_freq"] == vc.iloc[0]
    assert c["min_num"] is None and c["mean"] is None and c["std"] is None
    assert c["dtype"] == "string"

    i = out["intc"]
    assert i["nulls"] == 0
    assert i["n_distinct"] == pdf["intc"].nunique()
    assert i["mean"] == pytest.approx(pdf["intc"].mean(), abs=2e-6)


def test_top_value_tie_break(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"c": ["b", "b", "a", "a", "z"]})
    )
    r = profile(df, ["c"]).collect()[0]
    # tie on cnt=2 -> lexicographically larger value wins (deterministic)
    assert r["top_value"] == "b" and r["top_freq"] == 2


def test_approx_mode(toy):
    df, pdf = toy
    out = {r["column"]: r for r in profile(df, exact=False).collect()}
    r = out["num"]
    valid = pdf["num"].dropna()
    assert r["n"] == len(pdf)
    assert r["nulls"] == pdf["num"].isna().sum()
    # HLL estimate within the default 2% rsd (generous 10% test bound)
    assert abs(r["n_distinct"] - valid.nunique()) <= 0.1 * valid.nunique()
    assert r["mean"] == pytest.approx(valid.mean(), abs=2e-6)
    assert r["std"] == pytest.approx(valid.std(ddof=0), abs=2e-6)
    assert r["top_value"] is None and r["top_freq"] is None
    assert out["cat"]["n_distinct"] == 3  # small cardinality: HLL exact


def test_single_scan_plans(toy):
    df, _ = toy
    for mode in (True, False):
        out = profile(df, exact=mode)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_scans = (
            plan.count("Scan ExistingRDD")
            + plan.count("FileScan")
            + plan.count("LocalTableScan")
        )
        assert n_scans == 1, (mode, plan)
        assert "partial" in plan.lower(), (mode, plan)  # map-side combine


def test_errors(toy):
    df, _ = toy
    with pytest.raises(ValueError):
        profile(df, [])
    with pytest.raises(ValueError):
        profile(df, ["nope"])


def test_all_null_column(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [None, None]}), "x double"
    )
    r = profile(df, ["x"]).collect()[0]
    assert r["n"] == 2 and r["nulls"] == 2 and r["n_distinct"] == 0
    assert r["top_value"] is None and r["mean"] is None
