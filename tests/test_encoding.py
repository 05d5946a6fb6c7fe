"""target_encode_oof: leakage-safe K-fold mean-target encoding
(operators/encoding.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.encoding import (
    fold_assignment,
    frequency_encode,
    hash_bucket,
    hash_encode,
    target_encode_oof,
)
from monotonic_optimal_binning_spark.operators.sampling import (
    split_thresholds,
)


def _fold(i, n_folds, salt="folds"):
    h = hashlib.md5((salt + str(i)).encode()).hexdigest()[:8]
    for name, upper in split_thresholds(
        {str(j): 1.0 for j in range(n_folds)}
    ).items():
        if h < upper:
            return int(name)


def _truth(pdf, n_folds, m, salt="folds"):
    """Row-wise OOF encoding computed the slow, obvious way."""
    d = pdf.copy()
    d["fold"] = [_fold(i, n_folds, salt) for i in d["id"]]
    lab = d.dropna(subset=["y"])
    out = []
    for _, r in d.iterrows():
        oth = lab[lab["fold"] != r["fold"]]
        prior = oth["y"].mean() if len(oth) else lab["y"].mean()
        same_cat = oth[
            oth["cat"].isna() if pd.isna(r["cat"])
            else (oth["cat"] == r["cat"])
        ]
        out.append(
            (same_cat["y"].sum() + m * prior) / (len(same_cat) + m)
        )
    d["te"] = out
    return d


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.RandomState(9)
    n = 1500
    cats = rng.choice(["a", "b", "c", "d"], n, p=[0.4, 0.3, 0.2, 0.1])
    base_rate = {"a": 0.2, "b": 0.5, "c": 0.7, "d": 0.9}
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "cat": cats,
            "y": [
                float(rng.uniform() < base_rate[c]) for c in cats
            ],
        }
    )
    pdf.loc[pdf.index % 31 == 0, "cat"] = None       # null categories
    pdf.loc[pdf.index % 17 == 0, "y"] = np.nan       # unlabeled rows
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_matches_row_wise_truth(toy):
    df, pdf = toy
    got = (
        target_encode_oof(df, "cat", "y", id_col="id", n_folds=3,
                          smoothing=10.0)
        .select("id", "cat_te")
        .toPandas()
        .set_index("id")["cat_te"]
        .sort_index()
    )
    want = _truth(pdf, 3, 10.0).set_index("id")["te"].sort_index()
    assert len(got) == len(pdf)
    assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1e-9)


def test_no_leakage_single_fold_category(spark):
    """A category confined to one fold encodes to exactly that fold's
    out-of-fold prior — its own labels never reach its encoding."""
    pdf = pd.DataFrame(
        {
            "id": np.arange(300, dtype="int64"),
            "cat": ["common"] * 290 + ["rare"] * 10,
            "y": [0.0] * 290 + [1.0] * 10,
            "fold": ([0, 1, 2] * 100)[:290] + [0] * 10,
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        target_encode_oof(df, "cat", "y", fold_col="fold", smoothing=5.0)
        .filter(F.col("cat") == "rare")
        .select("cat_te")
        .distinct()
        .collect()
    )
    assert len(got) == 1
    # prior of fold 0 = mean(y over folds 1,2) = 0.0; rare's own ten 1.0
    # labels must NOT contaminate it: enc = (0 + 5*0)/(0+5) = 0
    assert got[0]["cat_te"] == pytest.approx(0.0)


def test_deterministic_under_repartition(toy):
    df, _ = toy
    a = (
        target_encode_oof(df, "cat", "y", id_col="id", n_folds=5)
        .select("id", "cat_te").toPandas().set_index("id").sort_index()
    )
    b = (
        target_encode_oof(df.repartition(3), "cat", "y", id_col="id",
                          n_folds=5)
        .select("id", "cat_te").toPandas().set_index("id").sort_index()
    )
    assert np.allclose(a["cat_te"], b["cat_te"])


def test_fold_assignment_balance(spark):
    df = spark.range(20_000).select(
        fold_assignment(F.col("id"), 4).alias("f")
    )
    counts = {r["f"]: r["cnt"] for r in
              df.groupBy("f").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    for c in counts.values():
        assert abs(c - 5000) < 300  # md5 is uniform


def test_single_scan_bounded_aggregates(toy):
    """In the executed (AQE-final) plan the per-category / per-fold /
    global totals all fold onto the ONE (category, fold) shuffle via
    ReusedExchange — never a rescan per aggregate or per fold. At most
    two input scans survive (aggregate side + join-back row side; with
    a pre-shuffled input even the row side reuses the scan's exchange
    and the whole plan reads the input ONCE)."""
    df, _ = toy
    out = target_encode_oof(df, "cat", "y", id_col="id", n_folds=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    n_scans = (
        plan.count("Scan ExistingRDD")
        + plan.count("FileScan")
        + plan.count("LocalTableScan")
    )
    assert n_scans <= 2, plan  # never one scan per aggregate / per fold
    assert "ReusedExchange" in plan, plan


def test_frequency_encode(toy):
    df, pdf = toy
    got = (
        frequency_encode(df, "cat")
        .select("id", "cat_freq")
        .toPandas().set_index("id")["cat_freq"].sort_index()
    )
    vc = pdf["cat"].value_counts(normalize=False)
    null_n = int(pdf["cat"].isna().sum())
    want = pdf.set_index("id")["cat"].map(
        lambda c: (vc[c] if pd.notna(c) else null_n) / len(pdf)
    ).sort_index()
    assert len(got) == len(pdf)  # NULL categories encoded, not dropped
    assert np.allclose(got.to_numpy(), want.to_numpy())
    counts = (
        frequency_encode(df, "cat", normalize=False)
        .filter(F.col("cat").isNull()).select("cat_freq").distinct().collect()
    )
    assert counts[0][0] == int(pdf["cat"].isna().sum())


def test_hash_encode_matches_python_md5(toy):
    df, pdf = toy
    got = (
        hash_encode(df, ["cat"], 64)
        .select("id", "cat", "cat_hash")
        .toPandas()
    )

    def truth(v):
        if pd.isna(v):
            return None
        h = hashlib.md5(f"hash:cat:{v}".encode()).hexdigest()[:8]
        return int(h, 16) % 64

    for _, r in got.iterrows():
        assert (None if pd.isna(r["cat_hash"]) else int(r["cat_hash"])) \
            == truth(r["cat"])
    # buckets bounded, NULLs stay NULL
    real = got["cat_hash"].dropna()
    assert real.between(0, 63).all()
    assert got.loc[got["cat"].isna(), "cat_hash"].isna().all()


def test_hash_encode_no_shuffle(toy, spark):
    _, pdf = toy
    df = spark.createDataFrame(pdf)  # no fixture repartition() exchange
    out = hash_encode(df, ["cat"], 1024)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_hash_bucket_distribution(spark):
    df = spark.range(50_000).select(
        hash_bucket(F.col("id").cast("string"), 16).alias("b")
    )
    counts = [r["n"] for r in
              df.groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 16
    for c in counts:
        assert abs(c - 50_000 / 16) < 400


def test_errors_and_options(toy):
    df, pdf = toy
    with pytest.raises(ValueError):
        target_encode_oof(df, "cat", "y")  # neither id nor fold
    with pytest.raises(ValueError):
        target_encode_oof(df, "cat", "y", id_col="id", fold_col="id")
    with pytest.raises(ValueError):
        target_encode_oof(df, "cat", "y", id_col="id", smoothing=0.0)
    out = target_encode_oof(
        df, "cat", "y", id_col="id", n_folds=3,
        output_col="enc", keep_fold_col="f"
    )
    assert {"enc", "f"} <= set(out.columns)
    assert out.count() == len(pdf)
