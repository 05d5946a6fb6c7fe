"""Scorecard PDO points scaling (scorecard.py): anchoring, table/transform
consistency, JSON round-trip, missing/excluded neutrality."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import SparkMonotonicBinner
from monotonic_optimal_binning_spark.core.constraints import (
    BinningConstraints,
)
from monotonic_optimal_binning_spark.scorecard import Scorecard


@pytest.fixture(scope="module")
def two_feature_models(spark):
    rng = np.random.RandomState(3)
    n = 3000
    x1 = rng.uniform(0, 10, n).round(1)
    x2 = rng.uniform(-5, 5, n).round(1)
    p = 1 / (1 + np.exp(-(0.5 * x1 - 0.4 * x2 - 2.0)))
    y = (rng.uniform(size=n) < p).astype(int)
    pdf = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    pdf.loc[pdf.index % 41 == 0, "x1"] = np.nan
    df = spark.createDataFrame(pdf)
    c = BinningConstraints(max_bins=5, min_bins=2)
    m1 = SparkMonotonicBinner("x1", "y", constraints=c).fit(df)._model()
    m2 = SparkMonotonicBinner("x2", "y", constraints=c).fit(df)._model()
    return df, pdf, {"x1": m1, "x2": m2}


def test_neutral_applicant_anchors_at_base(two_feature_models):
    """All-unknown applicant (WoE 0 everywhere) scores exactly
    base_points when the model's good-odds intercept sits at
    ln(base_odds)."""
    _, _, models = two_feature_models
    card = Scorecard(
        models, intercept=math.log(50.0), pdo=20.0,
        base_points=600.0, base_odds=50.0, round_points=False,
    )
    total = sum(card.neutral_points(f) for f in models)
    assert total == pytest.approx(600.0)


def test_pdo_semantics(two_feature_models):
    """A woe shift of +ln(2)/coef on one feature adds exactly pdo points
    (odds of good double)."""
    _, _, models = two_feature_models
    card = Scorecard(models, coefs={"x1": 0.8, "x2": 1.2},
                     round_points=False)
    p0 = card._points_of_woe("x1", np.array([0.3]))[0]
    p1 = card._points_of_woe("x1", np.array([0.3 + math.log(2) / 0.8]))[0]
    assert p1 - p0 == pytest.approx(20.0)


def test_transform_matches_points_table(two_feature_models):
    df, pdf, models = two_feature_models
    card = Scorecard(models, coefs={"x1": 0.9, "x2": 1.1},
                     intercept=-2.0)
    got = (
        card.transform(df, keep_feature_points=True)
        .select("x1", "x2", "x1_points", "x2_points", "score")
        .toPandas()
    )
    # row-wise truth straight from the driver-side artifact
    for feat, m in models.items():
        woe = m.assign_batch(got[feat], "woe").to_numpy()
        woe = np.nan_to_num(woe, nan=0.0)
        want = card._points_of_woe(feat, woe)
        assert np.allclose(got[f"{feat}_points"].to_numpy(), want)
    assert (got["score"] == got["x1_points"] + got["x2_points"]).all()
    assert str(got["score"].dtype) == "int64"  # integer card
    # every emitted point value appears in the human-readable table
    table = card.points_table_()
    for feat in models:
        assert set(got[f"{feat}_points"]) <= set(
            table[table["feature"] == feat]["points"]
        )


def test_missing_gets_neutral_points(two_feature_models):
    df, _, models = two_feature_models
    card = Scorecard(models)
    got = (
        card.transform(df, keep_feature_points=True)
        .filter(F.col("x1").isNull())
        .select("x1_points")
        .distinct()
        .collect()
    )
    assert len(got) == 1
    assert got[0][0] == card.neutral_points("x1")


def test_round_trip_json(two_feature_models, tmp_path):
    df, _, models = two_feature_models
    card = Scorecard(models, coefs={"x1": 0.7, "x2": 1.3},
                     intercept=-1.5, pdo=25.0, base_points=500.0,
                     base_odds=20.0)
    p = str(tmp_path / "scorecard.json")
    card.save_json(p)
    loaded = Scorecard.load_json(p)
    pd.testing.assert_frame_equal(
        card.points_table_(), loaded.points_table_()
    )
    a = card.transform(df).select("score").toPandas()
    b = loaded.transform(df).select("score").toPandas()
    assert (a["score"] == b["score"]).all()


def test_transform_is_shuffle_free(two_feature_models):
    df, _, models = two_feature_models
    out = Scorecard(models).transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_from_cuts_transform_and_card(spark):
    """Bring-your-own-bins artifact: explicit cuts + woes serve the same
    transform/Scorecard surface as a fitted model."""
    from monotonic_optimal_binning_spark import FittedBins

    m = FittedBins.from_cuts("x", [10.0, 25.0], [0.6, 0.0, -0.7])
    pdf = pd.DataFrame({"x": [5.0, 10.0, 24.9, 25.0, 99.0, np.nan]})
    df = spark.createDataFrame(pdf)
    woe = m.transform(df, assign="woe", output_col="w").toPandas()["w"]
    assert np.allclose(
        woe.to_numpy(), [0.6, 0.0, 0.0, -0.7, -0.7, np.nan], equal_nan=True
    )
    with pytest.raises(ValueError):
        FittedBins.from_cuts("x", [10.0, 5.0], [0.1, 0.2, 0.3])
    with pytest.raises(ValueError):
        FittedBins.from_cuts("x", [10.0], [0.1, 0.2, 0.3])
    # JSON round-trip of the constructed artifact
    d = m.to_dict()
    m2 = FittedBins.from_dict(d)
    woe2 = m2.transform(df, assign="woe", output_col="w").toPandas()["w"]
    assert np.allclose(woe.to_numpy(), woe2.to_numpy(), equal_nan=True)


def test_reason_codes(spark):
    from monotonic_optimal_binning_spark import FittedBins

    m1 = FittedBins.from_cuts("x1", [10.0], [0.5, -0.5])   # swing 1.0
    m2 = FittedBins.from_cuts("x2", [0.5], [0.2, -0.2])    # swing 0.4
    card = Scorecard({"x1": m1, "x2": m2}, round_points=False)
    pdf = pd.DataFrame(
        {
            "x1": [5.0, 20.0, 20.0, 5.0, np.nan],
            "x2": [0.1, 0.9, 0.1, 0.9, 0.9],
        }
    )
    df = spark.createDataFrame(pdf)
    got = card.reason_codes(df, top_k=2).toPandas()
    # row 0: both at best bins -> no reasons
    assert list(got.loc[0, "reasons"]) == []
    # row 1: both at worst; x1's deficit (factor*1.0) > x2's (factor*0.4)
    assert list(got.loc[1, "reasons"]) == ["x1", "x2"]
    # row 2: only x1 adverse
    assert list(got.loc[2, "reasons"]) == ["x1"]
    # row 3: only x2 adverse
    assert list(got.loc[3, "reasons"]) == ["x2"]
    # row 4: x1 missing -> neutral (deficit factor*0.5), x2 worst
    # (deficit factor*0.4): x1 costs more
    assert list(got.loc[4, "reasons"]) == ["x1", "x2"]
    # top_k truncation
    got1 = card.reason_codes(df, top_k=1).toPandas()
    assert list(got1.loc[1, "reasons"]) == ["x1"]
    # score column still correct and present
    assert "score" in got.columns
    # no shuffle anywhere
    out = card.reason_codes(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_validation(two_feature_models):
    _, _, models = two_feature_models
    with pytest.raises(ValueError):
        Scorecard({})
    with pytest.raises(ValueError):
        Scorecard(models, coefs={"nope": 1.0})
    with pytest.raises(ValueError):
        Scorecard(models, pdo=0.0)
