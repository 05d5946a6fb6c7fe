"""snapshot_at (point-in-time table state) and intervalize (SCD-2
validity intervals): pandas ground truth, tie/null conventions, the
no-window algebraic plan, and the snapshot == interval-containment
consistency property."""

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.asof import (
    intervalize,
    snapshot_at,
)


def _updates(seed=51, n=200, k=6):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "uid": np.arange(n),
            "key": rng.integers(0, k, n),
            "ts": rng.uniform(0, 1000, n).round(3),
            "state": rng.choice(["a", "b", "c"], n),
        }
    )
    pdf.loc[rng.choice(n, 5, replace=False), "ts"] = np.nan
    # force same-ms ties
    pdf.loc[10, ["key", "ts"]] = [0, pdf.loc[11, "ts"]]
    pdf.loc[11, "key"] = 0
    return pdf


def _truth_snapshot(pdf, at_s):
    ok = pdf[pdf["ts"].notna()].copy()
    ok["ms"] = np.trunc(ok["ts"].to_numpy(dtype=np.float64) * 1000)
    ok = ok[ok["ms"] <= at_s * 1000]
    ok = ok.sort_values(["ms", "uid"]).groupby("key").last()
    return ok


def test_snapshot_matches_pandas_truth(spark):
    pdf = _updates()
    at = 600.0
    got = (
        snapshot_at(
            spark.createDataFrame(pdf), "key", "ts", at,
            value_cols=["uid", "state"], tiebreak="uid",
        )
        .toPandas()
        .set_index("key")
        .sort_index()
    )
    want = _truth_snapshot(pdf, at)
    assert got.index.tolist() == want.index.tolist()
    assert got["uid"].tolist() == want["uid"].tolist()
    assert got["state"].tolist() == want["state"].tolist()
    assert got["as_of_ms"].tolist() == want["ms"].astype(int).tolist()


def test_snapshot_plan_is_algebraic_no_window(spark):
    """The argmax must combine map-side: a PARTIAL + final aggregate
    pair over one exchange, zero Window operators (a hot key costs
    partial merges, not one sorted task). max_by's struct buffer isn't
    hash-aggregable, so Spark plans SortAggregate — the partial stage
    (2 aggregate nodes) is the load-bearing property."""
    from tests.test_plans import SF, count_exchanges, plan_of

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    out = snapshot_at(
        ev, "user_id", "ts", "2024-01-15",
        value_cols=["value"], tiebreak="event_id",
    )
    plan = plan_of(out, "simple")
    assert "Window" not in plan, plan
    assert count_exchanges(out) == 1, plan
    assert plan.count("Aggregate(") == 2, plan


def test_intervalize_and_consistency_with_snapshot(spark):
    """Every snapshot_at(T) row equals the unique intervalize row whose
    [from, to) interval contains T*1000 — the closed-open contract."""
    pdf = _updates(seed=57)
    df = spark.createDataFrame(pdf)
    iv = intervalize(df, "key", "ts", tiebreak="uid").toPandas()
    assert iv["valid_from_ms"].notna().all()
    # null ts rows dropped
    assert len(iv) == int(pdf["ts"].notna().sum())
    for at in (100.0, 600.0, 999.0):
        t_ms = at * 1000
        hit = iv[
            (iv["valid_from_ms"] <= t_ms)
            & (iv["valid_to_ms"].isna() | (iv["valid_to_ms"] > t_ms))
        ].set_index("key").sort_index()
        snap = (
            snapshot_at(
                df, "key", "ts", at, value_cols=["uid"], tiebreak="uid"
            )
            .toPandas()
            .set_index("key")
            .sort_index()
        )
        # zero-length [t, t) tie intervals never contain t — at most one
        # hit per key, and it is the snapshot's pick whenever ts != t
        assert hit.index.tolist() == snap.index.tolist()
        exact_tie = hit["valid_from_ms"] == t_ms
        assert (
            hit.loc[~exact_tie, "uid"].tolist()
            == snap.loc[~exact_tie.reindex(snap.index, fill_value=False),
                        "uid"].tolist()
        )


def test_intervalize_tie_break_is_deterministic(spark):
    pdf = pd.DataFrame(
        {
            "uid": [0, 1, 2],
            "key": [1, 1, 1],
            "ts": [10.0, 10.0, 20.0],
            "state": ["a", "b", "c"],
        }
    )
    iv = (
        intervalize(spark.createDataFrame(pdf), "key", "ts", tiebreak="uid")
        .toPandas()
        .set_index("uid")
        .sort_index()
    )
    # uid 0 ends at the tied uid 1 (zero-length), uid 1 ends at uid 2
    assert iv.loc[0, "valid_to_ms"] == 10000
    assert iv.loc[1, "valid_to_ms"] == 20000
    assert pd.isna(iv.loc[2, "valid_to_ms"])
