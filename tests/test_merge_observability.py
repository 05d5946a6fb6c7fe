"""Merge-iteration lineage (history snapshots), merge-result warnings, and
strict-JSON model export — reference observability surface parity
(/root/reference/src/MOBPY/core/merge.py:413,545-546,629-685,952-953)."""

import json
import logging
import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import (
    BinningConstraints,
    BinningProgressLogger,
    SparkMonotonicBinner,
    set_verbosity,
)
from monotonic_optimal_binning_spark.core.blocks import Block
from monotonic_optimal_binning_spark.core.merge import (
    _validate_merge_result,
    merge_adjacent,
)
from monotonic_optimal_binning_spark.operators.binning import FittedBins


def _li_xy(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return li.select(
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )


# ----------------------------------------------------------- merge history --


def test_history_snapshot_count_matches_iterations(spark):
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=2)
    ).fit(_li_xy(spark))
    m = b.merge_metrics_
    assert len(b.merge_history_) == m.phase1_iterations + m.phase2_iterations
    assert len(b.merge_history_) > 0
    # each snapshot is one smaller than the previous block table
    lens = [m.initial_blocks] + [len(s) for s in b.merge_history_]
    assert all(lens[i] - 1 == lens[i + 1] for i in range(len(lens) - 1))
    assert lens[-1] == m.final_blocks
    # snapshots are plain block dicts (reference _snapshot shape)
    assert set(b.merge_history_[0][0]) >= {"left", "right", "n", "sum", "mean"}
    # surfaced through diagnostics
    d = b.get_diagnostics()
    assert d["merge_history_len"] == len(b.merge_history_)
    assert d["merge_history"] is b.merge_history_


def test_history_optional_in_merge_adjacent():
    blocks = [
        Block(float("-inf"), 1.0, 50, 10.0, 5.0, 0.0, 1.0),
        Block(1.0, 2.0, 50, 12.0, 6.0, 0.0, 1.0),
        Block(2.0, float("inf"), 50, 30.0, 20.0, 0.0, 1.0),
    ]
    c = BinningConstraints(max_bins=2, min_bins=1)
    c.resolve(total_n=150)
    hist = []
    merged = merge_adjacent(blocks, c, False, history=hist)
    assert len(merged) <= 2
    assert len(hist) == len(blocks) - len(merged)
    # default (history=None) unchanged
    merged2 = merge_adjacent(blocks, c, False)
    assert [b.as_dict() for b in merged2] == [b.as_dict() for b in merged]


# --------------------------------------------------------- merge warnings --


def _resolved(total_n=100, **kw):
    c = BinningConstraints(**kw)
    c.resolve(total_n=total_n)
    return c


def test_warns_on_missing_inf_edges():
    blocks = [Block(0.0, 1.0, 50, 10.0, 5.0, 0.0, 1.0),
              Block(1.0, 2.0, 50, 12.0, 6.0, 0.0, 1.0)]
    with pytest.warns(UserWarning, match="does not start at -inf"):
        _validate_merge_result(blocks, _resolved(max_bins=4, min_bins=1))
    with pytest.warns(UserWarning, match="does not end at [+]inf"):
        _validate_merge_result(blocks, _resolved(max_bins=4, min_bins=1))


def test_warns_on_undersized_bins():
    blocks = [Block(float("-inf"), 1.0, 3, 1.0, 1.0, 0.0, 1.0),
              Block(1.0, 2.0, 97, 40.0, 30.0, 0.0, 1.0),
              Block(2.0, float("inf"), 100, 50.0, 40.0, 0.0, 1.0)]
    c = _resolved(total_n=200, max_bins=5, min_bins=1, min_samples=10)
    with pytest.warns(UserWarning, match="fewer than"):
        _validate_merge_result(blocks, c)


def test_warns_on_oversized_bins():
    blocks = [Block(float("-inf"), 1.0, 90, 10.0, 8.0, 0.0, 1.0),
              Block(1.0, float("inf"), 10, 4.0, 3.0, 0.0, 1.0)]
    c = _resolved(total_n=100, max_bins=5, min_bins=1, max_samples=50)
    with pytest.warns(UserWarning, match="exceed max_samples"):
        _validate_merge_result(blocks, c)


def test_clean_result_warns_nothing(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SparkMonotonicBinner(
            "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=2)
        ).fit(_li_xy(spark))


# ------------------------------------------------------- strict JSON export --


def test_model_json_is_strict(spark, tmp_path):
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=2)
    ).fit(_li_xy(spark))
    p = str(tmp_path / "model.json")
    b.model_.save_json(p)

    def _reject(_):
        raise ValueError("non-standard JSON literal")

    with open(p) as f:
        d = json.load(f, parse_constant=_reject)  # Infinity/NaN would raise
    assert d["lefts"][0] == "-inf" and d["rights"][-1] == "inf"

    loaded = FittedBins.load_json(p)
    np.testing.assert_array_equal(loaded.lefts, b.model_.lefts)
    np.testing.assert_array_equal(loaded.rights, b.model_.rights)
    vals = np.array([-1e9, 0.5, 13.0, 27.5, 1e9])
    import pandas as pd

    for mode in ("interval", "left", "right", "woe"):
        a = b.model_.assign_batch(pd.Series(vals), mode)
        c = loaded.assign_batch(pd.Series(vals), mode)
        np.testing.assert_array_equal(a.to_numpy(), c.to_numpy())


# --------------------------------------------------------- progress logger --


def test_progress_logger(caplog):
    set_verbosity("DEBUG")
    try:
        with caplog.at_level(logging.DEBUG, logger="mob_spark.progress"):
            with BinningProgressLogger("unit-stage") as p:
                p.update("step one")
                p.update("step two")
        msgs = [r.getMessage() for r in caplog.records]
        assert any("starting unit-stage" in m for m in msgs)
        assert any("step one" in m for m in msgs)
        assert any("completed unit-stage (2 steps" in m for m in msgs)

        caplog.clear()
        with pytest.raises(RuntimeError):
            with BinningProgressLogger("boom"):
                raise RuntimeError("kaput")
        assert any("failed in boom" in r.getMessage() for r in caplog.records)
    finally:
        set_verbosity("WARNING")
