"""Structured Streaming analogs of the windowed operators.

Batch sessionize (operators/windows.py) has a native streaming counterpart
in ``F.session_window``; tumbling aggregation uses ``F.window`` +
watermarks. These helpers return writeStream-ready DataFrames; tests drive
them with the rate/memory sources.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session aggregates per (key, session_window) with late-data watermark.

    Output: key, session start/end, n_events — the streaming analog of the
    batch gap-based sessionize.
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("session"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_tumbling_stats(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    stats: Sequence[str] = ("count", "avg", "sum"),
) -> DataFrame:
    """Tumbling-window statistics per key (watermarked)."""
    fns = {"count": F.count, "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    aggs = [fns[s](F.col(value)).alias(f"{value}_{s}") for s in stats]
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.window(F.col(ts), window).alias("w"))
        .agg(*aggs)
        .select(
            key, F.col("w.start").alias("window_start"), *[f"{value}_{s}" for s in stats]
        )
    )


def streaming_woe_lookup(events: DataFrame, model, value_col: str) -> DataFrame:
    """Apply a fitted FittedBins model to a stream (stateless pandas UDF —
    identical code path as batch transform; works under writeStream)."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf("double")
    def _woe(values):
        return model.assign_batch(values, "woe")

    return events.withColumn(f"{value_col}_woe", _woe(F.col(value_col)))
