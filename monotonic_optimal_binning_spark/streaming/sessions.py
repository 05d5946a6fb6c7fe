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


def streaming_exact_dedup(
    events: DataFrame,
    content_cols: Sequence[str],
    *,
    shards: int = 256,
    output_mode: str = "append",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose content was already seen in
    any earlier micro-batch (custom stateful operator via
    ``applyInPandasWithState``).

    The content fingerprint (JVM-side xxhash64) is sharded with
    ``pmod(fp, shards)`` and each shard keeps its seen-set as group state —
    state is partitioned across executors instead of one global set, which
    is the shape that scales: shard count bounds per-task state and the
    shuffle key is uniform by construction (a hash). Within a batch the
    FIRST arrival of a fingerprint survives (streaming arrival order; batch
    :func:`operators.dedup.exact_dedup` is the deterministic-winner analog).

    State grows with the number of distinct fingerprints; at corpus scale
    bound it by sharding more and/or a TTL policy upstream (state timeout
    deliberately not enabled here — dedup state must not silently expire).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fp = F.xxhash64(*[F.col(c) for c in content_cols])
    ev = events.withColumn("__fp", fp).withColumn(
        "__shard", F.pmod(F.col("__fp"), F.lit(shards)).cast("int")
    )
    out_schema = ev.schema

    def _dedup(key, pdf_iter, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            keep = (~pdf["__fp"].isin(seen)) & (
                ~pdf["__fp"].duplicated(keep="first")
            )
            new = pdf[keep]
            seen.update(int(v) for v in new["__fp"])
            if len(new):
                yield new
        state.update((sorted(seen),))

    out = ev.groupBy("__shard").applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType="seen array<bigint>",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.drop("__fp", "__shard")


def streaming_woe_lookup(events: DataFrame, model, value_col: str) -> DataFrame:
    """Apply a fitted FittedBins model to a stream (stateless pandas UDF —
    identical code path as batch transform; works under writeStream)."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf("double")
    def _woe(values):
        return model.assign_batch(values, "woe")

    return events.withColumn(f"{value_col}_woe", _woe(F.col(value_col)))
