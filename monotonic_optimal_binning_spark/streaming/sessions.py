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


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: Sequence[str],
    *,
    right_prefix: str = "",
    output_mode: str = "append",
) -> DataFrame:
    """Streaming point-in-time enrichment: each left event gets the most
    recent right-side values AT OR BEFORE its timestamp (backward as-of,
    zero temporal leakage) — a custom stateful operator via
    ``applyInPandasWithState``.

    Plan: the two streams union with a side tag, group by the join key, and
    each key's state carries (last right ts, last right values). Within a
    micro-batch rows are sorted by (ts, side) with right-before-left at
    equal ts (exact-match semantics of the batch :func:`operators.asof
    .asof_join`); across micro-batches the state carries the newest right
    row forward, and the carried value is applied ONLY to left rows whose
    event time is at or after the state's right-side ts — a left row
    arriving late (older event time than the carried right row) gets null
    rather than a value from its temporal future, enforcing the
    zero-leakage contract instead of merely documenting it. A right row
    arriving late is still applied from its processing point onward, never
    retroactively — the streaming-world trade-off, stated rather than
    hidden.

    ``value_cols`` are carried as doubles in state (fixed state schema).
    Output: left rows + prefixed value columns.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_names = [right_prefix + c for c in value_cols]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(ts).cast("double").alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__payload"),
        *[F.lit(None).cast("double").alias(f"__v{i}") for i in range(len(value_cols))],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(ts).cast("double").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__payload"].dataType
        ).alias("__payload"),
        *[
            F.col(c).cast("double").alias(f"__v{i}")
            for i, c in enumerate(value_cols)
        ],
    )
    unioned = l_tagged.unionByName(r_tagged)

    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(n, T.DoubleType()) for n in out_names]
    )
    state_schema = "ts double, " + ", ".join(
        f"v{i} double" for i in range(len(value_cols))
    )
    n_vals = len(value_cols)
    left_fields = [f.name for f in left.schema.fields]

    def _enrich(key, pdf_iter, state: GroupState):
        # fully vectorized batch body (no per-row Python): the (ts, side)
        # sort puts each left row after every eligible right row, so the
        # matching right row index is prefix_count_of_rights - 1; index -1
        # falls back to the carried state value
        import numpy as np

        cur = list(state.get) if state.exists else [None] * (1 + n_vals)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
            is_right = (pdf["__side"].to_numpy() == 0)
            is_left = ~is_right
            if is_left.any():
                prefix_rights = np.cumsum(is_right)[is_left]  # per left row
                match_idx = prefix_rights - 1
                left_ts = pdf["__ts"].to_numpy(dtype=float)[is_left]
                # the carried state value is only eligible when the state's
                # right-side ts is AT OR BEFORE the left row's event time —
                # a left row arriving in a later micro-batch with an OLDER
                # event time must NOT see a right value from its temporal
                # future (the zero-leakage contract); it gets null instead
                if cur[0] is None:
                    state_ok = np.zeros(left_ts.shape, dtype=bool)
                else:
                    state_ok = cur[0] <= left_ts
                out = pd.DataFrame(
                    list(pdf["__payload"].to_numpy()[is_left]),
                    columns=left_fields,
                )
                for i, name in enumerate(out_names):
                    rv = pdf[f"__v{i}"].to_numpy(dtype=float)[is_right]
                    state_v = np.nan if cur[1 + i] is None else cur[1 + i]
                    col = np.where(
                        match_idx >= 0,
                        rv[np.clip(match_idx, 0, None)] if len(rv) else np.nan,
                        np.where(state_ok, state_v, np.nan),
                    )
                    # nullable Float64 so no-match NaN arrives as SQL NULL
                    # (matching the batch as-of), not as a NaN double
                    out[name] = pd.array(col, dtype="Float64")
                yield out
            if is_right.any():
                last = int(np.nonzero(is_right)[0][-1])
                cur[0] = float(pdf["__ts"].iloc[last])
                for i in range(n_vals):
                    v = pdf[f"__v{i}"].iloc[last]
                    cur[1 + i] = None if pd.isna(v) else float(v)
        state.update(tuple(cur))

    out = unioned.groupBy("__k").applyInPandasWithState(
        _enrich,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out


def streaming_woe_lookup(events: DataFrame, model, value_col: str) -> DataFrame:
    """Apply a fitted FittedBins model to a stream (stateless pandas UDF —
    identical code path as batch transform; works under writeStream)."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf("double")
    def _woe(values):
        return model.assign_batch(values, "woe")

    return events.withColumn(f"{value_col}_woe", _woe(F.col(value_col)))
