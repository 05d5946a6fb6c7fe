"""Streaming trailing-horizon features: the real-time counterpart of
``operators.windows.multi_horizon_features`` ("the user's activity over
the last hour/day as of this event"), as a custom stateful operator.

No built-in streaming construct computes per-EVENT trailing aggregates
(windowed aggregation emits per-window rows, stream-stream joins can't
aggregate), so this is ``applyInPandasWithState``: each key's state is a
time-sorted buffer of (event_ms, value) pairs bounded by the largest
horizon (+ the disorder allowance), and every arriving event is answered
with prefix-sum lookups over that buffer — fully vectorized per
micro-batch, no per-row Python.

Ordering semantics (the append-mode reality): an event is scored at
ARRIVAL against everything currently buffered for its key. Because the
buffer retains ``max(horizons) + disorder_seconds`` of history, any event
arriving within ``disorder_seconds`` of its key's frontier is scored
EXACTLY (its full trailing window is still in the buffer, late
contributors included); rows already emitted are never revised (no
retraction in append mode). Null event times match nothing and
contribute nothing — the engine-wide convention.

State discipline (environment notes in CLAUDE.md): buffers are plain
Python lists of floats — numpy scalars crash the JVM-side Pyrolite
unpickler, and ints written into double state fields would be silently
nulled.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import check_output_names, horizon_label


def streaming_trailing_agg(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    horizons_seconds: Sequence[float] = (),
    *,
    stats: Sequence[str] = ("sum", "count"),
    half_lives_seconds: Sequence[float] = (),
    decay_stats: Sequence[str] = ("sum", "count"),
    truncate_half_lives: int = 96,
    include_current: bool = True,
    disorder_seconds: float = 0.0,
    prefix: Optional[str] = None,
    output_mode: str = "append",
) -> DataFrame:
    """Per-event trailing aggregates over a stream, exact for any
    disorder within ``disorder_seconds`` of each key's frontier.

    ``horizons_seconds`` emit hard-window aggregates; ``half_lives_seconds``
    emit 2^{-(t-t_i)/H} decayed aggregates (``{prefix_base}hl{H}_{stat}``,
    the streaming counterpart of ``operators.windows.time_decayed_features``
    — same per-chunk exponent re-centering, same below-double-precision
    truncation at ``truncate_half_lives``).

    Output: every input row (original columns) plus
    ``{prefix}{h}_{stat}`` columns — sums as nullable doubles (null when
    the window holds nothing), counts as longs (decayed counts as
    doubles — they are fractional). State per key is bounded by event
    rate × (max horizon, truncated decay window, + disorder) —
    independent of stream length.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    allowed = {"sum", "count", "mean", "min", "max"}
    for s in stats:
        if s not in allowed:
            raise ValueError(
                f"unknown stat '{s}'; choose from {sorted(allowed)}"
            )
    dallowed = {"sum", "count", "mean"}
    for s in decay_stats:
        if s not in dallowed:
            raise ValueError(
                f"unknown decay stat '{s}'; choose from {sorted(dallowed)}"
            )
    if not horizons_seconds and not half_lives_seconds:
        raise ValueError("need at least one horizon or half-life")
    for h in list(horizons_seconds) + list(half_lives_seconds):
        if h <= 0:
            raise ValueError("horizons/half-lives must be > 0 seconds")
    if truncate_half_lives < 1:
        raise ValueError("truncate_half_lives must be >= 1")
    base_prefix = prefix if prefix is not None else f"{value}_"
    # horizon_label keeps fractional horizons non-lossy (90.2 -> h90p2),
    # matching the batch twins' column names so stream/backfill joins
    # line up; check_output_names rejects duplicate/colliding names
    out_specs = [
        (f"{base_prefix}h{horizon_label(h)}_{s}", h, s)
        for h in horizons_seconds
        for s in stats
    ]
    decay_specs = [
        (f"{base_prefix}hl{horizon_label(h)}_{s}", h, s)
        for h in half_lives_seconds
        for s in decay_stats
    ]
    check_output_names(
        events.columns, [name for name, _, _ in out_specs + decay_specs]
    )

    spans = [float(h) for h in horizons_seconds] + [
        truncate_half_lives * float(h) for h in half_lives_seconds
    ]
    keep_ms = int(round((max(spans) + float(disorder_seconds)) * 1000))
    end_off = 0 if include_current else -1

    in_fields = list(events.schema.fields)
    field_names = [f.name for f in in_fields]
    out_schema = T.StructType(
        list(in_fields)
        + [
            T.StructField(
                name, T.LongType() if s == "count" else T.DoubleType()
            )
            for name, _, s in out_specs
        ]
        # decayed counts are fractional -> all decayed stats are doubles
        + [T.StructField(name, T.DoubleType()) for name, _, _ in decay_specs]
    )
    state_schema = "ts array<double>, v array<double>"

    # exact epoch-ms like the batch operator: timestamps via unix_micros
    # integer division (no FP at frame boundaries), numerics as seconds
    dtype = events.schema[ts].dataType
    tcol = F.col(ts)
    if isinstance(dtype, T.TimestampNTZType):
        tcol = tcol.cast("timestamp")
        dtype = T.TimestampType()
    if isinstance(dtype, T.TimestampType):
        ms_expr = F.floor(F.unix_micros(tcol) / F.lit(1000)).cast("double")
    else:
        ms_expr = (tcol.cast("double") * 1000).cast("long").cast("double")

    tagged = events.select(
        F.col(key).alias("__k"),
        ms_expr.alias("__ms"),
        F.col(value).cast("double").alias("__v"),
        F.struct(*[F.col(c) for c in events.columns]).alias("__payload"),
    )

    def _payload_tuple(p):
        if p is None:
            return tuple([None] * len(field_names))
        if isinstance(p, dict):
            return tuple(p.get(f) for f in field_names)
        if hasattr(p, "asDict"):
            return tuple(p.asDict().get(f) for f in field_names)
        return tuple(p)

    def _score(key_, pdf_iter, state: GroupState):
        import numpy as np

        if state.hasTimedOut:  # pragma: no cover - no TTL armed here
            state.remove()
            return
        buf_ts, buf_v = (
            (list(state.get[0] or []), list(state.get[1] or []))
            if state.exists
            else ([], [])
        )
        chunks = list(pdf_iter)
        if not chunks:
            state.update((buf_ts, buf_v))
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        # stable sort; null-ms rows sort last and are excluded from the
        # buffer AND from every frame (they emit with empty-window stats)
        pdf = pdf.sort_values("__ms", kind="mergesort")
        ev_ms = pdf["__ms"].to_numpy(dtype=float)
        ev_v = pdf["__v"].to_numpy(dtype=float)
        valid = ~np.isnan(ev_ms)

        # merged timeline: buffered history + this batch's valid events
        # (value null -> contributes nothing: excluded from sums/counts
        # but the event itself is still scored)
        m_ts = np.concatenate([np.asarray(buf_ts, dtype=float), ev_ms[valid]])
        m_v = np.concatenate([np.asarray(buf_v, dtype=float), ev_v[valid]])
        order = np.argsort(m_ts, kind="mergesort")
        m_ts, m_v = m_ts[order], m_v[order]
        has_v = ~np.isnan(m_v)
        # prefix aggregates over contributors only
        pv = np.concatenate([[0.0], np.cumsum(np.where(has_v, m_v, 0.0))])
        pc = np.concatenate([[0], np.cumsum(has_v.astype(np.int64))])

        out = pd.DataFrame(
            [_payload_tuple(p) for p in pdf["__payload"].to_numpy()],
            columns=field_names,
        )
        need_minmax = any(s in ("min", "max") for _, _, s in out_specs)
        for name, h, s in out_specs:
            h_ms = int(round(float(h) * 1000))
            lo = np.searchsorted(m_ts, ev_ms - h_ms, side="left")
            hi = np.searchsorted(m_ts, ev_ms + end_off, side="right")
            cnt = np.where(valid, pc[np.clip(hi, 0, None)] - pc[lo], 0)
            if s == "count":
                out[name] = pd.array(cnt, dtype="Int64")
                continue
            sm = np.where(valid, pv[hi] - pv[lo], 0.0)
            if s == "sum":
                col = np.where(cnt > 0, sm, np.nan)
            elif s == "mean":
                col = np.where(cnt > 0, sm / np.maximum(cnt, 1), np.nan)
            else:  # min / max: exact but O(window) per event — rare path
                col = np.full(len(ev_ms), np.nan)
                for i in range(len(ev_ms)):
                    if not valid[i] or cnt[i] == 0:
                        continue
                    w = m_v[lo[i]:hi[i]]
                    w = w[~np.isnan(w)]
                    if len(w):
                        col[i] = w.min() if s == "min" else w.max()
            out[name] = pd.array(col, dtype="Float64")

        # decayed stats: same construction as windows.time_decayed_features
        # — per probe-chunk (width C = T*H), contributors come from the
        # current + previous chunk slice with exponents re-centered on the
        # probe's chunk start, so nothing leaves [-T, T) and the chunked
        # prefix sums never mix scales
        hl_done = {}
        for h in {h for _, h, _ in decay_specs}:
            h_ms = float(h) * 1000.0
            c_width = truncate_half_lives * h_ms
            d_sum = np.full(len(ev_ms), np.nan)
            d_cnt = np.zeros(len(ev_ms))
            qc = np.floor(np.where(valid, ev_ms, 0.0) / c_width)
            for q in np.unique(qc[valid]):
                pm = valid & (qc == q)
                a = np.searchsorted(m_ts, (q - 1) * c_width, side="left")
                b = np.searchsorted(m_ts, (q + 1) * c_width, side="left")
                t_loc, v_loc = m_ts[a:b], m_v[a:b]
                hv = ~np.isnan(v_loc)
                w = np.power(2.0, (t_loc - q * c_width) / h_ms)
                cs_v = np.concatenate(
                    [[0.0], np.cumsum(np.where(hv, v_loc, 0.0) * w)]
                )
                cs_1 = np.concatenate([[0.0], np.cumsum(hv * w)])
                ev_q = ev_ms[pm]
                lo = np.searchsorted(t_loc, ev_q - c_width, side="left")
                hi = np.searchsorted(t_loc, ev_q + end_off, side="right")
                mult = np.power(2.0, -(ev_q - q * c_width) / h_ms)
                c = (cs_1[hi] - cs_1[lo]) * mult
                s = (cs_v[hi] - cs_v[lo]) * mult
                d_cnt[pm] = c
                d_sum[pm] = np.where(c > 0, s, np.nan)
            hl_done[h] = (d_sum, d_cnt)
        for name, h, s in decay_specs:
            ds, dc = hl_done[h]
            if s == "sum":
                col = ds
            elif s == "count":
                col = dc
            else:  # mean
                col = np.where(dc > 0, ds / np.maximum(dc, 1e-300), np.nan)
            out[name] = pd.array(col, dtype="Float64")

        # prune the buffer to the retention horizon behind the frontier
        if len(m_ts):
            cut = m_ts[-1] - keep_ms
            keep = m_ts >= cut
            buf_ts = [float(x) for x in m_ts[keep]]
            buf_v = [
                None if np.isnan(x) else float(x) for x in m_v[keep]
            ]
        state.update((buf_ts, buf_v))
        yield out

    return tagged.groupBy("__k").applyInPandasWithState(
        _score,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )
