"""Windowed feature operators: lag/lead, backfill, sessionize, rolling stats.

New per BASELINE.json north_rule (the reference has no window functions,
SURVEY.md §2.9). All pure DataFrame/window compositions — whole-stage
codegen end to end, one shuffle on the partition key per distinct
(partitionBy, orderBy) pair; chaining several of these operators with the
same (key, ts) reuses the exchange.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_millis, epoch_seconds


def _keys(key: str | Sequence[str]):
    return [key] if isinstance(key, str) else list(key)


def horizon_label(h) -> str:
    """Non-lossy column-name fragment for a horizon/half-life in seconds.

    Integral horizons keep the bare-integer form (``3600``); fractional
    ones use ``p`` for the decimal point (``90.2`` -> ``90p2``) so two
    horizons sharing an integer part never alias the same output column.
    """
    hf = float(h)
    if hf.is_integer():
        return str(int(hf))
    return repr(hf).replace(".", "p").replace("-", "m")


def check_output_names(existing: Sequence[str], names: Sequence[str]) -> None:
    """Generated feature names must be pairwise distinct and absent from
    the input — a silent overwrite of a user column (or of a sibling
    horizon's output) is the failure mode this guards."""
    seen = set()
    for n in names:
        if n in seen:
            raise ValueError(
                f"generated output column '{n}' is not unique across "
                f"horizons/stats; set a distinct prefix or horizons"
            )
        seen.add(n)
        if n in existing:
            raise ValueError(
                f"output column '{n}' collides with an existing input "
                f"column; set prefix"
            )


def _order_cols(ts: str, tiebreak: Sequence[str]):
    """Deterministic window ordering: event time first, then tiebreaks
    (equal timestamps otherwise make lag/lead/rolling results run-dependent)."""
    return [ts, *tiebreak]


def with_lag_lead(
    df: DataFrame,
    cols: Sequence[str],
    key: str | Sequence[str],
    ts: str,
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add ``{col}_lag{k}`` / ``{col}_lead{k}`` columns per entity time line."""
    w = Window.partitionBy(*_keys(key)).orderBy(*_order_cols(ts, tiebreak))
    out = df
    for c in cols:
        for k in lags:
            out = out.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
        for k in leads:
            out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def with_lag_lead_bucketed(
    df: DataFrame,
    cols: Sequence[str],
    key: str | Sequence[str],
    ts: str,
    bucket_seconds: float,
    *,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-resistant lag-1/lead-1: identical output to
    :func:`with_lag_lead` with ``lags=[1], leads=[1]`` — the hot-key fix
    for the per-entity serial window (same decision rule as the other
    ``*_bucketed`` variants).

    Plan: lag/lead locally inside (key, time-bucket) partitions; each
    bucket's FIRST and LAST row values (min_by/max_by over the order key —
    one summary row per bucket) provide the boundary carry: a bucket's
    first row takes the previous bucket's last value as its lag, its last
    row takes the next bucket's first value as its lead. Only lag 1 /
    lead 1 are supported — deeper offsets would need k boundary rows
    carried per bucket; use the plain window for those.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = _keys(key)
    order = _order_cols(ts, tiebreak)
    tsd = epoch_seconds(df, ts)
    work = df.withColumn(
        "__b", F.floor(tsd / F.lit(float(bucket_seconds))).cast("long")
    )
    w1 = Window.partitionBy(*keys, "__b").orderBy(*order)
    okey = F.struct(*[F.col(o) for o in order])
    for c in cols:
        work = work.withColumn(f"__lag_{c}", F.lag(c).over(w1)).withColumn(
            f"__lead_{c}", F.lead(c).over(w1)
        )
    work = work.withColumn("__rn", F.row_number().over(w1)).withColumn(
        "__rn_max", F.count(F.lit(1)).over(Window.partitionBy(*keys, "__b"))
    )

    summ = work.groupBy(*keys, "__b").agg(
        *[F.max_by(F.col(c), okey).alias(f"__last_{c}") for c in cols],
        *[F.min_by(F.col(c), okey).alias(f"__first_{c}") for c in cols],
    )
    w2 = Window.partitionBy(*keys).orderBy("__b")
    carry = summ.select(
        *keys,
        "__b",
        *[F.lag(f"__last_{c}").over(w2).alias(f"__prev_{c}") for c in cols],
        *[F.lead(f"__first_{c}").over(w2).alias(f"__next_{c}") for c in cols],
    )
    out = work.join(carry, on=[*keys, "__b"])
    for c in cols:
        out = (
            out.withColumn(
                f"{c}_lag1",
                F.when(F.col("__rn") == 1, F.col(f"__prev_{c}")).otherwise(
                    F.col(f"__lag_{c}")
                ),
            )
            .withColumn(
                f"{c}_lead1",
                F.when(
                    F.col("__rn") == F.col("__rn_max"), F.col(f"__next_{c}")
                ).otherwise(F.col(f"__lead_{c}")),
            )
            .drop(f"__lag_{c}", f"__lead_{c}", f"__prev_{c}", f"__next_{c}",
                  f"__last_{c}", f"__first_{c}")
        )
    return out.drop("__b", "__rn", "__rn_max")


def backfill(
    df: DataFrame,
    cols: Sequence[str],
    key: str | Sequence[str],
    ts: str,
    direction: str = "forward",
    output_suffix: str = "_filled",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Forward-fill (carry last observation) or backward-fill null values.

    forward:  last(col, ignorenulls) over (-inf, current]
    backward: first(col, ignorenulls) over [current, +inf)
    """
    keys = _keys(key)
    order = _order_cols(ts, tiebreak)
    if direction == "forward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be forward|backward, got {direction}")

    out = df
    for c in cols:
        out = out.withColumn(c + output_suffix, fill(c))
    return out


def backfill_bucketed(
    df: DataFrame,
    cols: Sequence[str],
    key: str | Sequence[str],
    ts: str,
    bucket_seconds: float,
    output_suffix: str = "_filled",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-resistant forward-fill: identical output to
    :func:`backfill` (forward direction), without the per-entity serial
    window a hot key would funnel into one task.

    Plan: fill LOCALLY inside (key, time-bucket) partitions; each bucket's
    LAST non-null value per column (a ``max_by`` over the bucket — ignores
    rows whose ordering key is nulled out) forms a one-row-per-bucket
    summary; a window over the tiny summary carries the most recent
    non-null value across PRECEDING buckets, and rows whose local fill is
    still null coalesce with their bucket's carry-in. Same stitching
    pattern as :func:`sessionize_bucketed` / ``asof_join_bucketed``.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = _keys(key)
    order = _order_cols(ts, tiebreak)
    tsd = epoch_seconds(df, ts)
    work = df.withColumn(
        "__b", F.floor(tsd / F.lit(float(bucket_seconds))).cast("long")
    )
    w1 = (
        Window.partitionBy(*keys, "__b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in cols:
        work = work.withColumn(
            f"__local_{c}", F.last(c, ignorenulls=True).over(w1)
        )

    # bucket's last non-null value per col: max_by with the ordering key
    # nulled out for null values (max_by skips null ordering keys)
    okey = F.struct(*[F.col(o) for o in order])
    summ = work.groupBy(*keys, "__b").agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), okey)).alias(
                f"__last_{c}"
            )
            for c in cols
        ]
    )
    w2 = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ.select(
        *keys,
        "__b",
        *[
            F.last(f"__last_{c}", ignorenulls=True).over(w2).alias(f"__carry_{c}")
            for c in cols
        ],
    )
    out = work.join(carry, on=[*keys, "__b"])
    for c in cols:
        out = out.withColumn(
            c + output_suffix,
            F.coalesce(F.col(f"__local_{c}"), F.col(f"__carry_{c}")),
        ).drop(f"__local_{c}", f"__carry_{c}")
    return out.drop("__b")


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per entity.

    A new session starts when the time since the previous event exceeds
    ``gap_seconds`` (or at the first event). Session id is the 0-based
    session index within the entity; ``{session_col}_start`` carries the
    session's first event time for global uniqueness via (key, start).
    Streaming analog: F.session_window (streaming/sessions.py).
    """
    keys = _keys(key)
    order = _order_cols(ts, tiebreak)
    w = Window.partitionBy(*keys).orderBy(*order)
    tsd = epoch_seconds(df, ts)
    prev = F.lag(tsd).over(w)
    is_new = F.when(
        prev.isNull() | ((tsd - prev) > F.lit(float(gap_seconds))), 1
    ).otherwise(0)
    out = df.withColumn("__is_new", is_new)
    wrun = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(session_col, F.sum("__is_new").over(wrun) - 1)
    # session start = carry-forward of each session leader's event time
    # over the SAME (key, order) window the id sum already uses — a
    # min(ts) over a (key, session_id) partition would force a second
    # Exchange + Sort of the full input (measured ~30% of the operator at
    # sf1). Equal by construction: rows are ordered by (ts, tiebreak), so
    # a session's first row carries its minimum ts, and a null/NaN-ts row
    # is always its own singleton session (lag(ts) of the FOLLOWING row
    # is null/NaN, which re-triggers is_new), so null-start sessions
    # cannot mix with real timestamps — pinned by
    # tests/test_windows.py::test_sessionize_start_matches_min_window.
    # struct-wrapped so a NULL-ts leader still carries (a non-null struct
    # holding null) instead of falling through to the previous session's
    # start — min(ts) over a singleton null-ts session is null, and so is
    # this
    out = out.withColumn(
        f"{session_col}_start",
        F.last(
            F.when(F.col("__is_new") == 1, F.struct(F.col(ts).alias("t"))),
            ignorenulls=True,
        ).over(wrun)["t"],
    )
    return out.drop("__is_new")


def sessionize_bucketed(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    gap_seconds: float,
    bucket_seconds: float,
    session_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-resistant sessionize: identical output to :func:`sessionize`
    (same 0-based per-entity session ids and ``{session_col}_start``), but
    no per-entity serial window — the fix for a hot key whose event stream
    is too large for one task's sort.

    Plan: events are sessionized LOCALLY inside (key, time-bucket)
    partitions (parallel across a hot key's buckets); a per-(key, bucket)
    summary — first/last ts and local session count, ONE row per bucket —
    is stitched with a window over the tiny summary table: a bucket's
    first local session merges with the previous bucket's last session
    when the boundary gap is within ``gap_seconds``, and the cumulative
    (sessions so far − merges so far) gives each bucket's global id
    offset. Session starts come from a map-side-combinable groupBy on the
    final (key, session) key — finer than the per-key window the plain
    version sorts on, so the hot key's work stays spread out.

    Any ``bucket_seconds`` > 0 is correct (merge logic compares adjacent
    EXISTING buckets, so buckets smaller than the gap still chain); choose
    it so one bucket's events fit a task comfortably.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = _keys(key)
    order = _order_cols(ts, tiebreak)
    tsd = epoch_seconds(df, ts)
    work = df.withColumn("__tsd", tsd).withColumn(
        "__b", F.floor(F.col("__tsd") / F.lit(float(bucket_seconds))).cast("long")
    )
    w1 = Window.partitionBy(*keys, "__b").orderBy(*order)
    prev = F.lag("__tsd").over(w1)
    is_new = F.when(
        prev.isNull()
        | ((F.col("__tsd") - prev) > F.lit(float(gap_seconds))),
        1,
    ).otherwise(0)
    wrun1 = (
        Window.partitionBy(*keys, "__b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    work = work.withColumn("__is_new", is_new).withColumn(
        "__lsid", F.sum("__is_new").over(wrun1) - 1
    )

    summ = work.groupBy(*keys, "__b").agg(
        F.min("__tsd").alias("__first"),
        F.max("__tsd").alias("__last"),
        (F.max("__lsid") + 1).alias("__n_sess"),
    )
    w2 = Window.partitionBy(*keys).orderBy("__b")
    prev_last = F.lag("__last").over(w2)
    merge = F.when(
        prev_last.isNotNull()
        & ((F.col("__first") - prev_last) <= F.lit(float(gap_seconds))),
        1,
    ).otherwise(0)
    wrun2 = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = summ.withColumn("__merge", merge).withColumn(
        "__off",
        F.sum("__n_sess").over(wrun2)
        - F.col("__n_sess")
        - F.sum("__merge").over(wrun2),
    )
    out = work.join(offs.select(*keys, "__b", "__off"), on=[*keys, "__b"])
    out = out.withColumn(
        session_col, (F.col("__lsid") + F.col("__off")).cast("long")
    )
    starts = out.groupBy(*keys, session_col).agg(
        F.min(ts).alias(f"{session_col}_start")
    )
    out = out.join(starts, on=[*keys, session_col])
    return out.drop("__tsd", "__b", "__is_new", "__lsid", "__off")


def rolling_stats(
    df: DataFrame,
    value: str,
    key: str | Sequence[str],
    ts: str,
    *,
    n_rows: Optional[int] = None,
    range_seconds: Optional[float] = None,
    stats: Sequence[str] = ("mean", "sum", "min", "max", "count"),
    prefix: Optional[str] = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Trailing-window statistics per entity (row-count or time-range frame).

    The produced columns are exactly the "derived per-window statistics"
    the north_star bins into monotone WoE buckets downstream.
    """
    keys = _keys(key)
    prefix = prefix or f"{value}_roll"
    if (n_rows is None) == (range_seconds is None):
        raise ValueError("specify exactly one of n_rows / range_seconds")

    if n_rows is not None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*_order_cols(ts, tiebreak))
            .rowsBetween(-(n_rows - 1), Window.currentRow)
        )
    else:
        # rangeBetween requires integral bounds: order by millisecond longs
        w = (
            Window.partitionBy(*keys)
            .orderBy((epoch_seconds(df, ts) * 1000).cast("long"))
            .rangeBetween(-int(round(range_seconds * 1000)), 0)
        )

    fns = {
        "mean": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "stddev": F.stddev_samp,
    }
    out = df
    for s in stats:
        if s not in fns:
            raise ValueError(f"unknown stat '{s}'; choose from {sorted(fns)}")
        out = out.withColumn(f"{prefix}_{s}", fns[s](F.col(value)).over(w))
    return out


def multi_horizon_features(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value: str,
    horizons_seconds: Sequence[float],
    *,
    stats: Sequence[str] = ("sum", "count"),
    include_current: bool = True,
    prefix: Optional[str] = None,
) -> DataFrame:
    """Point-in-time features at several trailing horizons in ONE pass:
    for each event, aggregate ``value`` over the entity's events in the
    closed window ``[t - h, t]`` for every ``h`` — the feature-store
    "activity in the last hour / day / week as of each event" shape,
    leakage-free by construction (nothing after ``t`` is visible).

    Scale design: every horizon shares the SAME window partitioning and
    ordering, so Catalyst plans one shuffle + one sort and evaluates all
    the frames in a single Window operator — adding a horizon adds zero
    shuffles.  ``include_current=False`` ends the frame 1 ms before the
    event (strictly-prior features, e.g. when ``value`` is an outcome of
    the event itself).  A pathologically hot entity serializes into one
    task here — see :func:`multi_horizon_features_bucketed`.
    """
    keys = _keys(key)
    prefix = prefix or f"{value}_h"
    fns = {"sum": F.sum, "count": F.count, "mean": F.avg,
           "min": F.min, "max": F.max}
    for s in stats:
        if s not in fns:
            raise ValueError(f"unknown stat '{s}'; choose from {sorted(fns)}")
    check_output_names(
        df.columns,
        [
            f"{prefix}{horizon_label(h)}_{s}"
            for h in horizons_seconds
            for s in stats
        ],
    )
    end = 0 if include_current else -1
    ms = epoch_millis(df, ts)  # exact: no FP at frame boundaries
    # ALL horizon columns in one projection: sequential withColumn would
    # leave one physical Window operator per expression (CollapseWindow
    # can't merge across the interleaved Projects), i.e. one sort per
    # horizon; a single select groups every frame under ONE Window node
    # (same partitioning+ordering, frames differ per expression) — plan
    # shape pinned in tests/test_plans.py
    new_cols = []
    for h in horizons_seconds:
        if h <= 0:
            raise ValueError("horizons must be > 0 seconds")
        w = (
            Window.partitionBy(*keys)
            .orderBy(ms)
            .rangeBetween(-int(round(float(h) * 1000)), end)
        )
        for s in stats:
            new_cols.append(
                fns[s](F.col(value))
                .over(w)
                .alias(f"{prefix}{horizon_label(h)}_{s}")
            )
    return df.select("*", *new_cols)


def multi_horizon_features_bucketed(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value: str,
    horizons_seconds: Sequence[float],
    *,
    stats: Sequence[str] = ("sum", "count"),
    include_current: bool = True,
    prefix: Optional[str] = None,
) -> DataFrame:
    """Skew-safe :func:`multi_horizon_features`: identical output, but no
    single task ever holds a hot entity's full history.

    Per horizon ``h``, events are chunked by ``floor(t / h)`` and each
    event is ALSO emitted as a ghost contributor into the next chunk:
    the trailing window ``[t - h, t]`` can only reach the current and
    previous chunk, so a range window over the ``(entity, chunk)``
    partition — real rows query, ghosts only contribute — reproduces the
    global result exactly while bounding every task at two chunks of one
    entity.  Cost: 2x shuffled rows and one shuffle per horizon (the
    chunking differs per ``h``), the standard price of skew immunity.
    """
    keys = _keys(key)
    prefix = prefix or f"{value}_h"
    fns = {"sum": F.sum, "count": F.count, "mean": F.avg,
           "min": F.min, "max": F.max}
    for s in stats:
        if s not in fns:
            raise ValueError(f"unknown stat '{s}'; choose from {sorted(fns)}")
    for c in ("__ms", "__chunk", "__is_q", "__g"):
        if c in df.columns:
            raise ValueError(f"input column '{c}' shadows an internal name")
    check_output_names(
        df.columns,
        [
            f"{prefix}{horizon_label(h)}_{s}"
            for h in horizons_seconds
            for s in stats
        ],
    )
    end = 0 if include_current else -1
    out = df
    for h in horizons_seconds:
        if h <= 0:
            raise ValueError("horizons must be > 0 seconds")
        h_ms = int(round(float(h) * 1000))
        ms = epoch_millis(out, ts)  # exact: no FP at frame boundaries
        base = out.withColumn("__ms", ms)
        chunk0 = F.floor(F.col("__ms") / F.lit(h_ms))
        # ghost rows via explode, NOT a self-union: a union embeds the
        # upstream plan — including every PREVIOUS horizon's Window —
        # into both branches and re-executes it per branch (2^k blowup
        # across k horizons: 3 horizons planned 7 Windows / 8 scans).
        # Generate emits the (chunk, query) and (chunk+1, ghost) copies
        # in one pass over an upstream computed once.
        both = base.select(
            "*",
            F.explode(
                F.array(
                    F.struct(chunk0.alias("c"), F.lit(1).alias("q")),
                    F.struct(
                        (chunk0 + F.lit(1)).alias("c"), F.lit(0).alias("q")
                    ),
                )
            ).alias("__g"),
        ).select(
            "*",
            F.col("__g.c").alias("__chunk"),
            F.col("__g.q").alias("__is_q"),
        ).drop("__g")
        w = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy("__ms")
            .rangeBetween(-h_ms, end)
        )
        # every row in a partition contributes exactly once: an event's
        # real copy lives in chunk c and its ghost in c+1, so the two
        # incarnations never share a partition and nothing double-counts.
        # One select -> one Window operator per horizon (see the plain
        # variant's plan note)
        both = both.select(
            "*",
            *[
                fns[s](F.col(value))
                .over(w)
                .alias(f"{prefix}{horizon_label(h)}_{s}")
                for s in stats
            ],
        )
        out = both.filter(F.col("__is_q") == 1).drop(
            "__ms", "__chunk", "__is_q"
        )
    return out


def time_bucket(df: DataFrame, ts: str, seconds: float, out_col: str = "bucket") -> Column:
    """Tumbling-window bucket index for a timestamp/numeric column."""
    return df.withColumn(
        out_col, F.floor(epoch_seconds(df, ts) / F.lit(float(seconds)))
    )


def sliding_window_agg(
    df: DataFrame,
    ts: str,
    width_seconds: int,
    slide_seconds: int,
    *,
    keys: Sequence[str] = (),
    aggs: Optional[dict] = None,
) -> DataFrame:
    """Sliding-window aggregation via the native ``F.window`` generator
    (each row replicates into width/slide overlapping epoch-aligned
    windows — Catalyst's Expand, no join). Output: keys...,
    window_start (epoch seconds, long), one column per agg.

    ``aggs``: {out_name: Column-aggregate}; defaults to a row count.
    """
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
    w = F.window(
        F.col(ts), f"{int(width_seconds)} seconds", f"{int(slide_seconds)} seconds"
    )
    # window start is TIMESTAMP(_NTZ); ANSI refuses a direct long cast —
    # route via timestamp_ltz (engine entry points pin session tz = UTC)
    start_epoch = (
        F.col("__w.start").cast("timestamp_ltz").cast("double").cast("long")
    )
    return (
        df.groupBy(*[F.col(k) for k in keys], w.alias("__w"))
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            *keys,
            start_epoch.alias("window_start"),
            *aggs.keys(),
        )
    )


def time_decayed_features(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value: str,
    half_lives_seconds: Sequence[float],
    *,
    stats: Sequence[str] = ("sum", "count"),
    include_current: bool = True,
    prefix: Optional[str] = None,
    truncate_half_lives: int = 96,
) -> DataFrame:
    """Exponentially time-decayed trailing features: for each event at
    time ``t``, ``sum_i v_i * 2^{-(t - t_i) / H}`` over the entity's
    events at ``t_i <= t`` — the recency-weighted activity counters
    ("decayed transaction count / volume") that fraud and credit feature
    stores serve next to the hard-window :func:`multi_horizon_features`.
    ``count`` is the decayed event count (weight 1 per non-null value,
    fractional by nature); ``mean`` is decayed sum / decayed count.

    Numerics + scale in ONE construction: a windowed aggregate cannot
    reference the probe row, so the decay must factor as
    ``2^{-t/H} * sum(v_i * 2^{t_i/H})`` — whose terms overflow double
    for any real epoch. Events are therefore chunked by
    ``C = truncate_half_lives * H`` with each event re-emitted as a
    ghost contributor into the next chunk (the
    :func:`multi_horizon_features_bucketed` construction): within a
    ``(entity, chunk)`` partition every exponent is re-centered on the
    chunk start and stays in ``[-T, T)`` (default ±96 — far inside
    double range), and the trailing frame ``[t - C, t]`` never reaches
    past the previous chunk, so the partition is self-contained. The
    same chunking bounds any hot entity's task at two chunks — the skew
    story is free.

    Truncation is exact to double precision, not an approximation knob:
    a contributor older than ``T = truncate_half_lives`` half-lives
    carries weight ``< 2^-T`` (default ``2^-96 ~ 1.3e-29``) — adding it
    to any realistically-scaled accumulator cannot change one ulp.
    Lowering ``T`` trades tail mass for chunk width. Null event times
    and null values match nothing and contribute nothing (engine-wide
    convention): a null-time probe emits count 0 / null sum.
    """
    keys = _keys(key)
    prefix = prefix or f"{value}_hl"
    allowed = ("sum", "count", "mean")
    for s in stats:
        if s not in allowed:
            raise ValueError(f"unknown stat '{s}'; choose from {sorted(allowed)}")
    if truncate_half_lives < 1:
        raise ValueError("truncate_half_lives must be >= 1")
    for c in ("__ms", "__chunk", "__is_q", "__e", "__wv", "__w1", "__g"):
        if c in df.columns:
            raise ValueError(f"input column '{c}' shadows an internal name")
    check_output_names(
        df.columns,
        [
            f"{prefix}{horizon_label(h)}_{s}"
            for h in half_lives_seconds
            for s in stats
        ],
    )
    end = 0 if include_current else -1
    out = df
    for h in half_lives_seconds:
        if h <= 0:
            raise ValueError("half-lives must be > 0 seconds")
        h_ms = int(round(float(h) * 1000))
        c_ms = truncate_half_lives * h_ms
        ms = epoch_millis(out, ts)  # exact: no FP at frame boundaries
        base = out.withColumn("__ms", ms)
        chunk0 = F.floor(F.col("__ms") / F.lit(c_ms))
        # ghost rows via explode, NOT a self-union: a union would embed
        # the upstream plan (including every previous half-life's Window)
        # into BOTH branches and re-execute it per branch; Generate emits
        # the (chunk, is_query) and (chunk+1, is_ghost) copies in one
        # pass over an upstream computed once — and is a project-collapse
        # barrier, so the weight exprs below aren't re-inlined either
        both = base.select(
            "*",
            F.explode(
                F.array(
                    F.struct(chunk0.alias("c"), F.lit(1).alias("q")),
                    F.struct(
                        (chunk0 + F.lit(1)).alias("c"), F.lit(0).alias("q")
                    ),
                )
            ).alias("__g"),
        ).select(
            "*",
            F.col("__g.c").alias("__chunk"),
            F.col("__g.q").alias("__is_q"),
        ).drop("__g")
        # exponent re-centered on the row's own chunk start: real rows
        # in [0, T), ghosts in [-T, 0) — pow(2, .) never leaves double
        e = (F.col("__ms") - F.col("__chunk") * F.lit(c_ms)) / F.lit(
            float(h_ms)
        )
        contrib_ok = F.col("__ms").isNotNull() & F.col(value).isNotNull()
        both = (
            both.withColumn("__e", e)
            .withColumn(
                "__w1",
                F.when(contrib_ok, F.pow(F.lit(2.0), F.col("__e"))),
            )
            .withColumn("__wv", F.col("__w1") * F.col(value))
        )
        w = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy("__ms")
            .rangeBetween(-c_ms, end)
        )
        # all stats in one select -> ONE Window operator per half-life
        # (see multi_horizon_features' CollapseWindow note); the probe's
        # own 2^-e undoes the re-centering, so sum terms are exactly
        # v_i * 2^{(t_i - t)/H}
        unbase = F.pow(F.lit(2.0), -F.col("__e"))
        exprs = {
            "sum": lambda: F.sum("__wv").over(w) * unbase,
            "count": lambda: F.coalesce(
                F.sum("__w1").over(w) * unbase, F.lit(0.0)
            ),
            "mean": lambda: F.sum("__wv").over(w) / F.sum("__w1").over(w),
        }
        both = both.select(
            "*",
            *[
                exprs[s]().alias(f"{prefix}{horizon_label(h)}_{s}")
                for s in stats
            ],
        )
        out = both.filter(F.col("__is_q") == 1).drop(
            "__ms", "__chunk", "__is_q", "__e", "__w1", "__wv"
        )
    return out
