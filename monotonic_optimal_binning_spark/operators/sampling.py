"""Deterministic sampling / splitting for training-data pipelines.

``randomSplit``/``sample`` are seed-dependent on PARTITIONING: the same
seed yields different rows after a repartition or a cluster resize, which
silently leaks held-out data across reruns. These operators derive the
assignment from a hash of a stable row id instead — the split is a pure
function of (id, salt), reproducible across runs, cluster sizes, row
order, and engines (md5 is everywhere, so an ANSI-SQL oracle can verify
the exact assignment).

Mechanism: the first 8 hex chars of md5(salt || id) are uniform over
16^8 buckets; cumulative-weight thresholds are compared as HEX STRINGS
(lowercase hex compares lexicographically == numerically), so no
bigint-from-hex conversion is needed on either side.

The reference has no sampling surface; engine-new for the training-data
pipeline (reproducible train/val/test splits, fractional corpus samples).
"""

from __future__ import annotations

from typing import Dict, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def _bucket_hex(df_id: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), df_id.cast("string"))), 1, 8)


def split_thresholds(weights: Mapping[str, float]) -> Dict[str, str]:
    """Cumulative upper thresholds as zero-padded 8-char lowercase hex."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out: Dict[str, str] = {}
    acc = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        w = weights[name]
        if w < 0:
            raise ValueError(f"negative weight for {name!r}")
        acc += w / total
        # The LAST split is unconditionally the catch-all sentinel
        # (lexicographically > any hex): float accumulation of w/total can
        # end at 0.999...9, which would make the last threshold 'ffffffff'
        # and silently drop rows whose md5 prefix is exactly 'ffffffff'
        # (~25 rows per 10^11 at corpus scale). Interior thresholds that
        # reach >= 1.0 (trailing zero weights) clamp to the sentinel too.
        if i == len(names) - 1 or acc >= 1.0:
            out[name] = "g" * 8
        else:
            out[name] = format(int(acc * _HEX_SPACE), "08x")
    return out


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    *,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weight proportions,
    as a pure function of (id, salt). Weights are normalized; the same id
    always lands in the same split, so reruns never leak held-out rows.
    """
    thresholds = split_thresholds(weights)
    h = _bucket_hex(F.col(id_col), salt)
    expr = None
    for name, upper in thresholds.items():
        cond = h < F.lit(upper)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    *,
    salt: str = "strat",
    oversample: float = 4.0,
    slack: int = 64,
) -> DataFrame:
    """Keep at most ``n_per_group`` rows per group, chosen as the rows with
    the smallest md5(salt || id) — a deterministic uniform-without-
    replacement sample per stratum (source balancing for training mixes).

    Same reproducibility contract as :func:`deterministic_split`: the kept
    set is a pure function of (group, id, salt), invariant to partitioning
    and cluster size.

    Scale shape: the naive formulation (``row_number`` over a per-group
    window) serializes a hot stratum into ONE task. Instead the operator
    bounds each group's candidate set FIRST: one map-side-combinable
    aggregate counts each group, the per-group hash-threshold
    ``(oversample·n + slack) / count`` is broadcast back, and only rows
    whose hash falls under it enter the exact ``row_number`` window — so a
    billion-row stratum contributes ~``oversample·n + slack`` window rows
    instead of a billion. The winners (the ``n`` smallest hashes) survive
    the pre-filter unless fewer than ``n`` of a group's rows hash under a
    threshold with mean ``oversample·n + slack`` — a Chernoff tail below
    ``exp(-(3n+slack)²/(2(4n+slack)))`` (< 1e-13 even at n=1 with the
    defaults), negligible at any corpus size. Groups smaller than the
    oversample target are never filtered at all. Assumes group cardinality
    fits a broadcast (strata are sources/buckets, not ids).
    """
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    h = _bucket_hex(F.col(id_col), salt)
    hv = F.conv(h, 16, 10).cast("long")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__gn"))
    cut = F.least(
        F.lit(float(_HEX_SPACE)),
        F.lit(float(oversample) * n_per_group + float(slack))
        / F.col("__gn")
        * F.lit(float(_HEX_SPACE)),
    ).cast("long")
    survivors = (
        df.join(F.broadcast(counts), on=group_col)
        .filter(hv < cut)
        .drop("__gn")
    )
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
        .select(*df.columns)
    )


def sample_to_token_budget(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_tok_col: str,
    budgets: Mapping[str, int],
    *,
    salt: str = "mix",
    default_budget: int = 0,
    n_buckets: int = 64,
) -> DataFrame:
    """Training-mixture construction: per group (source), keep rows in
    md5(salt || id) hash order until the group's TOKEN budget is reached —
    the deterministic way to hit a target mixture like
    ``{"web": 10B, "code": 2B}`` tokens.

    A row is kept while the running token total BEFORE it is under budget,
    so the budget may be overshot by at most one document (the standard
    greedy contract; exact-cut packing is :mod:`packing`'s job). Groups
    absent from ``budgets`` get ``default_budget`` (0 = dropped). Rows
    with a null ``n_tok_col`` are dropped (a null poisons the running
    sum). Pure function of (group, id, salt): reruns, repartitions, and
    cluster resizes keep the identical sample.

    Scale shape: the per-group running cumsum is a grouped prefix sum in
    the style of :func:`packing.global_prefix_sum` — NOT a
    ``Window.partitionBy(group)`` (which funnels each source's multi-TB
    slice through one task). The md5 order key is uniform by construction,
    so its first 4 hex chars split each group into ``n_buckets``
    deterministic equal-width ranges with no quantile probe: a per-
    (group, bucket) window computes local cumsums in parallel, the
    per-bucket totals (k·n_buckets rows, map-side combined — the same
    exchange as the window, so AQE reuses it) roll into exclusive offsets
    via a window over the TINY totals table, and the offsets broadcast
    back. Input must be deterministic across actions (no unseeded
    sample()/rand() upstream): the window pass and the totals aggregate
    each re-scan it, and a frame that changes between scans would corrupt
    the offsets.
    """
    if not 1 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [1, 65536]")
    entries = [(str(k), int(v)) for k, v in budgets.items()]
    budget_join = None
    if len(entries) <= 128:
        budget_map = F.create_map(
            *[F.lit(x) for kv in entries for x in kv]
        )
        budget = F.coalesce(
            budget_map[F.col(group_col).cast("string")],
            F.lit(int(default_budget)),
        )
    else:
        # thousands of sources: a create_map literal would inline 2·k
        # literals into the plan (the expression-tree bloat that killed
        # IVF's literal routing); ship the budgets as a broadcast table
        budget_join = F.broadcast(
            df.sparkSession.createDataFrame(
                entries, "__bkey string, __budget long"
            )
        )
        budget = F.coalesce(F.col("__budget"), F.lit(int(default_budget)))
    h = _bucket_hex(F.col(id_col), salt)
    # bucket = equal-width range of the hash prefix: monotone in the full
    # hex order (bucket(a) < bucket(b) ⇒ h(a) < h(b)), so per-bucket
    # cumsums + cross-bucket offsets compose to the exact global cumsum
    hv16 = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    bucket = F.floor(hv16 * int(n_buckets) / F.lit(65536)).cast("int")
    work = df.withColumn("__h", h).withColumn("__bkt", bucket)
    wloc = (
        Window.partitionBy(group_col, "__bkt")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = work.withColumn("__loc", F.sum(F.col(n_tok_col)).over(wloc))
    totals = work.groupBy(group_col, "__bkt").agg(
        F.sum(F.col(n_tok_col)).alias("__tot")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group_col,
        "__bkt",
        F.coalesce(F.sum("__tot").over(woff), F.lit(0)).alias("__off"),
    )
    cum_before = F.col("__off") + F.col("__loc") - F.col(n_tok_col)
    joined = local.join(F.broadcast(offsets), on=[group_col, "__bkt"])
    if budget_join is not None:
        joined = joined.join(
            budget_join,
            on=F.col(group_col).cast("string") == F.col("__bkey"),
            how="left",
        )
    return joined.filter(cum_before < budget).select(*df.columns)


def source_token_counts(
    df: DataFrame, group_col: str, n_tok_col: str
) -> Dict[str, int]:
    """Available tokens per source — ONE map-side-combinable aggregate,
    k rows to the driver. The input :func:`temperature_mixture_budgets`
    needs; null token counts are ignored (they can't be sampled)."""
    rows = (
        df.groupBy(F.col(group_col).cast("string").alias("g"))
        .agg(F.sum(F.col(n_tok_col)).alias("n"))
        .collect()
    )
    return {r["g"]: int(r["n"] or 0) for r in rows}


def temperature_mixture_budgets(
    available: Mapping[str, int],
    total_budget: int,
    *,
    alpha: float = 0.7,
    cap_at_available: bool = True,
) -> Dict[str, int]:
    """Per-source token budgets for a temperature-sampled training mix:
    weight each source ``n_i^alpha`` (``alpha=1`` proportional — the raw
    corpus mix; ``alpha=0`` uniform; the 0.2–0.7 range is the standard
    up-weighting of small sources in multilingual / multi-domain
    pretraining), scale to ``total_budget``, and (by default) water-fill:
    a source whose share exceeds its available tokens is capped there and
    the excess is re-split over the remaining sources by the same
    weights, iterating until stable — so no budget silently exceeds what
    :func:`sample_to_token_budget` could actually draw.

    Driver-side pure arithmetic over k sources; plug the result straight
    into :func:`sample_to_token_budget`'s ``budgets``.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be non-negative")
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    avail = {str(k): max(int(v), 0) for k, v in available.items()}
    budgets: Dict[str, int] = {k: 0 for k in avail}
    remaining = int(total_budget)
    active = {k for k, v in avail.items() if v > 0}
    if cap_at_available:
        remaining = min(remaining, sum(avail[k] for k in active))
    while remaining > 0 and active:
        weights = {k: float(avail[k]) ** alpha for k in active}
        wsum = sum(weights.values())
        # largest-remainder rounding so the shares sum to `remaining`
        raw = {k: remaining * weights[k] / wsum for k in active}
        share = {k: int(raw[k]) for k in active}
        leftover = remaining - sum(share.values())
        for k in sorted(
            active, key=lambda k: (raw[k] - share[k], k), reverse=True
        )[:leftover]:
            share[k] += 1
        if not cap_at_available:
            for k, s in share.items():
                budgets[k] += s
            break
        overfull = {k for k in active if budgets[k] + share[k] > avail[k]}
        if not overfull:
            for k, s in share.items():
                budgets[k] += s
            break
        # cap the overfull sources; water-fill the excess over the rest
        # next round (terminates: |active| strictly shrinks)
        for k in overfull:
            budgets[k] = avail[k]
        active -= overfull
        remaining = min(
            total_budget - sum(budgets.values()),
            sum(avail[k] - budgets[k] for k in active),
        )
    return budgets


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    *,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by id hash —
    reproducible regardless of partitioning (unlike ``DataFrame.sample``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    upper = format(int(fraction * _HEX_SPACE), "08x")
    return df.filter(_bucket_hex(F.col(id_col), salt) < F.lit(upper))
