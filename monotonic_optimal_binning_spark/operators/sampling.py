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
) -> DataFrame:
    """Keep at most ``n_per_group`` rows per group, chosen as the rows with
    the smallest md5(salt || id) — a deterministic uniform-without-
    replacement sample per stratum (source balancing for training mixes).

    Same reproducibility contract as :func:`deterministic_split`: the kept
    set is a pure function of (group, id, salt), invariant to partitioning
    and cluster size. One shuffle (window by group); a pathologically hot
    group serializes its rank into one task — for those, pre-filter with
    :func:`hash_sample` at a fraction that bounds the group size first.
    """
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    w = Window.partitionBy(group_col).orderBy(
        _bucket_hex(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
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
    cluster resizes keep the identical sample. One shuffle (window per
    group).
    """
    entries = [(str(k), int(v)) for k, v in budgets.items()]
    budget_map = F.create_map(
        *[F.lit(x) for kv in entries for x in kv]
    )
    budget = F.coalesce(
        budget_map[F.col(group_col).cast("string")],
        F.lit(int(default_budget)),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(_bucket_hex(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(n_tok_col)).over(w) - F.col(n_tok_col)
    return (
        df.withColumn("__cum_before", cum_before)
        .filter(F.col("__cum_before") < budget)
        .drop("__cum_before")
    )


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
