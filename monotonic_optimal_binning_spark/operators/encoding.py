"""Leakage-safe out-of-fold target encoding.

Mean-target encoding is the workhorse for high-cardinality categoricals
in training pipelines, and the classic way to get it WRONG at scale is
to encode each row with a mean its own label contributed to (target
leakage). :func:`target_encode_oof` computes the standard K-fold
out-of-fold encoding — each row's category mean uses only the OTHER
folds' labels — without ever materializing per-fold copies of the data:

1. fold assignment is a pure function of the id (the same md5-threshold
   scheme as :func:`operators.sampling.deterministic_split`, so reruns,
   re-partitions and resumed jobs give every row the same fold — and an
   ANSI oracle can re-derive it);
2. ONE scan aggregates ``(category, fold) → (count, sum_y)`` with
   map-side combine; per-category and per-fold totals are two more
   algebraic aggregates over that bounded frame (≤ n_cat·n_folds rows),
   never a second input scan;
3. the encoding for (category, fold) is closed-form from totals minus
   the fold's own contribution, smoothed toward the out-of-fold global
   prior: ``enc = (S_cat − S_cat,f + m·prior_f) / (N_cat − N_cat,f + m)``
   with ``prior_f = (S − S_f) / (N − N_f)`` — a category seen ONLY in a
   row's own fold gets exactly ``prior_f``, the no-information answer;
4. rows join back to the (category, fold) map — an AQE-splittable
   equi-join on (category, fold); at n_cat small enough the runtime
   broadcasts it. A hot category is spread across n_folds keys and AQE
   skew-split handles the rest.

Rows with a NULL label contribute nothing to any mean (count/sum skip
them) but still receive an encoding — exactly what you want when
encoding unlabeled serving slices alongside training rows. NULL
categories are their own group (null-safe join back).

The reference has no analog (numeric-only binning); the smoothing
follows the classic empirical-Bayes shrinkage (Micci-Barreca, SIGKDD
Explorations 3(1), 2001).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .sampling import _bucket_hex, split_thresholds


def fold_assignment(
    id_col: Column, n_folds: int, salt: str = "folds"
) -> Column:
    """Deterministic fold id in [0, n_folds) as a pure function of the id
    (md5-threshold buckets — partition- and rerun-invariant)."""
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    thresholds = split_thresholds({str(i): 1.0 for i in range(n_folds)})
    h = _bucket_hex(id_col, salt)
    # The last bucket's threshold is the catch-all sentinel ('g'*8, above
    # any hex), so it becomes the CASE's ELSE branch: an else-less CASE
    # would make the fold column NULLABLE, and downstream join branches
    # then disagree on an inferred IsNotNull filter — which breaks
    # ReusedExchange and costs a whole extra input scan in the OOF plan.
    expr = None
    items = list(thresholds.items())
    for name, upper in items[:-1]:
        cond = h < F.lit(upper)
        fid = F.lit(int(name))
        expr = F.when(cond, fid) if expr is None else expr.when(cond, fid)
    last_fid = F.lit(int(items[-1][0]))
    return last_fid if expr is None else expr.otherwise(last_fid)


def frequency_encode(
    df: DataFrame,
    x_col: str,
    *,
    normalize: bool = True,
    output_col: Optional[str] = None,
) -> DataFrame:
    """Append the category's frequency (share of rows when ``normalize``,
    raw count otherwise) as ``output_col`` (default ``{x_col}_freq``).

    One hash-aggregate scan with map-side combine to the (category,
    count) frame, then an AQE-splittable null-safe join back (the
    runtime broadcasts it whenever the category side is small). NULL is
    its own category. Unlike target encoding this uses no label, so
    there is nothing to leak — no folds needed.
    """
    out = output_col or f"{x_col}_freq"
    if out in df.columns:
        raise ValueError(f"frequency_encode: column {out!r} already exists")
    counts = df.groupBy(x_col).agg(F.count(F.lit(1)).alias("__n"))
    if normalize:
        total = F.sum("__n").over(Window.partitionBy(F.lit(1)))
        counts = counts.select(
            F.col(x_col).alias("__k"),
            (F.col("__n").cast("double") / total).alias(out),
        )
    else:
        counts = counts.select(
            F.col(x_col).alias("__k"), F.col("__n").alias(out)
        )
    b, e = df.alias("__fe_b"), counts.alias("__fe_e")
    return b.join(
        e, on=F.col(f"__fe_b.{x_col}").eqNullSafe(F.col("__fe_e.__k"))
    ).select([F.col(f"__fe_b.{c}") for c in df.columns] + [F.col(out)])


def hash_bucket(col: Column, n_buckets: int, salt: str = "hash") -> Column:
    """Deterministic hash bucket in [0, n_buckets) — the hashing trick
    for unbounded-cardinality categoricals.

    md5-based (first 8 hex chars as an integer, mod n_buckets) rather
    than the JVM's Murmur `F.hash`: the bucket is then a pure function
    of the VALUE — stable across Spark versions, reproducible by any
    ANSI engine, safe to persist in artifacts. NULL hashes to NULL (its
    own signal, don't fold it into bucket 0).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    h = _bucket_hex(col, salt)  # NULL-propagating
    return F.conv(h, 16, 10).cast("long") % F.lit(int(n_buckets))


def hash_encode(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int,
    *,
    salt: str = "hash",
    suffix: str = "_hash",
) -> DataFrame:
    """Append ``{col}{suffix}`` hash buckets for each column — the
    feature-hashing trick: bounded output domain at ANY cardinality,
    zero state to fit/store/broadcast, one codegen-only projection
    (no shuffle, no aggregate). Each column is salted with its own name
    so identical values in different columns land independently."""
    out = df
    for c in cols:
        name = f"{c}{suffix}"
        if name in df.columns:
            raise ValueError(f"hash_encode: column {name!r} already exists")
        out = out.withColumn(
            name, hash_bucket(F.col(c), n_buckets, salt=f"{salt}:{c}:")
        )
    return out


def target_encode_oof(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    id_col: Optional[str] = None,
    fold_col: Optional[str] = None,
    n_folds: int = 5,
    smoothing: float = 20.0,
    salt: str = "folds",
    output_col: Optional[str] = None,
    keep_fold_col: Optional[str] = None,
) -> DataFrame:
    """Append the K-fold out-of-fold smoothed mean-target encoding of
    ``x_col`` as ``output_col`` (default ``{x_col}_te``).

    Exactly one of ``id_col`` (derive folds deterministically from it) or
    ``fold_col`` (use caller-provided integer folds) is required.
    ``keep_fold_col`` optionally also surfaces the fold id.
    """
    if (id_col is None) == (fold_col is None):
        raise ValueError(
            "target_encode_oof: exactly one of id_col / fold_col required"
        )
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    out = output_col or f"{x_col}_te"
    for c in ("__fold", "__c", "__s", "__tc", "__ts", "__fc", "__fs"):
        if c in df.columns:
            raise ValueError(f"target_encode_oof: column {c!r} is reserved")

    fold = (
        F.col(fold_col).cast("int")
        if fold_col is not None
        else fold_assignment(F.col(id_col), n_folds, salt)
    )
    base = df.withColumn("__fold", fold)

    y = F.col(y_col).cast("double")
    # count(y) not count(*): NULL labels are excluded from every mean
    cf = base.groupBy(x_col, "__fold").agg(
        F.count(y_col).alias("__c"), F.coalesce(F.sum(y), F.lit(0.0)).alias("__s")
    )
    tot = cf.groupBy(x_col).agg(
        F.sum("__c").alias("__tc"), F.sum("__s").alias("__ts")
    )
    gf = cf.groupBy("__fold").agg(
        F.sum("__c").alias("__fc"), F.sum("__s").alias("__fs")
    )
    g = cf.agg(
        F.sum("__c").alias("__gc"), F.sum("__s").alias("__gs")
    )

    m = float(smoothing)
    prior_f = F.coalesce(
        (F.col("__gs") - F.col("__fs"))
        / F.nullif(F.col("__gc") - F.col("__fc"), F.lit(0)),
        F.col("__gs") / F.nullif(F.col("__gc"), F.lit(0)),
        F.lit(0.0),
    )
    fold_prior = gf.crossJoin(F.broadcast(g)).select(
        "__fold", prior_f.alias("__prior")
    )
    enc = (
        (F.col("__ts") - F.col("__s")) + F.lit(m) * F.col("__prior")
    ) / ((F.col("__tc") - F.col("__c")) + F.lit(m))
    # null-safe on the category key: a NULL category is its own group and
    # must reach its own totals row (a plain equi-join would drop it)
    tot_k = tot.withColumnRenamed(x_col, "__kx")
    enc_map = (
        cf.join(tot_k, on=cf[x_col].eqNullSafe(tot_k["__kx"]))
        .join(F.broadcast(fold_prior), on="__fold")
        .select(
            F.col("__kx").alias("__k"),
            F.col("__fold").alias("__kf"),
            enc.alias(out),
        )
    )
    b = base.alias("__te_b")
    e = enc_map.alias("__te_e")
    joined = b.join(
        e,
        on=F.col(f"__te_b.{x_col}").eqNullSafe(F.col("__te_e.__k"))
        & (F.col("__te_b.__fold") == F.col("__te_e.__kf")),
    ).select([F.col(f"__te_b.{c}") for c in base.columns] + [F.col(out)])
    if keep_fold_col:
        joined = joined.withColumnRenamed("__fold", keep_fold_col)
    else:
        joined = joined.drop("__fold")
    return joined
