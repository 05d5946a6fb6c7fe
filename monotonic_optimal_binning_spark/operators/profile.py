"""One-scan data profiling — the step BEFORE screening/binning.

Feature work on a fresh 100 TB table starts with the same questions for
every column: how many nulls, how many distinct values, the numeric
range/moments, the dominant value. Asking them column-by-column
(``df.select(c).distinct().count()`` ...) is one job per column per
metric. :func:`profile` answers all of them for every requested column
in **ONE scan**, two modes:

``exact=True`` (default)
    ``explode(array(struct(col, value)))`` → ``groupBy(col, value)``
    with map-side partial aggregation (the same single-scan fan-out as
    ``iv_screen``), then a second algebraic aggregate per column over
    the per-value rows: exact distinct counts, exact top value (via
    ``max(struct(cnt, value))`` — deterministic tie-break on the value),
    and numeric moments folded from per-value sums. The shuffle carries
    one row per (column, distinct value) — hot values (constant
    columns, boilerplate) collapse map-side; a unique-id column costs a
    full but AQE-splittable shuffle, which is the price of EXACT
    distinct counts.

``exact=False``
    a single global aggregate: ``approx_count_distinct`` (HyperLogLog,
    configurable ``rsd``) instead of exact distincts, no top value —
    one pass, shuffle traffic = one partial-agg row per partition.
    The 100 TB default when ±2 % distinct estimates are enough.

Both modes emit the same schema (one row per column):
``column, dtype, n, nulls, n_distinct, min_num, max_num, mean, std,
top_value, top_freq`` — numeric stats NULL for non-numeric columns,
``top_value``/``top_freq``/exact distincts NULL in approx mode, and
``std`` is the population standard deviation. The reference profiles a
single feature implicitly inside its fit scan
(/root/reference/src/MOBPY/binning/mob.py:214-247 computes the y
moments and missing split); this generalizes that to every column of a
table without k scans.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType

_R = 6


def profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    *,
    exact: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-column profile of ``cols`` (default: every column) in one scan.

    Returns one row per column: ``column, dtype, n, nulls, n_distinct,
    min_num, max_num, mean, std, top_value, top_freq`` (see module
    docstring for mode semantics). Row order: ``cols`` order via an
    ``orderBy("column")`` on the k-row result.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile: empty column list")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile: columns not in DataFrame: {missing}")
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    numeric = {c for c in cols if isinstance(dtypes[c], NumericType)}

    if not exact:
        # single global aggregate — no per-value shuffle at all
        aggs = []
        for c in cols:
            aggs += [
                F.count(F.lit(1)).alias(f"__n_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
                F.approx_count_distinct(c, rsd).alias(f"__dist_{c}"),
            ]
            if c in numeric:
                d = F.col(c).cast("double")
                aggs += [
                    F.min(d).alias(f"__min_{c}"),
                    F.max(d).alias(f"__max_{c}"),
                    F.round(F.avg(d), _R).alias(f"__mean_{c}"),
                    F.round(F.stddev_pop(d), _R).alias(f"__std_{c}"),
                ]
        g = df.agg(*aggs)
        rows = [
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c].simpleString()).alias("dtype"),
                F.col(f"__n_{c}").alias("n"),
                F.col(f"__nulls_{c}").alias("nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if c in numeric
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if c in numeric
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__mean_{c}") if c in numeric
                 else F.lit(None).cast("double")).alias("mean"),
                (F.col(f"__std_{c}") if c in numeric
                 else F.lit(None).cast("double")).alias("std"),
                F.lit(None).cast("string").alias("top_value"),
                F.lit(None).cast("long").alias("top_freq"),
            )
            for c in cols
        ]
        return (
            g.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*")
            .orderBy("column")
        )

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("sval"),
            (F.col(c).cast("double") if c in numeric
             else F.lit(None).cast("double")).alias("dval"),
        )
        for c in cols
    ]
    pairs = df.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
    # dval is a function of sval within a column, so min() just picks the
    # one value present (deterministic, unlike first())
    per_val = pairs.groupBy("column", "sval").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("dval").alias("dval"),
    )
    nn_cnt = F.when(F.col("sval").isNotNull(), F.col("cnt"))
    num_n = F.sum(F.when(F.col("dval").isNotNull(), F.col("cnt")))
    mean = F.sum(F.col("dval") * F.col("cnt")) / num_n
    ex2 = F.sum(F.col("dval") * F.col("dval") * F.col("cnt")) / num_n
    dmap = {c: dtypes[c].simpleString() for c in cols}
    out = per_val.groupBy("column").agg(
        F.sum("cnt").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("sval").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("nulls"),
        F.count(nn_cnt).alias("n_distinct"),
        F.min("dval").alias("min_num"),
        F.max("dval").alias("max_num"),
        F.round(mean, _R).alias("mean"),
        # population std from per-value sufficient statistics; guard tiny
        # negative fp residue under the sqrt, and keep it NULL (not 0.0)
        # for non-numeric columns where greatest() would swallow the NULL
        F.round(
            F.when(
                num_n.isNotNull(),
                F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0))),
            ),
            _R,
        ).alias("std"),
        F.max(
            F.when(
                F.col("sval").isNotNull(),
                F.struct(F.col("cnt").alias("cnt"),
                         F.col("sval").alias("sval")),
            )
        ).alias("__top"),
    )
    dtype_col = F.create_map(
        *[x for c in cols for x in (F.lit(c), F.lit(dmap[c]))]
    )[F.col("column")]
    return out.select(
        "column",
        dtype_col.alias("dtype"),
        "n",
        "nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "mean",
        "std",
        F.col("__top.sval").alias("top_value"),
        F.col("__top.cnt").alias("top_freq"),
    ).orderBy("column")
