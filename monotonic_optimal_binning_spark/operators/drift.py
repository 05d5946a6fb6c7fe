"""Distribution-drift monitoring for binned features.

PSI (population stability index) is the standard scorecard companion to
WoE binning — Σ (p_actual − p_expected) · ln(p_actual / p_expected) over
bins, with the conventional reading PSI < 0.1 stable / 0.1–0.25 shifting /
> 0.25 shifted. The reference stops at fitting and plotting bins
(SURVEY.md §2.10 plot_binning_stability draws the comparison but computes
no index); engine-new for production feature monitoring.

Plan shape: each side collapses to one row per bin via an algebraic count
(map-side combine), the two tiny per-bin tables full-outer-join on the
bin label (null-safe: a null bucket present on both sides is ONE bin, not
two phantom half-rows), and totals broadcast — the raw frames are each
scanned once and never joined to each other.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_counts(df: DataFrame, bucket_col: str) -> DataFrame:
    """(bucket, n) — the one-aggregate input both PSI sides need."""
    return df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


def _psi_from_counts(
    expected_counts: DataFrame, actual_counts: DataFrame, smoothing: float
) -> DataFrame:
    """Shared PSI kernel over two (bucket, n_*) tables: null-safe
    full-outer join on the bucket label, broadcast totals, smoothed
    shares, per-bucket psi_term."""
    e = expected_counts.withColumnRenamed("bucket", "__be")
    a = actual_counts.withColumnRenamed("bucket", "__ba")
    j = e.join(a, on=F.col("__be").eqNullSafe(F.col("__ba")), how="full_outer").select(
        F.coalesce("__be", "__ba").alias("bucket"),
        F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
        F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
    )
    tot = j.agg(
        F.sum("n_expected").alias("te"),
        F.sum("n_actual").alias("ta"),
        F.count(F.lit(1)).alias("k"),
    )
    j = j.crossJoin(F.broadcast(tot))
    pe = (F.col("n_expected") + smoothing) / (
        F.col("te") + smoothing * F.col("k")
    )
    pa = (F.col("n_actual") + smoothing) / (
        F.col("ta") + smoothing * F.col("k")
    )
    return j.select(
        "bucket",
        "n_expected",
        "n_actual",
        pe.alias("pct_expected"),
        pa.alias("pct_actual"),
        ((pa - pe) * F.log(pa / pe)).alias("psi_term"),
    )


def psi(
    expected: DataFrame,
    actual: DataFrame,
    bucket_col: str,
    *,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bucket PSI terms between two bucketed samples, plus shares.

    Output: (bucket, n_expected, n_actual, pct_expected, pct_actual,
    psi_term); ``sum(psi_term)`` is the index. ``smoothing`` adds the
    standard half-count to BOTH sides of every bucket (mirroring the WoE
    0.5 smoothing) so a bin empty on one side contributes a large-but-
    finite term instead of ±inf. A null bucket value is a bin like any
    other (matched null-safe on both sides).
    """
    return _psi_from_counts(
        bucket_counts(expected, bucket_col).withColumnRenamed("n", "n_expected"),
        bucket_counts(actual, bucket_col).withColumnRenamed("n", "n_actual"),
        smoothing,
    )


def binner_psi(
    binner,
    actual: DataFrame,
    *,
    input_col: Optional[str] = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI of a NEW sample against a fitted binner's training
    distribution: the fit's per-bin counts are already on the driver
    (summary table, k rows — broadcast), so only the actual frame is
    scanned (transform + one aggregate).

    Both sides compare the FITTED bins only: the training side excludes
    the Missing/Excluded summary rows, so the actual side's
    Missing/Excluded labels are filtered out of both the counts and the
    denominator too — otherwise an unchanged population with nulls would
    read as drifted (deflated pct_actual in every real bin plus a phantom
    Missing bin). Monitor null-rate drift separately if it matters.
    """
    s = binner.summary_()
    mask = ~s["bucket"].astype(str).str.contains("Missing|Excluded")
    train = [
        (str(b), int(n))
        for b, n in zip(s.loc[mask, "bucket"], s.loc[mask, "count"])
    ]
    spark = actual.sparkSession
    e = spark.createDataFrame(train, "bucket string, n_expected long")
    labeled = binner.transform(
        actual, assign="interval",
        input_col=input_col or binner.x, output_col="__bucket",
    ).filter(
        F.col("__bucket").isNotNull()
        & ~F.col("__bucket").rlike("Missing|Excluded")
    )
    a = labeled.groupBy(F.col("__bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    return _psi_from_counts(F.broadcast(e), a, smoothing)
