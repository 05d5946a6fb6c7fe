"""Round-2 scale guards: auto prebinning (bounded driver collect), LSH
bucket caps, cache release, typed as-of payloads, simhash null safety."""

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import SparkMonotonicBinner
from monotonic_optimal_binning_spark.operators.asof import asof_join
from monotonic_optimal_binning_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_dedup,
)


# ------------------------------------------------------------ auto prebin --


def _highcard_df(spark, n):
    """n rows, all-distinct continuous x, monotone-ish binary y."""
    return spark.range(n).select(
        (F.col("id") / 1000.0).alias("x"),
        (F.pmod(F.xxhash64("id"), n) < F.col("id")).cast("int").alias("y"),
    )


def test_auto_prebins_bounds_collect_on_high_cardinality(spark):
    df = _highcard_df(spark, 1_000_000)  # 10^6 distinct x values
    b = SparkMonotonicBinner("x", "y")  # prebins defaults to "auto"
    b.fit(df)
    # collected candidate groups must be bounded by default_prebins (+1 for
    # quantile-edge slack), NOT the 10^6 distinct values
    assert b.fit_metrics_["groups_collected"] <= b.config.default_prebins + 1
    assert b.get_diagnostics()["prebinned"] is True
    assert len(b.bins_()) >= 2


def test_auto_prebins_stays_exact_on_low_cardinality(spark):
    df = spark.range(5000).select(
        (F.col("id") % 40).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < 50).cast("int").alias("y"),
    )
    b = SparkMonotonicBinner("x", "y").fit(df)
    assert b.get_diagnostics()["prebinned"] is False
    assert b.fit_metrics_["groups_collected"] == 40


def test_prebins_exact_opt_out(spark):
    df = _highcard_df(spark, 3000)
    b = SparkMonotonicBinner("x", "y", prebins="exact").fit(df)
    assert b.get_diagnostics()["prebinned"] is False
    assert b.fit_metrics_["groups_collected"] == 3000


def test_prebins_bad_string_raises(spark):
    df = _highcard_df(spark, 100)
    with pytest.raises(ValueError, match="prebins"):
        SparkMonotonicBinner("x", "y", prebins="bogus").fit(df)


# --------------------------------------------------------- LSH bucket cap --


def test_minhash_bucket_cap_bounds_degenerate_corpus(spark):
    # 500 identical docs + a handful of distinct ones: without the cap the
    # identical block alone makes 500*499/2 ~ 125k candidate pairs per band
    rows = [(i, "the same exact document text repeated verbatim") for i in range(500)]
    rows += [(1000 + i, f"unique document number {i} with its own words") for i in range(5)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    pairs = minhash_lsh_candidates(
        df, "text", "doc_id", num_hashes=16, n_bands=4, max_bucket_size=50
    )
    n = pairs.count()
    assert n <= 50 * 49 // 2 * 4  # bounded by cap, not by the 500-block

    # cap disabled -> the degenerate block's pairs all appear
    pairs_all = minhash_lsh_candidates(
        df, "text", "doc_id", num_hashes=16, n_bands=4, max_bucket_size=None
    )
    assert pairs_all.count() >= 500 * 499 // 2


def test_minhash_releases_intermediate_caches(spark):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"document {i} text body with words {i % 7}") for i in range(60)],
            columns=["doc_id", "text"],
        )
    )
    out = minhash_lsh_candidates(
        df, "text", "doc_id", num_hashes=16, n_bands=4, materialize=True
    )
    out.count()
    after = jsc.getPersistentRDDs().size()
    # the eager localCheckpoint behind the returned handle is the ONLY
    # storage left; the banded + pairs persists must be gone
    assert after - before <= 1


def test_minhash_lazy_mode_releases_via_helper(spark):
    from monotonic_optimal_binning_spark.operators.dedup import (
        release_lsh_caches,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"document {i} text body with words {i % 7}") for i in range(60)],
            columns=["doc_id", "text"],
        )
    )
    out = minhash_lsh_candidates(df, "text", "doc_id", num_hashes=16, n_bands=4)
    out.count()
    pinned = out._mob_pinned_caches
    # capped banded index + raw pair set + candidate shingle sets
    assert len(pinned) == 3
    assert all(c.storageLevel.useMemory or c.storageLevel.useDisk for c in pinned)
    release_lsh_caches(out)
    # all intermediate caches dropped to StorageLevel.NONE
    assert all(
        not (c.storageLevel.useMemory or c.storageLevel.useDisk) for c in pinned
    )


def test_minhash_threshold_pushdown_equals_outer_filter(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"shared words everywhere plus token {i % 3}") for i in range(30)],
            columns=["doc_id", "text"],
        )
    )
    inner = minhash_lsh_candidates(
        df, "text", "doc_id", num_hashes=16, n_bands=4, threshold=0.5
    ).toPandas()
    outer = (
        minhash_lsh_candidates(df, "text", "doc_id", num_hashes=16, n_bands=4)
        .filter(F.col("jaccard") >= 0.5)
        .toPandas()
    )
    key = lambda p: sorted(map(tuple, p[["id_a", "id_b"]].to_numpy()))  # noqa: E731
    assert key(inner) == key(outer)


# ------------------------------------------------------------ null inputs --


def test_simhash_dedup_null_text(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["alpha beta", None, "alpha beta", None, ""],
        }
    )
    df = spark.createDataFrame(pdf)
    kept = simhash_dedup(df, "text", "doc_id").toPandas()
    # no crash; identical texts collapse; null fingerprints group together
    assert 1 in set(kept["doc_id"])
    assert 3 not in set(kept["doc_id"])
    assert len(kept) == 3  # {alpha beta}, {null}, {""}


# -------------------------------------------------------- typed as-of join --


def test_asof_join_string_payload(spark):
    left = pd.DataFrame({"k": [1, 1, 2], "ts": [5.0, 10.0, 7.0]})
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "ts": [4.0, 9.0, 1.0, 8.0],
            "tag": ["early", "late", "first", "second"],
            "v": [1, 2, 3, 4],
        }
    )
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="ts",
        value_cols=["tag", "v"],
    )
    got = out.toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    # native types preserved
    # backward as-of: k=2 at ts=7 matches right ts=1 ("first")
    assert got["tag"].tolist() == ["early", "late", "first"]
    assert got["v"].tolist() == [1, 2, 3]
    assert str(out.schema["tag"].dataType) == "StringType()"
    assert str(out.schema["v"].dataType) == "LongType()"


def test_auto_fallback_equals_explicit_prebins(spark):
    """The auto high-cardinality fallback (re-bucketing cached exact stats)
    must produce the same bins as the direct explicit-prebins path (same
    quantile splits, algebraic re-aggregation)."""
    df = _highcard_df(spark, 200_000)
    auto = SparkMonotonicBinner("x", "y").fit(df)
    explicit = SparkMonotonicBinner(
        "x", "y", prebins=auto.config.default_prebins
    ).fit(df)
    a, b = auto.bins_(), explicit.bins_()
    assert len(a) == len(b)
    np.testing.assert_allclose(
        a[["left", "right", "n", "sum", "mean"]].to_numpy(float),
        b[["left", "right", "n", "sum", "mean"]].to_numpy(float),
        rtol=1e-9,
    )


def test_stratified_sample_hot_group_exact_and_bounded(spark):
    """A pathologically hot stratum (50k rows vs n=5) must (a) return the
    EXACT n-smallest-hash winners (pre-filter never clips a winner) and
    (b) rank only a bounded candidate set, not the whole group."""
    import hashlib

    from monotonic_optimal_binning_spark.operators.sampling import (
        stratified_sample,
    )

    n_hot = 50_000
    df = spark.range(n_hot + 20).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, "hot").otherwise("cold").alias("source"),
    )
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "source", "doc_id", 5).collect()
        if r["source"] == "hot"
    )
    # independent ground truth: the 5 smallest md5('strat'||id) prefixes
    expect = sorted(
        sorted(
            range(n_hot),
            key=lambda i: (
                hashlib.md5(f"strat{i}".encode()).hexdigest()[:8], i
            ),
        )[:5]
    )
    assert got == expect
    # candidate bound: threshold keeps ~ (4*5+64)/50000 of the hot group
    from monotonic_optimal_binning_spark.operators.sampling import (
        _HEX_SPACE,
        _bucket_hex,
    )

    counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("__gn"))
    cut = (4.0 * 5 + 64) / n_hot * _HEX_SPACE
    survivors = (
        df.filter(F.col("source") == "hot")
        .filter(
            F.conv(_bucket_hex(F.col("doc_id"), "strat"), 16, 10)
            .cast("long") < F.lit(int(cut))
        )
        .count()
    )
    assert survivors < 500  # ~84 expected; whole group is 50k
