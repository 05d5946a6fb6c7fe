"""Deterministic split/sample: partition-invariance, disjoint-complete
coverage, ratio accuracy, salt independence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.sampling import (
    deterministic_split,
    hash_sample,
    split_thresholds,
)


def _ids(spark, n=20_000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_disjoint_complete_and_ratio(spark):
    df = _ids(spark)
    out = deterministic_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20_000  # complete, no null split
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01


def test_split_partition_invariant(spark):
    df = _ids(spark, 5000)
    w = {"a": 0.5, "b": 0.5}
    s1 = deterministic_split(df.repartition(2), "doc_id", w).toPandas()
    s2 = deterministic_split(df.repartition(17), "doc_id", w).toPandas()
    m1 = dict(zip(s1["doc_id"], s1["split"]))
    m2 = dict(zip(s2["doc_id"], s2["split"]))
    assert m1 == m2  # identical assignment regardless of partitioning


def test_split_salt_changes_assignment_weights_validate(spark):
    df = _ids(spark, 5000)
    a = deterministic_split(df, "doc_id", {"x": 0.5, "y": 0.5}, salt="s1").toPandas()
    b = deterministic_split(df, "doc_id", {"x": 0.5, "y": 0.5}, salt="s2").toPandas()
    assert (a["split"] != b["split"]).any()
    with pytest.raises(ValueError):
        split_thresholds({"a": -1.0})
    with pytest.raises(ValueError):
        split_thresholds({})


def test_hash_sample_fraction_and_determinism(spark):
    df = _ids(spark)
    s = hash_sample(df, "doc_id", 0.25)
    n = s.count()
    assert abs(n / 20_000 - 0.25) < 0.02
    # subset property: a smaller fraction with same salt is a subset
    small = set(r["doc_id"] for r in hash_sample(df, "doc_id", 0.1).collect())
    big = set(r["doc_id"] for r in s.collect())
    assert small <= big
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)


def test_split_last_threshold_is_always_catchall():
    """Float accumulation of w/total can end at 0.999...9; the last split's
    threshold must still be the catch-all sentinel, or rows hashing to
    'ffffffff' would silently get a NULL split (~25 per 10^11 at corpus
    scale)."""
    import random

    rng = random.Random(0)
    for _ in range(200):
        k = rng.randint(2, 6)
        weights = {f"s{i}": rng.uniform(0.01, 5.0) for i in range(k)}
        th = split_thresholds(weights)
        assert list(th.values())[-1] == "g" * 8, weights
    # exact decimal weights too
    assert list(split_thresholds({"a": 0.8, "b": 0.2}).values())[-1] == "g" * 8


def test_stratified_sample_caps_per_group_deterministically(spark):
    from monotonic_optimal_binning_spark.operators.sampling import (
        stratified_sample,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "source": ["web"] * 700 + ["books"] * 280 + ["code"] * 20,
        }
    )
    df = spark.createDataFrame(pdf)
    out = stratified_sample(df, "source", "doc_id", 50)
    counts = dict(
        (r["source"], r["n"])
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert counts == {"web": 50, "books": 50, "code": 20}
    # pure function of (group, id, salt): identical across partitionings
    a = sorted(r["doc_id"] for r in stratified_sample(
        df.repartition(3), "source", "doc_id", 50).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(
        df.repartition(13), "source", "doc_id", 50).collect())
    assert a == b
    # different salt -> different (but same-sized) pick
    c = sorted(r["doc_id"] for r in stratified_sample(
        df, "source", "doc_id", 50, salt="other").collect())
    assert len(c) == len(a) and c != a


def test_sample_to_token_budget(spark):
    from monotonic_optimal_binning_spark.operators.sampling import (
        sample_to_token_budget,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(300),
            "source": (["web"] * 200 + ["code"] * 80 + ["rare"] * 20),
            "n_tok": [10] * 300,
        }
    )
    df = spark.createDataFrame(pdf)
    out = sample_to_token_budget(
        df, "source", "doc_id", "n_tok", {"web": 500, "code": 95}
    ).toPandas()
    got = out.groupby("source")["n_tok"].agg(["count", "sum"]).to_dict("index")
    assert got["web"] == {"count": 50, "sum": 500}     # exact multiple
    assert got["code"] == {"count": 10, "sum": 100}    # overshoot by <1 doc
    assert "rare" not in got                           # no budget -> dropped
    # deterministic under repartitioning
    a = sorted(out["doc_id"])
    b = sorted(
        sample_to_token_budget(
            df.repartition(11), "source", "doc_id", "n_tok",
            {"web": 500, "code": 95},
        ).toPandas()["doc_id"]
    )
    assert a == b


def test_temperature_mixture_budgets_math():
    from monotonic_optimal_binning_spark.operators.sampling import (
        temperature_mixture_budgets,
    )

    avail = {"web": 8_000_000, "code": 1_000_000, "books": 1_000_000}

    # alpha=1: proportional to availability (raw corpus mix)
    b = temperature_mixture_budgets(avail, 1_000_000, alpha=1.0)
    assert b == {"web": 800_000, "code": 100_000, "books": 100_000}

    # alpha=0: uniform regardless of availability
    b = temperature_mixture_budgets(avail, 900_000, alpha=0.0)
    assert b == {"web": 300_000, "code": 300_000, "books": 300_000}

    # intermediate alpha up-weights small sources vs proportional
    b = temperature_mixture_budgets(avail, 1_000_000, alpha=0.5)
    assert b["code"] > 100_000 and b["books"] > 100_000
    assert b["web"] < 800_000
    assert sum(b.values()) == 1_000_000

    # water-filling: a capped source's excess flows to the others, and
    # no budget exceeds its availability
    tight = {"web": 8_000_000, "code": 50_000, "books": 1_000_000}
    b = temperature_mixture_budgets(tight, 3_000_000, alpha=0.0)
    assert b["code"] == 50_000
    assert b["web"] + b["books"] == 2_950_000
    assert all(b[k] <= tight[k] for k in tight)

    # budget above total availability clamps to what exists
    b = temperature_mixture_budgets(tight, 10**12, alpha=0.7)
    assert b == tight

    # uncapped mode honors the requested budget even past availability
    b = temperature_mixture_budgets(
        tight, 10_000_000, alpha=1.0, cap_at_available=False
    )
    assert sum(b.values()) == 10_000_000


def test_temperature_budgets_feed_token_budget_mix(spark):
    """End-to-end: counts aggregate -> temperature budgets -> deterministic
    mixture sample; each source's drawn tokens land within one doc of its
    derived budget (the greedy overshoot contract)."""
    from monotonic_optimal_binning_spark.operators.sampling import (
        sample_to_token_budget,
        source_token_counts,
        temperature_mixture_budgets,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(900),
            "source": ["web"] * 600 + ["code"] * 200 + ["books"] * 100,
            "n_tok": [100] * 900,
        }
    )
    df = spark.createDataFrame(pdf)
    counts = source_token_counts(df, "source", "n_tok")
    assert counts == {"web": 60_000, "code": 20_000, "books": 10_000}
    budgets = temperature_mixture_budgets(counts, 30_000, alpha=0.5)
    assert sum(budgets.values()) == 30_000
    out = sample_to_token_budget(
        df, "source", "doc_id", "n_tok", budgets
    ).toPandas()
    drawn = out.groupby("source")["n_tok"].sum().to_dict()
    for k, budget in budgets.items():
        assert budget <= drawn[k] < budget + 100  # overshoot < 1 doc


def test_token_budget_mix_many_sources_broadcast_path(spark):
    """With >128 sources the budget lookup switches from a create_map
    literal (plan bloat at corpus source counts) to a broadcast table —
    results must be identical to the literal path's semantics."""
    from monotonic_optimal_binning_spark.operators.sampling import (
        sample_to_token_budget,
    )

    n_src = 200
    pdf = pd.DataFrame(
        {
            "doc_id": range(n_src * 5),
            "source": [f"s{i % n_src}" for i in range(n_src * 5)],
            "n_tok": [10] * (n_src * 5),
        }
    )
    df = spark.createDataFrame(pdf)
    budgets = {f"s{i}": 20 for i in range(n_src)}  # 2 docs per source
    out = sample_to_token_budget(
        df, "source", "doc_id", "n_tok", budgets
    ).toPandas()
    counts = out.groupby("source")["doc_id"].count()
    assert len(counts) == n_src
    assert (counts == 2).all()
    # default budget applies to sources missing from the table
    partial = {f"s{i}": 20 for i in range(150)}
    out2 = sample_to_token_budget(
        df, "source", "doc_id", "n_tok", partial, default_budget=10
    ).toPandas()
    c2 = out2.groupby("source")["doc_id"].count()
    assert (c2[[f"s{i}" for i in range(150)]] == 2).all()
    assert (c2[[f"s{i}" for i in range(150, 200)]] == 1).all()


def test_token_budget_mix_property_vs_naive(spark):
    """Property check of the grouped-prefix-sum sampler against a naive
    pandas reference (global md5 order cumsum per group) across random
    frames — sizes chosen to cross bucket boundaries both ways. Spark
    session per example is expensive, so this drives N seeded cases
    through one session instead of hypothesis' per-example engine."""
    import hashlib

    import numpy as np

    from monotonic_optimal_binning_spark.operators.sampling import (
        sample_to_token_budget,
    )

    rng = np.random.default_rng(123)
    for case in range(8):
        n = int(rng.integers(1, 400))
        n_src = int(rng.integers(1, 5))
        pdf = pd.DataFrame(
            {
                "doc_id": rng.permutation(10_000)[:n],
                "source": [f"g{int(v)}" for v in rng.integers(0, n_src, n)],
                "n_tok": rng.integers(0, 50, n),
            }
        )
        budgets = {
            f"g{i}": int(rng.integers(0, 2000)) for i in range(n_src)
        }
        nb = int(rng.choice([1, 2, 64]))

        def h(i):
            return hashlib.md5(f"mix{i}".encode()).hexdigest()[:8]

        expect = set()
        for g, grp in pdf.groupby("source"):
            b = budgets.get(g, 0)
            ordered = grp.assign(__h=[h(i) for i in grp["doc_id"]]).sort_values(
                ["__h", "doc_id"]
            )
            cum = 0
            for _, r in ordered.iterrows():
                if cum < b:
                    expect.add(int(r["doc_id"]))
                cum += int(r["n_tok"])
        got = set(
            int(r["doc_id"])
            for r in sample_to_token_budget(
                spark.createDataFrame(pdf).repartition(3),
                "source", "doc_id", "n_tok", budgets, n_buckets=nb,
            ).collect()
        )
        assert got == expect, (case, n, n_src, nb)
