"""Incremental fit via mergeable sufficient statistics (BinStats).

The invariant under test: ``fit_from_stats(merge(stats(p1), stats(p2)))``
equals ``fit(p1 ∪ p2)`` — merging per-partition algebraic aggregates is
exactly the fold Spark's own partial aggregation performs, so the solve
sees identical rows and produces identical bins. (The reference refits
from raw rows every time, /root/reference/src/MOBPY/binning/mob.py:229.)
"""

import numpy as np
import pandas as pd
import pytest

from monotonic_optimal_binning_spark import (
    BinningConstraints,
    BinStats,
    DataError,
    SparkMonotonicBinner,
)


def _make_pdf(n=4000, seed=7, with_specials=True):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 40, n).astype(float)
    p = 0.1 + 0.8 * (x / 40.0)
    y = (rng.uniform(0, 1, n) < p).astype(int)
    pdf = pd.DataFrame({"x": x, "y": y})
    if with_specials:
        pdf.loc[pdf.index % 17 == 0, "x"] = np.nan  # missing
        pdf.loc[pdf.index % 23 == 0, "x"] = -999.0  # excluded
    return pdf


def _binner(**kw):
    kw.setdefault("prebins", "exact")
    kw.setdefault("exclude_values", [-999.0])
    kw.setdefault("constraints", BinningConstraints(max_bins=6, min_bins=2))
    return SparkMonotonicBinner("x", "y", **kw)


def _assert_models_equal(a, b):
    assert a.labels == b.labels
    np.testing.assert_allclose(a.lefts, b.lefts)
    np.testing.assert_allclose(a.rights, b.rights)
    assert a.is_binary == b.is_binary
    assert a.resolved_sign == b.resolved_sign
    if a.woes is not None:
        np.testing.assert_allclose(a.woes, b.woes, rtol=1e-12)
    pd.testing.assert_frame_equal(
        a.summary_df.reset_index(drop=True),
        b.summary_df.reset_index(drop=True),
        check_exact=False,
        rtol=1e-9,
        atol=1e-12,
    )


def test_incremental_exact_equals_full_fit(spark):
    """Exact-grouping mode: two-partition incremental fit reproduces the
    single-pass fit bit-for-bit (binary y → integer sums, no FP order)."""
    pdf = _make_pdf()
    full = spark.createDataFrame(pdf)
    p1 = spark.createDataFrame(pdf.iloc[: len(pdf) // 2])
    p2 = spark.createDataFrame(pdf.iloc[len(pdf) // 2:])

    ref = _binner().fit(full)

    b = _binner()
    s1 = b.collect_stats(p1, label="part1")
    s2 = b.collect_stats(p2, prior=s1, label="part2")
    inc = _binner().fit_from_stats(s2)

    _assert_models_equal(ref.model_, inc.model_)
    assert inc.fit_metrics_["n_partitions"] == 2
    assert [e["label"] for e in s2.lineage] == ["part1", "part2"]
    # lineage row counts cover the whole input
    assert sum(e["n_clean"] for e in s2.lineage) == s2.totals()["clean"]
    assert (
        sum(s2.totals().values())
        == len(pdf)
    )


def test_merge_is_commutative_and_associative(spark):
    pdf = _make_pdf(n=1500, seed=11)
    parts = [
        spark.createDataFrame(pdf.iloc[i::3].reset_index(drop=True))
        for i in range(3)
    ]
    b = _binner()
    s = [b.collect_stats(p) for p in parts]

    ab_c = s[0].merge(s[1]).merge(s[2])
    a_bc = s[0].merge(s[1].merge(s[2]))
    c_ba = s[2].merge(s[1]).merge(s[0])

    def _norm(st):
        return sorted(
            (
                (
                    r["tag"],
                    repr(r["gkey"]),
                    r["n_rows"],
                    r["n_y"],
                    round(float(r["sum_y"] or 0), 9),
                    round(float(r["sum_y2"] or 0), 9),
                )
                for r in st.rows
            )
        )

    assert _norm(ab_c) == _norm(a_bc) == _norm(c_ba)

    m1 = _binner().fit_from_stats(ab_c).model_
    m2 = _binner().fit_from_stats(c_ba).model_
    _assert_models_equal(m1, m2)


def test_frozen_splits_incremental(spark):
    """Prebinned mode: the prior's quantile splits are FROZEN — the second
    partition buckets identically, and the merged fit equals a fit whose
    stats were collected over the union under the same splits."""
    rng = np.random.default_rng(3)
    n = 6000
    x = rng.normal(50, 20, n)
    y = (rng.uniform(0, 1, n) < 1 / (1 + np.exp(-(x - 50) / 15))).astype(int)
    pdf = pd.DataFrame({"x": x, "y": y})
    p1, p2 = pdf.iloc[: n // 2], pdf.iloc[n // 2:]

    b = SparkMonotonicBinner(
        "x", "y", prebins=32,
        constraints=BinningConstraints(max_bins=6, min_bins=2),
    )
    s1 = b.collect_stats(spark.createDataFrame(p1), label="p1")
    assert s1.splits is not None and len(s1.splits) >= 3
    s12 = b.collect_stats(spark.createDataFrame(p2), prior=s1, label="p2")
    assert s12.splits == s1.splits  # frozen, not re-probed

    # union aggregated under the SAME frozen splits in one pass
    b2 = SparkMonotonicBinner(
        "x", "y", prebins=32,
        constraints=BinningConstraints(max_bins=6, min_bins=2),
    )
    su = BinStats(
        x="x", y="y", splits=s1.splits, exclude_values=None, rows=[],
    )
    su = b2.collect_stats(spark.createDataFrame(pdf), prior=su)
    _norm = lambda st: sorted(  # noqa: E731
        (r["tag"], repr(r["gkey"]), r["n_rows"], r["n_y"]) for r in st.rows
    )
    assert _norm(s12) == _norm(su)
    for r12 in s12.rows:
        ru = next(
            r for r in su.rows
            if (r["tag"], repr(r["gkey"])) == (r12["tag"], repr(r12["gkey"]))
        )
        assert float(ru["sum_y"] or 0) == pytest.approx(
            float(r12["sum_y"] or 0), rel=1e-12
        )

    m_inc = b.fit_from_stats(s12).model_
    m_all = b2.fit_from_stats(su).model_
    _assert_models_equal(m_all, m_inc)


def test_json_round_trip(spark, tmp_path):
    pdf = _make_pdf(n=1200, seed=5)
    b = _binner()
    s = b.collect_stats(spark.createDataFrame(pdf), label="all")
    path = str(tmp_path / "binstats.json")
    s.save_json(path)
    s2 = BinStats.load_json(path)

    assert s2.x == s.x and s2.y == s.y and s2.splits == s.splits
    assert s2.exclude_values == s.exclude_values
    assert s2.lineage == s.lineage
    m1 = _binner().fit_from_stats(s).model_
    m2 = _binner().fit_from_stats(s2).model_
    _assert_models_equal(m1, m2)
    # NaN-x group keeps its identity apart from null-x through the trip
    nan_rows = [
        r for r in s2.rows
        if r["gkey"] is not None and np.isnan(r["gkey"])
    ]
    null_rows = [r for r in s2.rows if r["gkey"] is None]
    orig_nan = [
        r for r in s.rows
        if r["gkey"] is not None and np.isnan(r["gkey"])
    ]
    assert len(nan_rows) == len(orig_nan)
    assert len(null_rows) == len(
        [r for r in s.rows if r["gkey"] is None]
    )


def test_incompatible_merges_raise(spark):
    pdf = _make_pdf(n=400, seed=9, with_specials=False)
    df = spark.createDataFrame(pdf)
    s_plain = SparkMonotonicBinner(
        "x", "y", prebins="exact"
    ).collect_stats(df)
    s_excl = SparkMonotonicBinner(
        "x", "y", prebins="exact", exclude_values=[3.0]
    ).collect_stats(df)
    with pytest.raises(ValueError, match="exclude_values"):
        s_plain.merge(s_excl)

    s_bucketed = SparkMonotonicBinner("x", "y", prebins=8).collect_stats(df)
    with pytest.raises(ValueError, match="bucketing"):
        s_plain.merge(s_bucketed)

    with pytest.raises(ValueError, match="binner is"):
        SparkMonotonicBinner("other", "y").fit_from_stats(s_plain)


def test_grouped_incremental_equals_full_grouped_fit(spark, tmp_path):
    """Per-source incremental fit: two partition artifacts merged equal
    the one-scan fit_binners_per_group on the union, per group — through
    a JSON round-trip."""
    from monotonic_optimal_binning_spark import (
        collect_group_stats,
        fit_binners_per_group,
        fit_groups_from_stats,
    )

    rng = np.random.default_rng(29)
    n = 5000
    pdf = pd.DataFrame(
        {
            "src": rng.choice(["web", "code", "books"], n),
            "x": rng.integers(0, 25, n).astype(float),
            "y": 0,
        }
    )
    base = {"web": 0.1, "code": 0.3, "books": 0.2}
    for s, b0 in base.items():
        m = pdf["src"] == s
        p = b0 + 0.6 * pdf.loc[m, "x"] / 25.0
        pdf.loc[m, "y"] = (
            rng.uniform(0, 1, int(m.sum())) < p
        ).astype(int)
    pdf.loc[pdf.index % 19 == 0, "x"] = np.nan

    kw = dict(
        prebins="exact",
        constraints=BinningConstraints(max_bins=5, min_bins=2),
    )
    full = fit_binners_per_group(
        spark.createDataFrame(pdf), "src", "x", "y", **kw
    )

    p1 = spark.createDataFrame(pdf.iloc[: n // 2])
    p2 = spark.createDataFrame(pdf.iloc[n // 2:])
    s1 = collect_group_stats(p1, "src", "x", "y", label="p1", **kw)
    s12 = collect_group_stats(p2, prior=s1, label="p2", **kw)
    assert s12.group_col == "src"
    assert [e["label"] for e in s12.lineage] == ["p1", "p2"]

    path = str(tmp_path / "grouped_stats.json")
    s12.save_json(path)
    inc = fit_groups_from_stats(BinStats.load_json(path), **kw)

    assert sorted(inc.models) == sorted(full.models)
    for g in full.models:
        _assert_models_equal(full.models[g], inc.models[g])

    # a grouped artifact refuses the single-model solve and vice versa
    with pytest.raises(ValueError, match="grouped"):
        SparkMonotonicBinner("x", "y").fit_from_stats(s12)
    b = SparkMonotonicBinner("x", "y", prebins="exact")
    with pytest.raises(ValueError, match="ungrouped"):
        fit_groups_from_stats(b.collect_stats(p1))


def test_fit_incremental_job_resume_safe(spark, tmp_path, capsys):
    """The job loop: two daily partitions folded in sequence equal the
    full fit; re-running an already-folded label is a no-op (no
    double-count), and the artifacts land atomically."""
    import json

    from monotonic_optimal_binning_spark import FittedBins
    from monotonic_optimal_binning_spark.jobs import main

    pdf = _make_pdf(n=3000, seed=17, with_specials=False)
    d1, d2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    spark.createDataFrame(pdf.iloc[:1500]).write.parquet(d1)
    spark.createDataFrame(pdf.iloc[1500:]).write.parquet(d2)
    wd = str(tmp_path / "work")

    common = ["fit-incremental", "--x", "x", "--y", "y", "--workdir", wd,
              "--max-bins", "6", "--min-bins", "2"]
    main([*common, "--input", d1, "--label", "day1"])
    out0 = capsys.readouterr().out.strip().splitlines()
    r1 = json.loads(out0[-1])
    # first fold: there is no previous model.json to compare against
    assert r1["max_abs_woe_shift"] is None
    main([*common, "--input", d2, "--label", "day2"])
    out1 = capsys.readouterr().out.strip().splitlines()
    r2 = json.loads(out1[-1])
    assert r2["status"] == "folded" and r2["n_partitions"] == 2
    # second fold replaced day1's model: the promotion-gate metric is a
    # real non-negative WoE L-inf distance between the two step functions
    assert r2["max_abs_woe_shift"] is not None
    assert 0.0 <= r2["max_abs_woe_shift"] < 5.0

    # replaying day2 (duplicate scheduler run) must not double-count
    main([*common, "--input", d2, "--label", "day2"])
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["status"] == "already_folded"
    assert r3["n_partitions"] == 2
    assert r3["totals"] == r2["totals"]

    stats = BinStats.load_json(str(tmp_path / "work" / "binstats.json"))
    assert [e["label"] for e in stats.lineage] == ["day1", "day2"]

    served = FittedBins.load_json(str(tmp_path / "work" / "model.json"))
    full = SparkMonotonicBinner(
        "x", "y",
        constraints=BinningConstraints(max_bins=6, min_bins=2),
    ).fit(spark.createDataFrame(pdf))
    assert served.labels == full.model_.labels
    np.testing.assert_allclose(served.woes, full.model_.woes, rtol=1e-12)


def test_fit_incremental_job_grouped(spark, tmp_path, capsys):
    """--group-col mode: per-source incremental job equals the one-scan
    grouped fit; mixing grouped/ungrouped workdirs fails loudly."""
    import json

    from monotonic_optimal_binning_spark import (
        GroupedBins,
        fit_binners_per_group,
    )
    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(31)
    n = 2400
    pdf = pd.DataFrame(
        {
            "src": rng.choice(["a", "b"], n),
            "x": rng.integers(0, 15, n).astype(float),
        }
    )
    pdf["y"] = (
        rng.uniform(0, 1, n) < 0.15 + 0.6 * pdf["x"] / 15.0
    ).astype(int)
    d1, d2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    spark.createDataFrame(pdf.iloc[: n // 2]).write.parquet(d1)
    spark.createDataFrame(pdf.iloc[n // 2:]).write.parquet(d2)
    wd = str(tmp_path / "work")

    common = ["fit-incremental", "--x", "x", "--y", "y", "--group-col",
              "src", "--workdir", wd, "--max-bins", "5", "--min-bins", "2",
              "--prebins", "exact"]
    main([*common, "--input", d1, "--label", "p1"])
    main([*common, "--input", d2, "--label", "p2"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_partitions"] == 2 and set(r["groups"]) == {"a", "b"}

    served = GroupedBins.load_json(str(tmp_path / "work" / "model.json"))
    full = fit_binners_per_group(
        spark.createDataFrame(pdf), "src", "x", "y", prebins="exact",
        constraints=BinningConstraints(max_bins=5, min_bins=2),
    )
    for g in full.models:
        assert served[g].labels == full[g].labels
        np.testing.assert_allclose(served[g].woes, full[g].woes, rtol=1e-9)

    # ungrouped run against the grouped workdir must refuse
    with pytest.raises(ValueError, match="grouped by"):
        main(["fit-incremental", "--x", "x", "--y", "y", "--workdir", wd,
              "--input", d1, "--label", "again"])


def test_auto_exact_guard_on_new_partition(spark):
    """A prior collected with auto-resolved exact grouping + a new
    high-cardinality partition must fail loudly, not OOM the driver."""
    rng = np.random.default_rng(13)
    low = pd.DataFrame(
        {"x": rng.integers(0, 10, 500).astype(float),
         "y": rng.integers(0, 2, 500)}
    )
    high = pd.DataFrame(
        {"x": np.arange(2000).astype(float) + 0.5,
         "y": rng.integers(0, 2, 2000)}
    )
    b = SparkMonotonicBinner("x", "y", prebins="auto")
    prior = b.collect_stats(spark.createDataFrame(low))
    assert prior.splits is None  # auto resolved to exact
    with pytest.raises(DataError, match="incremental partition"):
        b.collect_stats(spark.createDataFrame(high), prior=prior)
