"""Checkpoint/resume: idempotent stages, manifests, lineage report."""

import json
import os

import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.plans.checkpoint import (
    PipelineRun,
    load_manifest,
    run_stage,
)


def test_stage_runs_once_and_resumes(spark, tmp_path):
    stage_dir = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    df1 = run_stage(spark, stage_dir, "double_ids", build)
    assert df1.count() == 100
    assert calls["n"] == 1

    m = load_manifest(stage_dir)
    assert m.stage == "double_ids"
    assert m.rows_written == 100
    assert m.wall_seconds > 0

    # resume: build() must NOT run again
    df2 = run_stage(spark, stage_dir, "double_ids", build)
    assert df2.count() == 100
    assert calls["n"] == 1

    # force re-runs
    run_stage(spark, stage_dir, "double_ids", build, force=True)
    assert calls["n"] == 2


def test_crash_before_manifest_reruns(spark, tmp_path):
    """Data written but no manifest (simulated crash) -> stage re-runs."""
    stage_dir = str(tmp_path / "stage2")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    run_stage(spark, stage_dir, "s", build)
    os.remove(os.path.join(stage_dir, "_MANIFEST.json"))
    run_stage(spark, stage_dir, "s", build)
    assert calls["n"] == 2


def test_partitioned_write_and_lineage(spark, tmp_path):
    root = str(tmp_path / "pipe")
    s1 = os.path.join(root, "tokens")
    s2 = os.path.join(root, "features")

    run_stage(
        spark,
        s1,
        "tokens",
        lambda: spark.range(50).withColumn(
            "source", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
        ),
        partition_by=["source"],
        params={"n": 50},
    )
    # partitioned layout on disk
    assert os.path.isdir(os.path.join(s1, "data", "source=a"))

    run_stage(
        spark,
        s2,
        "features",
        lambda: spark.read.parquet(os.path.join(s1, "data")).withColumn(
            "f", F.col("id") * 3
        ),
        inputs=[s1],
        extra_metrics={"merge_iterations": 7},
    )

    run = PipelineRun(root=root)
    run.record(s1)
    run.record(s2)
    report_path = run.save()
    with open(report_path) as f:
        report = json.load(f)
    assert report["n_stages"] == 2
    assert report["total_rows"] == 100
    assert report["stages"][1]["extra_metrics"]["merge_iterations"] == 7
    assert report["stages"][1]["inputs"] == [s1]


def test_dedup_job_end_to_end(spark, tmp_path):
    """spark-submit dedup pipeline: exact stage + LSH near-dup stage, each
    checkpointed with row-count lineage; re-run replays from checkpoints."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    src = str(tmp_path / "docs.parquet")
    rows = [(i, f"unique document number {i} body {i % 7}") for i in range(40)]
    rows += [(100 + i, "the very same duplicated text") for i in range(5)]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.parquet(src)

    wd = str(tmp_path / "run")
    main(["dedup", "--input", src, "--workdir", wd,
          "--near-threshold", "0.9", "--num-hashes", "16", "--n-bands", "4"])
    with open(os.path.join(wd, "_LINEAGE.json")) as f:
        report = json.load(f)
    assert [s["stage"] for s in report["stages"]] == ["exact_dedup", "minhash_dedup"]
    assert report["stages"][0]["rows_written"] == 41  # 40 unique + 1 survivor
    assert report["stages"][1]["rows_written"] <= 41

    # idempotent resume: re-running must replay (not recompute) both stages
    main(["dedup", "--input", src, "--workdir", wd,
          "--near-threshold", "0.9", "--num-hashes", "16", "--n-bands", "4"])
    final = spark.read.parquet(os.path.join(wd, "stage_neardup", "data"))
    assert final.count() == report["stages"][1]["rows_written"]


def test_fit_woe_job_with_horizons(spark, tmp_path):
    """fit-woe with --asof-right --horizons: the feature stage carries
    BOTH the latest event value (as-of join) and trailing-horizon
    aggregates (as-of aggregation join), then the fit+transform run on
    the enriched frame — end-to-end point-in-time training-set assembly."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(61)
    n = 600
    obs = pd.DataFrame(
        {
            "doc_id": rng.integers(0, 20, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.uniform(0, 86400, n), unit="s"),
            "x": rng.integers(0, 12, n).astype(float),
        }
    )
    obs["y"] = (rng.uniform(0, 1, n) < 0.1 + 0.7 * obs["x"] / 12).astype(int)
    ev = pd.DataFrame(
        {
            "doc_id": rng.integers(0, 20, 900),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.uniform(0, 86400, 900), unit="s"),
            "value": rng.uniform(0, 3, 900).round(2),
        }
    )
    src = str(tmp_path / "obs.parquet")
    rsrc = str(tmp_path / "ev.parquet")
    spark.createDataFrame(obs).write.parquet(src)
    spark.createDataFrame(ev).write.parquet(rsrc)

    wd = str(tmp_path / "fwrun")
    main(["fit-woe", "--input", src, "--x", "x", "--y", "y",
          "--workdir", wd, "--asof-right", rsrc, "--entity-col", "doc_id",
          "--ts-col", "ts", "--horizons", "3600,21600",
          "--half-lives", "3600",
          "--min-bins", "2", "--max-bins", "5"])

    feat = spark.read.parquet(os.path.join(wd, "stage_asof", "data"))
    cols = set(feat.columns)
    assert {"ev_value", "ev_value_h3600_sum", "ev_value_h3600_count",
            "ev_value_h21600_sum", "ev_value_h21600_count",
            "ev_value_hl3600_sum", "ev_value_hl3600_count"} <= cols
    # trailing counts are leakage-free: h-count at each obs equals the
    # pandas truth on a sampled row
    got = feat.toPandas()
    lms = (got["ts"].astype("int64") // 10**6)  # ns -> ms
    ems = (ev["ts"].astype("int64") // 10**6)
    for i in got.index[:5]:
        m = (
            (ev["doc_id"] == got.loc[i, "doc_id"])
            & (ems >= lms[i] - 3600 * 1000)
            & (ems <= lms[i])
        )
        assert int(got.loc[i, "ev_value_h3600_count"]) == int(m.sum())
        # decayed count: 96-half-life truncation window (96h) spans the
        # whole 24h of data, so the truth is the untruncated decay
        md = (ev["doc_id"] == got.loc[i, "doc_id"]) & (ems <= lms[i])
        wts = 2.0 ** ((ems[md] - lms[i]) / 3600000.0)
        assert abs(got.loc[i, "ev_value_hl3600_count"] - wts.sum()) < 1e-9

    with open(os.path.join(wd, "_LINEAGE.json")) as f:
        report = json.load(f)
    assert [s["stage"] for s in report["stages"]] == [
        "asof_features", "woe_transform"
    ]
    out = spark.read.parquet(os.path.join(wd, "stage_transform", "data"))
    assert "x_woe" in out.columns and out.count() == n


def test_pack_job_end_to_end(spark, tmp_path):
    """spark-submit packing stage: token-budget chunks written as an
    idempotent checkpoint with row-count lineage."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    src = str(tmp_path / "toks.parquet")
    pdf = pd.DataFrame({"doc_id": range(50), "n_tok": [13] * 50})
    spark.createDataFrame(pdf).write.parquet(src)

    wd = str(tmp_path / "packrun")
    main(["pack", "--input", src, "--workdir", wd, "--budget", "100"])
    with open(os.path.join(wd, "_LINEAGE.json")) as f:
        report = json.load(f)
    assert report["stages"][0]["stage"] == "pack_sequences"
    out = spark.read.parquet(os.path.join(wd, "stage_pack", "data"))
    import pyspark.sql.functions as F

    per_chunk = out.groupBy("chunk_id").agg(
        F.sum("n_tok_slice").alias("s")).orderBy("chunk_id").collect()
    # 650 tokens -> 6 full chunks of 100 + one 50-token tail
    assert [r["s"] for r in per_chunk] == [100] * 6 + [50]


def test_drift_job_end_to_end(spark, tmp_path):
    """fit -> save_json artifact -> score a new slice with the drift job:
    manifest carries the PSI index + status, resume skips the stage, and
    a shifted slice flips the status."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
    )
    from monotonic_optimal_binning_spark.jobs import main

    df = spark.range(20_000).select(
        (F.col("id") % 40).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < F.col("id") % 40 + 20)
        .cast("int").alias("y"),
    )
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=3)
    ).fit(df)
    model = str(tmp_path / "model.json")
    b.model_.save_json(model)

    same = str(tmp_path / "same.parquet")
    df.write.parquet(same)
    wd = str(tmp_path / "drift_same")
    main(["drift", "--input", same, "--model", model, "--workdir", wd])
    m = load_manifest(os.path.join(wd, "stage_drift"))
    assert m.extra_metrics["status"] == "stable"
    assert abs(m.extra_metrics["psi_worst"]) < 1e-6
    # per-bucket terms landed as the stage output
    out = spark.read.parquet(os.path.join(wd, "stage_drift", "data"))
    assert out.count() == len(b.bins_())

    # resume: identical invocation must not recompute (manifest survives)
    before = m.completed_at_unix
    main(["drift", "--input", same, "--model", model, "--workdir", wd])
    assert load_manifest(
        os.path.join(wd, "stage_drift")).completed_at_unix == before

    # a genuinely shifted slice alerts
    shifted = str(tmp_path / "shifted.parquet")
    df.filter(F.col("x") < 10).write.parquet(shifted)
    wd2 = str(tmp_path / "drift_shifted")
    main(["drift", "--input", shifted, "--model", model, "--workdir", wd2])
    m2 = load_manifest(os.path.join(wd2, "stage_drift"))
    assert m2.extra_metrics["status"] == "shifted"
    assert m2.extra_metrics["psi_worst"] > 0.25


def test_score_job_end_to_end(spark, tmp_path):
    """scorecard.json -> score job: integer scores + reason codes land as
    a checkpoint stage; resume skips; bins-job artifacts are rejected
    with a pointer and scorecards are rejected by transform/drift."""
    import pandas as pd
    import pytest

    from monotonic_optimal_binning_spark import FittedBins, Scorecard
    from monotonic_optimal_binning_spark.jobs import main

    card = Scorecard(
        {
            "x1": FittedBins.from_cuts("x1", [10.0], [0.5, -0.5]),
            "x2": FittedBins.from_cuts("x2", [0.5], [0.2, -0.2]),
        }
    )
    card_path = str(tmp_path / "scorecard.json")
    card.save_json(card_path)

    pdf = pd.DataFrame(
        {"x1": [5.0, 20.0, 20.0], "x2": [0.1, 0.9, 0.1]}
    )
    inp = str(tmp_path / "apps.parquet")
    spark.createDataFrame(pdf).write.parquet(inp)

    wd = str(tmp_path / "score_wd")
    main(["score", "--input", inp, "--scorecard", card_path,
          "--workdir", wd, "--reasons", "--top-k", "2"])
    out = spark.read.parquet(os.path.join(wd, "stage_score", "data"))
    rows = {r["x1"]: r for r in out.collect()}
    assert rows[5.0]["score"] > rows[20.0]["score"]
    worst = [r for r in out.collect()
             if r["x1"] == 20.0 and r["x2"] == 0.9][0]
    assert list(worst["reasons"]) == ["x1", "x2"]
    m = load_manifest(os.path.join(wd, "stage_score"))
    assert m.params["features"] == ["x1", "x2"]

    # resume: identical invocation must not recompute
    before = m.completed_at_unix
    main(["score", "--input", inp, "--scorecard", card_path,
          "--workdir", wd, "--reasons", "--top-k", "2"])
    assert load_manifest(
        os.path.join(wd, "stage_score")).completed_at_unix == before

    # a scorecard handed to transform/drift fails fast with a pointer
    with pytest.raises(SystemExit, match="score"):
        main(["transform", "--input", inp, "--model", card_path,
              "--workdir", str(tmp_path / "wrong")])


def test_quality_filter_job_end_to_end(spark, tmp_path):
    """Cleaning-stage job: good docs survive, junk (punct soup, too-short,
    repeated-line spam) is dropped; audit mode records per-reason counts;
    resume skips the stage."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the quiet field while the sun is setting over the hills "
        "and everyone is watching the long evening settle in for the night"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,
                "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))",  # punct soup
                "too short",                                 # few tokens
                "\n".join(["same line of repeated text here"] * 30),  # dup
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs).write.parquet(src)
    wd = str(tmp_path / "qf")
    main(["quality-filter", "--input", src, "--workdir", wd, "--audit"])
    out = spark.read.parquet(os.path.join(wd, "stage_quality_filter", "data"))
    assert [r["doc_id"] for r in out.collect()] == [1]
    assert set(out.columns) == {"doc_id", "text"}  # features projected out

    m = load_manifest(os.path.join(wd, "stage_quality_filter"))
    assert m.extra_metrics["audit_total"] == 4
    assert m.extra_metrics["audit_kept"] == 1
    assert m.extra_metrics["audit_too_few_tokens"] >= 1
    assert m.extra_metrics["audit_dup_lines"] >= 1
    assert m.rows_written == 1

    # resume skips
    before = m.completed_at_unix
    main(["quality-filter", "--input", src, "--workdir", wd])
    assert load_manifest(
        os.path.join(wd, "stage_quality_filter")).completed_at_unix == before


def test_mix_job_end_to_end(spark, tmp_path):
    """Training-mix job: availability scan -> temperature budgets ->
    deterministic token-budget sample -> packing, as checkpoint stages.
    The manifest carries available/budgeted/realized tokens per source;
    resume replays without recomputing; the sample is reproducible."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main
    from monotonic_optimal_binning_spark.operators.sampling import (
        temperature_mixture_budgets,
    )

    rows = (
        [(i, 10, "web") for i in range(60)]
        + [(100 + i, 10, "code") for i in range(20)]
        + [(200 + i, 10, "wiki") for i in range(10)]
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_tok", "source"])
    src = str(tmp_path / "toks.parquet")
    spark.createDataFrame(pdf).write.parquet(src)

    wd = str(tmp_path / "mixrun")
    main(["mix", "--input", src, "--workdir", wd,
          "--total-budget", "300", "--alpha", "0.5",
          "--pack-budget", "50"])

    m = load_manifest(os.path.join(wd, "stage_mix_sample"))
    avail = {"web": 600, "code": 200, "wiki": 100}
    assert m.extra_metrics["available_tokens"] == avail
    expected = temperature_mixture_budgets(avail, 300, alpha=0.5)
    assert m.extra_metrics["budgets"] == expected
    assert sum(expected.values()) == 300
    # every source respects its budget up to the < one-doc overshoot
    realized = m.extra_metrics["realized_tokens"]
    for s, b in expected.items():
        assert realized[s] < b + 10  # docs are 10 tokens
        assert realized[s] >= min(b, avail[s]) - 10
    # realized matches the written sample exactly
    sampled = spark.read.parquet(os.path.join(wd, "stage_mix_sample", "data"))
    got = {
        r["source"]: r["s"]
        for r in sampled.groupBy("source").agg(F.sum("n_tok").alias("s")).collect()
    }
    assert got == {k: v for k, v in realized.items() if v}

    with open(os.path.join(wd, "_LINEAGE.json")) as f:
        report = json.load(f)
    assert [s["stage"] for s in report["stages"]] == [
        "token_budget_sample", "pack_sequences"
    ]

    # resume: identical invocation replays both stages without recomputing
    before = m.completed_at_unix
    main(["mix", "--input", src, "--workdir", wd,
          "--total-budget", "300", "--alpha", "0.5", "--pack-budget", "50"])
    m2 = load_manifest(os.path.join(wd, "stage_mix_sample"))
    assert m2.completed_at_unix == before
    assert m2.extra_metrics["realized_tokens"] == realized

    # determinism: a fresh workdir draws the identical sample
    wd2 = str(tmp_path / "mixrun2")
    main(["mix", "--input", src, "--workdir", wd2,
          "--total-budget", "300", "--alpha", "0.5"])
    s2 = spark.read.parquet(os.path.join(wd2, "stage_mix_sample", "data"))
    assert sorted(r["doc_id"] for r in s2.collect()) == sorted(
        r["doc_id"] for r in sampled.collect()
    )


def test_ann_job_fit_once_codebook(spark, tmp_path):
    """ann job: first run fits + saves the IVF codebook and writes the
    top-k stage; re-run loads the artifact (no refit — file untouched)
    and replays the stage from its manifest."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((80, 6))
    corpus_pdf = pd.DataFrame(
        {"vec_id": range(80), "embedding": [v.tolist() for v in vecs]}
    )
    corpus = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(corpus_pdf).write.parquet(corpus)
    queries = str(tmp_path / "queries.parquet")
    spark.createDataFrame(
        corpus_pdf.head(5).rename(columns={"vec_id": "query_id"})
    ).write.parquet(queries)

    wd = str(tmp_path / "annrun")
    main(["ann", "--input", corpus, "--queries", queries, "--workdir", wd,
          "--k", "3", "--n-cells", "4", "--n-probe", "4"])
    cb_path = os.path.join(wd, "ivf_codebook.json")
    assert os.path.exists(cb_path)
    with open(cb_path) as f:
        cb = json.load(f)
    assert cb["n_cells"] == 4 and cb["dim"] == 6
    out = spark.read.parquet(os.path.join(wd, "stage_topk", "data"))
    assert out.count() == 15  # 5 queries x k=3
    m = load_manifest(os.path.join(wd, "stage_topk"))
    assert m.extra_metrics["codebook"] == cb_path

    # resume: codebook not refitted, stage not recomputed
    mtime = os.path.getmtime(cb_path)
    before = m.completed_at_unix
    main(["ann", "--input", corpus, "--queries", queries, "--workdir", wd,
          "--k", "3", "--n-cells", "4", "--n-probe", "4"])
    assert os.path.getmtime(cb_path) == mtime
    assert load_manifest(
        os.path.join(wd, "stage_topk")).completed_at_unix == before


def test_dedup_job_with_paragraph_stage(spark, tmp_path):
    """--paragraph-dedup runs boilerplate removal before the doc-level
    passes: the shared paragraph survives only in its first doc, and a
    doc made ENTIRELY of earlier paragraphs is dropped."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "unique one\n\nshared boiler",
                "unique two\n\nshared boiler",   # loses the boiler para
                "shared boiler",                  # fully duplicated -> drop
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(docs).write.parquet(src)
    wd = str(tmp_path / "run")
    main(["dedup", "--input", src, "--workdir", wd, "--paragraph-dedup"])
    with open(os.path.join(wd, "_LINEAGE.json")) as f:
        report = json.load(f)
    assert [s["stage"] for s in report["stages"]] == [
        "paragraph_dedup", "exact_dedup"
    ]
    assert report["stages"][0]["rows_written"] == 2  # doc 3 dropped
    para = (
        spark.read.parquet(os.path.join(wd, "stage_paragraph", "data"))
        .toPandas().sort_values("doc_id")
    )
    assert para["text"].tolist() == [
        "unique one\n\nshared boiler", "unique two"
    ]


def test_screen_job_end_to_end(spark, tmp_path):
    """spark-submit feature screening: ranked IV table checkpointed, the
    manifest amended once with the top-k ranking; resume replays."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main
    from monotonic_optimal_binning_spark.plans.checkpoint import load_manifest

    rng = np.random.RandomState(3)
    a = rng.uniform(0, 100, 800)
    noise = rng.uniform(0, 1, 800)
    y = (rng.uniform(size=800) < (0.1 + 0.6 * a / 100)).astype(int)
    src = str(tmp_path / "feats.parquet")
    spark.createDataFrame(
        pd.DataFrame({"a": a, "noise": noise, "label": y, "name": "x"})
    ).write.parquet(src)

    wd = str(tmp_path / "run")
    main(["screen", "--input", src, "--workdir", wd,
          "--features", "auto", "--y", "label", "--n-buckets", "5",
          "--top-k", "1"])

    m = load_manifest(os.path.join(wd, "stage_screen"))
    # auto feature discovery skipped the string col and the target
    assert sorted(m.params["features"]) == ["a", "noise"]
    assert m.rows_written == 2
    top = m.extra_metrics["top_features"]
    assert len(top) == 1 and top[0]["feature"] == "a"  # planted signal wins

    # resume: manifest amendment must not duplicate or rescan
    main(["screen", "--input", src, "--workdir", wd,
          "--features", "auto", "--y", "label", "--n-buckets", "5",
          "--top-k", "1"])
    m2 = load_manifest(os.path.join(wd, "stage_screen"))
    assert m2.extra_metrics["top_features"] == top

    ranked = spark.read.parquet(os.path.join(wd, "stage_screen", "data"))
    assert {r["feature"] for r in ranked.collect()} == {"a", "noise"}


def test_screen_job_corr_prune(spark, tmp_path):
    """--corr-threshold drops the lower-IV feature of a correlated pair
    and records kept/dropped in the manifest; re-run amends nothing; the
    flag refuses to compose with --group-col."""
    import numpy as np
    import pandas as pd
    import pytest

    from monotonic_optimal_binning_spark.jobs import main
    from monotonic_optimal_binning_spark.plans.checkpoint import load_manifest

    rng = np.random.RandomState(11)
    a = rng.uniform(0, 100, 1200)
    pdf = pd.DataFrame(
        {
            "a": a,
            # noisy copy of a: |corr| ~ 0.92 (> threshold) but the signal
            # is visibly diluted, so its IV ranks strictly below a's
            "a2": a * 2.0 + rng.normal(scale=25.0, size=1200),
            "noise": rng.uniform(0, 1, 1200),
            "label": (rng.uniform(size=1200) < (0.1 + 0.6 * a / 100))
            .astype(int),
        }
    )
    src = str(tmp_path / "feats.parquet")
    spark.createDataFrame(pdf).write.parquet(src)

    wd = str(tmp_path / "run")
    argv = ["screen", "--input", src, "--workdir", wd,
            "--features", "auto", "--y", "label", "--n-buckets", "5",
            "--corr-threshold", "0.8"]
    main(argv)

    m = load_manifest(os.path.join(wd, "stage_screen"))
    cp = m.extra_metrics["corr_prune"]
    assert cp["threshold"] == 0.8
    assert "a" in cp["kept"] and "noise" in cp["kept"]
    assert [d["feature"] for d in cp["dropped"]] == ["a2"]
    assert cp["dropped"][0]["dropped_for"] == "a"
    assert abs(cp["dropped"][0]["corr"]) > 0.9

    main(argv)  # resume: no re-amend, values identical
    m2 = load_manifest(os.path.join(wd, "stage_screen"))
    assert m2.extra_metrics["corr_prune"] == cp

    with pytest.raises(SystemExit):
        main(["screen", "--input", src, "--workdir",
              str(tmp_path / "run2"), "--features", "auto", "--y", "label",
              "--group-col", "noise", "--corr-threshold", "0.8"])


def test_profile_job_end_to_end(spark, tmp_path):
    """profile job: per-column stats checkpointed, manifest amended once
    with the headline facts; resume replays without re-amending."""
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main
    from monotonic_optimal_binning_spark.plans.checkpoint import load_manifest

    pdf = pd.DataFrame(
        {
            "v": [1.0, 2.0, 2.0, None, 5.0] * 40,
            "s": (["x"] * 3 + [None, "y"]) * 40,
        }
    )
    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(pdf).write.parquet(src)

    wd = str(tmp_path / "prof")
    argv = ["profile", "--input", src, "--workdir", wd]
    main(argv)

    m = load_manifest(os.path.join(wd, "stage_profile"))
    cols = {c["column"]: c for c in m.extra_metrics["columns"]}
    assert cols["v"]["null_pct"] == 20.0
    assert cols["v"]["n_distinct"] == 3
    assert cols["s"]["top_value"] == "x" and cols["s"]["top_freq"] == 120
    assert m.params["exact"] is True

    main(argv)  # resume: stage skipped, manifest unchanged
    m2 = load_manifest(os.path.join(wd, "stage_profile"))
    assert m2.extra_metrics["columns"] == m.extra_metrics["columns"]

    # approx mode in a fresh workdir: HLL distincts, no top values
    wd2 = str(tmp_path / "prof2")
    main(["profile", "--input", src, "--workdir", wd2,
          "--columns", "v", "--approx"])
    m3 = load_manifest(os.path.join(wd2, "stage_profile"))
    c = m3.extra_metrics["columns"][0]
    assert c["column"] == "v" and c["n_distinct"] == 3
    assert c["top_value"] is None


def test_transform_job_end_to_end(spark, tmp_path):
    """fit -> save_json -> score a FRESH slice with the transform job:
    output equals the in-process broadcast transform, resume replays."""
    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
    )
    from monotonic_optimal_binning_spark.jobs import main

    df = spark.range(20_000).select(
        (F.col("id") % 40).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), 100) < F.col("id") % 40 + 20)
        .cast("int").alias("y"),
    )
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=3)
    ).fit(df)
    model = str(tmp_path / "model.json")
    b.model_.save_json(model)

    fresh = df.limit(2_000)
    src = str(tmp_path / "fresh.parquet")
    fresh.write.parquet(src)

    wd = str(tmp_path / "score")
    main(["transform", "--input", src, "--model", model, "--workdir", wd,
          "--assign", "woe", "--output-col", "x_woe"])

    out = spark.read.parquet(os.path.join(wd, "stage_transform", "data"))
    expected = b.transform(
        spark.read.parquet(src), assign="woe", output_col="x_woe"
    )
    got = {(r["x"], r["y"], round(r["x_woe"], 9)) for r in out.collect()}
    want = {(r["x"], r["y"], round(r["x_woe"], 9)) for r in expected.collect()}
    assert got == want

    m = load_manifest(os.path.join(wd, "stage_transform"))
    assert m.params["kind"] == "single"
    assert m.rows_written == 2_000

    # resume is a replay, not a recompute
    before = m.completed_at_unix
    main(["transform", "--input", src, "--model", model, "--workdir", wd,
          "--assign", "woe", "--output-col", "x_woe"])
    assert load_manifest(
        os.path.join(wd, "stage_transform")).completed_at_unix == before

    # interval labels from the same artifact (string path)
    wd2 = str(tmp_path / "labels")
    main(["transform", "--input", src, "--model", model, "--workdir", wd2,
          "--assign", "interval"])
    lab = spark.read.parquet(os.path.join(wd2, "stage_transform", "data"))
    labels = {r["x_interval"] for r in lab.collect()}
    assert labels <= set(b.summary_()["bucket"]) and len(labels) > 1


def test_screen_job_grouped_topk_and_type_detection(spark, tmp_path):
    """--group-col: top-k is PER GROUP in the manifest; auto feature
    detection takes numeric types only (timestamps excluded)."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main
    from monotonic_optimal_binning_spark.plans.checkpoint import load_manifest

    rng = np.random.RandomState(11)
    n = 1200
    a = rng.uniform(0, 100, n)
    y = (rng.uniform(size=n) < (0.1 + 0.6 * a / 100)).astype(int)
    pdf = pd.DataFrame({
        "a": a,
        "noise": rng.uniform(0, 1, n),
        "label": y,
        "grp": np.where(np.arange(n) % 2 == 0, "g0", "g1"),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(np.arange(n), unit="s"),
    })
    src = str(tmp_path / "g.parquet")
    spark.createDataFrame(pdf).write.parquet(src)

    wd = str(tmp_path / "run")
    main(["screen", "--input", src, "--workdir", wd,
          "--features", "auto", "--y", "label", "--group-col", "grp",
          "--n-buckets", "5", "--top-k", "1"])

    m = load_manifest(os.path.join(wd, "stage_screen"))
    # timestamp and group columns are not candidate features
    assert sorted(m.params["features"]) == ["a", "noise"]
    top = m.extra_metrics["top_features"]
    # ONE row per group, and in each it's the planted-signal feature
    assert [(t["grp"], t["feature"]) for t in top] == [
        ("g0", "a"), ("g1", "a")
    ]


def test_fit_woe_job_weighted(spark, tmp_path):
    """fit-woe --weight-col: the job's model.json is the frequency-weighted
    fit — equal to running the job on the k-fold replicated input."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(71)
    n = 800
    pdf = pd.DataFrame(
        {
            "x": rng.integers(0, 10, n).astype(float),
            "w": rng.choice([1.0, 2.0, 3.0], n),
        }
    )
    pdf["y"] = (rng.uniform(0, 1, n) < 0.1 + 0.8 * pdf["x"] / 10).astype(int)
    src = str(tmp_path / "wsrc.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    rep = pdf.loc[pdf.index.repeat(pdf["w"].astype(int))].reset_index(drop=True)
    rsrc = str(tmp_path / "wrep.parquet")
    spark.createDataFrame(rep.drop(columns="w")).write.parquet(rsrc)

    wd_w = str(tmp_path / "run_w")
    wd_r = str(tmp_path / "run_r")
    common = ["--x", "x", "--y", "y", "--min-bins", "2", "--max-bins", "5",
              "--prebins", "exact"]
    main(["fit-woe", "--input", src, "--workdir", wd_w,
          "--weight-col", "w", *common])
    main(["fit-woe", "--input", rsrc, "--workdir", wd_r, *common])

    with open(os.path.join(wd_w, "cut_points.json")) as f:
        cw = json.load(f)
    with open(os.path.join(wd_r, "cut_points.json")) as f:
        cr = json.load(f)
    assert cw["labels"] == cr["labels"]
    assert cw["woes"] == pytest.approx(cr["woes"], rel=1e-9)
    # manifest records the weighting
    with open(os.path.join(wd_w, "_LINEAGE.json")) as f:
        rep_json = json.load(f)
    tr = [s for s in rep_json["stages"] if s["stage"] == "woe_transform"][0]
    assert tr["params"]["weight_col"] == "w"


def test_scale_job_fit_serve_resume(spark, tmp_path):
    """scale job: fit stage writes feature_stats.json + transformed
    output; a resumed run replays without re-fitting; a scoring run with
    --stats serves the TRAINING artifact (identical derived values on the
    training slice, training statistics applied to the new slice)."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(83)
    train = pd.DataFrame({"a": rng.normal(5, 2, 400),
                          "id": np.arange(400)})
    train.loc[train.index % 9 == 0, "a"] = np.nan
    src = str(tmp_path / "train.parquet")
    spark.createDataFrame(train).write.parquet(src)

    wd = str(tmp_path / "scale_run")
    argv = ["scale", "--input", src, "--cols", "a", "--workdir", wd,
            "--exact", "--impute", "median", "--standardize"]
    main(argv)
    stats_p = os.path.join(wd, "feature_stats.json")
    assert os.path.exists(stats_p)
    out1 = spark.read.parquet(os.path.join(wd, "stage_scale", "data"))
    assert "a_z" in out1.columns and out1.filter("a is null").count() == 0
    with open(os.path.join(wd, "stage_scale", "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["extra_metrics"]["applied"] == ["impute", "standardize"]
    assert man["extra_metrics"]["n_null"]["a"] == int(
        train["a"].isna().sum()
    )

    # resume: delete nothing, re-run — artifact untouched, stage replayed
    mtime = os.path.getmtime(stats_p)
    main(argv)
    assert os.path.getmtime(stats_p) == mtime

    # serve: new slice scaled by TRAINING stats, not its own
    score = pd.DataFrame({"a": rng.normal(50, 1, 100),
                          "id": np.arange(100)})
    ssrc = str(tmp_path / "score.parquet")
    spark.createDataFrame(score).write.parquet(ssrc)
    wd2 = str(tmp_path / "serve_run")
    main(["scale", "--input", ssrc, "--cols", "a", "--workdir", wd2,
          "--stats", stats_p, "--standardize"])
    served = spark.read.parquet(
        os.path.join(wd2, "stage_scale", "data")
    ).toPandas()
    from monotonic_optimal_binning_spark import FeatureStats

    st = FeatureStats.load_json(stats_p)
    m, sd = st.stats["a"]["mean"], st.stats["a"]["std"]
    served = served.sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(served["a_z"], (score["a"] - m) / sd)
    # a shifted slice standardized by training stats is FAR from zero
    # mean — the skew the artifact exists to surface, not hide
    assert served["a_z"].mean() > 5


def test_fit_woe_mixed_storage_per_ref_format(spark, tmp_path):
    """--asof-right-format overrides the reader for the SECONDARY ref
    only (the ADVICE r6 mixed-storage case): parquet main input + ORC
    event table in one pipeline."""
    import numpy as np
    import pandas as pd

    from monotonic_optimal_binning_spark.jobs import main

    rng = np.random.default_rng(62)
    n = 300
    obs = pd.DataFrame(
        {
            "doc_id": rng.integers(0, 10, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.uniform(0, 86400, n), unit="s"),
            "x": rng.integers(0, 12, n).astype(float),
        }
    )
    obs["y"] = (rng.uniform(0, 1, n) < 0.1 + 0.7 * obs["x"] / 12).astype(int)
    ev = pd.DataFrame(
        {
            "doc_id": rng.integers(0, 10, 200),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.uniform(0, 86400, 200), unit="s"),
            "value": rng.uniform(0, 3, 200).round(2),
        }
    )
    src = str(tmp_path / "obs.parquet")
    rsrc = str(tmp_path / "ev_orc")
    spark.createDataFrame(obs).write.parquet(src)
    spark.createDataFrame(ev).write.orc(rsrc)

    wd = str(tmp_path / "fwrun")
    main(["fit-woe", "--input", src, "--x", "x", "--y", "y",
          "--workdir", wd, "--asof-right", rsrc,
          "--asof-right-format", "orc",
          "--entity-col", "doc_id", "--ts-col", "ts",
          "--min-bins", "2", "--max-bins", "5"])
    feat = spark.read.parquet(os.path.join(wd, "stage_asof", "data"))
    assert "ev_value" in feat.columns
    assert feat.count() == n
