"""Extra measurement harness for the r08 optimization round (guide §1).

NOT the driver-timed bench (bench.py is frozen): this file isolates the
expensive queries' internal stages with the noop sink, captures
``explain("formatted")`` into plans/r08/, and prints per-stage seconds so
optimizations target the stage that actually costs (guide §1.1/§1.4).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--plans]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r08")
WRITE_PLANS = "--plans" in sys.argv
PLAN_SUFFIX = os.environ.get("PLAN_SUFFIX", "before")


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def build_spark():
    from pyspark.sql import SparkSession

    local_dir = "/dev/shm/spark-local"
    os.makedirs(local_dir, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mob-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", local_dir)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def main():
    from pyspark.sql import functions as F

    from monotonic_optimal_binning_spark import (
        BinningConstraints,
        SparkMonotonicBinner,
        fit_binners_per_group,
    )
    from monotonic_optimal_binning_spark.operators.asof import asof_join
    from monotonic_optimal_binning_spark.operators.dedup import (
        _banded_index,
        exact_dedup,
        minhash_lsh_candidates,
        release_lsh_caches,
        source_overlap_matrix,
    )
    from monotonic_optimal_binning_spark.operators.expectations import (
        expect_between,
        expect_in_set,
        expect_not_null,
        expect_regex,
        expect_row_count,
        expect_stat,
        expect_unique,
        run_checks,
    )
    from monotonic_optimal_binning_spark.operators.packing import chunk_documents
    from monotonic_optimal_binning_spark.operators.similarity import (
        brute_force_topk,
    )
    from monotonic_optimal_binning_spark.operators.textstats import (
        quality_features,
    )
    from monotonic_optimal_binning_spark.operators.windows import (
        rolling_stats,
        sessionize,
        with_lag_lead,
    )
    from monotonic_optimal_binning_spark.sources.synthetic import (
        event_table,
        token_table,
    )
    from monotonic_optimal_binning_spark.sources.tables import load_table
    from monotonic_optimal_binning_spark.functions.timeutil import (
        epoch_seconds,
        pin_utc,
    )

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    pin_utc(spark)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    li = load_table(spark, SF_DIR, "lineitem")
    docs = load_table(spark, SF_DIR, "documents").repartition(CPUS)
    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings").repartition(CPUS)

    results = {}

    def timed(name, fn, reps=3):
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"{name}: {results[name]}", flush=True)

    def plan(name, df):
        if not WRITE_PLANS:
            return
        import contextlib
        import io

        os.makedirs(PLANS_DIR, exist_ok=True)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{PLAN_SUFFIX}.txt"), "w") as f:
            f.write(buf.getvalue())

    # ---------------- sessionize ----------------
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800.0,
                      tiebreak=["event_id"])
    plan("sessionize", sess)
    timed("sessionize", lambda: materialize(
        sessionize(ev, "user_id", "ts", gap_seconds=1800.0,
                   tiebreak=["event_id"])))

    # ---------------- lag_rolling ----------------
    lr = rolling_stats(
        with_lag_lead(ev, ["value"], "user_id", "ts", lags=[1], leads=[1],
                      tiebreak=["event_id"]),
        "value", "user_id", "ts", n_rows=5, tiebreak=["event_id"])
    plan("lag_rolling", lr)
    timed("lag_rolling", lambda: materialize(rolling_stats(
        with_lag_lead(ev, ["value"], "user_id", "ts", lags=[1], leads=[1],
                      tiebreak=["event_id"]),
        "value", "user_id", "ts", n_rows=5, tiebreak=["event_id"])))

    # ---------------- asof_join ----------------
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", epoch_seconds(ev, "ts").alias("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", epoch_seconds(ev, "ts").alias("ts"), "value")
    aj = asof_join(clicks, purchases, on="user_id", left_ts="ts",
                   value_cols=["value"], right_prefix="p_")
    plan("asof_join", aj)
    timed("asof_join", lambda: materialize(
        asof_join(clicks, purchases, on="user_id", left_ts="ts",
                  value_cols=["value"], right_prefix="p_")))

    # ---------------- expectations ----------------
    exps = [
        expect_not_null("l_quantity"),
        expect_in_set("l_returnflag", ["A", "N", "R"]),
        expect_between("l_discount", 0.0, 0.05, min_ratio=0.6),
        expect_regex("l_returnflag", "^[A-Z]$"),
        expect_unique(["l_orderkey", "l_linenumber"], min_ratio=0.9),
        expect_row_count(lo=1000),
        expect_stat("l_quantity", "mean", lo=20, hi=30),
    ]
    timed("expectations_check", lambda: materialize(run_checks(li, exps)))
    # stage split: the one-scan aggregate without the exact-unique Expand
    timed("expectations_no_unique", lambda: materialize(run_checks(
        li, [e for e in exps if e.kind != "unique"])))
    timed("expectations_unique_only", lambda: materialize(run_checks(
        li, [e for e in exps if e.kind == "unique"])))

    # ---------------- minhash stages ----------------
    def mh_banded():
        b = _banded_index(docs, "text", "doc_id", num_hashes=32, n_bands=8,
                          shingle_size=3, shingle_unit="word", seed=42)
        materialize(b)
    timed("minhash_stage_banded", mh_banded)

    def mh_full():
        out = minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=32, n_bands=8,
            shingle_size=3, shingle_unit="word")
        materialize(out)
        release_lsh_caches(out)
    mh_plan = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=32, n_bands=8,
        shingle_size=3, shingle_unit="word")
    plan("minhash_pairs", mh_plan)
    release_lsh_caches(mh_plan)
    timed("minhash_pairs", mh_full)

    # shingle expression alone (no signature UDF)
    from monotonic_optimal_binning_spark.operators.dedup import _shingles
    timed("minhash_stage_shingles", lambda: materialize(
        docs.select(F.col("doc_id"),
                    _shingles(F.col("text"), 3, "word", "xxhash64")
                    .alias("sh"))))

    # ---------------- source_overlap ----------------
    so = source_overlap_matrix(docs, "text", "source", shingle_size=3)
    plan("source_overlap", so)
    timed("source_overlap", lambda: materialize(
        source_overlap_matrix(docs, "text", "source", shingle_size=3)))

    # ---------------- quality / chunk / dedup / cosine ----------------
    plan("quality_features", quality_features(docs))
    timed("quality_features", lambda: materialize(quality_features(docs)))
    plan("chunk_documents", chunk_documents(docs, "text", "doc_id",
                                            max_tokens=64, overlap=16))
    timed("chunk_documents", lambda: materialize(
        chunk_documents(docs, "text", "doc_id", max_tokens=64, overlap=16)))
    timed("exact_dedup", lambda: materialize(
        exact_dedup(docs, ["text"], "doc_id")))
    queries16 = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding")
    plan("cosine_topk", brute_force_topk(emb, queries16, k=10))
    timed("cosine_topk", lambda: materialize(
        brute_force_topk(emb, queries16, k=10)))

    # ---------------- tpch_q1 / bin fits ----------------
    timed("tpch_q1", lambda: materialize(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))))
    li_xy = li.select(
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"))
    timed("bin_fit_exact", lambda: SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=6, min_bins=3)
    ).fit(li_xy))
    timed("bin_fit_prebinned_highcard", lambda: SparkMonotonicBinner(
        "x2", "y", prebins=256,
        constraints=BinningConstraints(max_bins=6, min_bins=3),
    ).fit(li.select(F.col("l_extendedprice").alias("x2"),
                    (F.col("l_discount") > 0.05).cast("int").alias("y"))))
    binner = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=6, min_bins=3)
    ).fit(li_xy)
    plan("woe_transform", binner.transform(li_xy, assign="woe",
                                           output_col="woe"))
    timed("woe_transform", lambda: materialize(
        binner.transform(li_xy, assign="woe", output_col="woe")))

    # ---------------- flagship stages ----------------
    n_docs = max(int(6_000_000 * float(sf)), 20_000) if sf else 600_000

    def flagship_stages(n):
        tok = token_table(spark, n, seed=42)
        tev = event_table(spark, n, events_per_doc=3, seed=42)
        stages = {}
        t0 = time.time()
        snap = tok.select("doc_id", "n_tok", "source").withColumn(
            "ts", F.lit(1_700_050_000.0))
        feat = asof_join(snap, tev, on="doc_id", left_ts="ts", right_ts="ts",
                         value_cols=["value", "label"], right_prefix="ev_")
        feat = feat.withColumn(
            "y", F.coalesce(F.col("ev_label"), F.lit(0.0)).cast("int"))
        feat = feat.persist()
        materialize(feat)
        stages["asof_persist"] = round(time.time() - t0, 3)
        t0 = time.time()
        binners = fit_binners_per_group(
            feat, "source", "n_tok", "y", prebins=128,
            constraints=BinningConstraints(max_bins=6, min_bins=3))
        stages["fit"] = round(time.time() - t0, 3)
        t0 = time.time()
        out = binners.transform(feat, assign="woe", input_col="n_tok",
                                output_col="n_tok_woe")
        materialize(out.select("doc_id", "source", "n_tok", "n_tok_woe",
                               "ev_value"))
        stages["transform"] = round(time.time() - t0, 3)
        feat.unpersist()
        return stages

    # generation-only probe: how much of the as-of stage is synthesizing
    # the 4n input rows (format_string etc.)?
    def gen_only(n):
        tok = token_table(spark, n, seed=42)
        tev = event_table(spark, n, events_per_doc=3, seed=42)
        materialize(tok.select("doc_id", "n_tok", "source"))
        materialize(tev)

    timed("flagship_gen_only", lambda: gen_only(n_docs), reps=2)
    best = None
    for _ in range(3):
        s = flagship_stages(n_docs)
        tot = sum(s.values())
        if best is None or tot < best[0]:
            best = (tot, s)
        print(f"flagship stages: {s} total={round(tot, 3)}", flush=True)
    results["flagship_stages"] = best[1]
    results["flagship_total"] = round(best[0], 3)

    print(json.dumps({"sf": sf, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
