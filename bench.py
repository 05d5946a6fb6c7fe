"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship pipeline measures the north-star metric — feature rows/sec for
as-of join + monotone-WoE binning over the (doc_id, tokens, n_tok, source)
token table — on a deterministic synthetic input scaled to the sf dir.
Each query is forced end-to-end with the noop sink (count() would let
Catalyst prune the expensive columns away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def build_spark():
    from pyspark.sql import SparkSession

    # shuffle files on tmpfs: this VM's virtual block device does ~100 MB/s
    # cold, which made every >1 GB shuffle disk-bound regardless of cores; a
    # real cluster's NVMe-backed local dirs are the fair analog
    local_dir = "/dev/shm/spark-local"
    os.makedirs(local_dir, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mob-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", local_dir)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
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
        exact_dedup,
        minhash_lsh_candidates,
    )
    from monotonic_optimal_binning_spark.operators.similarity import brute_force_topk
    from monotonic_optimal_binning_spark.operators.textstats import quality_features
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

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    li = load_table(spark, SF_DIR, "lineitem")
    # testdata tables are single parquet files (one row group = one input
    # split); repartition the per-row-heavy inputs so regex/vector work uses
    # all cores — on a real multi-file table this parallelism comes free
    docs = load_table(spark, SF_DIR, "documents").repartition(CPUS)
    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings").repartition(CPUS)
    li_xy = li.select(
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") > 0.05).cast("int").alias("y"),
    )

    timings = {}
    # SPARK_GRAFT_FLAGSHIP_ONLY=1 -> skip the headline operator queries and
    # time only the north-star pipeline (used by bench_scaling.py, which
    # runs the flagship at two parallelism levels)
    flagship_only = bool(os.environ.get("SPARK_GRAFT_FLAGSHIP_ONLY"))

    # Queries REGISTER here and run later in interleaved round-robin ROUNDS
    # (q1,q2,...,qn, q1,q2,...) instead of consecutive per-query reps: the
    # host throttles in episodes long enough to swallow 3+ consecutive reps
    # of one query (round-3 driver run: minhash 6.1s recorded vs 2.3s warm),
    # but an episode that spans one round inflates each query's SINGLE rep
    # of that round and leaves its other rounds clean — per-query min then
    # measures the engine. Adaptive depth per query: 3 rounds minimum, up
    # to 5 while the min is still improving >5% (rep 1 absorbs JIT).
    _registry = []

    def bench(name, fn):
        if flagship_only:
            return
        _registry.append((name, fn))

    # small per-round CPU probe (~1/10 of the headline calibration): one
    # value per round-robin round, so a throttle episode inside a single
    # round is self-identifying PER QUERY — each query's reported calib is
    # the probe of the round its min rep came from
    def mini_calib():
        t0 = time.time()
        spark.range(0, 100_000_000, 1, CPUS).select(
            F.sum(F.shiftright(F.xxhash64("id", F.lit(int(t0 * 1e3) % 97)), 32))
        ).collect()
        return time.time() - t0

    queries_calib = {}
    calib_rounds = []

    def run_registered():
        reps = {name: [] for name, _ in _registry}  # (seconds, round) pairs
        stale = {name: 0 for name, _ in _registry}
        # one untimed warmup round (the flagship gets the same treatment):
        # codegen/JIT + python-worker forks are session costs, and letting
        # rep 1 absorb them means ONE throttle burst in rounds 2-3 can
        # trip the stale-stop with no clean warm rep ever recorded
        # (observed: minhash 4.2 s recorded vs 1.9 s warm)
        for name, fn in _registry:
            fn()
        for rnd in range(5):
            calib_rounds.append(round(mini_calib(), 3))
            for name, fn in _registry:
                r = reps[name]
                if len(r) >= 5 or (len(r) >= 3 and stale[name] >= 2):
                    continue
                t0 = time.time()
                fn()
                t = time.time() - t0
                stale[name] = (
                    stale[name] + 1
                    if r and t > min(v for v, _ in r) * 0.95
                    else 0
                )
                r.append((t, rnd))
        for name, r in reps.items():
            best, best_rnd = min(r)
            timings[name] = round(best, 3)
            queries_calib[name] = calib_rounds[best_rnd]

    # --- headline operator queries on the driver-provided testdata ---
    bench("tpch_q1", lambda: materialize(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))
    ))
    bench("bin_fit_exact", lambda: SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=6, min_bins=3)
    ).fit(li_xy))
    bench("bin_fit_prebinned_highcard", lambda: SparkMonotonicBinner(
        "x2", "y", prebins=256,
        constraints=BinningConstraints(max_bins=6, min_bins=3),
    ).fit(li.select(F.col("l_extendedprice").alias("x2"),
                    (F.col("l_discount") > 0.05).cast("int").alias("y"))))

    binner = None if flagship_only else SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=6, min_bins=3)
    ).fit(li_xy)
    bench("woe_transform", lambda: materialize(
        binner.transform(li_xy, assign="woe", output_col="woe")
    ))

    from monotonic_optimal_binning_spark.functions.timeutil import (
        epoch_seconds,
        pin_utc,
    )

    pin_utc(spark)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", epoch_seconds(ev, "ts").alias("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", epoch_seconds(ev, "ts").alias("ts"), "value"
    )
    bench("asof_join", lambda: materialize(
        asof_join(clicks, purchases, on="user_id", left_ts="ts",
                  value_cols=["value"], right_prefix="p_")
    ))
    bench("sessionize", lambda: materialize(
        sessionize(ev, "user_id", "ts", gap_seconds=1800.0, tiebreak=["event_id"])
    ))
    bench("lag_rolling", lambda: materialize(
        rolling_stats(
            with_lag_lead(ev, ["value"], "user_id", "ts", lags=[1], leads=[1],
                          tiebreak=["event_id"]),
            "value", "user_id", "ts", n_rows=5, tiebreak=["event_id"],
        )
    ))
    bench("exact_dedup", lambda: materialize(exact_dedup(docs, ["text"], "doc_id")))

    from monotonic_optimal_binning_spark.operators.dedup import (
        release_lsh_caches,
    )

    def run_minhash():
        # lazy mode keeps the measurement comparable across rounds (ONE
        # streamed pass to the noop sink, no checkpoint store of the full
        # unthresholded pair set); caches released per rep so reps don't
        # accumulate pinned storage
        out = minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=32, n_bands=8,
            shingle_size=3, shingle_unit="word",
        )
        materialize(out)
        release_lsh_caches(out)

    bench("minhash_pairs", run_minhash)
    bench("quality_features", lambda: materialize(quality_features(docs)))

    # --- round-6 tier: the heaviest of the r6 operators, so regressions
    # in them show up in the recorded bench (they previously had no
    # timing at all) ---
    from monotonic_optimal_binning_spark.operators.dedup import (
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
    from monotonic_optimal_binning_spark.operators.packing import (
        chunk_documents,
    )

    bench("source_overlap", lambda: materialize(
        source_overlap_matrix(docs, "text", "source", shingle_size=3)
    ))
    bench("chunk_documents", lambda: materialize(
        chunk_documents(docs, "text", "doc_id", max_tokens=64, overlap=16)
    ))
    bench("expectations_check", lambda: materialize(run_checks(
        li,
        [
            expect_not_null("l_quantity"),
            expect_in_set("l_returnflag", ["A", "N", "R"]),
            expect_between("l_discount", 0.0, 0.05, min_ratio=0.6),
            expect_regex("l_returnflag", "^[A-Z]$"),
            expect_unique(["l_orderkey", "l_linenumber"], min_ratio=0.9),
            expect_row_count(lo=1000),
            expect_stat("l_quantity", "mean", lo=20, hi=30),
        ],
    )))
    queries16 = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bench("cosine_topk", lambda: materialize(brute_force_topk(emb, queries16, k=10)))

    run_registered()

    # --- flagship: north-star feature pipeline on the token table ---
    # Scale discipline: the heavy token-array payload is projected OUT
    # before the as-of shuffle — the feature pipeline computes on scalar
    # columns only (doc_id, n_tok, source, event values); re-attaching
    # tokens is a plain equi-join by doc_id when a consumer needs them.
    # Shuffling a ~1.4 KB payload through the window sort to produce a
    # scalar feature is exactly the mistake that stops scaling at 100 TB.
    n_docs = max(int(6_000_000 * float(sf)), 20_000) if sf else 600_000
    # scaling harness override: a bigger flagship input amortizes the O(1)
    # serial fraction (driver solve, collect round-trips) so the efficiency
    # number measures the distributed stages
    n_docs = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_DOCS", n_docs))

    def run_flagship(n: int) -> float:
        tok = token_table(spark, n, seed=42)
        tev = event_table(spark, n, events_per_doc=3, seed=42)
        t0 = time.time()
        snap = tok.select("doc_id", "n_tok", "source").withColumn(
            "ts", F.lit(1_700_050_000.0)
        )
        feat = asof_join(
            snap, tev, on="doc_id", left_ts="ts", right_ts="ts",
            value_cols=["value", "label"], right_prefix="ev_",
        )
        feat = feat.withColumn(
            "y", F.coalesce(F.col("ev_label"), F.lit(0.0)).cast("int")
        )
        # feat feeds BOTH the fit aggregation and the transform: persist so
        # the as-of window computes once (on a cluster this would be a
        # checkpoint stage, plans/checkpoint.py)
        feat = feat.persist()
        binners = fit_binners_per_group(
            feat, "source", "n_tok", "y",
            prebins=128,
            constraints=BinningConstraints(max_bins=6, min_bins=3),
        )
        out = binners.transform(feat, assign="woe", input_col="n_tok",
                                output_col="n_tok_woe")
        materialize(out.select("doc_id", "source", "n_tok", "n_tok_woe", "ev_value"))
        sec = time.time() - t0
        feat.unpersist()
        return sec

    # one small warmup run first (JIT/codegen + python-worker startup are
    # session costs, not per-row costs; first-vs-warm differs 3-5x), then
    # adaptive best-of-reps: the host throttles in episodes long enough to
    # eat several consecutive reps (observed: 3 reps at 5-15s vs a 2.1s
    # floor), so keep taking reps (3..6) until the min stops improving by
    # >5% for two consecutive reps — the min measures the engine, not the
    # neighbors
    run_flagship(max(n_docs // 10, 10_000))
    fcalibs = [round(mini_calib(), 3)] if not flagship_only else []
    reps = [run_flagship(n_docs)]
    stale = 0
    while len(reps) < 6 and (len(reps) < 3 or stale < 2):
        if not flagship_only:
            fcalibs.append(round(mini_calib(), 3))
        t = run_flagship(n_docs)
        stale = stale + 1 if t > min(reps) * 0.95 else 0
        reps.append(t)
    flagship_sec = min(reps)
    if not flagship_only:
        queries_calib["flagship_pipeline"] = fcalibs[
            min(range(len(reps)), key=reps.__getitem__)
        ]
    feature_rows = n_docs
    timings["flagship_pipeline"] = round(flagship_sec, 3)

    # per-session CPU calibration (ALL modes): a fixed pure-CPU
    # hash-aggregate whose wall time reveals how much real CPU the host is
    # granting this VM during THIS session (it varies ~6x between host-load
    # windows). Emitted next to the headline numbers so a run recorded
    # inside a throttle episode is self-identifying — measured full-speed
    # range is ~0.3-0.7 s at local[32] (BENCH.md: 0.62 s at local[8],
    # 2.1 s at local[2]); a local[32] value above ~2 s means the session
    # was throttled and the headline is inflated. Rebuilt per run —
    # re-collecting one DataFrame reuses shuffle maps.
    def calib():
        t0 = time.time()
        spark.range(0, 1_000_000_000, 1, CPUS * 2).select(
            F.sum(F.shiftright(F.xxhash64("id", F.lit(int(t0) % 97)), 32))
        ).collect()
        return time.time() - t0

    calib()
    cpu_calib_sec = round(min(calib(), calib()), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "flagship_feature_rows_per_sec": round(feature_rows / flagship_sec, 1),
        "flagship_rows": feature_rows,
        "cpus": CPUS,
    }
    result["cpu_calib_sec"] = cpu_calib_sec
    # per-query calibration: the mini-probe (~1/10 the headline calib
    # work) of the round each query's min rep came from — a throttle
    # episode inside one query's winning round is visible right next to
    # its number instead of hiding behind the session-level calib
    result["queries_calib_sec"] = queries_calib
    result["calib_rounds_sec"] = calib_rounds
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
