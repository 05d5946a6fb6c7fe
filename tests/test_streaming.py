"""Structured Streaming analogs: session_window aggregation + stateless WoE
lookup driven end-to-end with a file stream and memory sink."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark import SparkMonotonicBinner
from monotonic_optimal_binning_spark.streaming.sessions import (
    streaming_sessionize,
    streaming_tumbling_stats,
    streaming_woe_lookup,
)


@pytest.fixture()
def stream_source(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "user": ["a"] * 4 + ["b"] * 2,
            "ts": pd.to_datetime(
                [
                    "2026-01-01 00:00:00",
                    "2026-01-01 00:05:00",
                    "2026-01-01 02:00:00",
                    "2026-01-01 02:10:00",
                    "2026-01-01 01:00:00",
                    "2026-01-01 05:00:00",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    src = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_sessionize(spark, stream_source):
    out = streaming_sessionize(stream_source, "user", "ts", gap="30 minutes")
    _run_to_memory(out, "sess", "complete")
    res = spark.sql("select * from sess").toPandas()
    a = res[res["user"] == "a"].sort_values("session_start")
    # two sessions for user a (00:00-00:05 and 02:00-02:10), two singletons for b
    assert len(a) == 2
    assert a["n_events"].tolist() == [2, 2]
    assert len(res[res["user"] == "b"]) == 2


def test_streaming_tumbling_stats(spark, stream_source):
    out = streaming_tumbling_stats(
        stream_source, "user", "ts", "value", window="1 hour"
    )
    _run_to_memory(out, "tumb", "complete")
    res = spark.sql("select * from tumb").toPandas()
    first_hour_a = res[
        (res["user"] == "a")
        & (res["window_start"] == pd.Timestamp("2026-01-01 00:00:00"))
    ]
    assert first_hour_a["value_count"].iloc[0] == 2
    assert first_hour_a["value_sum"].iloc[0] == pytest.approx(3.0)


def test_streaming_woe_lookup(spark, stream_source, tmp_path):
    # fit a model in batch, apply it on the stream (stateless pandas UDF)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, 500)
    y = (rng.random(500) < x / 10).astype(int)
    b = SparkMonotonicBinner("x", "y").fit(
        spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    )
    out = streaming_woe_lookup(stream_source, b.model_, "value")
    _run_to_memory(out, "woes", "append")
    res = spark.sql("select * from woes").toPandas()
    assert len(res) == 6
    expected = b.model_.assign_batch(res["value"], "woe")
    np.testing.assert_allclose(res["value_woe"].to_numpy(), expected.to_numpy())


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): duplicates must be
    dropped WITHIN a micro-batch and ACROSS micro-batches (seen-set state)."""
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    batch1 = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha", "beta", "alpha"]}
    )
    batch2 = pd.DataFrame(
        {"doc_id": [4, 5, 6], "text": ["beta", "gamma", "gamma"]}
    )
    spark.createDataFrame(batch1).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(batch2).coalesce(1).write.parquet(src + "/f2")
    schema = spark.read.parquet(src + "/f1").schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src + "/*")
    )
    out = streaming_exact_dedup(stream, ["text"], shards=8)
    _run_to_memory(out, "dedup_stream", "append")
    res = spark.sql("select * from dedup_stream").toPandas()
    # one survivor per distinct text, across all batches
    assert sorted(res["text"].tolist()) == ["alpha", "beta", "gamma"]
    assert res["text"].is_unique


def test_streaming_asof_enrich_matches_batch(spark, tmp_path):
    """Streaming point-in-time enrichment must equal the batch asof_join
    when the per-key event-time-order assumption holds across batches."""
    from monotonic_optimal_binning_spark.operators.asof import asof_join
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    rng = np.random.default_rng(7)
    # two time-ordered chunks per side (log-ordered source)
    def chunk(lo, hi, n, is_left):
        ts = np.sort(rng.uniform(lo, hi, n)).round(3)
        if is_left:
            return pd.DataFrame(
                {"k": rng.integers(0, 4, n), "ts": ts,
                 "eid": np.arange(n) + int(lo * 1000)}
            )
        return pd.DataFrame(
            {"k": rng.integers(0, 4, n), "ts": ts,
             "val": rng.uniform(0, 100, n).round(2)}
        )

    l1, l2 = chunk(0, 50, 30, True), chunk(50, 100, 30, True)
    r1, r2 = chunk(0, 50, 20, False), chunk(50, 100, 20, False)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(l1).coalesce(1).write.parquet(lsrc + "/b1")
    spark.createDataFrame(l2).coalesce(1).write.parquet(lsrc + "/b2")
    spark.createDataFrame(r1).coalesce(1).write.parquet(rsrc + "/b1")
    spark.createDataFrame(r2).coalesce(1).write.parquet(rsrc + "/b2")

    lschema = spark.read.parquet(lsrc + "/b1").schema
    rschema = spark.read.parquet(rsrc + "/b1").schema
    # one file per trigger -> the [0,50) and [50,100) chunks arrive in
    # separate micro-batches, exercising the cross-batch state carry
    lstream = (
        spark.readStream.schema(lschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc + "/*")
    )
    rstream = (
        spark.readStream.schema(rschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc + "/*")
    )

    out = streaming_asof_enrich(
        lstream, rstream, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_",
    )
    _run_to_memory(out, "asof_stream", "append")
    got = (
        spark.sql("select * from asof_stream")
        .toPandas()
        .sort_values(["k", "ts", "eid"])
        .reset_index(drop=True)
    )

    lall = pd.concat([l1, l2], ignore_index=True)
    rall = pd.concat([r1, r2], ignore_index=True)
    expected = (
        asof_join(
            spark.createDataFrame(lall), spark.createDataFrame(rall),
            on="k", left_ts="ts", value_cols=["val"], right_prefix="last_",
        )
        .toPandas()
        .sort_values(["k", "ts", "eid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(lall)
    np.testing.assert_allclose(
        got["last_val"].to_numpy(float),
        expected["last_val"].to_numpy(float),
        equal_nan=True,
    )


def test_streaming_asof_late_left_never_sees_future_state(spark, tmp_path):
    """A left row arriving in a LATER micro-batch with an OLDER event time
    than the carried right-side state must be enriched with null, not a
    value from its temporal future (zero-leakage guard)."""
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    # batch 1: one right row at ts=100
    r1 = pd.DataFrame({"k": [1], "ts": [100.0], "val": [5.0]})
    # right stream needs a second file so the left batch-2 rows are
    # processed after state carries ts=100; give it a far-future row
    r2 = pd.DataFrame({"k": [1], "ts": [900.0], "val": [9.0]})
    l1 = pd.DataFrame({"k": [1], "ts": [110.0], "eid": [0]})
    # batch 2: one late left (ts=50 < state ts=100) and one on-time (150)
    l2 = pd.DataFrame({"k": [1, 1], "ts": [50.0, 150.0], "eid": [1, 2]})
    spark.createDataFrame(r1).coalesce(1).write.parquet(rsrc + "/b1")
    spark.createDataFrame(r2).coalesce(1).write.parquet(rsrc + "/b2")
    spark.createDataFrame(l1).coalesce(1).write.parquet(lsrc + "/b1")
    spark.createDataFrame(l2).coalesce(1).write.parquet(lsrc + "/b2")

    lschema = spark.read.parquet(lsrc + "/b1").schema
    rschema = spark.read.parquet(rsrc + "/b1").schema
    lstream = (
        spark.readStream.schema(lschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc + "/*")
    )
    rstream = (
        spark.readStream.schema(rschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc + "/*")
    )
    out = streaming_asof_enrich(
        lstream, rstream, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_",
    )
    _run_to_memory(out, "asof_late_left", "append")
    got = (
        spark.sql("select * from asof_late_left")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    by_eid = dict(zip(got["eid"], got["last_val"]))
    assert by_eid[0] == 5.0            # on-time left sees the ts=100 right
    assert pd.isna(by_eid[1])          # late left (ts=50) must NOT see it
    assert by_eid[2] in (5.0, 9.0)     # ts=150: batch or carried state


def test_streaming_asof_reorder_buffer_applies_late_right(spark, tmp_path):
    """With reorder_within, a right row arriving one micro-batch LATE (but
    within the bound) must still enrich an earlier-buffered left row —
    bounded disorder is sorted out inside the buffer, not dropped."""
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    # batch 1: left at ts=100 (no right yet) + an early right at ts=10
    l1 = pd.DataFrame({"k": [1], "ts": [100.0], "eid": [0]})
    r1 = pd.DataFrame({"k": [1], "ts": [10.0], "val": [1.0]})
    # batch 2: the LATE right at ts=90 (before the buffered left!) plus
    # frontier-advancing rows at ts=300 so the buffer flushes
    l2 = pd.DataFrame({"k": [1], "ts": [300.0], "eid": [9]})
    r2 = pd.DataFrame({"k": [1, 1], "ts": [90.0, 300.0], "val": [5.0, 9.0]})
    spark.createDataFrame(l1).coalesce(1).write.parquet(lsrc + "/b1")
    spark.createDataFrame(l2).coalesce(1).write.parquet(lsrc + "/b2")
    spark.createDataFrame(r1).coalesce(1).write.parquet(rsrc + "/b1")
    spark.createDataFrame(r2).coalesce(1).write.parquet(rsrc + "/b2")

    lstream = (
        spark.readStream.schema(spark.read.parquet(lsrc + "/b1").schema)
        .option("maxFilesPerTrigger", 1).parquet(lsrc + "/*")
    )
    rstream = (
        spark.readStream.schema(spark.read.parquet(rsrc + "/b1").schema)
        .option("maxFilesPerTrigger", 1).parquet(rsrc + "/*")
    )
    out = streaming_asof_enrich(
        lstream, rstream, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_", reorder_within=50.0,
    )
    _run_to_memory(out, "asof_reorder", "append")
    got = spark.sql("select * from asof_reorder").toPandas()
    by_eid = dict(zip(got["eid"], got["last_val"]))
    # left@100 was held in batch 1 (frontier 100, cutoff 50); in batch 2
    # the frontier jumps to 300, the buffer flushes, and the late right@90
    # (which arrived AFTER the left) is correctly matched to it
    assert by_eid[0] == 5.0
    # left@300 stays inside the reorder window (frontier 300) -> unemitted
    assert 9 not in by_eid
    # WITHOUT the buffer the late right would have been invisible to eid 0
    out2 = streaming_asof_enrich(
        lstream, rstream, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_",
    )
    _run_to_memory(out2, "asof_noreorder", "append")
    got2 = spark.sql("select * from asof_noreorder").toPandas()
    by2 = dict(zip(got2["eid"], got2["last_val"]))
    assert by2[0] == 1.0  # only the in-order right@10 was visible in time


def test_streaming_asof_inblock_late_right_does_not_regress_state(spark, tmp_path):
    """A late right row arriving IN THE SAME BATCH as a newer left must not
    override the newer carried state value (in-block frontier regression)."""
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    # batch 1: right@100 val=5 reaches state via left@110
    r1 = pd.DataFrame({"k": [1], "ts": [100.0], "val": [5.0]})
    l1 = pd.DataFrame({"k": [1], "ts": [110.0], "eid": [0]})
    # batch 2: LATE right@50 val=77 + left@150 — 150 must see 5, not 77
    r2 = pd.DataFrame({"k": [1], "ts": [50.0], "val": [77.0]})
    l2 = pd.DataFrame({"k": [1], "ts": [150.0], "eid": [1]})
    spark.createDataFrame(r1).coalesce(1).write.parquet(rsrc + "/b1")
    spark.createDataFrame(r2).coalesce(1).write.parquet(rsrc + "/b2")
    spark.createDataFrame(l1).coalesce(1).write.parquet(lsrc + "/b1")
    spark.createDataFrame(l2).coalesce(1).write.parquet(lsrc + "/b2")
    lstream = (
        spark.readStream.schema(spark.read.parquet(lsrc + "/b1").schema)
        .option("maxFilesPerTrigger", 1).parquet(lsrc + "/*")
    )
    rstream = (
        spark.readStream.schema(spark.read.parquet(rsrc + "/b1").schema)
        .option("maxFilesPerTrigger", 1).parquet(rsrc + "/*")
    )
    out = streaming_asof_enrich(
        lstream, rstream, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_",
    )
    _run_to_memory(out, "asof_inblock_late", "append")
    got = spark.sql("select * from asof_inblock_late").toPandas()
    by_eid = dict(zip(got["eid"], got["last_val"]))
    assert by_eid[0] == 5.0
    assert by_eid[1] == 5.0   # NOT 77: the carried frontier (100) is newer


def test_stateless_textstats_work_under_streaming(spark, tmp_path):
    """quality/repetition/PII operators are pure column expressions, so the
    SAME code must run unchanged under readStream (stateless streaming)."""
    from monotonic_optimal_binning_spark.operators.textstats import (
        pii_scrub,
        quality_features,
        repetition_features,
    )

    src = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["the quick brown fox\nthe quick brown fox",
                     "reach me at a@b.co now"],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = pii_scrub(repetition_features(quality_features(stream)))
    _run_to_memory(out, "textstats_stream", "append")
    got = spark.sql("select * from textstats_stream").toPandas().set_index("doc_id")
    assert got.loc[1, "dup_line_frac"] == 1.0
    assert got.loc[2, "n_email"] == 1
    assert "<EMAIL>" in got.loc[2, "text_scrubbed"]
    assert got.loc[1, "n_tokens"] == 8


def test_scorecard_transform_under_streaming(spark, tmp_path):
    """Scorecard scoring is a stateless broadcast lookup, so the same
    artifact scores a readStream batch-for-batch equal to batch mode —
    the real-time decisioning path needs zero extra code."""
    from monotonic_optimal_binning_spark import FittedBins, Scorecard

    card = Scorecard(
        {
            "x1": FittedBins.from_cuts("x1", [10.0], [0.5, -0.5]),
            "x2": FittedBins.from_cuts("x2", [0.5], [0.2, -0.2]),
        }
    )
    src = str(tmp_path / "apps")
    pdf = pd.DataFrame(
        {"app_id": [1, 2, 3], "x1": [5.0, 20.0, None],
         "x2": [0.1, 0.9, 0.9]}
    )
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = card.reason_codes(stream, top_k=2)
    _run_to_memory(out, "score_stream", "append")
    got = (
        spark.sql("select * from score_stream")
        .toPandas().set_index("app_id").sort_index()
    )
    want = (
        card.reason_codes(spark.read.parquet(src), top_k=2)
        .toPandas().set_index("app_id").sort_index()
    )
    assert (got["score"] == want["score"]).all()
    assert [list(r) for r in got["reasons"]] == [
        list(r) for r in want["reasons"]
    ]


def _poll(read, pred, seconds=60):
    """Poll a continuous-trigger query's file-sink output until pred(df)
    (wall-clock-driven TTL tests can't use availableNow: processing-time
    timeouts hang availableNow termination on this Spark build — see the
    operator docstrings)."""
    import time

    deadline = time.time() + seconds
    while time.time() < deadline:
        try:
            pdf = read()
        except Exception:
            pdf = None
        if pdf is not None and pred(pdf):
            return pdf
        time.sleep(0.5)
    raise AssertionError("condition not reached within %ss" % seconds)


def test_streaming_dedup_ttl_forgets_idle_fingerprints(spark, tmp_path):
    """ttl_seconds bounds dedup state: a fingerprint not sighted for the
    TTL is forgotten, so its next arrival passes again."""
    import time

    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    cp, outdir = str(tmp_path / "cp"), str(tmp_path / "out")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["alpha"]})
    ).coalesce(1).write.parquet(src + "/f1")
    schema = spark.read.parquet(src + "/f1").schema
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    out = streaming_exact_dedup(stream, ["text"], shards=4, ttl_seconds=1.0)
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        read = lambda: spark.read.parquet(outdir).toPandas()  # noqa: E731
        _poll(read, lambda pdf: len(pdf) >= 1)
        time.sleep(3.0)  # > ttl: the alpha fingerprint must expire
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [2], "text": ["alpha"]})
        ).coalesce(1).write.parquet(src + "/f2")
        got = _poll(read, lambda pdf: len(pdf) >= 2)
        # the duplicate passes again: state for 'alpha' expired
        assert sorted(got["doc_id"].tolist()) == [1, 2]
    finally:
        q.stop()


def test_streaming_dedup_idle_shard_timeout_eviction(spark, tmp_path):
    """The hasTimedOut -> state.remove() branch: a shard that receives NO
    further data is evicted by the engine's processing-time timeout alone
    (Spark schedules no-data batches while timeouts are armed). Observable
    in the query's state-operator metrics — numRowsTotal drops back to 0
    without any new arrival for that shard — and end-to-end: the
    fingerprint's next arrival passes again."""
    import time

    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    cp, outdir = str(tmp_path / "cp"), str(tmp_path / "out")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["alpha"]})
    ).coalesce(1).write.parquet(src + "/f1")
    schema = spark.read.parquet(src + "/f1").schema
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    out = streaming_exact_dedup(stream, ["text"], shards=4, ttl_seconds=1.0)
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        read = lambda: spark.read.parquet(outdir).toPandas()  # noqa: E731
        _poll(read, lambda pdf: len(pdf) >= 1)

        def state_rows():
            prog = q.lastProgress
            ops = (prog or {}).get("stateOperators") or []
            return int(ops[0]["numRowsTotal"]) if ops else None

        # the alpha shard's state exists after the first batch...
        deadline = time.time() + 60
        while time.time() < deadline and state_rows() != 1:
            time.sleep(0.5)
        assert state_rows() == 1
        # ...and is REMOVED by the timeout with zero new input anywhere
        # (not the lazy in-batch pruning path, which needs an arrival)
        while time.time() < deadline and state_rows() != 0:
            time.sleep(0.5)
        assert state_rows() == 0
        # end-to-end: the forgotten fingerprint passes again
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [2], "text": ["alpha"]})
        ).coalesce(1).write.parquet(src + "/f2")
        got = _poll(read, lambda pdf: len(pdf) >= 2)
        assert sorted(got["doc_id"].tolist()) == [1, 2]
    finally:
        q.stop()


def test_streaming_dedup_no_ttl_never_forgets(spark, tmp_path):
    """Control for the TTL case: without ttl_seconds the same wall-clock
    gap must NOT resurrect a seen fingerprint."""
    import time

    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    cp, outdir = str(tmp_path / "cp"), str(tmp_path / "out")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["alpha"]})
    ).coalesce(1).write.parquet(src + "/f1")
    schema = spark.read.parquet(src + "/f1").schema
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    out = streaming_exact_dedup(stream, ["text"], shards=4)
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        read = lambda: spark.read.parquet(outdir).toPandas()  # noqa: E731
        _poll(read, lambda pdf: len(pdf) >= 1)
        time.sleep(3.0)
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [2], "text": ["alpha"]})
        ).coalesce(1).write.parquet(src + "/f2")
        time.sleep(6.0)  # several trigger intervals to process f2
        got = read()
        assert got["doc_id"].tolist() == [1]  # duplicate stays dropped
    finally:
        q.stop()


def test_streaming_asof_state_ttl_evicts_idle_key(spark, tmp_path):
    """state_ttl_seconds evicts the carried as-of state of a key idle for
    the TTL: a later left row for that key is enriched with null, exactly
    as if the key were new. The middle write carries data for a DIFFERENT
    key only — its batch is what fires the idle key's timeout."""
    import time

    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    cp, outdir = str(tmp_path / "cp"), str(tmp_path / "out")
    lschema = "k long, ts double, eid long"
    rschema = "k long, ts double, val double"

    def write(side, name, pdf):
        spark.createDataFrame(
            pdf, lschema if side == "l" else rschema
        ).coalesce(1).write.parquet((lsrc if side == "l" else rsrc) + name)

    write("r", "/b1", pd.DataFrame({"k": [1], "ts": [10.0], "val": [5.0]}))
    write("l", "/b1", pd.DataFrame({"k": [1], "ts": [11.0], "eid": [100]}))

    ls = spark.readStream.schema(lschema).parquet(lsrc + "/*")
    rs = spark.readStream.schema(rschema).parquet(rsrc + "/*")
    out = streaming_asof_enrich(
        ls, rs, on="k", ts="ts", value_cols=["val"],
        right_prefix="last_", state_ttl_seconds=1.0,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        read = lambda: spark.read.parquet(outdir).toPandas()  # noqa: E731
        r1 = _poll(read, lambda pdf: (pdf["eid"] == 100).any())
        assert r1.loc[r1["eid"] == 100, "last_val"].tolist() == [5.0]

        time.sleep(3.0)  # > ttl: k=1 is now idle past its timeout
        # a batch with only k=2 data fires k=1's processing-time timeout
        write("l", "/b2", pd.DataFrame({"k": [2], "ts": [11.0], "eid": [200]}))
        _poll(read, lambda pdf: (pdf["eid"] == 200).any())

        # k=1 returns after eviction: null, not the stale 5.0
        write("l", "/b3", pd.DataFrame({"k": [1], "ts": [12.0], "eid": [300]}))
        r3 = _poll(read, lambda pdf: (pdf["eid"] == 300).any())
        assert r3.loc[r3["eid"] == 300, "last_val"].isna().all()
    finally:
        q.stop()


def test_streaming_asof_null_event_times_match_nothing(spark, tmp_path):
    """A null-ts right row must never enter state (float(None) -> NaN
    would poison the frontier: NaN >= x is False forever) and a null-ts
    left row must emit with null values, not the block's last right row."""
    from monotonic_optimal_binning_spark.streaming.sessions import (
        streaming_asof_enrich,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "k long, ts double, eid long"
    rschema = "k long, ts double, val double"
    # batch 1: a null-ts right row, then a real one; a null-ts left row
    # and a real left after the real right
    spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [None, 10.0], "val": [99.0, 5.0]}),
        rschema,
    ).coalesce(1).write.parquet(rsrc + "/b1")
    spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [None, 11.0], "eid": [100, 101]}),
        lschema,
    ).coalesce(1).write.parquet(lsrc + "/b1")
    # batch 2: later left — the frontier must have advanced past the null
    spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [12.0], "eid": [102]}), lschema
    ).coalesce(1).write.parquet(lsrc + "/b2")

    ls = spark.readStream.schema(lschema).parquet(lsrc + "/*")
    rs = spark.readStream.schema(rschema).parquet(rsrc + "/*")
    out = streaming_asof_enrich(
        ls, rs, on="k", ts="ts", value_cols=["val"], right_prefix="last_"
    )
    _run_to_memory(out, "asof_null_ts", "append")
    got = (
        spark.sql("select * from asof_null_ts")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert got["eid"].tolist() == [100, 101, 102]
    assert pd.isna(got.loc[0, "last_val"])       # null-ts left: no match
    assert got.loc[1, "last_val"] == 5.0         # real match, not 99.0
    assert got.loc[2, "last_val"] == 5.0         # frontier not poisoned


def test_streaming_stateless_corpus_operators(spark, tmp_path):
    """The stateless corpus operators (quality/repetition features, PII
    scrub, token counts) are plain column expressions, so the SAME code
    runs unchanged on a readStream — streaming output must equal the
    batch result row-for-row (the batch paths are DuckDB-value-checked,
    so this transitively value-checks the streaming path)."""
    from monotonic_optimal_binning_spark.operators.textstats import (
        pii_scrub,
        quality_features,
        repetition_features,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog near the bank",
                "call me at 555-123-4567 or mail bob@example.com today",
                "short",
                "same line\nsame line\nsame line\nunique line here",
                "!!! ??? *** ((( )))",
                "a perfectly ordinary sentence about training data quality",
            ],
        }
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def featurize(df):
        out = repetition_features(quality_features(df), "text")
        out = pii_scrub(out, "text")
        return out.select(
            "doc_id", "quality_score", "n_tokens", "dup_line_frac",
            "top_token_frac", "n_email", "n_digit_run", "text_scrubbed",
        )

    batch = featurize(spark.read.parquet(src)).toPandas().sort_values(
        "doc_id").reset_index(drop=True)
    stream = featurize(spark.readStream.schema(schema).parquet(src))
    q = (
        stream.writeStream.format("memory").queryName("qf_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from qf_stream").toPandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(streamed, batch)
