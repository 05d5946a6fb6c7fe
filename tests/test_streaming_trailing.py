"""Streaming trailing-horizon features (applyInPandasWithState) vs the
batch multi-horizon operator: exact equality when arrivals respect the
disorder bound, across micro-batch boundaries."""

import numpy as np
import pandas as pd

from monotonic_optimal_binning_spark.operators.windows import (
    multi_horizon_features,
)
from monotonic_optimal_binning_spark.streaming.trailing import (
    streaming_trailing_agg,
)


def _events(seed=71, n=400):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "eid": np.arange(n),
            "user": rng.integers(0, 5, n),
            "ts": np.sort(np.round(rng.uniform(0, 3000, n), 3)),
            "v": rng.uniform(0, 5, n).round(2),
        }
    )
    return pdf


def _run(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_truth(spark, pdf, horizons):
    df = spark.createDataFrame(pdf)
    return (
        multi_horizon_features(df, "user", "ts", "v", horizons)
        .toPandas()
        .set_index("eid")
        .sort_index()
    )


def test_streaming_equals_batch_single_batch(spark, tmp_path):
    pdf = _events()
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out = streaming_trailing_agg(
        stream, "user", "ts", "v", [60.0, 600.0]
    )
    _run(out, "trail1")
    got = (
        spark.sql("select * from trail1")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    exp = _batch_truth(spark, pdf, [60.0, 600.0])
    for h in (60, 600):
        np.testing.assert_allclose(
            got[f"v_h{h}_sum"].to_numpy(dtype=float),
            exp[f"v_h{h}_sum"].to_numpy(dtype=float),
            rtol=1e-9, equal_nan=True,
        )
        assert (
            got[f"v_h{h}_count"].astype(int).tolist()
            == exp[f"v_h{h}_count"].astype(int).tolist()
        )


def test_streaming_equals_batch_across_microbatches(spark, tmp_path):
    """State carries the buffer across micro-batches: one file per
    trigger, events split chronologically — trailing windows that span
    the file boundary must still be exact."""
    pdf = _events(seed=73)
    src = str(tmp_path / "ev")
    third = len(pdf) // 3
    spark.createDataFrame(pdf.iloc[:third]).coalesce(1).write.parquet(
        src + "/b1"
    )
    spark.createDataFrame(
        pdf.iloc[third:2 * third]
    ).coalesce(1).write.parquet(src + "/b2")
    spark.createDataFrame(pdf.iloc[2 * third:]).coalesce(1).write.parquet(
        src + "/b3"
    )
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_trailing_agg(stream, "user", "ts", "v", [600.0])
    _run(out, "trail2")
    got = (
        spark.sql("select * from trail2")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    assert len(got) == len(pdf)
    exp = _batch_truth(spark, pdf, [600.0])
    np.testing.assert_allclose(
        got["v_h600_sum"].to_numpy(dtype=float),
        exp["v_h600_sum"].to_numpy(dtype=float),
        rtol=1e-9, equal_nan=True,
    )


def test_disorder_within_bound_is_exact(spark, tmp_path):
    """A late event inside disorder_seconds is scored exactly (its whole
    trailing window is still buffered)."""
    early = pd.DataFrame(
        {
            "eid": [0, 1, 2],
            "user": [1, 1, 1],
            "ts": [100.0, 150.0, 200.0],
            "v": [1.0, 2.0, 4.0],
        }
    )
    late = pd.DataFrame(
        {"eid": [3], "user": [1], "ts": [160.0], "v": [8.0]}
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(early).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(late).coalesce(1).write.parquet(src + "/b2")
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_trailing_agg(
        stream, "user", "ts", "v", [100.0], disorder_seconds=100.0
    )
    _run(out, "trail3")
    got = (
        spark.sql("select * from trail3")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    # late eid=3 at ts 160: window [60,160] holds v=1 (t100) + 2 (t150)
    # + itself -> 11; scored exactly despite arriving after t200
    assert got.loc[3, "v_h100_sum"] == 11.0
    assert got.loc[3, "v_h100_count"] == 3
    # earlier rows were emitted before the late event arrived (append
    # mode): eid=2's window [100,200] saw 1+2+4 = 7 without the late 8
    assert got.loc[2, "v_h100_sum"] == 7.0


def test_null_time_and_null_value(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "eid": [0, 1, 2],
            "user": [1, 1, 1],
            "ts": [100.0, None, 101.0],
            "v": [5.0, 100.0, None],
        }
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_trailing_agg(stream, "user", "ts", "v", [10.0])
    _run(out, "trail4")
    got = (
        spark.sql("select * from trail4")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    # null-ts event: matches nothing, contributes nothing
    assert got.loc[1, "v_h10_count"] == 0
    assert pd.isna(got.loc[1, "v_h10_sum"])
    # null-v event at t=101: counts nothing itself, window sees t=100's 5
    assert got.loc[2, "v_h10_count"] == 1
    assert got.loc[2, "v_h10_sum"] == 5.0
    assert got.loc[0, "v_h10_count"] == 1


def test_streaming_decayed_equals_batch_across_microbatches(spark, tmp_path):
    """Decayed (half-life) stats match the batch time_decayed_features
    operator exactly across micro-batch boundaries; hard-window and
    decayed stats coexist in one state pass."""
    from monotonic_optimal_binning_spark.operators.windows import (
        time_decayed_features,
    )

    pdf = _events(seed=79)
    src = str(tmp_path / "ev")
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        src + "/b1"
    )
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        src + "/b2"
    )
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_trailing_agg(
        stream,
        "user",
        "ts",
        "v",
        [600.0],
        half_lives_seconds=[60.0],
        truncate_half_lives=8,
    )
    _run(out, "trail_dec")
    got = (
        spark.sql("select * from trail_dec")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    exp = (
        time_decayed_features(
            spark.createDataFrame(pdf),
            "user",
            "ts",
            "v",
            [60.0],
            truncate_half_lives=8,
        )
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    np.testing.assert_allclose(
        got["v_hl60_sum"].to_numpy(dtype=float),
        exp["v_hl60_sum"].to_numpy(dtype=float),
        rtol=1e-9, equal_nan=True,
    )
    np.testing.assert_allclose(
        got["v_hl60_count"].to_numpy(dtype=float),
        exp["v_hl60_count"].to_numpy(dtype=float),
        rtol=1e-9,
    )
    # the hard-window columns still match the batch multi-horizon truth
    exp_h = _batch_truth(spark, pdf, [600.0])
    np.testing.assert_allclose(
        got["v_h600_sum"].to_numpy(dtype=float),
        exp_h["v_h600_sum"].to_numpy(dtype=float),
        rtol=1e-9, equal_nan=True,
    )


def test_fractional_horizon_names_match_batch(spark, tmp_path):
    """Fractional horizons must emit non-lossy, batch-identical column
    names (90.2 -> v_h90p2_sum): int(h) truncation used to collapse
    90.2 and 90.7 into one duplicate 'v_h90_sum' column, silently losing
    a horizon and breaking backfill-vs-stream joins."""
    pdf = _events(seed=77, n=120)
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_trailing_agg(
        stream, "user", "ts", "v", [90.2, 90.7], stats=["sum"]
    )
    assert "v_h90p2_sum" in out.columns and "v_h90p7_sum" in out.columns
    _run(out, "trail_frac")
    got = (
        spark.sql("select * from trail_frac")
        .toPandas()
        .set_index("eid")
        .sort_index()
    )
    exp = _batch_truth(spark, pdf, [90.2, 90.7])
    for col in ("v_h90p2_sum", "v_h90p7_sum"):
        assert col in exp.columns  # batch twin uses the same name
        np.testing.assert_allclose(
            got[col].to_numpy(dtype=float),
            exp[col].to_numpy(dtype=float),
            rtol=1e-9, equal_nan=True,
        )


def test_output_name_collisions_raise(spark, tmp_path):
    """Duplicate generated names and collisions with input columns fail
    loudly before any stream starts."""
    import pytest

    pdf = _events(seed=78, n=10)
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="not unique"):
        streaming_trailing_agg(stream, "user", "ts", "v", [60.0, 60])
    with pytest.raises(ValueError, match="collides"):
        streaming_trailing_agg(
            stream.withColumn("v_h60_sum", stream["v"]),
            "user", "ts", "v", [60.0],
        )
