"""Streaming PSI drift monitoring: windowed bin counts under Structured
Streaming equal the batch counts per window slice, and the per-window PSI
finisher matches operators/drift.model_psi on the same slice."""

import numpy as np
import pandas as pd
import pytest

from monotonic_optimal_binning_spark import (
    BinningConstraints,
    SparkMonotonicBinner,
)
from monotonic_optimal_binning_spark.operators.drift import model_psi
from monotonic_optimal_binning_spark.streaming.drift import (
    psi_over_windows,
    streaming_bucket_counts,
)


@pytest.fixture(scope="module")
def fitted(spark):
    rng = np.random.default_rng(41)
    n = 4000
    x = rng.integers(0, 30, n).astype(float)
    y = (rng.uniform(0, 1, n) < 0.1 + 0.8 * x / 30.0).astype(int)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    b = SparkMonotonicBinner(
        "x", "y", constraints=BinningConstraints(max_bins=5, min_bins=3)
    ).fit(df)
    return b.model_


def _traffic():
    """Three hourly windows: in-distribution, mildly shifted, hard-shifted
    — plus one late sentinel far ahead so the watermark closes them."""
    rng = np.random.default_rng(43)
    rows = []
    specs = [
        ("2026-03-01 00:30:00", rng.integers(0, 30, 400)),   # like training
        ("2026-03-01 01:30:00", rng.integers(0, 12, 400)),   # low-shifted
        ("2026-03-01 02:30:00", rng.integers(25, 30, 400)),  # hard-shifted
    ]
    for ts, xs in specs:
        rows += [(pd.Timestamp(ts), float(v)) for v in xs]
    rows.append((pd.Timestamp("2026-03-01 09:00:00"), 1.0))  # closes all
    pdf = pd.DataFrame(rows, columns=["ts", "x"])
    # a null and a NaN must drop (Missing) without crashing the stream
    pdf.loc[len(pdf)] = (pd.Timestamp("2026-03-01 00:40:00"), np.nan)
    return pdf


def test_streaming_counts_and_psi_match_batch(spark, tmp_path, fitted):
    pdf = _traffic()
    src = str(tmp_path / "traffic")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    counts = streaming_bucket_counts(
        fitted, stream, "ts", window="1 hour", watermark="10 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("drift_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.sql("select * from drift_counts")

    got = sink.toPandas()
    # the three closed windows emitted; the sentinel's window did not
    assert sorted(got["window_start"].astype(str).unique()) == [
        "2026-03-01 00:00:00",
        "2026-03-01 01:00:00",
        "2026-03-01 02:00:00",
    ]
    # per-window counts equal the batch lookup on the same slice
    batch = spark.createDataFrame(pdf)
    for h in (0, 1, 2):
        lo = pd.Timestamp(f"2026-03-01 {h:02d}:00:00")
        sl = batch.filter(
            (batch["ts"] >= lo) & (batch["ts"] < lo + pd.Timedelta("1 hour"))
        )
        bslice = model_psi(fitted, sl).toPandas().set_index("bucket")
        wslice = (
            got[got["window_start"].astype(str) == str(lo)]
            .set_index("bucket")
        )
        joined = (
            bslice[["n_actual"]]
            .rename(columns={"n_actual": "batch_n"})
            .join(
                wslice[["n_actual"]].rename(
                    columns={"n_actual": "stream_n"}
                ),
                how="outer",
            )
            .fillna(0)
        )
        assert (
            joined["batch_n"].astype(int) == joined["stream_n"].astype(int)
        ).all()

        # PSI finisher on the sink == batch model_psi on the slice
        win_psi = (
            psi_over_windows(
                sink.filter(sink["window_start"] == lo), fitted
            )
            .toPandas()
        )
        assert win_psi["psi"].nunique() == 1
        np.testing.assert_allclose(
            win_psi["psi"].iloc[0],
            bslice["psi_term"].sum(),
            rtol=1e-9,
        )

    # ordering sanity: drifted windows score strictly higher
    allpsi = (
        psi_over_windows(sink, fitted)
        .select("window_start", "psi")
        .distinct()
        .toPandas()
        .sort_values("window_start")["psi"]
        .tolist()
    )
    assert allpsi[0] < 0.05 < allpsi[1] < allpsi[2]


def test_drift_stream_job_incremental_runs(spark, tmp_path, fitted, capsys):
    """Two job invocations over a growing input directory: the second
    processes ONLY the newly-added files (streaming checkpoint cursor)
    and the psi table grows to cover the newly-closed windows."""
    import json

    from monotonic_optimal_binning_spark.jobs import main

    model_path = str(tmp_path / "model.json")
    fitted.save_json(model_path)
    src = str(tmp_path / "traffic")
    wd = str(tmp_path / "mon")

    pdf = _traffic()
    first = pdf[pdf["ts"] < pd.Timestamp("2026-03-01 02:00:00")]
    rest = pdf[pdf["ts"] >= pd.Timestamp("2026-03-01 02:00:00")]
    spark.createDataFrame(first).write.parquet(src)

    common = ["drift-stream", "--input", src, "--model", model_path,
              "--workdir", wd, "--ts-col", "ts", "--input-col", "x",
              "--window", "1 hour", "--watermark", "10 minutes"]
    main(common)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # only window 00 closed (max ts 01:xx, watermark 10m)
    assert r1["windows"] == 1
    assert "2026-03-01 00:00:00" in r1["per_window"]
    assert r1["per_window"]["2026-03-01 00:00:00"]["status"] == "stable"

    # append the rest of the traffic; second run picks up ONLY new files
    spark.createDataFrame(rest).write.mode("append").parquet(src)
    main(common)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["windows"] == 3
    assert r2["per_window"]["2026-03-01 02:00:00"]["status"] == "shifted"
    assert r2["worst_psi"] == r2["per_window"]["2026-03-01 02:00:00"]["psi"]
    # window 00's counts were not reprocessed/duplicated
    counts = spark.read.parquet(str(tmp_path / "mon" / "counts")).toPandas()
    w0 = counts[counts["window_start"].astype(str) == "2026-03-01 00:00:00"]
    assert w0["bucket"].is_unique
    assert int(w0["n_actual"].sum()) == 400


def test_psi_over_windows_zero_fill(spark, fitted):
    """A window missing bins entirely still scores every expected bin
    (n_actual=0, finite smoothed term) — no silent denominator shrink."""
    one = spark.createDataFrame(
        [("2026-01-01 00:00:00", "2026-01-01 01:00:00",
          fitted.labels[0], 10)],
        "window_start string, window_end string, bucket string, n_actual long",
    )
    out = psi_over_windows(one, fitted).toPandas()
    assert len(out) == len(fitted.labels)
    assert (out["n_actual"] == 0).sum() == len(fitted.labels) - 1
    assert np.isfinite(out["psi_term"]).all()
    assert out["psi"].iloc[0] > 0.25  # all mass in one bin = drifted
