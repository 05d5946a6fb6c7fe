"""Streaming data-contract gate: the batch expectations suite
(:mod:`..operators.expectations`) evaluated per micro-batch.

An ingest stream should be gated the same way a batch ingest is — but
`run_checks` is one eager aggregate, which Structured Streaming cannot
run mid-plan. `foreachBatch` is the idiomatic bridge: each micro-batch
is a bounded DataFrame, so the SAME single-scan aggregate runs per
trigger and appends one verdict row per expectation to a sink table.
Nothing is duplicated — the operator, metric semantics, and JSON suite
artifact are the batch ones; this module only adds the per-batch loop,
batch metadata columns, and an optional quarantine split.

Per-batch verdict schema = the batch RESULT_SCHEMA plus
``batch_id long, n_rows long`` — a contract-health TIME SERIES (PSI's
streaming twin, but for ingest contracts instead of distributions).

Scale notes: the per-batch cost is the batch aggregate (map-side
combinable, one reduced row) — O(batch) work per trigger, state-free,
so the gate adds no watermark/state-store footprint. The verdict sink
grows by ``len(expectations)`` rows per trigger.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.expectations import Expectation, run_checks


def expectations_stream(
    stream_df: DataFrame,
    expectations: Sequence[Expectation],
    verdict_path: str,
    checkpoint_dir: str,
    *,
    rsd: float = 0.02,
    quarantine_path: Optional[str] = None,
    passed_path: Optional[str] = None,
    on_violation: Optional[Callable] = None,
    query_name: str = "mob-expect-stream",
    trigger: Optional[dict] = None,
):
    """Gate a stream with the batch expectation suite, per micro-batch.

    Appends one verdict row per expectation per trigger to
    ``verdict_path`` (parquet). When any expectation fails a batch:
    ``quarantine_path`` (if set) receives that batch's ROWS (the
    failing ingest is preserved for repair instead of polluting
    downstream); otherwise the batch is only recorded as failing.
    Passing batches append their rows (plus ``batch_id``) to
    ``passed_path`` (if set) — the gated-through stream. ``on_violation(batch_id, failed_names)`` (if
    set) is invoked for alerting.

    Returns the started ``StreamingQuery``. Exactly-once notes: the
    foreachBatch body re-runs on failure recovery with the same
    batch_id; parquet appends are therefore at-least-once per batch —
    idempotent consumers should dedupe on (batch_id, name), the
    standard Structured Streaming contract for file-sink side outputs.
    """
    exps = list(expectations)
    if not exps:
        # fail at wiring time, not inside the first non-empty trigger
        raise ValueError("no expectations given")

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        # the gate reads the batch up to 3x (count, suite aggregate,
        # row write) — cache it for the body
        batch_df.persist()
        n = batch_df.count()
        verdicts = run_checks(batch_df, exps, rsd=rsd) if n else None
        spark = batch_df.sparkSession
        if verdicts is None:
            # empty trigger: record a heartbeat row so gaps are visible
            verdicts = spark.createDataFrame(
                [("__empty_batch__", "heartbeat", "", None, None, None,
                  True)],
                "name string, kind string, column string, "
                "observed double, bound_lo double, bound_hi double, "
                "passed boolean",
            )
        bid = F.lit(int(batch_id)).cast("long")
        out = verdicts.withColumn("batch_id", bid).withColumn(
            "n_rows", F.lit(int(n)).cast("long")
        )
        out.write.mode("append").parquet(verdict_path)
        failed = [r["name"] for r in out.filter(~F.col("passed")).collect()]
        if failed and quarantine_path is not None:
            batch_df.withColumn("batch_id", bid).write.mode(
                "append"
            ).parquet(quarantine_path)
        if not failed and passed_path is not None and n:
            # batch_id rides along so at-least-once replay duplicates
            # stay dedupable in the gated-through sink too
            batch_df.withColumn("batch_id", bid).write.mode(
                "append"
            ).parquet(passed_path)
        batch_df.unpersist()
        if failed and on_violation is not None:
            on_violation(batch_id, failed)

    writer = (
        stream_df.writeStream.foreachBatch(_gate)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
