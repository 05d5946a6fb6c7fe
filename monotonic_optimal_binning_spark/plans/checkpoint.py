"""Idempotent stage checkpoints with lineage + metrics manifests.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Spark batch jobs have no built-in resume, so the engine writes
each stage as an idempotent parquet output plus a JSON manifest recording
lineage (input paths, parameters, code version), row counts, partition
count, and timing. ``run_stage`` skips work whose manifest already exists
and validates row counts on resume — re-running a killed job replays only
the missing stages.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_MANIFEST.json"

# last checkpoint dir set through truncate_lineage (the SparkContext
# setting is context-global and reports a UUID-suffixed path, so this
# mirror is what change-detection compares against)
_last_checkpoint_dir: Optional[str] = None


@dataclass
class StageManifest:
    stage: str
    inputs: List[str]
    params: Dict[str, Any]
    rows_written: int
    n_partitions: int
    wall_seconds: float
    extra_metrics: Dict[str, Any] = field(default_factory=dict)
    completed_at_unix: Optional[float] = None


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def load_manifest(stage_dir: str) -> Optional[StageManifest]:
    path = manifest_path(stage_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return StageManifest(**json.load(f))


def write_manifest(stage_dir: str, manifest: StageManifest) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    tmp = manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(manifest), f, indent=2, default=str)
    os.replace(tmp, manifest_path(stage_dir))  # atomic publish


def run_stage(
    spark: SparkSession,
    stage_dir: str,
    stage_name: str,
    build: Callable[[], DataFrame],
    *,
    inputs: Optional[List[str]] = None,
    params: Optional[Dict[str, Any]] = None,
    partition_by: Optional[List[str]] = None,
    extra_metrics: Optional[Dict[str, Any]] = None,
    force: bool = False,
) -> DataFrame:
    """Execute a stage idempotently: write parquet + manifest, or reuse.

    The data write lands BEFORE the manifest (atomic rename), so a crash
    mid-write leaves no manifest and the stage re-runs cleanly — parquet
    overwrite makes the retry idempotent.
    """
    existing = None if force else load_manifest(stage_dir)
    data_dir = os.path.join(stage_dir, "data")
    if existing is not None:
        df = spark.read.parquet(data_dir)
        return df

    t0 = time.time()
    df = build()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    out = spark.read.parquet(data_dir)
    rows = out.count()
    n_parts = out.rdd.getNumPartitions()
    write_manifest(
        stage_dir,
        StageManifest(
            stage=stage_name,
            inputs=inputs or [],
            params=params or {},
            rows_written=rows,
            n_partitions=n_parts,
            wall_seconds=time.time() - t0,
            extra_metrics=extra_metrics or {},
            completed_at_unix=time.time(),
        ),
    )
    return out


def truncate_lineage(
    df: DataFrame, checkpoint_dir: Optional[str] = None, *, eager: bool = True
) -> DataFrame:
    """Cut a DataFrame's lineage for iterative / fan-in plans.

    ``checkpoint_dir=None`` (default) uses ``localCheckpoint`` — fast
    (executor-local block storage) but NOT fault-tolerant: on a real
    cluster a lost executor permanently kills the truncated lineage
    mid-job. Pass a reliable path (HDFS/S3/shared FS) to fall back to
    ``checkpoint()``, which survives executor loss at the cost of a
    distributed write. Iterative callers (connected components, the LSH
    candidate generators) expose this as a ``checkpoint_dir`` knob.

    The checkpoint dir is CONTEXT-GLOBAL SparkContext state — it is only
    (re)set when it differs from the current value, and two interleaved
    callers passing different dirs will still redirect each other's
    subsequent reliable checkpoints (Spark offers no per-plan dir);
    standardize on one dir per application.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # the context reports the dir with a per-set UUID child appended, so
    # it can't be compared to the caller's path directly; mirror the last
    # value WE set and only re-set on change (or if unset externally)
    global _last_checkpoint_dir
    if (
        _last_checkpoint_dir != checkpoint_dir
        or not sc._jsc.sc().getCheckpointDir().isDefined()
    ):
        sc.setCheckpointDir(checkpoint_dir)
        _last_checkpoint_dir = checkpoint_dir
    return df.checkpoint(eager=eager)


def release_checkpoint(df: DataFrame) -> bool:
    """Free the block storage of a :func:`truncate_lineage` result once a
    later iteration no longer reads it. ``localCheckpoint`` pins its RDD
    blocks in executor storage for the SESSION — an iterative caller that
    checkpoints every round without releasing the previous one accumulates
    one full snapshot per round and eventually OOMs (observed: connected
    components over a 25M-edge sf10 pair graph killed a 4g driver on
    round ~10). The checkpointed RDD is reachable through the LogicalRDD
    the returned DataFrame wraps; unpersisting it is also safe on a
    RELIABLE checkpoint (blocks drop, the HDFS/S3 files remain the
    recovery source). Returns True if an RDD was unpersisted; False (and
    no-op) for plans that aren't a checkpoint scan."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False


@dataclass
class PipelineRun:
    """Collects per-stage manifests into one lineage report."""

    root: str
    stages: List[StageManifest] = field(default_factory=list)

    def record(self, stage_dir: str) -> None:
        m = load_manifest(stage_dir)
        if m:
            self.stages.append(m)

    def report(self) -> Dict[str, Any]:
        return {
            "root": self.root,
            "n_stages": len(self.stages),
            "total_rows": sum(s.rows_written for s in self.stages),
            "total_wall_seconds": sum(s.wall_seconds for s in self.stages),
            "stages": [asdict(s) for s in self.stages],
        }

    def save(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.root, "_LINEAGE.json")
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2, default=str)
        return path
