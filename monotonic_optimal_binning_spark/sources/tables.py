"""Table loaders: testdata parquet now, Iceberg catalog when available.

The engine targets Iceberg tables (BASELINE.json input_hint); this sandbox
has no Iceberg runtime jars, so ``load_table`` prefers a configured catalog
(``spark.read.table``) and falls back to parquet files — same DataFrame
either way, all downstream operators are storage-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a named table: Iceberg catalog identifier if ``sf_dir`` looks
    like ``catalog.db``, else ``{sf_dir}/{name}.parquet``."""
    if "/" not in sf_dir and not os.path.isdir(sf_dir):
        return spark.read.table(f"{sf_dir}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_iceberg_or_parquet(
    df: DataFrame, target: str, *, partition_by=None, mode: str = "overwrite"
) -> None:
    """Write to an Iceberg table identifier (``cat.db.tbl``) when a catalog
    is configured, else to a parquet path."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" in target or os.path.isabs(target):
        writer.parquet(target)
    else:
        writer.format("iceberg").saveAsTable(target)
