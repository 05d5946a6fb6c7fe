"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a struct of
typed metadata. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batch shape, partition
sizing) is real and tested; the actual codec step is STUBBED because no
image/audio library exists in this container. Pass ``decoder="fake"`` for a
deterministic stand-in (features derived from the payload bytes) or
``decoder="real"`` to get the explicit NotImplementedError marking where
PIL/ffmpeg wiring goes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: bytes -> sha256 stream -> floats."""
    out = np.empty(dim, dtype=np.float32)
    h = hashlib.sha256(payload or b"")
    raw = b""
    while len(raw) < dim * 4:
        h.update(b"x")
        raw += h.digest()
    ints = np.frombuffer(raw[: dim * 4], dtype=np.uint32)
    out[:] = (ints % 10_000) / 10_000.0
    return out


def extract_media_features(
    df: DataFrame,
    *,
    feature_dim: int = 16,
    decoder: str = "fake",
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    The UDF signature, output schema and batch iteration are the production
    plumbing; only the codec call is stubbed (see module docstring).
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not available in "
                    "this container — wire the codec here"
                )
            feats = [
                _fake_decode(p if p is not None else b"", feature_dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


def synthetic_media_table(spark, n_rows: int, *, seed: int = 42) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA.

    Every field is plain arithmetic / SHA-256 over the row id so an ANSI-SQL
    oracle (DuckDB ``range`` + ``sha256`` + ``repeat``) can regenerate the
    exact table — that is what makes ``media_features`` a fully value-checked
    driver query rather than rows-only. Payload length varies by row
    (64 * (1 + id % 4) bytes) so size aggregates are non-trivial.
    """
    base = spark.range(n_rows)
    kind = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    hex_digest = F.sha2(
        F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")), 256
    )
    payload = F.repeat(hex_digest, (F.lit(1) + F.col("id") % 4).cast("int")).cast(
        "binary"
    )
    return base.select(
        F.format_string("media-%08d", F.col("id")).alias("media_id"),
        kind.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            ((F.col("id") * 37) % 1920).cast("int").alias("width"),
            ((F.col("id") * 53) % 1080).cast("int").alias("height"),
            ((F.col("id") * 997) % 60000).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )
