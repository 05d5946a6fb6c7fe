"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic stub."""

import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_media_features,
    synthetic_media_table,
)


def test_media_table_schema(spark):
    df = synthetic_media_table(spark, 50)
    # compare names/types, not nullability flags
    assert df.schema.simpleString() == MEDIA_SCHEMA.simpleString()


def test_feature_extraction_fake_decoder(spark):
    df = synthetic_media_table(spark, 64)
    feats = extract_media_features(df, feature_dim=8, decoder="fake")
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows[:10]:
        assert len(r["feature"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0


def test_fake_decoder_deterministic_across_partitioning(spark):
    df1 = synthetic_media_table(spark, 40).repartition(2)
    df2 = synthetic_media_table(spark, 40).repartition(11)
    f1 = {r["media_id"]: r["feature"] for r in extract_media_features(df1).collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_media_features(df2).collect()}
    assert f1 == f2


def test_real_decoder_is_explicit_stub(spark):
    df = synthetic_media_table(spark, 4)
    feats = extract_media_features(df, decoder="real")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        feats.collect()
