"""Multimodal plumbing + real header decode.

The ``decoder="real"`` path is a pure-stdlib container-header parser
(public PNG/GIF/BMP/JPEG/WAV specs); the synthetic real-bytes table's
fields are modular arithmetic over the row id, so every parse is checked
against a closed-form expectation.
"""

import struct

import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    HEADER_SCHEMA,
    MEDIA_SCHEMA,
    _real_media_bytes,
    extract_media_features,
    extract_media_headers,
    parse_media_header,
    synthetic_media_table,
    synthetic_media_table_real,
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


def test_parse_media_header_formats():
    # PNG
    p = parse_media_header(_real_media_bytes(4))  # 4 % 4 == 0 -> png
    assert p["format"] == "png" and p["valid"]
    assert p["width"] == 16 + (4 * 7) % 512
    assert p["height"] == 16 + (4 * 11) % 512
    assert p["bit_depth"] == 8 and p["n_channels"] == 4
    # GIF
    g = parse_media_header(_real_media_bytes(5))
    assert g["format"] == "gif" and g["width"] == 1 + (5 * 5) % 300
    # BMP
    b = parse_media_header(_real_media_bytes(6))
    assert b["format"] == "bmp" and b["bit_depth"] == 24 and b["n_channels"] == 3
    # WAV
    w = parse_media_header(_real_media_bytes(7))
    ch, sr, ns = 1 + 7 % 2, 8000 + 1000 * (7 % 5), 100 + (7 * 37) % 4000
    assert w["format"] == "wav"
    assert w["n_channels"] == ch and w["sample_rate"] == sr
    assert w["duration_ms"] == (ns * 1000) // sr
    # planted garbage rows (i % 31 == 0)
    z = parse_media_header(_real_media_bytes(31))
    assert z["format"] == "unknown" and not z["valid"]


def test_parse_media_header_jpeg_and_robustness():
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
        + struct.pack(">HH", 480, 640) + bytes([3]) + b"\x00" * 9
    )
    p = parse_media_header(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9")
    assert p["format"] == "jpeg" and (p["width"], p["height"]) == (640, 480)
    assert p["bit_depth"] == 8 and p["n_channels"] == 3 and p["valid"]
    # truncated / garbage / null payloads never raise
    for junk in (None, b"", b"\x89PNG", b"RIFF1234WAVE",
                 b"BM" + b"\x00" * 10, b"\xff\xd8\xff",
                 b"GIF89a\x01", b"\x89PNG\r\n\x1a\n" + b"\x00" * 8):
        q = parse_media_header(junk)
        assert q["format"] == "unknown" and not q["valid"], junk


def test_extract_media_headers_distributed(spark):
    df = synthetic_media_table_real(spark, 200).repartition(7)
    out = extract_media_headers(df)
    assert out.schema.simpleString() == HEADER_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 200
    for i in range(200):
        r = rows[f"media-{i:08d}"]
        exp = parse_media_header(_real_media_bytes(i))
        assert r["format"] == exp["format"], (i, r)
        assert r["width"] == exp["width"] and r["height"] == exp["height"]
        assert r["duration_ms"] == exp["duration_ms"]
        assert r["valid"] == exp["valid"]
        assert r["n_bytes"] == len(_real_media_bytes(i))


def test_real_decoder_feature_vector(spark):
    df = synthetic_media_table_real(spark, 30)
    feats = extract_media_features(df, feature_dim=9, decoder="real")
    rows = {r["media_id"]: r for r in feats.collect()}
    r = rows["media-00000004"]  # png row
    v = r["feature"]
    assert v[0] == 1.0 and v[1] == 1.0  # valid, png code
    assert v[2] == 16 + (4 * 7) % 512 and v[3] == 16 + (4 * 11) % 512
    assert v[8] == len(_real_media_bytes(4))
    z = rows["media-00000000"]  # i=0 is a garbage row (0 % 31 == 0)
    assert z["feature"][0] == 0.0 and z["feature"][1] == 0.0
