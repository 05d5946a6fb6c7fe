"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a struct of
typed metadata. Decode / feature-extraction runs as Arrow-batched
``mapInPandas``.

Two decoders exist:

- ``decoder="real"`` — a pure-stdlib CONTAINER-HEADER featurizer
  (:func:`parse_media_header`): PNG IHDR width/height/bit-depth/channels,
  GIF logical-screen dims, BMP DIB dims/bpp, JPEG SOF dims/components,
  WAV fmt+data chunks (sample rate, channels, bits, duration). This is
  real byte decoding built only from the public file-format specs — no
  PIL/ffmpeg needed. Full pixel/sample decode (which WOULD need those
  libs, absent in this container) is out of scope; header features are
  what large-scale data pipelines filter on first anyway (dims, duration,
  corrupt-file detection).
- ``decoder="fake"`` — deterministic hash stand-in features for testing
  the downstream plumbing independent of the parser.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

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


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("valid", T.BooleanType()),
    ]
)

# PNG color type -> sample channels (PNG spec, "Color types and values")
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF0/1/2/3/5/6/7/9/10/11/13/14/15 markers (frame headers carry dims)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_media_header(payload: Optional[bytes]) -> dict:
    """Pure-stdlib media container header parse (public format specs only).

    Returns ``{format, width, height, bit_depth, n_channels, sample_rate,
    duration_ms, valid}`` with ``None`` for fields the format doesn't
    carry and ``format="unknown", valid=False`` for unrecognized or
    truncated payloads. Never raises — a corrupt byte stream is data, not
    an error, at pipeline scale.
    """
    out = {
        "format": "unknown", "width": None, "height": None,
        "bit_depth": None, "n_channels": None, "sample_rate": None,
        "duration_ms": None, "valid": False,
    }
    b = payload or b""
    try:
        if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            out.update(
                format="png", width=w, height=h, bit_depth=b[24],
                n_channels=_PNG_CHANNELS.get(b[25]), valid=True,
            )
        elif len(b) >= 13 and b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            packed = b[10]
            out.update(
                format="gif", width=w, height=h,
                bit_depth=((packed >> 4) & 0x7) + 1, valid=True,
            )
        elif len(b) >= 54 and b[:2] == b"BM":
            dib = struct.unpack("<I", b[14:18])[0]
            if dib >= 40:  # BITMAPINFOHEADER or later
                w, h = struct.unpack("<ii", b[18:26])
                bpp = struct.unpack("<H", b[28:30])[0]
                out.update(
                    format="bmp", width=w, height=abs(h), bit_depth=bpp,
                    n_channels=bpp // 8 if bpp >= 8 else 1, valid=True,
                )
        elif len(b) >= 4 and b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # standalone marker, no length field
                    continue
                if marker == 0xD9 or marker == 0xDA:
                    break  # EOI / start-of-scan: no SOF found before data
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                if marker in _JPEG_SOF and i + 10 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    out.update(
                        format="jpeg", width=w, height=h,
                        bit_depth=b[i + 4], n_channels=b[i + 9],
                        valid=True,
                    )
                    break
                i += 2 + seg_len
        elif len(b) >= 44 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            fmt = None
            data_size = None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                csize = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 8 + 16 <= len(b):
                    (_, ch, sr, byte_rate, _ba, bits) = struct.unpack(
                        "<HHIIHH", b[i + 8:i + 24]
                    )
                    fmt = (ch, sr, byte_rate, bits)
                elif cid == b"data":
                    data_size = csize
                i += 8 + csize + (csize & 1)  # chunks are word-aligned
            if fmt is not None and data_size is not None and fmt[2] > 0:
                ch, sr, byte_rate, bits = fmt
                out.update(
                    format="wav", n_channels=ch, sample_rate=sr,
                    bit_depth=bits,
                    duration_ms=(data_size * 1000) // byte_rate,
                    valid=True,
                )
    except (struct.error, IndexError):
        pass
    return out


def extract_media_headers(df: DataFrame) -> DataFrame:
    """Header-decode every media row via Arrow-batched ``mapInPandas``.

    Input must carry ``media_id`` and ``payload`` (binary). Output is one
    typed row per input row (:data:`HEADER_SCHEMA`) — the real-decode
    production path: at 100 TB this is an embarrassingly parallel map with
    no shuffle, and the binary column never leaves the executor.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [p["format"] for p in parsed],
                    "n_bytes": pd.array(
                        [len(p) if p is not None else 0
                         for p in pdf["payload"]],
                        dtype="Int32",
                    ),
                    "width": pd.array(
                        [p["width"] for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p["height"] for p in parsed], dtype="Int32"
                    ),
                    "bit_depth": pd.array(
                        [p["bit_depth"] for p in parsed], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [p["n_channels"] for p in parsed], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [p["sample_rate"] for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p["duration_ms"] for p in parsed], dtype="Int64"
                    ),
                    "valid": [p["valid"] for p in parsed],
                }
            )

    return df.mapInPandas(_batches, schema=HEADER_SCHEMA)


_FMT_CODE = {"unknown": 0.0, "png": 1.0, "gif": 2.0, "bmp": 3.0,
             "jpeg": 4.0, "wav": 5.0}


def _real_decode(payload: bytes, dim: int) -> np.ndarray:
    """Header-derived feature vector (the ``decoder="real"`` path)."""
    p = parse_media_header(payload)
    base = [
        1.0 if p["valid"] else 0.0,
        _FMT_CODE.get(p["format"], 0.0),
        float(p["width"] or 0), float(p["height"] or 0),
        float(p["bit_depth"] or 0), float(p["n_channels"] or 0),
        float(p["sample_rate"] or 0), float(p["duration_ms"] or 0),
        float(len(payload or b"")),
    ]
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(base))] = base[:dim]
    return out


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

    ``decoder="real"`` parses actual container headers
    (:func:`parse_media_header`) and emits
    ``[valid, format_code, width, height, bit_depth, n_channels,
    sample_rate, duration_ms, n_bytes, 0...]``; ``"fake"`` is the
    deterministic hash stand-in for plumbing tests. For the full typed
    header table use :func:`extract_media_headers` instead.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    decode = _real_decode if decoder == "real" else _fake_decode

    def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode(p if p is not None else b"", feature_dim)
                for p in pdf["payload"]
            ]
            # media_type is optional on input (the real-bytes table
            # carries only id+payload; type is what the decoder derives)
            mtype = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series([None] * len(pdf), dtype=object)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": mtype,
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


def _real_media_bytes(i: int) -> bytes:
    """REAL container bytes for row ``i`` — every header field is plain
    modular arithmetic over ``i`` so an ANSI-SQL oracle can state the
    expected parse without touching the binary (that is what value-checks
    :func:`parse_media_header` end-to-end in the driver gate).

    Layout per ``i % 4`` (``i % 31 == 0`` rows are deliberate garbage):
    png 57 + i%50 bytes, gif 14 + i%30, bmp 54 + i%40,
    wav 44 + (100 + (i*37)%4000) * 2 * (1 + i%2).
    """
    if i % 31 == 0:
        return b"Z" * (10 + i % 7)
    f = i % 4
    if f == 0:  # PNG: sig + IHDR + filler IDAT + IEND (zero CRCs)
        w = 16 + (i * 7) % 512
        h = 16 + (i * 11) % 512
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        idat = b"\x00" * (i % 50)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
            + struct.pack(">I", len(idat)) + b"IDAT" + idat + b"\x00" * 4
            + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
        )
    if f == 1:  # GIF89a: header + logical screen descriptor + trailer + junk
        w = 1 + (i * 5) % 300
        h = 1 + (i * 3) % 200
        return (
            b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x70, 0, 0])  # packed (color res 8, no GCT), bg, aspect
            + b"\x3b" + b"\x00" * (i % 30)
        )
    if f == 2:  # BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + pixel filler
        w = 1 + (i * 13) % 1024
        h = 1 + (i * 17) % 768
        pix = b"\x00" * (i % 40)
        return (
            b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(pix), 2835, 2835, 0, 0)
            + pix
        )
    # WAV: RIFF + fmt (PCM) + data
    ch = 1 + i % 2
    sr = 8000 + 1000 * (i % 5)
    n_samples = 100 + (i * 37) % 4000
    block_align = 2 * ch
    data = b"\x00" * (n_samples * block_align)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                sr * block_align, block_align, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthetic_media_table_real(spark, n_rows: int) -> DataFrame:
    """Deterministic table of REAL PNG/GIF/BMP/WAV payloads (plus planted
    garbage rows) matching ``media_id``/``payload`` of MEDIA_SCHEMA —
    the fixture behind the value-checked ``media_features_real`` driver
    query. Built in ``mapInPandas`` so generation scales with partitions.
    """

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": [f"media-{i:08d}" for i in ids],
                    "payload": [_real_media_bytes(int(i)) for i in ids],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.range(n_rows).mapInPandas(_gen, schema=schema)
