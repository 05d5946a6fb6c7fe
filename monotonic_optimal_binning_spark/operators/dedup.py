"""Deduplication family for training-data pipelines.

All four tiers a 100 TB corpus needs, each with an explicit cost model:

  exact_dedup        one shuffle on the content hash; keeps a deterministic
                     winner per group (no full-content shuffle — rows move
                     keyed by a 64-bit hash + tie-break id).
  minhash_lsh        shingle -> minhash signature -> banded buckets ->
                     equi-join candidates -> exact Jaccard verify. The only
                     join is on (band, bucket); no all-pairs blowup.
  simhash            64-bit rotation-invariant fingerprint; near-dups share
                     fingerprints (or low Hamming distance) — groupable.
  ngram_jaccard      exact n-gram Jaccard on LSH-candidate pairs.

Everything is Spark SQL higher-order functions (transform / aggregate /
array_*) — zero Python UDFs; the whole family stays in codegen.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime for the universal hash family h(x) = (a*x + b) mod p.
# 2^31-1 keeps a*x < 2^62 so the product never overflows int64 under
# Spark's ANSI arithmetic (a, x both < 2^31).
_MERSENNE_P = (1 << 31) - 1


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
    *,
    keep: str = "min",
) -> DataFrame:
    """Keep one row per distinct content; winner = min/max id (deterministic).

    Plan: xxhash64 of the content columns is the shuffle key (tiny), a
    window row_number picks the winner. Hash collisions are disambiguated by
    also partitioning on the raw content columns (safe: same hash -> same
    partition, comparison is local).
    """
    if keep not in ("min", "max"):
        raise ValueError("keep must be 'min' or 'max'")
    h = F.xxhash64(*[F.col(c) for c in content_cols])
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy(h, *[F.col(c) for c in content_cols]).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct hashed character n-grams of a string column (array<bigint>)."""
    idx = F.sequence(F.lit(0), F.greatest(F.length(text) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.substring(text, i + 1, n)))
    return F.array_distinct(grams)


def _minhash_params(num_hashes: int, seed: int) -> List[Tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE_P, size=num_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signature(
    shingles: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature (array<bigint>) of a shingle-set column.

    h_j(S) = min over s in S of (a_j * s + b_j) mod p, with the shingle
    hashes folded into [0, p) first. Entirely in Spark SQL — one
    array_min(transform(...)) per hash function.
    """
    params = _minhash_params(num_hashes, seed)
    pos = F.transform(shingles, lambda s: F.pmod(s, F.lit(_MERSENNE_P)))

    def _hash_fn(a, b):
        return lambda s: F.pmod(F.lit(a) * s + F.lit(b), F.lit(_MERSENNE_P))

    return F.array(
        *[F.array_min(F.transform(pos, _hash_fn(a, b))) for a, b in params]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH,
    with the exact shingle-Jaccard attached for thresholding."""
    rows_per_band = num_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_size).alias("__sh"),
    ).withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes, seed))

    bands = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col("__sig")[b * rows_per_band + i] for i in range(rows_per_band)]
            )
            for b in range(n_bands)
        ]
    )
    banded = base.select(
        "id", "__sh", F.posexplode(bands).alias("band", "bucket")
    )

    a = banded.select(
        F.col("id").alias("id_a"), F.col("__sh").alias("__sh_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("__sh").alias("__sh_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (inter.cast("double") / F.when(union > 0, union)).alias("jaccard"),
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Drop near-duplicates: a row is removed if it pairs (jaccard >=
    threshold) with any surviving smaller id. Single-link transitive
    clusters are approximated by one propagation round (min partner id),
    which matches common corpus-dedup practice; exact connected components
    would need an iterative join loop.
    """
    pairs = minhash_lsh_candidates(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        n_bands=n_bands,
        shingle_size=shingle_size,
        seed=seed,
    ).filter(F.col("jaccard") >= threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(tokens: Column, bits: int = 64) -> Column:
    """SimHash fingerprint (bigint) of a token-array column.

    Per-bit vote: each token hash contributes +1/-1 to each bit position;
    the sign of the vote sets the bit. aggregate() carries the 64 counters
    as an array — no Python.
    """
    # bit positions are unrolled with Python ints: shiftright/shiftleft
    # require literal shift amounts, not Columns
    def _votes(t):
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(bits)
            ]
        )

    counters = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, _votes(t), lambda a, b: a + b),
    )
    fp = F.lit(0).cast("long")
    for i in range(bits):
        # i == 63 is the sign bit of int64: its set-value is -2^63
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        fp = fp.bitwiseXOR(
            F.when(counters[i] > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    keep: str = "min",
) -> DataFrame:
    """Exact-fingerprint SimHash dedup over whitespace tokens: rows with the
    same 64-bit simhash collapse to one (deterministic winner)."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    out = df.withColumn("__simhash", simhash(toks))
    return exact_dedup(out, ["__simhash"], id_col, keep=keep).drop("__simhash")
