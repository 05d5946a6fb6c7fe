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

Shingling, banding, joins, and verification are Spark SQL expressions
(transform / array_* / joins); the two signature folds that a SQL
formulation would evaluate as per-element interpreted HOF lambdas —
the MinHash min-fold and the SimHash bit-vote — run as vectorized
Arrow/numpy pandas UDFs instead (bit-identical results, measured
multiples faster; see minhash_signature / simhash notes).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime for the universal hash family h(x) = (a*x + b) mod p.
# 2^31-1 keeps a*x < 2^62 so the product never overflows int64 under
# Spark's ANSI arithmetic (a, x both < 2^31).
_MERSENNE_P = (1 << 31) - 1


def _probe_frame(
    df: DataFrame, digest: Column, id_col: str, probe_rows: int
) -> DataFrame:
    """The duplication-probe plan: two 64-bit hashes per row under a
    TERMINAL limit. The limit must stay terminal (no aggregate above it):
    ``limit().collect()`` plans as CollectLimitExec, which fetches input
    partitions incrementally and stops at ``probe_rows`` rows total —
    putting an agg above the limit instead plans LocalLimit → Exchange
    SinglePartition → GlobalLimit, which launches EVERY partition and
    digests up to probe_rows rows in each (a full-scan-shaped probe at
    corpus scale). Pinned by tests/test_plans.py (CollectLimit node)."""
    return df.select(
        digest.alias("__c"), F.xxhash64(F.col(id_col)).alias("__i")
    ).limit(int(probe_rows))


def _probe_duplication(
    df: DataFrame, digest: Column, id_col: str, probe_rows: int
) -> tuple:
    """(content duplicate fraction, ids-look-unique) over at most
    ``probe_rows`` rows, computed on the driver from two collected
    64-bit hashes per row (~1.6 MB at the default 100k). One small
    incremental job; biased toward the leading partitions, which is fine
    for a strategy pick (a corpus whose duplication lives only in its
    tail gets the window plan, which is correct, just not the
    cheapest)."""
    rows = _probe_frame(df, digest, id_col, probe_rows).collect()
    n = len(rows)
    if n == 0:
        return 0.0, True
    ratio = 1.0 - len({r["__c"] for r in rows}) / n
    ids_unique = len({r["__i"] for r in rows}) == n
    return ratio, ids_unique


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
    *,
    keep: str = "min",
    strategy: str = "auto",
    probe_rows: int = 100_000,
    dup_ratio_cutoff: float = 0.10,
) -> DataFrame:
    """Keep one row per distinct content; winner = min/max id (deterministic).

    ``strategy="auto"`` (default) picks between the two physical plans
    from a cheap bounded probe (a TERMINAL limit over ``probe_rows``
    rows, fetched incrementally — never a full scan; one eager Spark
    action at call time, so pin a strategy for plan-only construction or
    streaming inputs). Heavy content duplication (> ``dup_ratio_cutoff``)
    selects ``"agg"``, whose map-side combine collapses duplicate
    clusters before the shuffle; light duplication — or ANY id
    duplication observed in the probe — selects ``"window"``, which
    needs only ONE shuffle of df and is id-agnostic. The probe is a
    sample: ids that repeat only outside the probed rows can still route
    to ``agg``, whose divergence is bounded to literal full-duplicate
    rows (see below) — callers that knowingly carry duplicate ids should
    pass ``strategy="window"`` explicitly.

    Two explicit physical strategies (identical results for unique ids;
    under duplicate ids ``"agg"`` keeps every copy of a winning
    (content, id) row where ``"window"`` keeps exactly one):

    ``"window"`` (default): a 192-bit content digest (xxhash64 + md5 of the
    JSON-encoded column struct) is the shuffle/grouping key — the raw
    content columns are NOT part of the key, so long text contributes its
    bytes to the shuffled row payload exactly once instead of twice
    (key + payload), roughly halving shuffle bytes for text-dominated rows.
    Same-content rows always collide (the digest is a pure function of
    content); distinct-content rows merging requires a SIMULTANEOUS
    xxhash64 AND md5 collision (~2^-192 per pair — birthday-safe at any
    corpus size; the md5 leg encodes timestamps at microsecond precision
    and normalizes float ±0.0, matching the grouping semantics of the
    raw-column groupBy it replaces — float fields NESTED inside
    struct-typed content columns keep JSON text semantics, where -0.0 is
    distinct). A window row_number picks the winner in ONE shuffle of
    df. A pathologically hot content value serializes into one window task.

    ``"agg"`` (skew/heavy-duplication path): winner ids via
    ``groupBy(digest).agg(min(id))`` — an ALGEBRAIC aggregate, so Spark's
    map-side partial aggregation collapses each duplicate cluster to one
    row per map task before the shuffle (a 10^8-duplicate page shuffles
    ~n_tasks rows, not 10^8, and no single reducer sorts it) — then a
    semi-join of df on (digest, winner id). The digest is part of the
    join key, so a duplicate id can never resurrect DISTINCT content
    that happens to share it (per digest group, only min-id rows
    survive); the sole divergence from ``"window"`` is that all copies
    of a fully-identical (content, id) row survive where the window
    keeps one. Costs a second shuffle of df; wins when duplication is
    heavy or skewed.
    """
    if keep not in ("min", "max"):
        raise ValueError("keep must be 'min' or 'max'")
    if strategy not in ("window", "agg", "auto"):
        raise ValueError("strategy must be 'window', 'agg', or 'auto'")
    dtypes = dict(df.dtypes)

    def _norm(c):
        # SQL grouping treats -0.0 and 0.0 as equal; the string/JSON digest
        # would split them into two groups — normalize to +0.0 first
        # (a null/NaN condition falls through to the raw column)
        col = F.col(c)
        if dtypes.get(c) in ("float", "double"):
            return F.when(col == 0, F.lit(0.0).cast(dtypes[c])).otherwise(col)
        return col

    # both digest legs normalize: the grouping key is the PAIR (h, h2)
    h = F.xxhash64(*[_norm(c) for c in content_cols])
    if len(content_cols) == 1:
        # single column: hash it directly — no JSON encoding cost (null ->
        # md5(null) = null, which still groups nulls together); string and
        # binary feed md5 as-is (a binary->string cast would be lossy)
        c0 = content_cols[0]
        dt = dtypes.get(c0, "")
        base = F.col(c0) if dt in ("string", "binary") else _norm(c0).cast("string")
        h2 = F.md5(base)
    else:
        # md5 over to_json(struct) is an unambiguous multi-column encoding
        # (ignoreNullFields=false keeps null vs absent distinct); concat_ws
        # would alias ("a\x00b") with ("a","b"). timestampFormat AND
        # timestampNTZFormat keep MICROSECONDS — both defaults truncate to
        # millis, which would merge microsecond-differing timestamps into
        # one digest (TIMESTAMP and TIMESTAMP_NTZ read separate options)
        h2 = F.md5(
            F.to_json(
                F.struct(*[_norm(c) for c in content_cols]),
                {
                    "ignoreNullFields": "false",
                    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                },
            )
        )
    if strategy == "auto":
        # memoize per (DataFrame handle, content cols, id col, probe
        # size): the probe is a pure function of the (deterministic)
        # input, so repeated dedups of the same handle pay the probe job
        # once
        key = (tuple(content_cols), id_col, int(probe_rows))
        cache = df.__dict__.setdefault("_mob_dup_probe", {})
        if key not in cache:
            cache[key] = _probe_duplication(df, h, id_col, probe_rows)
        ratio, ids_unique = cache[key]
        strategy = (
            "agg" if ids_unique and ratio > dup_ratio_cutoff else "window"
        )
    if strategy == "agg":
        pick = F.min(F.col(id_col)) if keep == "min" else F.max(F.col(id_col))
        keyed = df.withColumn("__h", h).withColumn("__h2", h2)
        winners = (
            keyed.groupBy("__h", "__h2").agg(pick.alias(id_col))
        )
        # digest INCLUDED in the semi-join key: a duplicate id outside the
        # probe can then at worst keep extra copies of the winning row,
        # never distinct content that shares the winner's id
        return (
            keyed.join(winners, on=["__h", "__h2", id_col], how="leftsemi")
            .drop("__h", "__h2")
        )
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy(h, h2).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    sep: str = "\n\n",
    join_sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide SUB-document dedup (the C4/RefinedWeb-style boilerplate
    remover): split every document into paragraphs on ``sep`` (a regex),
    keep each distinct paragraph only at its FIRST occurrence corpus-wide
    (min ``(id, pos)``), and reassemble documents from their surviving
    paragraphs in original order (joined with ``join_sep``). Documents
    whose every paragraph was seen earlier elsewhere come back with empty
    text and ``n_paras_kept = 0`` — filter on that to drop them.

    Scale shape: ``posexplode`` → ALGEBRAIC ``min(struct(id, pos))`` per
    paragraph digest — map-side partial aggregation collapses a
    boilerplate paragraph's billions of occurrences to one row per task
    before the shuffle, and there is no window over the digest, so no
    hot-paragraph single task (cf. :func:`exact_dedup`'s ``agg``
    strategy) — then a digest join back (AQE-splittable) and a per-doc
    sort+join bounded by document size. Identity is the same 192-bit
    two-leg digest as :func:`exact_dedup` (xxhash64 + md5).

    Whitespace note: splitting can produce empty paragraphs (leading/
    doubled separators); they dedup like any other paragraph — normalize
    whitespace upstream if that matters.
    """
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    )
    keyed = paras.select(
        "__id", "__pos", "__para",
        F.xxhash64("__para").alias("__h"),
        F.md5("__para").alias("__h2"),
    )
    winners = keyed.groupBy("__h", "__h2").agg(
        F.min(F.struct("__id", "__pos")).alias("__w")
    )
    kept = keyed.join(winners, on=["__h", "__h2"]).filter(
        (F.col("__id") == F.col("__w.__id"))
        & (F.col("__pos") == F.col("__w.__pos"))
    )
    re = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                lambda s: s["__para"],
            ),
            join_sep,
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    out = df.join(re, on=F.col(id_col) == F.col("__id"), how="left")
    cols = [
        F.coalesce("__text", F.lit("")).alias(text_col)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return out.select(
        *cols,
        F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_paras_kept"),
    )


def _hash_gram(gram: Column, hash_fn: str) -> Column:
    """64-bit content hash of one shingle string.

    ``"xxhash64"`` (default): one codegen'd JVM hash — the fast path.
    ``"md5"``: first 15 hex chars of md5 parsed as a bigint (< 2^60,
    non-negative) — ~2x more expression work, but md5 is the one hash
    every engine shares, so a MinHash pipeline built on it is
    value-checkable end-to-end by an ANSI-SQL oracle
    (``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`` in DuckDB).
    Collision behavior is equivalent for dedup purposes (60 vs 64
    uniform bits)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(gram)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    raise ValueError(f"shingle hash must be xxhash64|md5, got {hash_fn}")


# engine-wide binding idiom (see functions/hof.bind_once docstring for
# the per-element re-evaluation trap and the Python-UDF caveat)
from ..functions.hof import bind_once as _bind_once  # noqa: E402


def _char_grams(t: Column, n: int, hash_fn: str) -> Column:
    idx = F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: _hash_gram(F.substring(t, i + 1, n), hash_fn)
        )
    )


def _word_grams(
    ts: Column, n: int, hash_fn: str, via_get: bool = False
) -> Column:
    idx = F.sequence(F.lit(0), F.greatest(F.size(ts) - n, F.lit(0)))
    if via_get:
        # n direct element gets instead of slice+concat_ws-over-array:
        # no per-gram array allocation — ~2x on the sf1 shingle stage.
        # Identical strings: F.get past the end is null and concat_ws
        # skips nulls, exactly what a clamped slice produced for short
        # token lists. Only safe when ``ts`` is a BOUND lambda variable
        # (n gets re-reference it n times; on the public unbound shape
        # that would re-run the tokenization n times per gram).
        def gram(i):
            return F.concat_ws(" ", *[F.get(ts, i + j) for j in range(n)])
    else:
        def gram(i):
            return F.concat_ws(" ", F.slice(ts, i + 1, n))

    return F.array_distinct(
        F.transform(idx, lambda i: _hash_gram(gram(i), hash_fn))
    )


def _word_tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def char_shingles(text: Column, n: int = 5, hash_fn: str = "xxhash64") -> Column:
    """Distinct hashed character n-grams of a string column (array<bigint>).

    Public/UDF-safe shape: the per-gram lambda references ``text``
    directly, so composing this with a Python UDF argument stays
    extractable. Operators use the ``_shingles`` bound variant, which
    evaluates a computed ``text`` once per row instead of once per gram
    (see :func:`_bind_once`)."""
    return _char_grams(text, n, hash_fn)


def word_shingles(text: Column, n: int = 3, hash_fn: str = "xxhash64") -> Column:
    """Distinct hashed word n-grams (array<bigint>).

    ~5x fewer shingles than char 5-grams on natural text, so the MinHash
    signature costs ~5x less — the standard trade-off large-corpus dedup
    pipelines make (word-level Jaccard instead of char-level).

    Public/UDF-safe shape (re-tokenizes per gram — lambdas capture the
    split tree); operators go through ``_shingles``, whose bound variant
    tokenizes once per row (measured ~4x faster at sf1) but must stay
    out of Python-UDF arguments (:func:`_bind_once` caveat)."""
    return _word_grams(_word_tokens(text), n, hash_fn)


def _shingles(
    text: Column, size: int, unit: str, hash_fn: str = "xxhash64"
) -> Column:
    """Operator-internal shingle expression: the BOUND shape — the text/
    token subtree evaluates once per row, not once per gram (word mode's
    regex split dominated the sf1 shingle stage 4x unbound). Never feed
    this directly to a Python UDF (_bind_once caveat); _banded_index
    materializes it behind a Generate barrier before the signature UDF."""
    if unit == "char":
        return _bind_once(text, lambda t: _char_grams(t, size, hash_fn))
    if unit == "word":
        return _bind_once(
            _word_tokens(text),
            lambda ts: _word_grams(ts, size, hash_fn, via_get=True),
        )
    raise ValueError(f"shingle unit must be char|word, got {unit}")


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
    hashes folded into [0, p) first.

    Execution split (the :func:`simhash` lesson applied here): the
    per-shingle content hash stays JVM-side (``xxhash64`` inside the
    shingle expression); the num_hashes-way min-fold runs as a vectorized
    Arrow/numpy UDF. The previous pure-SQL formulation (ONE ``aggregate``
    fold keeping all minima in an array accumulator — already the fast SQL
    shape, 10x over per-hash ``array_min`` re-evaluation) still paid
    ~2·num_hashes interpreted expression evaluations per shingle, because
    higher-order-function lambdas never enter codegen; numpy does each
    universal-hash row as a handful of SIMD passes over the whole Arrow
    batch (measured ~3x on the banded-index stage at sf0.1). Exact same
    integer math — signatures are bit-identical to the SQL fold.
    """
    import numpy as np

    params = _minhash_params(num_hashes, seed)
    a_arr = np.array([a for a, _ in params], dtype=np.int64)
    b_arr = np.array([b for _, b in params], dtype=np.int64)
    p = _MERSENNE_P

    # cap the flattened-shingle working set per chunk (~3 int64 temporaries
    # of this length live at once): an Arrow batch of long documents can
    # carry tens of millions of shingles, and the per-worker heap must stay
    # bounded regardless of document length
    chunk_shingles = 4_000_000

    @F.pandas_udf("array<bigint>")
    def _fold(sets: pd.Series) -> pd.Series:
        n = len(sets)
        lens = np.fromiter(
            (0 if s is None else len(s) for s in sets), dtype=np.int64, count=n
        )
        out = np.empty(n, dtype=object)  # default None: null OR empty set ->
        out[:] = None                    # null signature (SQL-fold parity)
        nz_rows = np.nonzero(lens > 0)[0]
        start = 0
        while start < len(nz_rows):
            stop = start
            total = 0
            while stop < len(nz_rows) and (
                stop == start or total + lens[nz_rows[stop]] <= chunk_shingles
            ):
                total += lens[nz_rows[stop]]
                stop += 1
            rows = nz_rows[start:stop]
            flat = np.concatenate(
                [np.asarray(sets.iloc[r], dtype=np.int64) for r in rows]
            )
            pos = flat % p  # non-negative (pmod semantics), < 2^31
            nzlens = lens[rows]
            offsets = np.zeros(len(nzlens), dtype=np.int64)
            np.cumsum(nzlens[:-1], out=offsets[1:])
            # one vectorized pass per hash function: a*pos stays < 2^62, no
            # overflow; reduceat folds each row's segment to its minimum
            mins = np.empty((len(nzlens), num_hashes), dtype=np.int64)
            for j in range(num_hashes):
                hj = (pos * a_arr[j] + b_arr[j]) % p
                mins[:, j] = np.minimum.reduceat(hj, offsets)
            for i, r in enumerate(rows):
                out[r] = mins[i].tolist()
            start = stop
        return pd.Series(out)

    return _fold(shingles)


def _banded_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int,
    n_bands: int,
    shingle_size: int,
    shingle_unit: str,
    seed: int,
    shingle_hash: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket) LSH index rows — the shared banding pipeline of
    :func:`minhash_lsh_candidates` and :func:`lsh_bucket_sizes`.

    The band index is exploded FIRST: Generate is a project-collapse
    barrier, so the signature expression evaluates exactly once per input
    row (the obvious transform-lambda formulation re-evaluates the whole
    signature pipeline once per band — measured 8x slower). Buckets then
    hash a slice of the already-materialized signature array.
    """
    rows_per_band = num_hashes // n_bands
    # the shingle set is materialized behind an explode(array(.)) Generate
    # barrier (1:1 — the array always has exactly one element) so the
    # signature UDF's input is a plain ATTRIBUTE: feeding the
    # lambda-bearing shingle expression to the UDF directly makes
    # ExtractPythonUDFs leave the UDF un-extracted in re-planned cache
    # subtrees (second fresh-source invocation in one session →
    # INTERNAL_ERROR "Cannot evaluate expression: _fold(...)"), and the
    # barrier also guarantees the shingle pipeline evaluates exactly once
    # per row regardless of project collapse
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                _shingles(F.col(text_col), shingle_size, shingle_unit,
                          shingle_hash)
            )
        ).alias("__sset"),
    )
    base = shingled.select(
        "id",
        minhash_signature(F.col("__sset"), num_hashes, seed).alias("__sig"),
    )
    return base.select(
        "id",
        "__sig",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).select(
        "id",
        "band",
        F.xxhash64(
            "band",
            F.slice(
                F.col("__sig"), F.col("band") * rows_per_band + 1, rows_per_band
            ),
        ).alias("bucket"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_size: int = 5,
    shingle_unit: str = "char",
    seed: int = 42,
    shingle_hash: str = "xxhash64",
    max_bucket_size: Optional[int] = 5000,
    threshold: Optional[float] = None,
    materialize: bool = False,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH,
    with the exact shingle-Jaccard attached for thresholding.

    Shuffle discipline: the banded explode and the bucket self-join carry
    ONLY (id, band, bucket) — never the shingle arrays (which would be
    amplified n_bands times through the shuffle). Shingle sets are re-joined
    by id onto the (small) candidate-pair set for the exact verify; AQE
    typically broadcasts the pair side.

    ``max_bucket_size`` guards the self-join against degenerate buckets
    (m near-identical docs → m²/2 candidate pairs): buckets holding more ids
    are DROPPED from candidate generation (run :func:`exact_dedup` first —
    byte-identical docs are exactly the degenerate case and are cheaper as
    an exact pass). The cap is a window count over the (band, bucket)
    partitioning the self-join needs anyway — no extra shuffle, no extra
    job (the round-2 eager ``count()`` + broadcast-anti-join formulation
    measured 3x slower end-to-end). ``None`` disables; audit what a cap
    would drop with :func:`lsh_bucket_sizes`.

    ``threshold`` pushes the ``jaccard >= threshold`` filter INSIDE the
    operator, before any materialization — at corpus scale the
    below-threshold majority of candidate pairs is then never stored.

    Cache ownership: the returned plan pins three small persisted tables
    (the capped (id, band, bucket) index, the raw pair set, and the
    candidate shingle sets — the self-join, the three pair-set consumers,
    and the two verify legs would otherwise recompute their shared inputs
    per reference; no ReusedExchange fires for the aliased self-join). By
    default (``materialize=False``) they stay pinned for the session;
    call :func:`release_lsh_caches` on the result when done.
    ``materialize=True`` computes the result EAGERLY (``localCheckpoint``,
    or a reliable ``checkpoint()`` when ``checkpoint_dir`` is given — the
    fault-tolerant choice for real clusters) and releases both caches
    before returning; use it when the result feeds an iterative consumer
    (connected components) or outlives this SparkSession's caches.
    """
    # persist the TINY (id, band, bucket) table: the self-join would
    # otherwise recompute the signature pipeline once per side
    # (measured: no ReusedExchange fires for the aliased self-join).
    # The persist sits ABOVE the bucket-cap window, so the window (and the
    # shuffle feeding it) also computes once — pre-cap persisting measured
    # a full extra 40k-row shuffle+window per rep at sf0.1 — and the cached
    # plan keeps its (band, bucket) hash partitioning, which is exactly
    # what the self-join needs
    banded_use = _banded_index(
        df, text_col, id_col,
        num_hashes=num_hashes, n_bands=n_bands,
        shingle_size=shingle_size, shingle_unit=shingle_unit, seed=seed,
        shingle_hash=shingle_hash,
    )
    if max_bucket_size is not None:
        # window count over the join's own (band, bucket) partitioning:
        # zero extra shuffle, zero extra job, and the dropped rows never
        # enter the self-join
        wb = Window.partitionBy("band", "bucket")
        banded_use = (
            banded_use.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    banded = banded_use = banded_use.persist()

    a = banded_use.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded_use.select(F.col("id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .persist()
    )

    # shingles for the exact verify: restrict to candidate ids FIRST (semi
    # join), so the expensive shingle expression only evaluates for the few
    # rows that made it out of LSH; explode reads the cached pair set ONCE
    # (the union-of-two-projections formulation scanned it twice).
    # sh is persisted because BOTH pair legs (id_a, id_b) reference it and
    # no exchange reuse fires across the different join keys — uncached,
    # the corpus scan + candidate shingle computation ran twice per action
    # (measured ~0.3 s/rep at sf0.1); the cache holds only the candidates'
    # shingle sets, bounded by the LSH survivor count, not the corpus
    # NO .distinct(): the left-semi join is set-semantics on the probe
    # side regardless of build-side duplicates, and the distinct cost an
    # extra exchange+aggregate job per run (the build table is bounded by
    # 2x the candidate-pair count either way)
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    )
    sh = (
        df.join(cand_ids, on=F.col(id_col) == cand_ids["id"], how="leftsemi")
        .select(
            F.col(id_col).alias("id"),
            _shingles(
                F.col(text_col), shingle_size, shingle_unit, shingle_hash
            ).alias("__sh"),
        )
        # set size cached next to the set: |A ∪ B| = |A| + |B| − |A ∩ B|
        # for distinct arrays, so the verify never builds the union array
        # (array_union re-hashes both sides per pair; the intersect pass
        # alone carries the same information)
        .withColumn("__sz", F.size("__sh"))
        .persist()
    )
    # sort-merge hint on the verify legs (sf1 lesson): Catalyst's static
    # size estimate for the array-heavy shingle table is far under its
    # real bytes, so the initial plan picked BroadcastHashJoin of sh —
    # which AQE cannot demote once statically planned — and the driver
    # died building a multi-GB broadcast at corpus scale. Shuffle-hash
    # also failed under tight executor memory (the build side must fit
    # per-partition); sort-merge is the only strategy whose memory is
    # bounded by spill at ANY candidate volume.
    joined = (
        pairs.hint("merge")
        .join(sh.select(F.col("id").alias("id_a"),
                        F.col("__sh").alias("__sh_a"),
                        F.col("__sz").alias("__sz_a")),
              on="id_a")
        .hint("merge")
        .join(sh.select(F.col("id").alias("id_b"),
                        F.col("__sh").alias("__sh_b"),
                        F.col("__sz").alias("__sz_b")),
              on="id_b")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    # sets are array_distinct'd: |A ∪ B| = |A| + |B| − |A ∩ B| exactly —
    # same value as size(array_union(...)) without materializing it
    union = F.col("__sz_a") + F.col("__sz_b") - inter
    out = joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / F.when(union > 0, union)).alias("jaccard"),
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    if materialize:
        from ..plans.checkpoint import truncate_lineage

        out = truncate_lineage(out, checkpoint_dir, eager=True)
        banded.unpersist()
        pairs.unpersist()
        sh.unpersist()
    else:
        # released by release_lsh_caches
        out._mob_pinned_caches = [banded, pairs, sh]
    return out


def release_lsh_caches(result: DataFrame) -> None:
    """Unpersist the intermediate caches a lazy (``materialize=False``)
    :func:`minhash_lsh_candidates` / :func:`embedding_neardup_pairs` result
    pinned. Call AFTER the last action on ``result`` — the plan references
    the caches, so releasing early just recomputes them.

    Must be called on the ORIGINAL returned handle: any downstream
    transformation (``.filter``/``.select``) is a NEW DataFrame without
    the cache registry, and silently accepting it would leak both pinned
    caches for the session — so a handle with no registry raises.
    """
    pinned = getattr(result, "_mob_pinned_caches", None)
    if pinned is None:
        raise ValueError(
            "release_lsh_caches must be called on the DataFrame returned "
            "by the candidate generator itself (derived DataFrames do not "
            "carry the cache registry); keep the original handle, or use "
            "materialize=True which releases the caches before returning"
        )
    for cached in pinned:
        cached.unpersist()


def lsh_bucket_sizes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_size: int = 5,
    shingle_unit: str = "char",
    seed: int = 42,
    shingle_hash: str = "xxhash64",
) -> DataFrame:
    """Diagnostic: (band, bucket, n_ids) histogram for the LSH index the
    candidate generator would build — run it to audit how many buckets a
    given ``max_bucket_size`` cap would drop before committing to one
    (the cap itself is silent at runtime by design: counting drops would
    cost an extra job on the hot path). Shares :func:`_banded_index` with
    the candidate generator so the audit can never drift from the real
    bucketing."""
    banded = _banded_index(
        df, text_col, id_col,
        num_hashes=num_hashes, n_bands=n_bands,
        shingle_size=shingle_size, shingle_unit=shingle_unit, seed=seed,
        shingle_hash=shingle_hash,
    )
    return banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n_ids"))


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_hashes: int = 64,
    n_bands: int = 16,
    shingle_size: int = 5,
    shingle_unit: str = "char",
    seed: int = 42,
    transitive: bool = False,
    max_bucket_size: Optional[int] = 5000,
    checkpoint_dir: Optional[str] = None,
    keep_best_col: Optional[str] = None,
    keep_best_higher: bool = True,
) -> DataFrame:
    """Drop near-duplicates: a row is removed if it pairs (jaccard >=
    threshold) with any surviving smaller id.

    ``transitive=False`` (default): one propagation round (min partner id)
    — the cheap approximation common corpus-dedup pipelines use.
    ``transitive=True``: exact single-link clusters via connected
    components (operators/graph.py large-star/small-star) — keeps exactly
    one row per transitive cluster (A~B, B~C drops C even when A!~C).
    The threshold filter is pushed inside the candidate generator and the
    pair set is materialized (releasing the LSH caches; reliable when
    ``checkpoint_dir`` is set) because both consumers re-read it.

    ``keep_best_col`` changes WHICH copy survives: instead of the
    min-id winner, each transitive cluster keeps its best-scoring row
    (:func:`keep_best` — e.g. highest quality score, or lowest
    perplexity with ``keep_best_higher=False``; id still breaks ties).
    Requires ``transitive=True`` — only components define the cluster a
    "best" is taken over.
    """
    if keep_best_col is not None and not transitive:
        raise ValueError(
            "keep_best_col needs transitive=True: only connected "
            "components define the cluster each 'best' row is chosen "
            "from"
        )
    if keep_best_col is not None:
        # validate BEFORE the (eager, expensive) candidate
        # materialization below — a shadowed column should fail in
        # milliseconds, not after the full LSH pipeline ran
        for shadow in ("__cluster", "component"):
            if shadow in df.columns:
                raise ValueError(
                    f"input already has a '{shadow}' column; rename it"
                )
    pairs = minhash_lsh_candidates(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        n_bands=n_bands,
        shingle_size=shingle_size,
        shingle_unit=shingle_unit,
        seed=seed,
        max_bucket_size=max_bucket_size,
        threshold=threshold,
        materialize=True,
        checkpoint_dir=checkpoint_dir,
    )
    if transitive:
        if keep_best_col is not None:
            from .graph import connected_components

            comp = connected_components(
                pairs, "id_a", "id_b", checkpoint_dir=checkpoint_dir
            ).withColumnRenamed("id", id_col)
            labeled = df.join(comp, on=id_col, how="left").withColumn(
                # rows in no pair are their own singleton cluster
                "__cluster", F.coalesce(F.col("component"), F.col(id_col))
            ).drop("component")
            return keep_best(
                labeled, "__cluster", keep_best_col, id_col,
                higher_is_better=keep_best_higher,
            ).drop("__cluster")
        from .graph import dedup_by_components

        return dedup_by_components(
            df, pairs, id_col, checkpoint_dir=checkpoint_dir
        )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    shingle_size: int = 3,
    shingle_unit: str = "word",
    max_df: Optional[int] = 1000,
    containment_threshold: Optional[float] = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity for every pair >= threshold, via an
    inverted-index (posting-list) self-join — no LSH approximation.
    Output also carries the asymmetric ``containment_a``/``containment_b``
    (|A∩B|/|A|, |A∩B|/|B|): a quote or excerpt scores near 1.0 on one side
    while its symmetric jaccard stays low. ``containment_threshold`` (if
    set) WIDENS the result: pairs qualify by jaccard >= threshold OR
    max(containment) >= containment_threshold.

    Plan shape: explode distinct shingles to (id, shingle) postings; the
    self-join key is the shingle, so two documents only ever meet if they
    share a shingle (never an all-pairs product); |intersection| is a
    count per (id_a, id_b); |union| = sz_a + sz_b - common from the
    per-doc posting counts. All aggregates are algebraic -> map-side
    partial aggregation throughout.

    ``max_df`` drops shingles occurring in more than max_df documents
    (stop-shingles) before the join — the standard guard against the
    frequent-key blowup at corpus scale. The DEFAULT is bounded
    (max_df=1000): a posting list of length m self-joins to m² candidate
    rows, so one boilerplate shingle shared by 10^6 documents would emit
    10^12 rows from a single join key; capping at 1000 bounds any key's
    fan-out at 10^6 rows while leaving genuinely discriminative shingles
    (df << corpus) untouched. Pass ``max_df=None`` explicitly for the
    exact unbounded jaccard (safe only when the corpus is known to have
    no stop-shingles, e.g. after template stripping).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), shingle_size, shingle_unit).alias("__sh"),
    )
    post = base.select("id", F.explode("__sh").alias("s"))
    if max_df is not None:
        keep = post.groupBy("s").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_df
        )
        post = post.join(keep.select("s"), on="s", how="leftsemi")
    # sizes AFTER the stop-shingle filter so numerator and denominator use
    # the same (filtered) shingle universe — a consistent filtered-set
    # jaccard; with max_df=None this is the exact jaccard
    sizes = post.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = post.select(F.col("id").alias("id_a"), "s")
    b = post.select(F.col("id").alias("id_b"), "s")
    common = (
        a.join(b, on="s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(
            sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("__sza")),
            on="id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("__szb")),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("common").cast("double")
                / (F.col("__sza") + F.col("__szb") - F.col("common"))
            ).alias("jaccard"),
            # asymmetric CONTAINMENT |A∩B|/|A| (and /|B|): near 1.0 when one
            # document is a sub-document of the other even though jaccard is
            # low — the quote/excerpt duplication signal jaccard misses
            (F.col("common").cast("double") / F.col("__sza")).alias(
                "containment_a"
            ),
            (F.col("common").cast("double") / F.col("__szb")).alias(
                "containment_b"
            ),
        )
    )
    keep = F.col("jaccard") >= threshold
    if containment_threshold is not None:
        keep = keep | (
            F.greatest("containment_a", "containment_b")
            >= containment_threshold
        )
    return out.filter(keep)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: Optional[str] = None,
    shingle_size: int = 8,
    shingle_unit: str = "word",
    min_hits: int = 1,
    mode: str = "drop",
) -> DataFrame:
    """Benchmark decontamination: remove (or flag) corpus documents sharing
    at least ``min_hits`` distinct ``shingle_size``-grams with ANY benchmark
    document — the standard guard against evaluation data leaking into a
    training corpus (word 8-grams ≈ the n-gram overlap rule used by public
    LLM training pipelines).

    Plan shape for 100 TB corpus × small benchmark: the benchmark's
    distinct shingle-hash set is aggregated FIRST (it is tiny relative to
    the corpus — thousands of eval docs), then the corpus posting list
    joins against it; AQE broadcasts the benchmark side, so the corpus is
    never shuffled — one scan + broadcast hash join + one groupBy(corpus
    id) count. ``mode="drop"`` anti-joins ids with >= ``min_hits``
    overlapping grams out; ``mode="flag"`` adds ``n_contaminated_ngrams``
    with the RAW overlap count (0 for clean docs; ``min_hits`` is ignored)
    so the drop threshold can be tuned from the audit.
    """
    if mode not in ("drop", "flag"):
        raise ValueError("mode must be 'drop' or 'flag'")
    btext = benchmark_text_col or text_col
    bench_shingles = (
        benchmark.select(
            F.explode(
                _shingles(F.col(btext), shingle_size, shingle_unit)
            ).alias("s")
        )
        .distinct()
    )
    post = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(
            _shingles(F.col(text_col), shingle_size, shingle_unit)
        ).alias("s"),
    )
    hits = (
        post.join(F.broadcast(bench_shingles), on="s")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__n_hits"))
    )
    if mode == "drop":
        return corpus.join(
            hits.filter(F.col("__n_hits") >= min_hits),
            on=corpus[id_col] == hits["__id"],
            how="left_anti",
        )
    # flag mode reports RAW overlap counts (min_hits is the drop-mode
    # threshold only) — the whole point of flagging is tuning min_hits
    out = corpus.join(
        hits, on=corpus[id_col] == hits["__id"], how="left"
    ).drop("__id")
    return out.withColumn(
        "n_contaminated_ngrams", F.coalesce(F.col("__n_hits"), F.lit(0))
    ).drop("__n_hits")


def simhash(tokens: Column, bits: int = 64) -> Column:
    """SimHash fingerprint (bigint) of a token-array column.

    Per-bit vote: each token hash contributes +1/-1 to each bit position;
    the sign of the vote sets the bit.

    Execution split: the per-token hash stays JVM-side (one ``xxhash64``
    per token inside codegen); the 64-counter vote aggregation runs as a
    vectorized Arrow/numpy UDF. A pure-SQL formulation exists
    (``aggregate`` + ``zip_with`` over 64-element vote arrays) but
    higher-order functions are interpreted per element — 64 boxed ops per
    token made it ~10x slower end-to-end at sf0.1, which is exactly the
    "UDFs beat built-ins" exception: numpy does the bit matrix for a whole
    Arrow batch in a handful of SIMD passes.
    """
    if bits > 64:
        raise ValueError("simhash supports at most 64 bits")

    @F.pandas_udf("long")
    def _vote(hashes: pd.Series) -> pd.Series:
        import numpy as np

        n = len(hashes)
        # null token arrays (null text upstream) -> null fingerprint, matching
        # the SQL-aggregate formulation this UDF replaced; empty arrays -> 0
        isnull = np.fromiter((a is None for a in hashes), dtype=bool, count=n)
        lens = np.fromiter(
            (0 if a is None else len(a) for a in hashes), dtype=np.int64, count=n
        )
        out = np.zeros(n, dtype=np.uint64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hashes[nz]]
            ).astype(np.uint64)
            shifts = np.arange(bits, dtype=np.uint64)
            bitmat = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            nzlens = lens[nz]
            offsets = np.zeros(len(nzlens), dtype=np.int64)
            np.cumsum(nzlens[:-1], out=offsets[1:])
            ones = np.add.reduceat(bitmat, offsets, axis=0)
            # vote_i = ones_i - zeros_i = 2*ones_i - n_tokens; bit set iff > 0
            setbits = (2 * ones) > nzlens[:, None]
            out[nz] = (setbits.astype(np.uint64) << shifts).sum(axis=1)
        result = pd.Series(out.astype(np.int64))
        if isnull.any():
            result = result.astype(object)
            result[isnull] = None
        return result

    hashed = F.transform(tokens, lambda t: F.xxhash64(t))
    return _vote(hashed)


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
    # pinned "window": it tolerates duplicate ids (simhash_dedup makes no
    # id-uniqueness promise) and skips the auto probe, which would evaluate
    # the simhash UDF on the probe rows just to pick a plan
    return exact_dedup(
        out, ["__simhash"], id_col, keep=keep, strategy="window"
    ).drop("__simhash")


def simhash_banded_pairs(
    df: DataFrame,
    fp_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_blocks: Optional[int] = None,
    max_bucket_size: Optional[int] = 5000,
    checkpoint_dir: Optional[str] = None,
    include_fp: bool = False,
) -> DataFrame:
    """All pairs of rows whose 64-bit bigint fingerprints (``fp_col``)
    differ by at most ``max_hamming`` bits — EXACT by pigeonhole, not
    probabilistic. This is the banding + Hamming-verify half of
    :func:`simhash_neardup_pairs`, factored out so it runs over ANY
    precomputed fingerprint column: with a SQL-expressible fingerprint the
    whole operator is reproducible in ANSI SQL (``bit_count(xor(...))``
    over the all-pairs set), which is how the driver oracle value-checks
    the distance/banding math end-to-end.

    The fingerprint splits into ``n_blocks`` (default max_hamming+1)
    contiguous bit blocks; two fingerprints within ``max_hamming`` bits
    MUST agree on at least one block, so candidates meet through an
    equi-join on (block index, block value) and the exact popcount(xor)
    verify runs only on co-bucketed pairs. Null fingerprints never pair.
    ``max_bucket_size`` drops degenerate blocks (run :func:`exact_dedup`
    first — identical fingerprints are cheaper exact).

    Output: (id_a, id_b, hamming), plus (fp_a, fp_b) when ``include_fp``,
    with id_a < id_b.
    """
    n_blocks = n_blocks if n_blocks is not None else max_hamming + 1
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"n_blocks={n_blocks} < max_hamming+1={max_hamming + 1}: the "
            f"pigeonhole guarantee needs at least max_hamming+1 blocks"
        )
    if n_blocks > 64:
        raise ValueError("n_blocks must be <= 64")

    base = df.select(
        F.col(id_col).alias("id"), F.col(fp_col).cast("long").alias("__fp")
    ).filter(F.col("__fp").isNotNull())

    width = 64 // n_blocks
    blocks = []
    for i in range(n_blocks):
        w = width if i < n_blocks - 1 else 64 - width * (n_blocks - 1)
        shifted = F.shiftrightunsigned(F.col("__fp"), i * width)
        if w >= 64:
            # n_blocks=1 (max_hamming=0): the block IS the fingerprint;
            # (1<<64)-1 would overflow LongType and fail at plan time
            blocks.append(shifted)
        else:
            blocks.append(shifted.bitwiseAND(F.lit((1 << w) - 1)))

    # the fingerprint RIDES the banded rows (one extra int64 — nothing
    # like minhash's shingle arrays, where ids-only banding is the right
    # call): the exact popcount verify can then run INSIDE the self-join
    # stage, before any row is shuffled onward. The r7 shape
    # (ids-only join → dropDuplicates → two fingerprint re-joins →
    # hamming filter) shuffled the RAW candidate set twice and sorted it
    # twice — with max_hamming=8 the 7-bit blocks collide so heavily that
    # 5k docs produced 10.9M raw candidates (measured sf0.1: 9.8 s);
    # filtering first leaves only true near-dup pairs (orders of
    # magnitude fewer) for the dedup shuffle (0.7 s same data).
    banded = base.select(
        "id",
        "__fp",
        F.posexplode(F.array(*blocks)).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.select(F.col("id").alias("id_a"), F.col("__fp").alias("__fa"),
                      "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), F.col("__fp").alias("__fb"),
                      "band", "bucket")
    fp_cols = (
        [F.col("__fa").alias("fp_a"), F.col("__fb").alias("fp_b")]
        if include_fp
        else []
    )
    scored = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", hamming_distance(F.col("__fa"), F.col("__fb"))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", *fp_cols, "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )
    from ..plans.checkpoint import truncate_lineage

    return truncate_lineage(scored, checkpoint_dir, eager=True)


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_blocks: Optional[int] = None,
    max_bucket_size: Optional[int] = 5000,
    checkpoint_dir: Optional[str] = None,
    include_fp: bool = False,
) -> DataFrame:
    """All pairs whose 64-bit SimHash fingerprints (over whitespace tokens
    of ``text_col``) differ by at most ``max_hamming`` bits — the
    :func:`simhash` fingerprint feeding :func:`simhash_banded_pairs`; see
    there for the pigeonhole-exactness and bucket-cap contract.

    Output: (id_a, id_b, hamming), plus the fingerprints (fp_a, fp_b) when
    ``include_fp``, with id_a < id_b.
    """
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    with_fp = df.select(
        F.col(id_col).alias("__sid"), simhash(toks).alias("__simfp")
    )
    return simhash_banded_pairs(
        with_fp, "__simfp", "__sid",
        max_hamming=max_hamming, n_blocks=n_blocks,
        max_bucket_size=max_bucket_size, checkpoint_dir=checkpoint_dir,
        include_fp=include_fp,
    )


def embedding_neardup_pairs(
    df: "DataFrame",
    vec_col: str,
    id_col: str,
    dim: int,
    *,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    max_bucket_size: Optional[int] = 5000,
    checkpoint_dir: Optional[str] = None,
) -> "DataFrame":
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    Candidates come from banded random-hyperplane LSH (operators/similarity),
    so the only join is an equi-join on (band, bucket); every candidate is
    exactly re-scored with the JVM-side cosine expression. High thresholds
    (>= 0.9) pair naturally with LSH because near-identical vectors almost
    always share at least one band.

    ``max_bucket_size`` drops degenerate buckets before the m²/2 self-join
    blowup — a window count over the join's own (band, bucket)
    partitioning (no extra job; see :func:`minhash_lsh_candidates`). The
    thresholded result is eagerly materialized (``localCheckpoint``, or a
    reliable ``checkpoint()`` when ``checkpoint_dir`` is set) so the
    intermediate cache is released before returning.
    """
    scored, banded = _embedding_scored_pairs(
        df,
        vec_col,
        id_col,
        dim,
        n_planes=n_planes,
        n_bands=n_bands,
        seed=seed,
        max_bucket_size=max_bucket_size,
    )
    from ..plans.checkpoint import truncate_lineage

    out = truncate_lineage(
        scored.filter(F.col("cosine") >= threshold), checkpoint_dir, eager=True
    )
    banded.unpersist()
    return out


def _embedding_scored_pairs(
    df: "DataFrame",
    vec_col: str,
    id_col: str,
    dim: int,
    *,
    n_planes: int,
    n_bands: int,
    seed: int,
    max_bucket_size: Optional[int],
) -> tuple:
    """Lazy (un-checkpointed) cosine-scored LSH candidate pairs and the
    pinned banded-index cache — split out so the verify-leg plan shape is
    inspectable (``tests/test_plans.py`` pins SortMergeJoin there; the
    public entry point eagerly checkpoints, which erases the plan)."""
    from ..functions.vector import dot, l2_norm
    from .similarity import add_lsh_buckets

    # double-cast + norm computed once per row (not per candidate pair)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v")))
    # ids-only through the self-join (persisted: tiny), vectors re-joined
    # onto the candidate pairs for exact scoring
    banded = add_lsh_buckets(
        base, "__v", dim, n_planes=n_planes, n_bands=n_bands, seed=seed
    ).select("id", "band", "bucket").persist()

    banded_use = banded
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bucket")
        banded_use = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )

    a = banded_use.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded_use.select(F.col("id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    denom = F.col("__na") * F.col("__nb")
    # sort-merge hint on the verify legs: the vector table's static size
    # estimate undercounts array rows, and a statically planned broadcast
    # of it cannot be demoted by AQE; sort-merge stays spill-bounded at
    # any candidate volume (the minhash sf1 lesson — see
    # minhash_lsh_candidates)
    scored = (
        pairs.hint("merge")
        .join(
            base.select(
                F.col("id").alias("id_a"),
                F.col("__v").alias("__va"),
                F.col("__n").alias("__na"),
            ),
            on="id_a",
        )
        .hint("merge")
        .join(
            base.select(
                F.col("id").alias("id_b"),
                F.col("__v").alias("__vb"),
                F.col("__n").alias("__nb"),
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.when(denom > 0, dot(F.col("__va"), F.col("__vb")) / denom).alias(
                "cosine"
            ),
        )
    )
    return scored, banded


def embedding_neardup_dedup(
    df: "DataFrame",
    vec_col: str,
    id_col: str,
    dim: int,
    *,
    threshold: float = 0.95,
    **lsh_kwargs,
) -> "DataFrame":
    """Drop rows whose embedding near-duplicates a surviving smaller id."""
    pairs = embedding_neardup_pairs(
        df, vec_col, id_col, dim, threshold=threshold, **lsh_kwargs
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def keep_best(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    score_col: str,
    id_col: str,
    *,
    higher_is_better: bool = True,
    keep_id: str = "min",
    strategy: str = "auto",
) -> DataFrame:
    """Canonical-row selection: ONE row per group — the best-scoring one.

    The step after duplicate DETECTION: exact digests, MinHash/SimHash
    clusters (:func:`connected_components` labels), or URL/source groups
    tell you which rows are copies; ``keep_best`` decides which copy the
    corpus keeps — the highest-quality one (longest, best quality score,
    newest), not an arbitrary min-id winner. Ties break on ``keep_id``
    = 'min'/'max' of ``id_col``, so the result is deterministic.

    Null and NaN scores rank BELOW every real score (a group of only
    null-score rows still emits its ``keep_id`` winner).

    Two physical strategies (same result; pinned by test):

    ``"agg"``: ``groupBy(groups).agg(max(struct(orderkey, payload)))`` —
    algebraic, map-side combinable: a 10^8-copy boilerplate group
    collapses to one row per map task before the shuffle, so no single
    reducer ever sees a hot group (the same skew argument as
    ``exact_dedup``'s agg path). Needs a NUMERIC id for the tie field
    (packed negated under 'min').

    ``"window"``: one ``row_number`` over (groups, score desc, id) —
    one shuffle of df, any id type, but a hot group serializes into one
    window task.

    ``"auto"`` picks ``agg`` when ``id_col`` is numeric, else
    ``window`` — a pure schema decision, no probe action.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if keep_id not in ("min", "max"):
        raise ValueError("keep_id must be 'min' or 'max'")
    if strategy not in ("agg", "window", "auto"):
        raise ValueError("strategy must be 'agg', 'window', or 'auto'")
    dtypes = dict(df.dtypes)
    numeric_id = dtypes.get(id_col) in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    )
    # the agg path packs the WHOLE row into max(struct(...)), so every
    # payload column must be ORDERABLE — map types are not (Spark raises
    # INVALID_ORDERING_TYPE); the window path never orders the payload
    orderable_payload = not any("map<" in dt for _, dt in df.dtypes)
    if strategy == "auto":
        strategy = "agg" if numeric_id and orderable_payload else "window"
    if strategy == "agg" and not numeric_id:
        raise ValueError(
            "strategy='agg' needs a numeric id_col for the tie-break "
            "ordering; use strategy='window'"
        )
    if strategy == "agg" and not orderable_payload:
        raise ValueError(
            "strategy='agg' packs the full row into an ordered struct, "
            "and map-typed columns are not orderable; use "
            "strategy='window'"
        )

    s = F.col(score_col).cast("double")
    # direction FIRST, missing-sentinel SECOND: negating after the
    # null->-inf mapping would send missing scores to +inf and make the
    # UNSCORED copy win every lower-is-better group. NaN sorts ABOVE
    # every double in Spark orderings — null/NaN both mean "no score":
    # rank lowest in either direction
    sv = s if higher_is_better else -s
    ord_score = (
        F.when(s.isNull() | F.isnan(s), F.lit(float("-inf"))).otherwise(sv)
    )

    if strategy == "agg":
        # tie keeps the id's NATIVE integer type (a double cast would
        # collide distinct ids above 2^53 at corpus scale). keep_id='min'
        # needs a DESCENDING-in-id key for the max(): bitwise NOT, not
        # negation — ~x = -x-1 is monotone decreasing and total over the
        # whole int64 range, while -x wraps silently at Long.MIN_VALUE
        # (ANSI off) or throws (ANSI on). Float ids negate safely, but a
        # NaN id would poison the struct ordering (NaN sorts ABOVE every
        # double): map it to -inf so a NaN-id row loses ties either way.
        tie = F.col(id_col)
        if dtypes.get(id_col) in ("float", "double"):
            tie_min = F.when(F.isnan(tie), F.lit(float("-inf"))).otherwise(-tie)
            tie_max = F.when(F.isnan(tie), F.lit(float("-inf"))).otherwise(tie)
            tie_key = tie_min if keep_id == "min" else tie_max
        else:
            tie_key = F.bitwise_not(tie) if keep_id == "min" else tie
        packed = F.max(
            F.struct(
                ord_score.alias("__s"),
                tie_key.alias("__t"),
                F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
            )
        ).alias("__best")
        return (
            df.groupBy(*groups).agg(packed).select("__best.__row.*")
        )

    # a NaN float id must LOSE ties in BOTH directions, matching the agg
    # path's -inf mapping: NaN sorts ABOVE every double in Spark
    # orderings, so raw id desc (keep_id='max') would put the NaN-id row
    # FIRST and the two strategies would return different winners. Map
    # NaN to the always-losing end per direction (+inf under asc, -inf
    # under desc).
    idc = F.col(id_col)
    if dtypes.get(id_col) in ("float", "double"):
        id_min = F.when(F.isnan(idc), F.lit(float("inf"))).otherwise(idc)
        id_max = F.when(F.isnan(idc), F.lit(float("-inf"))).otherwise(idc)
    else:
        id_min = id_max = idc
    order = [ord_score.desc()] + (
        [id_min.asc()] if keep_id == "min" else [id_max.desc()]
    )
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str,
    group_col: str,
    *,
    shingle_size: int = 3,
    shingle_unit: str = "word",
) -> DataFrame:
    """Cross-source duplication matrix: for every pair of corpus sources,
    how much of one source's distinct n-gram set appears in the other —
    the corpus-composition question (which crawls/dumps overlap, where
    to spend dedup effort, is source B just a re-crawl of A) asked at
    the SOURCE level instead of per document.

    Per source: the DISTINCT shingle set (union over its documents).
    Output per pair (source_a < source_b): ``common`` (|Sa ∩ Sb|),
    ``size_a``/``size_b``, symmetric ``jaccard``, and the asymmetric
    ``containment_a``/``containment_b`` (|Sa∩Sb|/|Sa|, /|Sb|) — a small
    source wholly embedded in a big one scores ~1.0 containment while
    jaccard stays low.

    Plan shape (r8): explode → ONE ``collect_set(source)`` aggregate
    keyed by shingle (map-side partial set-merge collapses each source's
    repeats before the shuffle — the set is bounded by k sources, never
    by document count); each shingle's sorted source set then emits its
    ordered PAIRS plus two singleton markers per member — ``(x, null)``
    and ``(null, x)`` — in one Generate, and a single map-side-
    combinable count over ``(a, b)`` yields common counts (both
    non-null) AND per-source distinct-shingle sizes (the marker rows) in
    the same tiny table. Two windows over that k²-bounded table attach
    ``size_a``/``size_b`` (partition by a, then by b) with no join. The
    whole heavy posting pipeline therefore appears ONCE in the plan —
    the r7 formulation (distinct over (source, shingle) + shingle-keyed
    self-join + sizes join) executed the shingle scan 3x and paid three
    posting-sized shuffles (AQE does not deduplicate stages referenced
    under separate broadcast subtrees; pinned in tests/test_plans).
    No max_df cap is needed and the result is EXACT at any corpus size.
    The shingle value is xxhash64 content hashing (~2^-64 collisions);
    shingle-string equality gives the same matrix.
    """
    gtype = df.schema[group_col].dataType
    post = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            _shingles(F.col(text_col), shingle_size, shingle_unit)
        ).alias("s"),
    )
    # one posting-sized shuffle: per-shingle DISTINCT source set
    # (array_sort makes pair enumeration deterministic and ordered a < b;
    # collect_set drops null sources, matching the join formulation where
    # null never survived the inner joins)
    gsets = post.groupBy("s").agg(
        F.array_sort(F.collect_set("g")).alias("gs")
    )
    # gs is an aggregate OUTPUT attribute, so lambda references to it are
    # variable lookups, not re-evaluated trees (cf. _bind_once)
    gs = F.col("gs")
    nul = F.lit(None).cast(gtype)
    pair_arr = F.flatten(
        F.transform(
            gs,
            lambda x, i: F.transform(
                F.slice(gs, i + 2, F.size(gs)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    # marker rows ride the same aggregate: (x, null) counts = |S_x| for
    # the partition-by-a window, (null, x) for the partition-by-b window
    size_a_arr = F.transform(
        gs, lambda x: F.struct(x.alias("a"), nul.alias("b"))
    )
    size_b_arr = F.transform(
        gs, lambda x: F.struct(nul.alias("a"), x.alias("b"))
    )
    counted = (
        gsets.select(
            F.explode(F.concat(pair_arr, size_a_arr, size_b_arr)).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    return (
        counted.withColumn(
            "__sza",
            F.max(F.when(F.col("b").isNull(), F.col("common"))).over(wa),
        )
        .withColumn(
            "__szb",
            F.max(F.when(F.col("a").isNull(), F.col("common"))).over(wb),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            "common",
            F.col("__sza").alias("size_a"),
            F.col("__szb").alias("size_b"),
            (
                F.col("common")
                / (F.col("__sza") + F.col("__szb") - F.col("common")).cast("double")
            ).alias("jaccard"),
            (F.col("common") / F.col("__sza").cast("double")).alias(
                "containment_a"
            ),
            (F.col("common") / F.col("__szb").cast("double")).alias(
                "containment_b"
            ),
        )
    )
