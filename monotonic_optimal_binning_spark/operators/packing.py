"""Sequence packing for LLM pretraining pipelines.

``pack_sequences`` implements the standard concat-then-chunk packing:
documents are laid end-to-end in a deterministic global order and cut into
fixed token-budget chunks (a document may span chunk boundaries). The hard
part at 100 TB is the GLOBAL running token offset — a naive
``Window.orderBy(...)`` with no partition key funnels the whole corpus
through ONE task. ``global_prefix_sum`` does it scalably in two levels:

  1. deterministic range buckets from one approxQuantile pass — the bucket
     of a row is a pure function of its order key and the (driver-inlined)
     boundary literals, so recomputation can never re-bucket differently
     (unlike ``repartitionByRange``, whose sampled bounds depend on RDD
     identity);
  2. per-bucket window cumsum — parallel across buckets;
  3. k bucket totals (map-side-combinable agg, k rows to the driver) →
     exclusive cumsum on the driver → broadcast join of bucket offsets.

Cost: one stats pass + one shuffle by bucket + one tiny aggregate. The
reference has no packing surface; engine-new for the training-data
pipeline (the (doc_id, tokens, n_tok, source) input shape of the north
rule).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    n_buckets: int = 64,
    relative_error: float = 0.001,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """INCLUSIVE prefix sum of ``value_col`` over the total order given by
    ``order_col`` (must be numeric and unique — ties would make the order,
    and therefore the prefix, ill-defined) without a single-task global
    window. Adds ``out_col``; see the module docstring for the plan shape.

    ``df`` must be DETERMINISTIC across actions (no unseeded ``sample()``/
    ``rand()`` upstream): the quantile probe, the window pass, and the
    bucket-totals aggregate each re-scan it, and a frame that changes
    between scans would silently corrupt every broadcast offset — the
    same rationale as the deterministic range buckets below. Cache or
    checkpoint a non-deterministic input first.

    Exactness note: the quantile pass only places BUCKET BOUNDARIES — the
    prefix values themselves are exact integer sums regardless of how
    balanced the buckets are.

    Scan accounting (deliberate): the input is read three times, but the
    quantile probe and the bucket-totals aggregate are COLUMN-PRUNED scans
    of one/two narrow columns with map-side combine (k rows shuffled) —
    only the window pass touches full rows. Persisting full rows to avoid
    the two narrow scans would trade cheap columnar re-reads for caching
    the whole corpus, which loses at the 100 TB design point; callers that
    already have the frame cached get the reuse for free.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        df.select(F.col(order_col).cast("double").alias("_k"))
        .approxQuantile("_k", probs, relative_error)
    )
    bounds = sorted(set(b for b in bounds if b is not None))
    key = F.col(order_col).cast("double")
    if bounds:
        # bucket = number of boundaries <= key: pure function of (key,
        # literal boundaries) — deterministic under any recomputation
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b <= key))
    else:
        bucket = F.lit(0)
    work = df.withColumn("__bkt", bucket)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = work.withColumn("__local", F.sum(F.col(value_col)).over(w))

    totals = (
        work.groupBy("__bkt")
        .agg(F.sum(F.col(value_col)).alias("__tot"))
        .collect()
    )
    offsets: List[tuple] = []
    acc = 0
    for r in sorted(totals, key=lambda r: r["__bkt"]):
        offsets.append((r["__bkt"], acc))
        acc += int(r["__tot"] or 0)
    off_df = df.sparkSession.createDataFrame(
        offsets, "__bkt int, __off long"
    )
    return (
        local.join(F.broadcast(off_df), on="__bkt")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__bkt", "__local", "__off")
    )


def pack_sequences(
    df: DataFrame,
    n_tok_col: str,
    id_col: str,
    budget: int,
    *,
    order_col: Optional[str] = None,
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """GPT-style concat-then-chunk packing: documents laid end-to-end in
    ascending ``order_col`` (default: ``id_col``; must be unique numeric)
    and cut into fixed ``budget``-token chunks.

    Output: one row per (document, chunk) slice —
      chunk_id       which chunk this slice belongs to
      doc_offset     first token of the slice within the document
      chunk_offset   position of the slice within the chunk
      n_tok_slice    slice length (sums to n_tok per doc, to budget per
                     full chunk)
    plus ``tokens_slice`` (the actual token sub-array) when ``tokens_col``
    is given. Zero-token documents produce no slice; ``n_tok`` must be
    non-negative (negative counts would corrupt every downstream offset —
    validate upstream, a lazy plan cannot check it for free). The input
    must be deterministic across actions (:func:`global_prefix_sum`
    re-scans it; see there). Chunk arithmetic is exact integer ``div`` on
    BIGINT global offsets — no double rounding at any corpus size.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = order_col or id_col
    pre = global_prefix_sum(df, n_tok_col, order, out_col="__end")
    pre = pre.withColumn(
        "__start", F.col("__end") - F.col(n_tok_col).cast("long")
    )
    b = int(budget)
    exploded = (
        pre.filter(F.col(n_tok_col) > 0)
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.expr(f"__start div {b}"),
                    F.expr(f"(__end - 1) div {b}"),
                )
            ),
        )
    )
    cstart = F.col("chunk_id") * b
    slice_begin = F.greatest(F.col("__start"), cstart)
    slice_end = F.least(F.col("__end"), cstart + b)
    cols = [
        F.col(id_col),
        F.col("chunk_id"),
        (slice_begin - F.col("__start")).alias("doc_offset"),
        (slice_begin - cstart).alias("chunk_offset"),
        (slice_end - slice_begin).alias("n_tok_slice"),
    ]
    if tokens_col is not None:
        cols.append(
            F.slice(
                F.col(tokens_col),
                (slice_begin - F.col("__start") + 1).cast("int"),
                (slice_end - slice_begin).cast("int"),
            ).alias("tokens_slice")
        )
    return exploded.select(*cols)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Per-document sliding-window chunking — the RAG-indexing /
    long-document-training shape: each document becomes
    ``ceil``-many windows of at most ``max_tokens`` whitespace tokens,
    consecutive windows sharing ``overlap`` tokens so no boundary
    context is lost.

    Chunk starts are ``k * (max_tokens - overlap)``; the chunk count is
    ``1 + ceil((n - max_tokens) / step)`` for ``n > max_tokens`` else 1,
    so every token is covered and no degenerate tail chunk (one fully
    contained in its predecessor) is emitted. Empty/whitespace-only
    documents yield one empty chunk (``n_tokens = 0``) — row-count
    lineage stays 1:N with no silent drops.

    Execution: pure codegen — ``split`` once per row, ``explode`` over a
    ``sequence`` of chunk indices (Generate is a project-collapse
    barrier, so the token array materializes ONCE per document, not once
    per chunk), ``slice``+``concat_ws`` per chunk. Embarrassingly
    parallel: zero shuffles, zero UDFs; unlike :func:`pack_sequences`
    (cross-document concat-then-chunk, which needs the global prefix
    sum) this is a per-row map at any corpus size.
    """
    from .textstats import whitespace_tokens

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    # NULL text behaves like empty text (one empty chunk, n_tokens 0):
    # without the coalesce, size(slice(NULL)) nulls n_tokens and the row
    # contract ("empty chunk") silently breaks on the first null doc
    toks = whitespace_tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    n_chunks = F.when(
        n > max_tokens,
        F.lit(1) + F.ceil((n - max_tokens) / F.lit(step)).cast("int"),
    ).otherwise(F.lit(1))
    base = df.select(
        F.col(id_col),
        toks.alias("__t"),
        n_chunks.alias("__nc"),
    )
    # explode FIRST (collapse barrier): __t materializes once per doc
    exploded = base.select(
        id_col,
        "__t",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk"),
    )
    piece = F.slice(
        F.col("__t"), F.col("chunk") * step + 1, max_tokens
    )
    return exploded.select(
        id_col,
        F.col("chunk").cast("int").alias("chunk"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("int").alias("n_tokens"),
    )
