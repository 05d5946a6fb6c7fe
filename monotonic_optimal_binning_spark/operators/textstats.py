"""Text analysis operators over a documents table.

Language-ID (stopword-ratio heuristic), quality scoring, token counting,
and document fingerprinting — all pure Spark SQL column expressions so the
scan is one codegen stage; nothing leaves the JVM.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny, deliberately-public stopword seeds per language (top function words).
STOPWORDS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "für", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "de", "que", "los", "en", "una", "por", "con", "para"),
}


def whitespace_tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish token count: word pieces of <=4 chars + punctuation marks.

    A deterministic regex stand-in for a BPE tokenizer: every run of up to 4
    word characters and every non-space punctuation char counts as a token.
    Accepts a Column (or a column name for convenience) — no string
    interpolation into SQL, so weird identifiers can't break or inject.
    """
    col = F.col(text) if isinstance(text, str) else text
    pattern = r"[\p{L}\p{N}]{1,4}|[^\p{L}\p{N}\s]"
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + composite score.

    Columns: n_chars_calc, n_tokens, mean_token_len, punct_ratio,
    digit_ratio, stopword_ratio, quality_score in [0, 1].
    """
    text = F.col(text_col)
    toks = whitespace_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    # regexp_count over the single-char classes counts the same matches
    # as length-minus-replaced (pinned equal at sf1) without building the
    # stripped string per row
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    digits = F.regexp_count(text, F.lit(r"[0-9]"))
    lower_toks = F.transform(toks, lambda t: F.lower(t))
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(lower_toks, lambda t: F.array_contains(en_stop, t)))

    out = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "mean_token_len",
            F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens),
        )
        .withColumn(
            "punct_ratio", F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
        )
        .withColumn(
            "digit_ratio", F.when(n_chars > 0, digits / n_chars).otherwise(0.0)
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0),
        )
    )
    # composite: long enough, not punctuation/digit soup, some function words
    score = (
        F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality_score", score)


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit ratios.

    Deterministic tie-break by language code; 'und' when nothing matches.
    The lowered token array is BOUND once per row (functions/hof) — the
    unbound form re-ran split+lower once per language score plus once for
    the length, ~1.5x the operator at sf0.1.
    """
    from ..functions.hof import bind_once

    toks = F.transform(whitespace_tokens(F.col(text_col)), lambda t: F.lower(t))

    def _scores(ts):
        n = F.size(ts)
        entries = []
        for lang in sorted(STOPWORDS):
            arr = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
            hit = F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))
            entries.append(
                F.struct(
                    F.when(n > 0, hit / n).otherwise(F.lit(0.0)).alias("score"),
                    F.lit(lang).alias("lang"),
                )
            )
        return F.array(*entries)

    pairs = bind_once(toks, _scores)
    best = F.array_max(pairs)  # struct compare: score first, then lang
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lowercase: bool = True,
) -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace tokens.

    Output: (doc_id, term, tf, df, tfidf) with tfidf = tf * ln(N / df).

    Plan shape (the 100 TB shape): explode tokens once; ``tf`` is a
    map-side-combinable count keyed by (doc, term); ``df`` comes from a
    second ALGEBRAIC aggregate over the tf table — its map-side partial
    collapses every term to one row per task, so only ~|vocab| rows reach
    the wire — and joins back on term. A window count over the term
    partition would be one exchange cheaper on paper, but a stop-word
    term ("the": df ≈ N) funnels its entire posting into ONE window task
    and AQE cannot split a window partition; it CAN split a skewed join
    partition, which is why the join formulation is the one that
    survives a 100 TB vocabulary. The corpus size N is a one-row
    broadcast. No row ever carries the full token array through a
    shuffle.
    """
    toks = whitespace_tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    post = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
    )
    tf = post.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
    return (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("__n").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )


def repetition_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals per document (the Gopher-rule
    family used to filter low-quality/boilerplate training text):

      n_lines              non-empty trimmed lines
      dup_line_frac        fraction of lines that are repeats of another
      dup_line_char_frac   fraction of line characters inside repeated lines
      top_token_frac       most-frequent-token count / total tokens

    Zero shuffles: everything is computed per row with sorted-array
    adjacency (a line/token is part of a repeat group iff it equals a
    neighbor after sorting; the top-token count is the longest equal run in
    the sorted token array, folded in ONE ``aggregate`` pass). An
    explode+groupBy formulation would shuffle the whole corpus token-wise
    to compute per-doc scalars.
    """
    text = F.col(text_col)
    empty = F.array().cast("array<string>")
    lines = F.coalesce(
        F.filter(
            F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ),
        empty,
    )
    s = F.array_sort(lines)
    n = F.size(s)

    # ONE forward fold over the sorted lines — the lambda touches ONLY the
    # accumulator and the element (a captured outer array expression would
    # be RE-EVALUATED per element by the interpreted HOF: the sort would go
    # O(n^2 log n) per row). Equal lines are adjacent after sorting, so a
    # run-length pass yields duplicate count and duplicated characters;
    # when a run reaches length 2 its first member is counted retroactively
    # (same string -> same length).
    def _line_step(acc, x):
        eq = acc["prev"].isNotNull() & (x == acc["prev"])
        runlen = F.when(eq, acc["runlen"] + 1).otherwise(F.lit(1))
        extra_dup = F.when(
            eq & (acc["runlen"] == 1), F.length(x) * 2
        ).when(eq, F.length(x)).otherwise(F.lit(0))
        extra_n = F.when(
            eq & (acc["runlen"] == 1), F.lit(2)
        ).when(eq, F.lit(1)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            runlen.alias("runlen"),
            (acc["dupchars"] + extra_dup).alias("dupchars"),
            (acc["totchars"] + F.length(x)).alias("totchars"),
            (acc["ndup"] + extra_n).alias("ndup"),
        )

    line_stats = F.aggregate(
        s,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("runlen"),
            F.lit(0).alias("dupchars"),
            F.lit(0).alias("totchars"),
            F.lit(0).alias("ndup"),
        ),
        _line_step,
        lambda acc: F.struct(
            acc["dupchars"].alias("dupchars"),
            acc["totchars"].alias("totchars"),
            acc["ndup"].alias("ndup"),
        ),
    )

    toks = F.array_sort(
        F.coalesce(
            F.transform(whitespace_tokens(text), lambda t: F.lower(t)), empty
        )
    )
    n_tok = F.size(toks)
    # longest equal run in the sorted token array == max token frequency
    top_run = F.aggregate(
        toks,
        F.struct(
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )

    # Generate (explode of a 1-element array) is a project-collapse
    # barrier: the folds evaluate ONCE per row and downstream columns read
    # real attributes of the generated struct instead of inlined copies
    rep = F.struct(
        n.alias("n_lines"),
        line_stats.alias("ls"),
        top_run.alias("top_run"),
        n_tok.alias("n_tok"),
    )
    out = df.select("*", F.explode(F.array(rep)).alias("__rep"))
    r = F.col("__rep")
    return out.select(
        *df.columns,
        r["n_lines"].alias("n_lines"),
        F.when(
            r["n_lines"] > 0, r["ls"]["ndup"] / r["n_lines"]
        ).otherwise(0.0).alias("dup_line_frac"),
        F.when(
            r["ls"]["totchars"] > 0, r["ls"]["dupchars"] / r["ls"]["totchars"]
        ).otherwise(0.0).alias("dup_line_char_frac"),
        F.when(
            r["n_tok"] > 0, r["top_run"] / r["n_tok"]
        ).otherwise(0.0).alias("top_token_frac"),
    )


# Deliberately simple, RE2-and-Java-compatible patterns (no lookarounds):
# the point is the scrubbing *pipeline shape* (counts + sequential
# replacement, one codegen stage), not NER-grade PII detection.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digit_run", r"\b\d[\d\- ]{7,}\d\b", "<NUM>"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_scrubbed",
    patterns=PII_PATTERNS,
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, long digit runs) with typed
    placeholder tokens and count each kind per document.

    Adds ``n_<kind>`` counts (from the ORIGINAL text) and ``out_col`` with
    replacements applied sequentially in pattern order (emails first so an
    address's digits can't be half-eaten by the digit-run rule). All
    JVM-side regex — one codegen stage, no shuffle, no Python.
    """
    out = df
    for kind, pat, _ in patterns:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    scrubbed = F.col(text_col)
    for _, pat, token in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out.withColumn(out_col, scrubbed)


def fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    strip punctuation, then xxhash64 — stable under formatting noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N} ]", "")
    norm = F.regexp_replace(F.trim(norm), r"\s+", " ")
    return df.withColumn(out_col, F.xxhash64(norm))


def token_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    *,
    lowercase: bool = True,
    group_col: Optional[str] = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the top-``k`` whitespace tokens by
    frequency (globally, or per ``group_col`` — e.g. per source/language).

    Plan at 100 TB: explode → ONE ``groupBy(token)`` aggregate whose
    partial (map-side) combine collapses stop-word skew before the
    shuffle — the shuffle carries one row per distinct (task, token), not
    per occurrence. The global top-k then runs as TakeOrdered over
    vocab-sized rows (no full sort shuffle); the per-group variant is a
    rank window on (count desc, token) where Spark's WindowGroupLimit
    pushes the k-limit below the sort. Ties break on token text, so the
    result is deterministic on both engines (oracle-checkable).
    """
    tok = F.explode(
        whitespace_tokens(
            F.lower(F.col(text_col)) if lowercase else F.col(text_col)
        )
    ).alias("token")
    keys = [F.col(group_col)] if group_col else []
    counts = (
        df.select(*keys, tok)
        .groupBy(*([group_col] if group_col else []), "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    if group_col:
        w = Window.partitionBy(group_col).orderBy(
            F.col("n").desc(), F.col("token")
        )
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(group_col, "token", "n", "rank")
        )
    return (
        counts.orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
        .select("token", "n")
    )


def token_distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    *,
    top_k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary drift between two corpus slices (crawls, snapshots,
    sources): per-token Jensen-Shannon contributions over the combined
    top-``top_k`` tokens plus one ``__rest__`` row carrying ALL
    remaining probability mass — so the contributions sum to the exact
    JS divergence (nats) of the top-k-coarsened distributions, not an
    approximation over an unstated support. PSI answers this for
    numeric features; this is its token-frequency twin (did the new
    crawl change what the corpus talks about / which language/boiler-
    plate dominates).

    Output: one row per selected token + ``__rest__``:
    ``token, is_rest, n_a, n_b, p_a, p_b, js_contrib`` (p's are
    occurrence shares of the FULL token stream; zeros contribute 0 by
    the 0·log 0 convention — JS needs no smoothing). ``is_rest``
    disambiguates the remainder row from a corpus that literally
    contains the token ``__rest__``. Degenerate case: a slice with ZERO
    tokens has no distribution — its p/js columns come back NULL (the
    0/0 share is undefined, not zero); gate empty slices upstream.

    Plan at 100 TB: one explode→groupBy(token) aggregate per side
    (map-side combine collapses stop-word skew), a token-keyed outer
    join of the two vocab tables, top-k via orderBy+limit (TakeOrdered
    — never a single-task vocab sort; ties break on token text so both
    engines agree), scalar totals broadcast, and the ``__rest__`` mass
    computed by subtraction from the k selected rows — the non-selected
    vocab is never re-scanned.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def _counts(d: DataFrame, name: str) -> DataFrame:
        tok = F.explode(
            whitespace_tokens(
                F.lower(F.col(text_col)) if lowercase else F.col(text_col)
            )
        ).alias("token")
        return d.select(tok).groupBy("token").agg(
            F.count(F.lit(1)).alias(name)
        )

    ca, cb = _counts(df_a, "n_a"), _counts(df_b, "n_b")
    joined = (
        ca.join(cb, on="token", how="full_outer")
        .select(
            "token",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
        )
    )
    sel = joined.orderBy(
        F.desc(F.col("n_a") + F.col("n_b")), F.asc("token")
    ).limit(top_k).withColumn("is_rest", F.lit(False))
    rest = (
        sel.agg(F.sum("n_a").alias("__sa"), F.sum("n_b").alias("__sb"))
        .crossJoin(totals)
        .select(
            F.lit("__rest__").alias("token"),
            (F.col("__ta") - F.coalesce("__sa", F.lit(0))).alias("n_a"),
            (F.col("__tb") - F.coalesce("__sb", F.lit(0))).alias("n_b"),
            F.lit(True).alias("is_rest"),
        )
    )
    p = F.col("n_a") / F.col("__ta")
    q = F.col("n_b") / F.col("__tb")
    m = (p + q) / 2
    contrib = 0.5 * (
        F.when(F.col("n_a") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("n_b") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        sel.unionByName(rest)
        .crossJoin(totals)
        .select(
            "token", "is_rest", "n_a", "n_b",
            p.alias("p_a"), q.alias("p_b"),
            contrib.alias("js_contrib"),
        )
    )
