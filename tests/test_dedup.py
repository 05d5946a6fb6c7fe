"""Dedup operators: exact, MinHash-LSH, SimHash — with brute-force oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.dedup import (
    char_shingles,
    exact_dedup,
    hamming_distance,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    simhash,
    simhash_dedup,
    simhash_neardup_pairs,
)


def corpus_pdf():
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
    ]
    rows = []
    i = 0
    for t in base:
        for rep in range(3):  # exact duplicates
            rows.append((i, t))
            i += 1
        rows.append((i, t + " extra"))  # near duplicate
        i += 1
    rows.append((i, "completely different content about spark engines"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    pdf = corpus_pdf()
    res = exact_dedup(spark.createDataFrame(pdf), ["text"], "doc_id").toPandas()
    expected = pdf.groupby("text")["doc_id"].min().sort_values()
    assert sorted(res["doc_id"]) == sorted(expected.tolist())
    assert res["text"].is_unique


def test_exact_dedup_keep_max(spark):
    pdf = corpus_pdf()
    res = exact_dedup(
        spark.createDataFrame(pdf), ["text"], "doc_id", keep="max"
    ).toPandas()
    expected = pdf.groupby("text")["doc_id"].max()
    assert sorted(res["doc_id"]) == sorted(expected.tolist())


def python_shingles(text, n=5):
    return {hash_stub(text[i : i + n]) for i in range(max(len(text) - n + 1, 1))}


def hash_stub(s):
    return s  # compare via raw strings in the oracle


def test_minhash_candidates_find_near_dups(spark):
    pdf = corpus_pdf()
    cands = minhash_lsh_candidates(
        spark.createDataFrame(pdf), "text", "doc_id", num_hashes=64, n_bands=16
    ).toPandas()
    # exact duplicates must be candidates with jaccard 1.0
    for t, group in pdf.groupby("text"):
        ids = sorted(group["doc_id"])
        for a, b in zip(ids, ids[1:]):
            hit = cands[(cands["id_a"] == a) & (cands["id_b"] == b)]
            assert len(hit) == 1, f"missing exact-dup pair {a},{b}"
            assert hit["jaccard"].iloc[0] == pytest.approx(1.0)
    # jaccard values match a brute-force character-shingle oracle
    for _, row in cands.head(30).iterrows():
        ta = pdf.loc[pdf["doc_id"] == row["id_a"], "text"].iloc[0]
        tb = pdf.loc[pdf["doc_id"] == row["id_b"], "text"].iloc[0]
        sa = {ta[i : i + 5] for i in range(len(ta) - 4)}
        sb = {tb[i : i + 5] for i in range(len(tb) - 4)}
        expected = len(sa & sb) / len(sa | sb)
        assert row["jaccard"] == pytest.approx(expected, abs=1e-12)


def test_minhash_md5_mode_matches_python_oracle(spark):
    """shingle_hash='md5' pins the cross-engine value-check contract: the
    shingle value is int(md5(gram)[:15 hex], 16), and the WHOLE pipeline
    (signature min-fold, banding, candidate join, exact verify) matches a
    pure-Python re-derivation from those literals — the property the
    DuckDB oracle of the minhash_pairs query relies on."""
    import hashlib

    from monotonic_optimal_binning_spark.operators.dedup import (
        _MERSENNE_P,
        _minhash_params,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different text content here now",
        "one two",
        "one two",  # exact dup: must pair with jaccard 1.0
        "",  # degenerate: single shingle = hash of ''
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    num_hashes, n_bands, rpb = 16, 4, 4
    out = minhash_lsh_candidates(
        spark.createDataFrame(pdf), "text", "doc_id",
        num_hashes=num_hashes, n_bands=n_bands,
        shingle_size=3, shingle_unit="word", shingle_hash="md5",
        materialize=True,
    )
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in out.collect()
    )

    def shingle_set(text):
        toks = [t for t in text.strip().split() if t]
        grams = {
            " ".join(toks[i : i + 3])
            for i in range(max(len(toks) - 3, 0) + 1)
        }
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        }

    params = _minhash_params(num_hashes, 42)
    p = _MERSENNE_P
    sigs, sets = {}, {}
    for _, row in pdf.iterrows():
        s = shingle_set(row["text"])
        sets[row["doc_id"]] = s
        sigs[row["doc_id"]] = [
            min(((v % p) * a + b) % p for v in s) for a, b in params
        ]
    cand = set()
    for band in range(n_bands):
        buckets = {}
        for i, sig in sigs.items():
            buckets.setdefault(
                tuple(sig[band * rpb : (band + 1) * rpb]), []
            ).append(i)
        for ids in buckets.values():
            for a in ids:
                for b in ids:
                    if a < b:
                        cand.add((a, b))
    expected = sorted(
        (
            a,
            b,
            round(
                len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 12
            ),
        )
        for a, b in cand
    )
    assert got == expected
    assert (3, 4, 1.0) in got  # the planted exact dup co-buckets everywhere


def test_minhash_dedup_removes_exact_and_near(spark):
    pdf = corpus_pdf()
    res = minhash_dedup(
        spark.createDataFrame(pdf), "text", "doc_id", threshold=0.9
    ).toPandas()
    # all exact duplicate groups collapse to their min id
    for t, group in pdf.groupby("text"):
        survivors = res[res["text"] == t]
        assert len(survivors) <= 1
        if len(survivors) == 1:
            assert survivors["doc_id"].iloc[0] == group["doc_id"].min()
    # the unique document survives
    assert "completely different content about spark engines" in set(res["text"])


def test_minhash_signature_similarity_estimates_jaccard(spark):
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = a.replace("lazy", "sleepy")
    df = spark.createDataFrame(pd.DataFrame({"id": [0, 1], "text": [a, b]}))
    sigs = (
        df.select(
            "id",
            minhash_signature(char_shingles(F.col("text"), 5), 128, 42).alias("sig"),
        )
        .orderBy("id")
        .collect()
    )
    sim = np.mean(
        [x == y for x, y in zip(sigs[0]["sig"], sigs[1]["sig"])]
    )
    sa = {a[i : i + 5] for i in range(len(a) - 4)}
    sb = {b[i : i + 5] for i in range(len(b) - 4)}
    true_j = len(sa & sb) / len(sa | sb)
    assert sim == pytest.approx(true_j, abs=0.15)


def test_simhash_properties(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta theta",  # identical
                "totally unrelated words describing other things here",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    toks = F.split(F.col("text"), " ")
    res = df.select("doc_id", simhash(toks).alias("sh")).orderBy("doc_id").collect()
    assert res[0]["sh"] == res[1]["sh"]
    d = (
        spark.createDataFrame([(res[0]["sh"], res[2]["sh"])], ["a", "b"])
        .select(hamming_distance(F.col("a"), F.col("b")).alias("d"))
        .first()["d"]
    )
    assert d > 10  # unrelated docs differ in many bits


def test_simhash_dedup(spark):
    pdf = corpus_pdf()
    res = simhash_dedup(spark.createDataFrame(pdf), "text", "doc_id").toPandas()
    # identical texts share simhash -> collapse to min id
    for t, group in pdf.groupby("text"):
        survivors = res[res["text"] == t]
        assert len(survivors) <= 1


def test_exact_dedup_agg_strategy_equals_window(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": [f"doc {i % 17}" for i in range(100)],  # heavy duplication
        }
    )
    df = spark.createDataFrame(pdf)
    for keep in ("min", "max"):
        a = exact_dedup(df, ["text"], "doc_id", keep=keep).toPandas()
        b = exact_dedup(df, ["text"], "doc_id", keep=keep, strategy="agg").toPandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        assert len(a) == 17


def test_exact_dedup_auto_strategy(spark):
    """auto probes content duplication AND id duplication; heavy content
    duplication with clean ids picks agg, anything else windows — same
    result either way."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        _probe_duplication,
    )

    heavy = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(200), "text": [f"doc {i % 9}" for i in range(200)]}
    ))
    unique = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(200), "text": [f"doc number {i}" for i in range(200)]}
    ))
    ratio, ids_ok = _probe_duplication(heavy, F.xxhash64("text"), "doc_id", 100_000)
    assert ratio > 0.5 and ids_ok
    ratio, ids_ok = _probe_duplication(unique, F.xxhash64("text"), "doc_id", 100_000)
    assert ratio < 0.1 and ids_ok
    for df, n in ((heavy, 9), (unique, 200)):
        auto = exact_dedup(df, ["text"], "doc_id", strategy="auto").toPandas()
        win = exact_dedup(df, ["text"], "doc_id", strategy="window").toPandas()
        assert sorted(auto["doc_id"]) == sorted(win["doc_id"])
        assert len(auto) == n
    # empty input: probe ratio 0.0, window path, empty result
    empty = unique.filter(F.col("doc_id") < 0)
    assert exact_dedup(empty, ["text"], "doc_id").count() == 0


def test_exact_dedup_auto_safe_under_duplicate_ids(spark):
    """Duplicate ids must not corrupt auto's output: the probe routes
    observed id duplication to the window plan, and even the agg plan's
    digest-keyed semi-join cannot let a duplicate id resurrect DISTINCT
    content (the judge scenario: (1,'a'), (2,'a'), (2,'b'))."""
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 2] * 30, "text": ["a", "a", "b"] * 30}
    ))
    out = exact_dedup(df, ["text"], "doc_id").toPandas()
    assert sorted(map(tuple, out[["doc_id", "text"]].to_numpy())) == [
        (1, "a"), (2, "b")
    ]
    # the agg plan directly (forced): distinct content sharing a winner id
    # still dedups correctly; only literal full-duplicate rows multiply
    df2 = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 2], "text": ["a", "a", "b"]}
    ))
    agg = exact_dedup(df2, ["text"], "doc_id", strategy="agg").toPandas()
    assert sorted(map(tuple, agg[["doc_id", "text"]].to_numpy())) == [
        (1, "a"), (2, "b")
    ]


def test_exact_dedup_auto_probe_is_limit_bounded(spark):
    """The auto probe must never full-scan: the limit is TERMINAL
    (CollectLimit fetches partitions incrementally and stops at
    probe_rows) — an aggregate ABOVE the limit would plan GlobalLimit
    over a single-partition Exchange, launching every input partition."""
    from monotonic_optimal_binning_spark.operators.dedup import _probe_frame
    from tests.test_plans import plan_of

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), "id").alias("text")
    )
    plan = plan_of(_probe_frame(df, F.xxhash64("text"), "doc_id", 100), "simple")
    assert "CollectLimit" in plan, plan
    assert "Exchange" not in plan, plan


def test_simhash_banded_pairs_on_precomputed_fp(spark):
    """The banding/Hamming half over an arbitrary fingerprint column must
    equal the brute-force pair set (pigeonhole), and include_fp emits the
    fingerprints the hamming was computed from."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        simhash_banded_pairs,
    )

    rng = np.random.default_rng(7)
    # clustered fingerprints: shared 48-bit prefix per cluster, few low bits
    fps = {}
    for i in range(60):
        hi = int(rng.integers(0, 6)) << 40
        lo = int(rng.integers(0, 16))
        fps[i] = hi | lo
    df = spark.createDataFrame(
        pd.DataFrame({"vid": list(fps), "fp": list(fps.values())})
    )
    for k in (1, 2, 3):
        out = simhash_banded_pairs(
            df, "fp", "vid", max_hamming=k, include_fp=True
        ).toPandas()
        expected = sorted(
            (a, b)
            for a in fps
            for b in fps
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= k
        )
        got = sorted(map(tuple, out[["id_a", "id_b"]].to_numpy()))
        assert got == expected, f"max_hamming={k}"
        # emitted fingerprints are the inputs; hamming matches popcount
        for r in out.itertuples():
            assert r.fp_a == fps[r.id_a] and r.fp_b == fps[r.id_b]
            assert r.hamming == bin(r.fp_a ^ r.fp_b).count("1")


def test_simhash_neardup_include_fp(spark):
    """include_fp on the text-level API: fp columns appear and agree with
    the standalone simhash fingerprints."""
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["alpha beta gamma", "alpha beta gamma"]}
    )
    df = spark.createDataFrame(pdf)
    out = simhash_neardup_pairs(
        df, "text", "doc_id", max_hamming=0, include_fp=True
    ).toPandas()
    assert list(out.columns) == ["id_a", "id_b", "fp_a", "fp_b", "hamming"]
    assert len(out) == 1 and out["fp_a"][0] == out["fp_b"][0]


def test_simhash_neardup_pairs_exact_by_pigeonhole(spark):
    """Banded Hamming join must return EXACTLY the brute-force set of pairs
    within max_hamming bits (pigeonhole guarantee with n_blocks = k+1)."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    base_words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    rng = np.random.default_rng(4)
    for i in range(40):
        words = list(base_words)
        # perturb a few docs lightly (near-dups), others heavily
        n_swap = int(rng.integers(0, 6))
        for j in rng.integers(0, len(words), n_swap):
            words[j] = f"tok{rng.integers(0, 50)}"
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash(toks).alias("fp")).collect()
    }
    for k in (2, 4):
        expected = sorted(
            (a, b)
            for a in fps
            for b in fps
            if a < b and bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= k
        )
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in simhash_neardup_pairs(
                df, "text", "doc_id", max_hamming=k
            ).collect()
        )
        assert got == expected, f"max_hamming={k}"


def test_simhash_neardup_guards(spark):
    from monotonic_optimal_binning_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", None]})
    )
    # null text never pairs; invalid block counts raise
    assert simhash_neardup_pairs(df, "text", "doc_id").count() == 0
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3, n_blocks=2)


def test_simhash_neardup_max_hamming_zero(spark):
    """max_hamming=0 (n_blocks=1, 64-bit block) must plan and return exactly
    the identical-fingerprint pairs — (1<<64)-1 used to overflow LongType."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha beta gamma", "alpha beta gamma",
                     "totally different words here", "alpha beta gamma"],
        }
    )
    out = simhash_neardup_pairs(
        spark.createDataFrame(pdf), "text", "doc_id", max_hamming=0
    ).toPandas()
    got = sorted(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert got == [(1, 2), (1, 4), (2, 4)]
    assert (out["hamming"] == 0).all()


def test_minhash_dedup_forwards_max_bucket_size(spark):
    """The cap kwarg must reach the candidate generator: with a tiny cap a
    large identical-text block stays un-deduped (its buckets are dropped),
    with the cap disabled it collapses to one survivor."""
    rows = [(i, "same text repeated for everyone in this block") for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    capped = minhash_dedup(
        df, "text", "doc_id", threshold=0.5, num_hashes=16, n_bands=4,
        max_bucket_size=5,
    )
    assert capped.count() == 40  # all buckets dropped -> no pairs -> no losers
    uncapped = minhash_dedup(
        df, "text", "doc_id", threshold=0.5, num_hashes=16, n_bands=4,
        max_bucket_size=None,
    )
    assert uncapped.count() == 1


def test_exact_dedup_distinguishes_null_from_empty(spark):
    """The 192-bit digest key must not alias null with empty or across
    column boundaries (to_json struct encoding, ignoreNullFields=false)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "a": [None, "", "x", "x"],
            "b": ["y", "y", None, None],
        }
    )
    kept = exact_dedup(
        spark.createDataFrame(pdf), ["a", "b"], "doc_id"
    ).toPandas()
    # (null,y) != ("",y); (x,null) duplicated -> keep min id 3
    assert sorted(kept["doc_id"].tolist()) == [1, 2, 3]


def test_decontaminate_drop_and_flag(spark):
    from monotonic_optimal_binning_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the quick brown fox jumps over the lazy dog",   # contains bench gram
            "a completely unrelated document about spark",
            "quick brown fox appears here too somewhere",    # contains bench gram
            "nothing shared with any benchmark at all",
        ],
    }))
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["benchmark question: the quick brown fox answer"],
    }))
    kept = decontaminate(
        corpus, bench, shingle_size=3, shingle_unit="word"
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    flagged = decontaminate(
        corpus, bench, shingle_size=3, shingle_unit="word", mode="flag"
    ).toPandas().set_index("doc_id")["n_contaminated_ngrams"].to_dict()
    # doc 1 shares 'the quick brown' and 'quick brown fox'; doc 3 one gram
    assert flagged[1] == 2 and flagged[3] == 1
    assert flagged[2] == 0 and flagged[4] == 0
    # min_hits=2 only drops the double-overlap doc
    kept2 = decontaminate(
        corpus, bench, shingle_size=3, shingle_unit="word", min_hits=2
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3, 4]


def test_ngram_containment_detects_excerpts(spark):
    from monotonic_optimal_binning_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    full = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo")
    excerpt = "delta echo foxtrot golf hotel"   # verbatim sub-document
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": [full, excerpt, "completely different words everywhere now"]}))
    # jaccard alone misses the excerpt (small overlap / big union)...
    j_only = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5).toPandas()
    assert len(j_only) == 0
    # ...containment finds it with score 1.0 on the excerpt side
    out = ngram_jaccard_pairs(
        df, "text", "doc_id", threshold=0.5, containment_threshold=0.9
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert max(row["containment_a"], row["containment_b"]) == 1.0
    assert row["jaccard"] < 0.5


def test_ngram_jaccard_default_path_is_bounded(spark):
    """The DEFAULT must carry the stop-shingle guard (max_df=1000): a
    posting list of length m self-joins to m² rows, so the unbounded
    path must be an explicit opt-in (max_df=None). Pinned two ways:
    (a) a shingle planted in >1000 docs produces ZERO pairs by default
    but m² pairs with max_df=None; (b) the default plan contains the
    left-semi stop-shingle filter join."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    n = 1001  # one past the default cap
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("common boiler plate").alias("text"),
    )
    bounded = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.1)
    assert bounded.count() == 0
    exact = ngram_jaccard_pairs(
        df.limit(5), "text", "doc_id", threshold=0.1, max_df=None
    )
    assert exact.count() == 10  # C(5,2) identical docs
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    nop = ngram_jaccard_pairs(
        df.limit(5), "text", "doc_id", threshold=0.1, max_df=None
    )
    assert "LeftSemi" not in nop._jdf.queryExecution().executedPlan().toString()


def test_exact_dedup_digest_float_zero_and_timestamp_micros(spark):
    """Digest-key semantics must match the raw-column groupBy it replaced:
    -0.0 and 0.0 share one group (SQL grouping normalizes signed zero),
    while timestamps differing only in MICROSECONDS stay distinct (the
    default to_json format truncates to millis)."""
    import datetime

    import pandas as pd

    from monotonic_optimal_binning_spark.operators.dedup import exact_dedup

    zdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "v": [0.0, -0.0, 1.0]})
    )
    for strategy in ("window", "agg"):
        out = exact_dedup(zdf, ["v"], "doc_id", strategy=strategy)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3], strategy
    # multi-column path normalizes signed zero too
    z2 = zdf.withColumn("tag", F.lit("x"))
    out = exact_dedup(z2, ["v", "tag"], "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0, 100000)
    t1 = datetime.datetime(2026, 1, 1, 0, 0, 0, 100001)  # +1 microsecond
    tdf = spark.createDataFrame(
        [(1, t0, "a"), (2, t1, "a")], "doc_id long, ts timestamp, tag string"
    )
    out = exact_dedup(tdf, ["ts", "tag"], "doc_id")
    assert out.count() == 2  # microsecond difference is a real difference


def test_release_lsh_caches_rejects_derived_handle(spark):
    """Calling release on a derived DataFrame (which lacks the cache
    registry) must raise instead of silently leaking both pinned caches."""
    import pandas as pd
    import pytest

    from monotonic_optimal_binning_spark.operators.dedup import (
        minhash_lsh_candidates,
        release_lsh_caches,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(20),
             "text": [f"some words here number {i}" for i in range(20)]}
        )
    )
    out = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, n_bands=2,
        shingle_size=2, shingle_unit="word",
    )
    derived = out.filter(F.col("jaccard") > 0.5)
    with pytest.raises(ValueError, match="original handle"):
        release_lsh_caches(derived)
    release_lsh_caches(out)  # the real handle still releases fine


def test_paragraph_dedup_keeps_first_occurrence_corpus_wide(spark):
    """Sub-document dedup: a paragraph survives only at its first
    corpus-wide (id, pos) occurrence; docs reassemble in original order;
    fully-duplicated docs come back empty with n_paras_kept=0."""
    import pandas as pd

    from monotonic_optimal_binning_spark.operators.dedup import (
        paragraph_dedup,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha one\n\nshared boiler\n\nbeta two",
                "shared boiler\n\ngamma three",   # boiler seen in doc 1
                "alpha one\n\nshared boiler",     # both seen earlier
                "delta four",
            ],
        }
    )
    out = (
        paragraph_dedup(spark.createDataFrame(docs), "text", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "alpha one\n\nshared boiler\n\nbeta two",
        "gamma three",
        "",
        "delta four",
    ]
    assert out["n_paras_kept"].tolist() == [3, 1, 0, 1]
    assert list(out.columns) == ["doc_id", "text", "n_paras_kept"]

    # partition-invariant (winner is min (id,pos), not arrival order)
    out2 = (
        paragraph_dedup(
            spark.createDataFrame(docs).repartition(7), "text", "doc_id"
        )
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out2["text"].tolist() == out["text"].tolist()


# ------------------------------------------------------------ keep_best ----


def _kb_frame(spark, with_string_id=False):
    rng = np.random.default_rng(5)
    n = 500
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "grp": rng.integers(0, 40, n),
            "score": rng.uniform(0, 10, n).round(3),
            "payload": [f"p{i}" for i in range(n)],
        }
    )
    # planted pathologies: tied scores, all-null-score group, NaN scores
    pdf.loc[pdf["grp"] == 3, "score"] = 7.0           # whole group tied
    pdf.loc[pdf["grp"] == 5, "score"] = np.nan        # all-"missing" group
    pdf.loc[pdf.index % 17 == 0, "score"] = np.nan
    df = spark.createDataFrame(pdf)
    # true NaN (createDataFrame maps np.nan->null): re-plant as real NaN
    df = df.withColumn(
        "score",
        F.when(F.col("rid") % 13 == 0, F.lit(float("nan"))).otherwise(
            F.col("score")
        ),
    )
    if with_string_id:
        df = df.withColumn("rid", F.format_string("id%04d", F.col("rid")))
    return df


def _kb_truth(df, keep_id="min", higher=True):
    pdf = df.toPandas()
    s = pdf["score"].astype(float)
    # direction first, THEN missing -> -inf (missing loses both ways)
    ordv = (s if higher else -s).where(~s.isna(), -np.inf)
    pdf = pdf.assign(__o=ordv)
    asc_id = keep_id == "min"
    pdf = pdf.sort_values(
        ["grp", "__o", "rid"], ascending=[True, False, asc_id]
    )
    return (
        pdf.groupby("grp").head(1).drop(columns="__o")
        .sort_values("grp").reset_index(drop=True)
    )


def test_keep_best_agg_equals_window_and_truth(spark):
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    df = _kb_frame(spark)
    want = _kb_truth(df)
    for strategy in ("agg", "window"):
        got = (
            keep_best(df, "grp", "score", "rid", strategy=strategy)
            .toPandas().sort_values("grp").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["grp", "rid", "payload"]], want[["grp", "rid", "payload"]]
        )
    # every group survives exactly once, incl. the all-NaN/null one
    assert len(want) == df.select("grp").distinct().count()


def test_keep_best_directions(spark):
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    df = _kb_frame(spark)
    for keep_id in ("min", "max"):
        for higher in (True, False):
            want = _kb_truth(df, keep_id=keep_id, higher=higher)
            got = (
                keep_best(
                    df, "grp", "score", "rid",
                    keep_id=keep_id, higher_is_better=higher,
                    strategy="agg",
                )
                .toPandas().sort_values("grp").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[["grp", "rid"]], want[["grp", "rid"]]
            )


def test_keep_best_string_id_routes_window(spark):
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    df = _kb_frame(spark, with_string_id=True)
    got = keep_best(df, "grp", "score", "rid")  # auto -> window
    assert got.count() == df.select("grp").distinct().count()
    import pytest as _pt

    with _pt.raises(ValueError, match="numeric id_col"):
        keep_best(df, "grp", "score", "rid", strategy="agg")


def test_keep_best_agg_plan_is_algebraic(spark):
    """The agg strategy must stay a map-side-combinable HashAggregate
    pair (partial + final) with no Window/Sort — the skew guarantee."""
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    df = _kb_frame(spark)
    plan = (
        keep_best(df, "grp", "score", "rid", strategy="agg")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2


# ---------------------------------------------------- source_overlap -------


def test_source_overlap_matrix_matches_truth(spark):
    """Source-level distinct-shingle overlap vs a pandas reference —
    including a source fully contained in another (containment ~1,
    jaccard low) and a disjoint one (no pair row)."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        source_overlap_matrix,
    )

    mk = lambda i, src, words: (i, src, " ".join(words))
    rows = []
    # A: two docs over words a..j ; B: copy of A's first doc (subset);
    # C: disjoint vocabulary
    rows.append(mk(0, "A", [f"w{k}" for k in range(8)]))
    rows.append(mk(1, "A", [f"w{k}" for k in range(4, 12)]))
    rows.append(mk(2, "B", [f"w{k}" for k in range(8)]))
    rows.append(mk(3, "C", [f"z{k}" for k in range(8)]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    out = source_overlap_matrix(df, "text", "source", shingle_size=3).toPandas()
    out = out.set_index(["source_a", "source_b"]).sort_index()

    def shingle_set(texts):
        s = set()
        for t in texts:
            w = t.split()
            for i in range(max(len(w) - 3, 0) + 1):
                s.add(" ".join(w[i:i + 3]))
        return s

    sa = shingle_set([rows[0][2], rows[1][2]])
    sb = shingle_set([rows[2][2]])
    common = len(sa & sb)
    got = out.loc[("A", "B")]
    assert got["common"] == common
    assert got["size_a"] == len(sa) and got["size_b"] == len(sb)
    assert abs(got["jaccard"] - common / len(sa | sb)) < 1e-12
    assert abs(got["containment_b"] - common / len(sb)) < 1e-12
    assert got["containment_b"] == 1.0  # B wholly inside A
    # C shares nothing -> no (A,C)/(B,C) rows at all
    assert ("A", "C") not in out.index and ("B", "C") not in out.index


def test_keep_best_missing_score_loses_both_directions(spark):
    """A null/NaN score must lose to ANY real score in BOTH directions —
    negating after the -inf mapping used to send missing scores to +inf
    and crown the unscored copy in every lower-is-better group."""
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    pdf = pd.DataFrame(
        {"rid": [1, 2, 3], "grp": [0, 0, 0], "score": [5.0, None, 2.0]}
    )
    df = spark.createDataFrame(pdf)
    for strategy in ("agg", "window"):
        lo = keep_best(
            df, "grp", "score", "rid",
            higher_is_better=False, strategy=strategy,
        ).collect()
        assert [r["rid"] for r in lo] == [3], strategy
        hi = keep_best(df, "grp", "score", "rid", strategy=strategy).collect()
        assert [r["rid"] for r in hi] == [1], strategy


def test_keep_best_extreme_id_ties(spark):
    """Agg-path tie-break must survive the full id domain: keep_id='min'
    uses bitwise NOT (~x, total over int64) instead of negation, which
    wraps at Long.MIN_VALUE with ANSI off and throws with ANSI on; a NaN
    float id maps to -inf so it loses ties in BOTH directions."""
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    lmin, lmax = -(2 ** 63), 2 ** 63 - 1
    df = spark.createDataFrame(
        [(lmin, 0, 5.0), (0, 0, 5.0), (lmax, 0, 5.0)],
        "rid long, grp int, score double",
    )
    for strategy in ("agg", "window"):
        got_min = keep_best(
            df, "grp", "score", "rid", keep_id="min", strategy=strategy
        ).collect()
        assert [r["rid"] for r in got_min] == [lmin], strategy
        got_max = keep_best(
            df, "grp", "score", "rid", keep_id="max", strategy=strategy
        ).collect()
        assert [r["rid"] for r in got_max] == [lmax], strategy

    fdf = spark.createDataFrame(
        pd.DataFrame({"rid": [1.0, 2.0], "grp": [0, 0], "score": [5.0, 5.0]})
    ).withColumn(
        "rid",
        F.when(F.col("rid") == 2.0, F.lit(float("nan"))).otherwise(
            F.col("rid")
        ),
    )
    # BOTH strategies must agree: NaN float ids lose ties in BOTH
    # directions (window previously let NaN WIN keep_id='max' because
    # NaN sorts above every double under id desc)
    for keep_id in ("min", "max"):
        for strategy in ("agg", "window"):
            got = keep_best(
                fdf, "grp", "score", "rid", keep_id=keep_id,
                strategy=strategy,
            ).collect()
            assert len(got) == 1 and got[0]["rid"] == 1.0, (
                keep_id, strategy,
            )


def test_keep_best_map_payload_routes_window(spark):
    """max(struct(...)) cannot order map columns: auto must route to the
    window strategy, and explicit agg must refuse loudly."""
    from monotonic_optimal_binning_spark.operators.dedup import keep_best

    df = spark.createDataFrame(
        pd.DataFrame({"rid": [1, 2], "grp": [0, 0], "score": [1.0, 2.0]})
    ).withColumn("m", F.create_map(F.lit("k"), F.col("rid")))
    got = keep_best(df, "grp", "score", "rid").collect()  # auto -> window
    assert [r["rid"] for r in got] == [2]
    with pytest.raises(ValueError, match="map-typed"):
        keep_best(df, "grp", "score", "rid", strategy="agg")


def test_minhash_dedup_keep_best_cluster_winner(spark):
    """keep_best_col survives the BEST copy per transitive near-dup
    cluster (not the min id); singleton rows survive untouched."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        minhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [base, base + " x", base + " y",
                     "entirely different content about query planners"],
            "quality": [0.2, 0.9, 0.5, 0.1],
        }
    )
    df = spark.createDataFrame(pdf)
    out = minhash_dedup(
        df, "text", "doc_id", threshold=0.8, num_hashes=64, n_bands=16,
        transitive=True, keep_best_col="quality",
    ).toPandas()
    assert sorted(out["doc_id"]) == [1, 3]  # best-quality copy + singleton
    assert set(out.columns) == {"doc_id", "text", "quality"}
    with pytest.raises(ValueError, match="transitive"):
        minhash_dedup(df, "text", "doc_id", keep_best_col="quality")


def test_bound_shingles_equal_public_shapes(spark):
    """r8 regression: the operator-internal bound shingle expression
    (_shingles — tokenization evaluated once per row) must be
    value-identical to the public unbound char_shingles/word_shingles,
    for both hash modes, including null/empty/short-text edges."""
    from monotonic_optimal_binning_spark.operators.dedup import (
        _shingles,
        word_shingles,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [None, "", "one", "one two",
                     "one two three four five", "  padded   spaces  "],
        }
    )
    df = spark.createDataFrame(pdf)
    for unit, pub in (("char", char_shingles), ("word", word_shingles)):
        for hf in ("xxhash64", "md5"):
            n = 5 if unit == "char" else 3
            diffs = df.select(
                F.sum(
                    F.when(
                        _shingles(F.col("text"), n, unit, hf).eqNullSafe(
                            pub(F.col("text"), n, hf)
                        ),
                        0,
                    ).otherwise(1)
                ).alias("d")
            ).collect()[0]["d"]
            assert diffs == 0, f"{unit}/{hf} bound != public"


def test_minhash_repeated_fresh_source_invocations(spark):
    """r8 regression for the ExtractPythonUDFs failure: a second
    minhash_lsh_candidates over a FRESH source DataFrame in the same
    session used to die with INTERNAL_ERROR 'Cannot evaluate expression:
    _fold(...)' when the signature UDF's argument carried the bound
    (lambda-variable) shingle expression. The Generate barrier in
    _banded_index must keep every invocation extractable."""
    pdf = pd.DataFrame(
        {"doc_id": range(12),
         "text": [f"alpha beta gamma delta {i}" for i in range(12)]}
    )
    counts = []
    for _ in range(2):
        out = minhash_lsh_candidates(
            spark.createDataFrame(pdf), "text", "doc_id",
            num_hashes=16, n_bands=4,
        )
        counts.append(out.count())
        from monotonic_optimal_binning_spark.operators.dedup import (
            release_lsh_caches,
        )
        release_lsh_caches(out)
    assert counts[0] == counts[1]
