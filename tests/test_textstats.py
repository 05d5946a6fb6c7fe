"""Text-analysis operators on the real documents table."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.textstats import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")


def test_token_count_matches_python(docs):
    res = docs.select("doc_id", "text", token_count(F.col("text")).alias("n")).collect()
    for r in res[:100]:
        assert r["n"] == len(r["text"].split()), r["text"][:50]


def test_quality_features_ranges(docs):
    q = quality_features(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "punct_ratio",
        "digit_ratio", "stopword_ratio", "quality_score",
    )
    pdf = q.toPandas()
    for c in ("punct_ratio", "digit_ratio", "stopword_ratio", "quality_score"):
        assert (pdf[c] >= 0).all() and (pdf[c] <= 1.0 + 1e-9).all(), c
    # n_chars matches the table's own n_chars column
    joined = quality_features(docs).select("n_chars", "n_chars_calc").toPandas()
    assert (joined["n_chars"] == joined["n_chars_calc"]).all()


def test_language_id_on_crafted_sentences(spark):
    """The testdata documents all share an English-ish synthetic vocabulary
    (lang column is independent of text), so accuracy is checked on real
    sentences per language instead."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "lang": ["en", "de", "fr", "es", "und"],
            "text": [
                "the cat sat on the mat and it was happy for a while",
                "der hund und die katze sind nicht mit den kindern",
                "le chat est dans la maison et les oiseaux sont pour",
                "el perro y la casa de los gatos en una ciudad con luz",
                "zzz qqq xxx www",
            ],
        }
    )
    res = language_id(spark.createDataFrame(pdf)).orderBy("lang").collect()
    got = {r["lang"]: r["lang_pred"] for r in res}
    assert got == {"en": "en", "de": "de", "fr": "fr", "es": "es", "und": "und"}


def test_language_id_runs_on_documents(docs):
    preds = language_id(docs).groupBy("lang_pred").count().collect()
    assert all(r["lang_pred"] in {"en", "de", "fr", "es", "und"} for r in preds)


def test_fingerprint_stable_under_formatting(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "Hello,   World! This is a TEST.",
                "hello world this is a test",
                "something else entirely",
            ],
        }
    )
    res = fingerprint(spark.createDataFrame(pdf)).orderBy("doc_id").collect()
    assert res[0]["fingerprint"] == res[1]["fingerprint"]
    assert res[0]["fingerprint"] != res[2]["fingerprint"]


def test_bpe_ish_token_count(spark):
    import pandas as pd

    pdf = pd.DataFrame({"text_input": ["hello world!", "a,b", "internationalization"]})
    res = (
        spark.createDataFrame(pdf)
        .select(bpe_ish_token_count("text_input").alias("n"))
        .collect()
    )
    # hello(2: hell+o) world(2: worl+d) !(1) = 5 ; a(1) ,(1) b(1) = 3 ;
    # internationalization = 20 chars -> 5 pieces
    assert [r["n"] for r in res] == [5, 3, 5]


def test_tf_idf(spark):
    import math

    import pandas as pd

    from monotonic_optimal_binning_spark.operators.textstats import tf_idf

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "apple banana apple",
                "banana cherry",
                "cherry cherry Cherry",
            ],
        }
    )
    res = {
        (r["doc_id"], r["term"]): r
        for r in tf_idf(spark.createDataFrame(pdf)).collect()
    }
    # tf counts (lowercased)
    assert res[(1, "apple")]["tf"] == 2
    assert res[(3, "cherry")]["tf"] == 3
    # document frequencies
    assert res[(1, "apple")]["df"] == 1
    assert res[(1, "banana")]["df"] == 2
    assert res[(2, "cherry")]["df"] == 2
    # tfidf = tf * ln(N/df), N=3
    assert abs(res[(1, "apple")]["tfidf"] - 2 * math.log(3 / 1)) < 1e-12
    assert abs(res[(3, "cherry")]["tfidf"] - 3 * math.log(3 / 2)) < 1e-12
    # a term present in every doc scores 0
    pdf2 = pd.DataFrame({"doc_id": [1, 2], "text": ["x y", "x z"]})
    res2 = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tf_idf(spark.createDataFrame(pdf2)).collect()
    }
    assert res2[(1, "x")] == 0.0 and res2[(2, "x")] == 0.0


def test_repetition_features_reference(spark):
    from monotonic_optimal_binning_spark.operators.textstats import (
        repetition_features,
    )

    docs = [
        (1, "a line\nanother\na line\nunique one\na line"),   # 'a line' x3
        (2, "x\ny\nz"),                                       # no repeats
        (3, "only the the the words the"),                     # top token 'the' x4
        (4, ""),                                              # empty
        (5, None),                                            # null text
        (6, "dup\ndup\nother\nother\nsingle"),                # two pairs
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_features(df).collect()
    }
    # doc 1: 5 lines, 3 dups ('a line'), dup chars = 3*6 of total 6+7+6+10+6
    assert got[1]["n_lines"] == 5
    assert got[1]["dup_line_frac"] == pytest.approx(3 / 5)
    assert got[1]["dup_line_char_frac"] == pytest.approx(18 / 35)
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_char_frac"] == 0.0
    # doc 3: 6 tokens, 'the' x4 (lowercased)
    assert got[3]["top_token_frac"] == pytest.approx(4 / 6)
    for d in (4, 5):
        assert got[d]["n_lines"] == 0
        assert got[d]["dup_line_frac"] == 0.0
        assert got[d]["top_token_frac"] == 0.0
    assert got[6]["dup_line_frac"] == pytest.approx(4 / 5)


def test_pii_scrub_counts_and_replacement(spark):
    from monotonic_optimal_binning_spark.operators.textstats import pii_scrub

    docs = [
        (1, "mail me at john.doe+x@exa-mple.org or jane@sub.example.co today"),
        (2, "server at 10.0.255.3 and card 4111 1111 1111 1111 expired"),
        (3, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 0
    assert "<EMAIL>" in got[1]["text_scrubbed"]
    assert "@" not in got[1]["text_scrubbed"]
    assert got[2]["n_ipv4"] == 1 and got[2]["n_digit_run"] == 1
    assert "<IP>" in got[2]["text_scrubbed"]
    assert "<NUM>" in got[2]["text_scrubbed"]
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_digit_run"] == 0
    assert got[3]["text_scrubbed"] == docs[2][1]


def test_token_topk_exact_and_plan(spark):
    import re

    import pandas as pd

    from monotonic_optimal_binning_spark.operators.textstats import (
        token_topk,
    )

    pdf = pd.DataFrame(
        {
            "src": ["a", "a", "b", "b"],
            "text": [
                "the cat sat on the mat",
                "The   dog\tand the cat",
                "spark spark spark rdd",
                None,
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    top = token_topk(df, "text", k=3).toPandas()
    assert [tuple(r) for r in top.itertuples(index=False)] == [
        ("the", 4), ("spark", 3), ("cat", 2)
    ]

    grouped = token_topk(df, "text", k=2, group_col="src").toPandas()
    a = grouped[grouped["src"] == "a"]
    assert [tuple(r) for r in a[["token", "n", "rank"]].itertuples(index=False)] == [
        ("the", 4, 1), ("cat", 2, 2)
    ]
    b = grouped[grouped["src"] == "b"]
    assert b.iloc[0]["token"] == "spark"

    # plan: global top-k is TakeOrdered (no full sort shuffle); counts
    # aggregate has a map-side partial
    out = token_topk(df, "text", k=3)
    jqe = out._jdf.queryExecution()
    plan = out.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    g = token_topk(df, "text", k=2, group_col="src")
    jqe = g._jdf.queryExecution()
    gplan = g.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "simple")
    assert "WindowGroupLimit" in gplan, gplan


def test_token_distribution_drift_matches_truth(spark):
    """Per-token JS contributions + __rest__ mass vs a pure-python
    reference; contributions sum to the exact coarsened JS divergence."""
    import math

    from monotonic_optimal_binning_spark.operators.textstats import (
        token_distribution_drift,
    )

    a_texts = ["the cat sat", "the cat ran", "a dog ran far away today"]
    b_texts = ["the dog sat", "the dog sat again", "a cat naps"]
    df_a = spark.createDataFrame(pd.DataFrame({"text": a_texts}))
    df_b = spark.createDataFrame(pd.DataFrame({"text": b_texts}))
    got = (
        token_distribution_drift(df_a, df_b, top_k=4)
        .toPandas().set_index("token")
    )

    def counts(ts):
        c = {}
        for t in ts:
            for w in t.lower().split():
                c[w] = c.get(w, 0) + 1
        return c

    ca, cb = counts(a_texts), counts(b_texts)
    ta, tb = sum(ca.values()), sum(cb.values())
    vocab = sorted(set(ca) | set(cb),
                   key=lambda w: (-(ca.get(w, 0) + cb.get(w, 0)), w))
    sel = vocab[:4]
    rows = {w: (ca.get(w, 0), cb.get(w, 0)) for w in sel}
    rows["__rest__"] = (
        ta - sum(ca.get(w, 0) for w in sel),
        tb - sum(cb.get(w, 0) for w in sel),
    )
    js_total = 0.0
    for w, (na, nb) in rows.items():
        p, q = na / ta, nb / tb
        m = (p + q) / 2
        c = 0.5 * ((p * math.log(p / m) if na else 0.0)
                   + (q * math.log(q / m) if nb else 0.0))
        js_total += c
        assert got.loc[w, "n_a"] == na and got.loc[w, "n_b"] == nb, w
        assert abs(got.loc[w, "js_contrib"] - c) < 1e-12, w
    assert abs(got["js_contrib"].sum() - js_total) < 1e-12
    assert len(got) == 5
    assert got.loc["__rest__", "is_rest"] and not got.drop("__rest__")["is_rest"].any()
    # identical corpora -> zero divergence everywhere
    same = token_distribution_drift(df_a, df_a, top_k=4).toPandas()
    assert (same["js_contrib"].abs() < 1e-15).all()
