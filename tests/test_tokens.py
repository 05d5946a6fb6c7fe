"""Token-table source: determinism, partition invariance, and the per-row
token-array equality invariant through pipeline operators (input_hint)."""

import numpy as np
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.asof import asof_join
from monotonic_optimal_binning_spark.sources.synthetic import (
    event_table,
    token_table,
    tokenize_text,
)


def test_schema_matches_input_hint(spark):
    df = token_table(spark, 100)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }


def test_deterministic_across_parallelism(spark):
    a = token_table(spark, 500, seed=42, partitions=2).orderBy("doc_id").collect()
    b = token_table(spark, 500, seed=42, partitions=16).orderBy("doc_id").collect()
    assert a == b


def test_n_tok_consistent_with_tokens(spark):
    rows = token_table(spark, 300).collect()
    for r in rows:
        assert r["n_tok"] == len(r["tokens"])
        assert all(0 <= t < 50_000 for t in r["tokens"][:5])


def test_token_array_equality_through_pipeline(spark):
    """input_hint invariant: token arrays are byte-identical per doc_id after
    shuffle + as-of join + repartition."""
    docs = token_table(spark, 400, seed=1)
    events = event_table(spark, 400, events_per_doc=2, seed=1)
    baseline = {r["doc_id"]: r["tokens"] for r in docs.collect()}

    joined = asof_join(
        docs.withColumn("ts", F.lit(1_700_100_000.0)),
        events,
        on="doc_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
    ).repartition(13, "source")
    out = {r["doc_id"]: r["tokens"] for r in joined.collect()}
    assert set(out) == set(baseline)
    for k in baseline:
        assert out[k] == baseline[k], f"token array mutated for {k}"


def test_sources_distribution(spark):
    counts = dict(
        token_table(spark, 2000).groupBy("source").count().collect()
    )
    assert set(counts) == {"web", "books", "code", "wiki", "forums"}
    assert min(counts.values()) > 200  # roughly uniform


def test_tokenize_text_matches_hint_schema(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = tokenize_text(docs, "text", doc_id_col="doc_id", source_col="source")
    schema = {f.name: f.dataType.simpleString() for f in tok.schema.fields}
    assert schema == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }
    rows = tok.limit(20).collect()
    for r in rows:
        assert r["n_tok"] == len(r["tokens"])
    # deterministic: same input -> same tokens
    again = {r["doc_id"]: r["tokens"] for r in tok.limit(20).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["tokens"]


def test_event_table_label_rate_signal(spark):
    ev = event_table(spark, 2000, events_per_doc=1)
    agg = ev.agg(F.avg("label"), F.corr("value", F.col("label").cast("double"))).first()
    assert 0.05 < agg[0] < 0.95
    assert agg[1] > 0.1  # labels correlate with value -> binnable signal
