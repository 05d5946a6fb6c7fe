"""Sequence packing: distributed global prefix sum + concat-then-chunk
slicing, verified against a plain Python reference."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
)


def _docs(spark, n=500, seed=0, with_tokens=False):
    rng = np.random.default_rng(seed)
    n_tok = rng.integers(0, 40, n)
    pdf = pd.DataFrame({"doc_id": np.arange(n), "n_tok": n_tok})
    if with_tokens:
        pdf["tokens"] = [
            list(range(int(i * 1000), int(i * 1000 + t)))
            for i, t in zip(pdf["doc_id"], n_tok)
        ]
    return pdf


def test_global_prefix_sum_matches_cumsum_any_partitioning(spark):
    pdf = _docs(spark, 800, seed=1)
    expected = dict(
        zip(pdf["doc_id"], pdf.sort_values("doc_id")["n_tok"].cumsum())
    )
    for parts in (1, 7):
        df = spark.createDataFrame(pdf.sample(frac=1, random_state=3)).repartition(parts)
        got = global_prefix_sum(df, "n_tok", "doc_id", n_buckets=5).toPandas()
        m = dict(zip(got["doc_id"], got["prefix_sum"]))
        assert m == expected, parts


def test_pack_sequences_reference(spark):
    pdf = _docs(spark, 300, seed=2, with_tokens=True)
    budget = 64
    df = spark.createDataFrame(pdf)
    out = (
        pack_sequences(df, "n_tok", "doc_id", budget, tokens_col="tokens")
        .toPandas()
        .sort_values(["chunk_id", "chunk_offset"])
        .reset_index(drop=True)
    )

    # python reference: concatenate in doc_id order, cut every `budget`
    ordered = pdf.sort_values("doc_id")
    stream = [
        (int(d), k)
        for d, t in zip(ordered["doc_id"], ordered["n_tok"])
        for k in range(int(t))
    ]
    ref_rows = {}
    for pos, (d, k) in enumerate(stream):
        cid = pos // budget
        key = (d, cid)
        if key not in ref_rows:
            ref_rows[key] = [k, pos % budget, 0]
        ref_rows[key][2] += 1

    got_rows = {
        (int(r.doc_id), int(r.chunk_id)): [
            int(r.doc_offset), int(r.chunk_offset), int(r.n_tok_slice)
        ]
        for r in out.itertuples()
    }
    assert got_rows == ref_rows

    # token slices: doc_id*1000 + doc_offset .. + n_tok_slice
    for r in out.itertuples():
        exp = list(
            range(
                int(r.doc_id) * 1000 + int(r.doc_offset),
                int(r.doc_id) * 1000 + int(r.doc_offset) + int(r.n_tok_slice),
            )
        )
        assert list(r.tokens_slice) == exp

    # every chunk except the last is exactly `budget` tokens
    per_chunk = out.groupby("chunk_id")["n_tok_slice"].sum()
    assert (per_chunk.iloc[:-1] == budget).all()
    assert per_chunk.sum() == pdf["n_tok"].sum()
    # zero-token docs emit no slice
    assert set(out["doc_id"]) == set(pdf.loc[pdf["n_tok"] > 0, "doc_id"])


def test_pack_sequences_doc_spanning_chunks(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "n_tok": [10, 250, 5]})
    out = (
        pack_sequences(spark.createDataFrame(pdf), "n_tok", "doc_id", 100)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # doc 1 spans tokens 10..259 -> chunks 0,1,2 with slices 90/100/60
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_id"].tolist() == [0, 1, 2]
    assert d1["n_tok_slice"].tolist() == [90, 100, 60]
    assert d1["doc_offset"].tolist() == [0, 90, 190]
    assert d1["chunk_offset"].tolist() == [10, 0, 0]


def test_pack_sequences_invariants_property(spark):
    """Property-style invariants over randomized shapes: token conservation,
    full interior chunks, contiguous per-doc slices, offset consistency."""
    rng = np.random.default_rng(21)
    for trial in range(5):
        n = int(rng.integers(1, 120))
        budget = int(rng.integers(1, 50))
        n_tok = rng.integers(0, 25, n)
        pdf = pd.DataFrame({"doc_id": np.arange(n), "n_tok": n_tok})
        out = pack_sequences(
            spark.createDataFrame(pdf), "n_tok", "doc_id", budget
        ).toPandas()
        total = int(n_tok.sum())
        # token conservation
        assert out["n_tok_slice"].sum() == total, (trial, n, budget)
        if total:
            per_chunk = out.groupby("chunk_id")["n_tok_slice"].sum().sort_index()
            # chunk ids are 0..ceil(total/budget)-1, interior chunks full
            assert per_chunk.index.tolist() == list(range(-(-total // budget)))
            assert (per_chunk.iloc[:-1] == budget).all()
            # per-doc slices are contiguous from offset 0
            for doc, grp in out.sort_values("chunk_id").groupby("doc_id"):
                offs = grp["doc_offset"].tolist()
                sizes = grp["n_tok_slice"].tolist()
                assert offs[0] == 0
                for k in range(1, len(offs)):
                    assert offs[k] == offs[k - 1] + sizes[k - 1]
            # chunk_offset + slice length never exceeds the budget
            assert ((out["chunk_offset"] + out["n_tok_slice"]) <= budget).all()


# ------------------------------------------------------ chunk_documents ----


def _chunk_truth(text, max_tokens, overlap):
    toks = [t for t in text.split() if t]
    n = len(toks)
    step = max_tokens - overlap
    if n > max_tokens:
        import math
        nc = 1 + math.ceil((n - max_tokens) / step)
    else:
        nc = 1
    out = []
    for k in range(nc):
        piece = toks[k * step: k * step + max_tokens]
        out.append((k, " ".join(piece), len(piece)))
    return out


def test_chunk_documents_matches_truth(spark):
    from monotonic_optimal_binning_spark.operators.packing import (
        chunk_documents,
    )

    texts = {
        0: " ".join(f"w{i}" for i in range(13)),   # 3 chunks @ max8/ov4
        1: " ".join(f"w{i}" for i in range(10)),   # 2 chunks (no tail dup)
        2: " ".join(f"w{i}" for i in range(8)),    # exactly one window
        3: "one two",                              # short doc
        4: "",                                     # empty -> 1 empty chunk
        5: "   ",                                  # whitespace-only
        6: None,                                   # NULL behaves like empty
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = (
        chunk_documents(df, "text", "doc_id", max_tokens=8, overlap=4)
        .toPandas().sort_values(["doc_id", "chunk"]).reset_index(drop=True)
    )
    rows = []
    for d, t in texts.items():
        for k, ct, nt in _chunk_truth(t or "", 8, 4):
            rows.append((d, k, ct, nt))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk", "chunk_text", "n_tokens"])
    pd.testing.assert_frame_equal(
        got.astype({"chunk": "int64", "n_tokens": "int64"}),
        want.astype({"chunk": "int64", "n_tokens": "int64"}),
    )
    # overlap property: consecutive chunks share exactly `overlap` tokens
    c0 = got[(got.doc_id == 0) & (got.chunk == 0)].chunk_text.iloc[0].split()
    c1 = got[(got.doc_id == 0) & (got.chunk == 1)].chunk_text.iloc[0].split()
    assert c0[-4:] == c1[:4]


def test_chunk_documents_validation_and_plan(spark):
    import pytest as _pt

    from monotonic_optimal_binning_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", max_tokens=4, overlap=4)
    with _pt.raises(ValueError, match="max_tokens"):
        chunk_documents(df, "text", "doc_id", max_tokens=0)
    # zero-shuffle plan: a per-row map + Generate only
    plan = (
        chunk_documents(df, "text", "doc_id", max_tokens=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan
