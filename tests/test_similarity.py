"""Similarity search vs numpy brute-force oracle on real embeddings."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monotonic_optimal_binning_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_smoke_dir):
    df = spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
    pdf = df.toPandas()
    return df, pdf


def numpy_topk(pdf, query_ids, k):
    M = np.stack(pdf["embedding"].to_numpy())
    norms = np.linalg.norm(M, axis=1)
    ids = pdf["vec_id"].to_numpy()
    out = {}
    for qid in query_ids:
        qi = np.where(ids == qid)[0][0]
        cos = (M @ M[qi]) / (norms * norms[qi])
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [(i, c) for c, i in order[:k]]
    return out


def test_brute_force_matches_numpy(emb, spark):
    df, pdf = emb
    query_ids = pdf["vec_id"].head(5).tolist()
    queries = df.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = brute_force_topk(df, queries, k=5).toPandas()
    oracle = numpy_topk(pdf, query_ids, 5)
    for qid in query_ids:
        got = res[res["query_id"] == qid].sort_values("rank")
        exp = oracle[qid]
        assert got["neighbor_id"].tolist() == [i for i, _ in exp]
        np.testing.assert_allclose(
            got["cosine"].to_numpy(), [c for _, c in exp], rtol=1e-5
        )


def test_lsh_topk_reasonable_recall(emb, spark):
    df, pdf = emb
    dim = len(pdf["embedding"].iloc[0])
    query_ids = pdf["vec_id"].head(10).tolist()
    queries = df.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = lsh_topk(
        df, queries, k=5, dim=dim, n_planes=16, n_bands=8
    ).toPandas()
    oracle = numpy_topk(pdf, query_ids, 5)
    hits = total = 0
    for qid in query_ids:
        got = set(res[res["query_id"] == qid]["neighbor_id"])
        exp = {i for i, _ in oracle[qid]}
        hits += len(got & exp)
        total += len(exp)
    assert hits / total >= 0.4, f"LSH recall too low: {hits}/{total}"
    # and every returned cosine must be exact (verified re-scoring)
    for _, row in res.head(20).iterrows():
        a = np.array(pdf.loc[pdf["vec_id"] == row["query_id"], "embedding"].iloc[0])
        b = np.array(pdf.loc[pdf["vec_id"] == row["neighbor_id"], "embedding"].iloc[0])
        expected = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert row["cosine"] == pytest.approx(expected, rel=1e-5)


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """Probing every cell degenerates IVF to an exact scan — results must
    equal brute_force_topk exactly."""
    from monotonic_optimal_binning_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((80, 12))
    pdf = pd.DataFrame(
        {"vec_id": range(80), "embedding": [v.tolist() for v in vecs]}
    )
    corpus = spark.createDataFrame(pdf)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=4).select(
        "query_id", "neighbor_id", "rank"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    ivf = ivf_topk(
        corpus, queries, k=4, n_cells=6, n_probe=6, seed=1
    ).select("query_id", "neighbor_id", "rank").toPandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(ivf, exact, check_dtype=False)


def test_ivf_codebook_round_trip_and_loaded_query(spark, tmp_path):
    """fit once / reuse: a save_json -> load_json codebook must route a
    later ivf_topk call to EXACTLY the fit-fresh result (JSON floats
    round-trip exactly in Python), with no KMeans fit on the query path."""
    from monotonic_optimal_binning_spark.operators.similarity import (
        IVFCodebook,
        fit_ivf_codebook,
        ivf_topk,
    )

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((90, 8))
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(90), "embedding": [v.tolist() for v in vecs]})
    )
    queries = corpus.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    cb = fit_ivf_codebook(corpus, n_cells=5, seed=9)
    assert cb.n_cells == 5 and cb.dim == 8
    path = str(tmp_path / "codebook.json")
    cb.save_json(path)
    loaded = IVFCodebook.load_json(path)
    assert loaded.centroids == cb.centroids  # exact float round-trip
    assert loaded.seed == 9

    fresh = ivf_topk(
        corpus, queries, k=4, n_cells=5, n_probe=2, seed=9
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    served = ivf_topk(
        corpus, queries, k=4, n_probe=2, codebook=loaded
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(served, fresh)


def test_ivf_topk_recall_on_clustered_data(spark):
    """On well-separated clusters, probing 1 cell already finds the true
    neighbors (they share the query's cluster)."""
    from monotonic_optimal_binning_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 10)) * 20
    rows = []
    for i in range(120):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(0, 0.2, 10)).tolist()))
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=5).toPandas()
    approx = ivf_topk(corpus, queries, k=5, n_cells=4, n_probe=1, seed=3).toPandas()
    hits = 0
    for qid in range(4):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 0.9 * 4 * 5  # >=90% recall with 1-cell probes


def test_nearest_cells_udf_matches_numpy_at_1024_cells(spark):
    """Query routing must scale in n_cells: the broadcast-matmul UDF plans
    flat (no n_cells x dim literal expression tree) and must reproduce the
    brute-force nearest-centroid ordering, ties to the lower cell index."""
    from monotonic_optimal_binning_spark.operators.similarity import (
        nearest_cells_udf,
    )

    rng = np.random.default_rng(3)
    n_cells, dim, n_probe, n_q = 1024, 32, 4, 64
    cents = rng.standard_normal((n_cells, dim))
    qs = rng.standard_normal((n_q, dim))
    pdf = pd.DataFrame({"qid": range(n_q), "v": list(map(list, qs))})
    df = spark.createDataFrame(pdf).select(
        "qid", F.col("v").cast("array<double>").alias("v")
    )
    route = nearest_cells_udf(spark, cents, n_probe)
    got = {
        r["qid"]: list(r["cells"])
        for r in df.select("qid", route(F.col("v")).alias("cells")).collect()
    }
    d = ((qs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    exp = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
    for i in range(n_q):
        assert got[i] == exp[i].tolist(), i


def test_ivf_topk_large_cell_count_smoke(spark):
    """ivf_topk must plan and run at a cell count that would have broken
    the literal-expression router (smoke: n_cells=64 on 600 vectors)."""
    from monotonic_optimal_binning_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((600, 16)).round(3)
    pdf = pd.DataFrame({"vec_id": range(600), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(df, q, k=3, n_cells=64, n_probe=64)
    res = out.toPandas()
    assert len(res) == 15
    assert res.groupby("query_id")["rank"].max().eq(3).all()


def test_ivf_topk_tolerates_null_vectors(spark):
    from monotonic_optimal_binning_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(9)
    vecs = [list(map(float, rng.standard_normal(8))) for _ in range(100)]
    pdf = pd.DataFrame({"vec_id": range(102),
                        "embedding": vecs + [None, None]})
    df = spark.createDataFrame(pdf)
    q = df.filter(F.col("vec_id").isin([0, 100])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(df, q, k=3, n_cells=4, n_probe=4).toPandas()
    # null query produces no rows; null corpus vectors never appear
    assert set(out["query_id"]) == {0}
    assert len(out) == 3


def test_ivf_topk_production_cell_count_smoke(spark):
    """n_cells=1024 (production-scale coarse quantizer): routing is a
    broadcast centroid matmul per Arrow batch — flat in n_cells — so a
    big codebook must just work and still return exact-format results.
    KMeans caps at the distinct-vector count, so feed > 1024 corpus rows."""
    import time

    from monotonic_optimal_binning_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(17)
    n, dim = 3000, 16
    vecs = rng.normal(size=(n, dim)).astype("float32")
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [v.tolist() for v in vecs]}
    )
    corpus = spark.createDataFrame(pdf)
    queries = spark.createDataFrame(
        pdf.head(5).rename(columns={"vec_id": "query_id"})
    )
    t0 = time.time()
    out = ivf_topk(
        corpus, queries, k=3, n_cells=1024, n_probe=8,
        train_fraction=0.5,
    ).toPandas()
    wall = time.time() - t0
    # 5 queries x 3 ranks (self-pairs are excluded by the operator)
    assert len(out) == 15
    assert sorted(out["rank"].tolist()) == sorted([1, 2, 3] * 5)
    assert (out["neighbor_id"] != out["query_id"]).all()
    assert out["cosine"].between(-1.0 - 1e-9, 1.0 + 1e-9).all()
    # ranks are ordered by descending cosine within each query
    for _, g in out.groupby("query_id"):
        cs = g.sort_values("rank")["cosine"].to_numpy()
        assert (np.diff(cs) <= 1e-12).all()
    # flat-in-n_cells routing: generous bound that still catches a return
    # to the literal-expression-tree formulation (which grew superlinearly
    # and took minutes at this codebook size)
    assert wall < 120, wall


def test_quantize_embeddings_roundtrip_and_parity(spark):
    """int8 quantization: exact parity with the numpy re-derivation of
    the explicit floor(v/scale + 0.5) formula, reconstruction bounded by
    scale/2, zero-vector and null-vector edges."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from monotonic_optimal_binning_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rng = np.random.default_rng(7)
    vecs = [rng.normal(0, 1, 8).astype(np.float32).tolist() for _ in range(20)]
    vecs.append([0.0] * 8)          # zero vector -> scale 0, all-zero ints
    vecs.append(None)               # null vector passes through
    vecs.append([])                 # empty vector -> NULL scale/vec
    vecs.append([1.0, float("nan")])   # NaN poisons max|v| -> NULL
    # (via Arrow ingestion the NaN above actually arrives as a NULL
    # element — also degenerate by contract)
    vecs.append([1.0, float("inf")])   # inf poisons max|v| -> NULL
    vecs.append([1.0, None])           # explicit null element -> NULL
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    out = quantize_embeddings(df).orderBy("vec_id")
    rows = out.collect()
    for r in rows:
        v = pdf.loc[pdf["vec_id"] == r["vec_id"], "embedding"].iloc[0]
        degenerate = (
            v is None
            or len(v) == 0
            or any(x is None for x in v)
            or not np.isfinite(
                np.asarray(
                    [0.0 if x is None else x for x in v], dtype=np.float64
                )
            ).all()
        )
        if degenerate:
            assert r["q_scale"] is None and r["q_vec"] is None
            continue
        v64 = np.asarray(v, dtype=np.float32).astype(np.float64)
        scale = np.abs(v64).max() / 127.0
        assert r["q_scale"] == pytest.approx(scale, rel=0, abs=0)
        if scale == 0:
            assert r["q_vec"] == [0] * len(v)
            continue
        expect = np.floor(v64 / scale + 0.5).astype(np.int64)
        assert list(r["q_vec"]) == expect.tolist()
        assert max(abs(q) for q in r["q_vec"]) <= 127
        # reconstruction error bound
        err = np.abs(expect * scale - v64).max()
        assert err <= scale / 2 + 1e-12

    deq = dequantize_embeddings(out).filter(F.col("q_scale").isNotNull())
    got = {r["vec_id"]: r["embedding_hat"] for r in deq.collect()}
    for vid, vh in got.items():
        v = pdf.loc[pdf["vec_id"] == vid, "embedding"].iloc[0]
        v64 = np.asarray(v, dtype=np.float32).astype(np.float64)
        scale = np.abs(v64).max() / 127.0
        np.testing.assert_allclose(
            np.asarray(vh), v64, atol=scale / 2 + 1e-12
        )

    # plan: pure codegen — no python UDF, no exchange; exactly one
    # Generate barrier materializing the per-vector scale
    qplan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in qplan and "ArrowEvalPython" not in qplan
    assert "Exchange" not in qplan
    assert qplan.count("Generate") == 1
