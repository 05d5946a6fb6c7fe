"""Connected components (large-star/small-star) vs a Python union-find."""

import numpy as np
import pandas as pd
import pytest

from monotonic_optimal_binning_spark.operators.graph import (
    connected_components,
    dedup_by_components,
)


def _union_find_labels(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    roots = {}
    for x in range(n_nodes):
        r = find(x)
        roots.setdefault(r, []).append(x)
    label = {}
    for members in roots.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 60, 40), (1, 200, 150), (2, 50, 120)])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, n_nodes, n_edges), rng.integers(0, n_nodes, n_edges)
        )
        if a != b
    ]
    pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(spark.createDataFrame(pdf)).collect()
    }
    exp = _union_find_labels(n_nodes, edges)
    touched = {a for a, b in edges} | {b for a, b in edges}
    assert set(got) == touched
    for node in touched:
        assert got[node] == exp[node], f"node {node}"


def test_components_long_chain(spark):
    """A chain is the worst case for plain label propagation (rounds =
    diameter); star-algorithm must converge well inside max_iterations."""
    n = 300
    pdf = pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    comp = connected_components(spark.createDataFrame(pdf), max_iterations=15)
    res = comp.toPandas()
    assert (res["component"] == 0).all()
    assert len(res) == n


def test_dedup_by_components_transitive(spark):
    # A~B, B~C: transitive cluster {1,2,3} keeps only 1; {7,8} keeps 7
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 7, 8, 9], "text": list("abcdef")})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 3, 8]})
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_by_components(df, pairs, "doc_id").collect()
    )
    assert kept == [1, 7, 9]


def test_minhash_dedup_transitive(spark):
    """transitive=True keeps one survivor per single-link cluster."""
    import pandas as pd

    from monotonic_optimal_binning_spark.operators.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    # 1~2 and 2~3 are near (one-word edits of each other); 9 is unrelated
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, base.replace("lazy", "sleepy").replace("quick", "rapid")),
        (9, "completely different text with none of those words present"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    kept = sorted(
        r["doc_id"]
        for r in minhash_dedup(
            df, "text", "doc_id", threshold=0.5, num_hashes=32, n_bands=16,
            shingle_unit="word", shingle_size=2, transitive=True,
        ).collect()
    )
    assert kept == [1, 9]


def test_components_string_ids(spark):
    """Ids only need a total order — string doc ids work."""
    pdf = pd.DataFrame(
        {"id_a": ["doc-b", "doc-c", "doc-x"], "id_b": ["doc-a", "doc-b", "doc-y"]}
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(spark.createDataFrame(pdf)).collect()
    }
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }


def test_components_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable checkpoint()
    (fault-tolerant on a real cluster); labels must be identical."""
    pdf = pd.DataFrame({"id_a": [1, 2, 10, 11], "id_b": [2, 3, 11, 12]})
    edges = spark.createDataFrame(pdf)
    local = connected_components(edges).toPandas()
    reliable = connected_components(
        edges, checkpoint_dir=str(tmp_path / "ckpt")
    ).toPandas()
    m_local = dict(zip(local["id"], local["component"]))
    m_rel = dict(zip(reliable["id"], reliable["component"]))
    assert m_local == m_rel == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # the reliable run actually wrote checkpoint data
    import os

    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_connected_components_releases_round_checkpoints(spark):
    """The iteration must FREE each round's localCheckpoint blocks once
    the next round is materialized: a long chain forces many large/small-
    star rounds, and only the final edge set + the node set may stay
    pinned (sf10 evidence: one snapshot per round OOMed a 4g driver on a
    25M-edge graph)."""
    import pandas as pd

    from monotonic_optimal_binning_spark.operators.graph import (
        connected_components,
    )

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    # a 200-node path graph needs several rounds to collapse
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(200), "id_b": range(1, 201)})
    )
    out = connected_components(pairs)
    rows = out.collect()
    assert len(rows) == 201
    assert {r["component"] for r in rows} == {0}
    # final edges + nodes only — no per-round snapshot accumulation
    assert jsc.getPersistentRDDs().size() - base <= 2
