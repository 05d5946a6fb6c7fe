"""Connected components over a pair/edge table — the transitive-closure
step a dedup pipeline needs to turn near-duplicate PAIRS into CLUSTERS.

The reference has no graph operators (it is a single-feature binning
library); this is engine-new per the training-data-pipeline requirement
(dedup clusters, not just pairs).

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14 — public literature), which
converges in O(log^2 n) rounds on any graph shape, unlike plain min-label
propagation whose round count is the graph DIAMETER (a 10^6-long chain of
near-dup shards would need 10^6 rounds). Each round is two
groupBy+join passes over the edge set keyed by node id — hash-partitioned,
map-side combinable, no driver state. Lineage is truncated with a
localCheckpoint every round (iterative DataFrame plans otherwise grow
unboundedly and overwhelm the optimizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidirect(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def _neighbor_min(e_bidir: DataFrame) -> DataFrame:
    """(u, m) where m = min(Γ(u) ∪ {u}) — one map-side-combinable agg."""
    return e_bidir.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def _large_star(e_bidir: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u)."""
    m = _neighbor_min(e_bidir)
    return (
        e_bidir.join(m, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u to m(u). Operates on
    edges oriented high->low (u >= v), per the published formulation."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = _neighbor_min(oriented)
    out = (
        oriented.join(m, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iterations: int = 25,
    out_id: str = "id",
    out_label: str = "component",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Component label (= the component's minimum id) for every node that
    appears in ``pairs``. Output: (out_id, out_label), one row per node.

    Convergence is detected with an (edge-count, hash-sum) signature — two
    scalars per round, no full edge-set comparison. ``max_iterations``
    bounds the loop (large/small-star needs O(log^2 n) rounds; 25 covers
    any realistic corpus); a non-converged exit still returns the current
    (correct-but-possibly-unmerged) labels and warns.

    Per-round lineage truncation defaults to ``localCheckpoint`` (fast,
    executor-local, NOT fault-tolerant); set ``checkpoint_dir`` to a
    reliable path (HDFS/S3) on a real cluster so an executor loss mid-run
    cannot kill the truncated lineage (plans/checkpoint.py).
    """
    import warnings

    from ..plans.checkpoint import release_checkpoint, truncate_lineage

    edges = truncate_lineage(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        checkpoint_dir,
    )
    nodes = truncate_lineage(
        edges.select(F.col("u").alias(out_id))
        .unionByName(edges.select(F.col("v").alias(out_id)))
        .distinct(),
        checkpoint_dir,
    )

    def _signature(e: DataFrame):
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    sig = _signature(edges)
    converged = False
    for _ in range(max_iterations):
        e2 = truncate_lineage(
            _small_star(_large_star(_bidirect(edges))), checkpoint_dir
        )
        new_sig = _signature(e2)
        # the signature action materialized e2, so the PREVIOUS round's
        # checkpoint blocks are dead weight — release them, or the loop
        # pins one full edge-set snapshot per round and OOMs at corpus
        # scale (sf10 evidence: 25M-edge graph x ~10 rounds killed a 4g
        # driver). The final round's blocks stay: the returned plan and
        # the label aggregation read them.
        release_checkpoint(edges)
        edges = e2
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"iterations; labels may split one true component",
            UserWarning,
        )

    # fixpoint edge set is a star u -> component-min: label = min neighbor,
    # centers (and any isolated survivors) label themselves
    labels = edges.groupBy("u").agg(F.min("v").alias("__lbl"))
    return (
        nodes.join(labels, on=nodes[out_id] == labels["u"], how="left")
        .select(
            F.col(out_id),
            F.least(F.coalesce("__lbl", F.col(out_id)), F.col(out_id)).alias(
                out_label
            ),
        )
    )


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Keep one row (the minimum id) per TRANSITIVE near-duplicate cluster.

    ``minhash_dedup``'s single propagation round removes direct partners
    only; this removes every non-minimum member of each connected
    component of the pair graph (A~B, B~C also drops C even if A!~C).
    """
    comp = connected_components(
        pairs, id_a, id_b, max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
