"""Distributed connected components for dedup-cluster resolution.

Near-dup detection (MinHash-LSH, SimHash, n-gram Jaccard — see
``operators/dedup.py``) emits *pairs*; turning pairs into clusters and
electing one canonical document per cluster needs connected components
over the pair graph. The reference pipeline has no graph stage — this
operator serves the LLM-training-data brief (drop all but one doc per
near-dup cluster).

Algorithm: min-label propagation. Every node starts labelled with its
own id; each round, each node adopts the minimum label among itself and
its neighbours; the fixpoint labels each node with the smallest id in
its component. Rounds are bounded by the graph diameter — near-dup
clusters are shallow (stars around a popular document, short chains), so
a handful of rounds suffices in practice; ``max_iter`` guards the
pathological chain. (The O(log n)-round large-star/small-star variant
from Kiveris et al., "Connected Components in MapReduce and Beyond",
trades per-round cost for fewer rounds; diameter-bounded propagation is
the better fit for dedup graphs and keeps every round a single
shuffle join + min-aggregate.)

Scale notes:
- Each round is one shuffled equi-join (edges x labels on the edge
  endpoint) and one min-aggregate — both partition on the node id, so
  AQE coalesces them into a stable partitioning, no driver-side state.
- Convergence is detected with a one-row scalar aggregate: labels only
  ever decrease, so the label sum is strictly monotone until the
  fixpoint. Summing as decimal(38,0) makes the check exact even with
  2^63-scale ids (no overflow aliasing). No label-diff join needed.
- The symmetric edge list is persisted once and reused every round;
  intermediate label frames are unpersisted as soon as superseded.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _track


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Label every node with the minimum node id in its component.

    ``nodes`` must contain every vertex (isolated vertices keep their
    own id as the component); ``edges`` is undirected (symmetrized
    internally, direction and duplicates don't matter).

    ``algorithm``:

      * ``"label"`` (default) — min-label propagation, O(diameter)
        rounds, one join + one min-aggregate per round. The right
        choice for dedup graphs (shallow stars/short chains).
      * ``"star"`` — large-star/small-star alternation (Kiveris et al.,
        "Connected Components in MapReduce and Beyond", public
        algorithm), O(log² n) rounds regardless of diameter. The
        insurance policy for DEEP graphs (long chains — e.g. temporal
        near-dup chains of revisions) where propagation's round count,
        not its per-round cost, is the bottleneck. Two extra shuffles
        per round, so only worth it when diameter ≫ log² n.

    Returns ``(id, component)`` — one row per node, materialized (the
    result does not depend on a persisted lineage).
    """
    if algorithm == "star":
        return _star_components(nodes, edges, id_col, src_col, dst_col, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    for _ in range(max_iter):
        # TWO propagation hops per materialized round: the per-round
        # fixed cost (checkpoint job + convergence collect — two driver
        # round-trips) dominates on shallow dedup graphs, so doubling
        # the hops halves the rounds at identical semantics (min-label
        # after 2k hops == two fixpoint-free single hops composed).
        stepped = labels
        for _hop in range(2):
            prop = (
                sym.alias("e")
                .join(stepped.alias("l"), F.col("e.a") == F.col("l.id"))
                .select(F.col("e.b").alias("id"), F.col("l.component").alias("component"))
            )
            stepped = (
                stepped.unionByName(prop)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
        # localCheckpoint (not persist) each round: the round's plan
        # references `labels` multiple times, so without lineage
        # TRUNCATION the analyzed plan doubles per iteration —
        # exponential analysis cost and a JVM stack overflow near ~10
        # rounds. Checkpointing resets the plan to a constant-size leaf;
        # superseded checkpoint blocks are freed by the ContextCleaner
        # once unreferenced.
        labels = stepped.localCheckpoint(eager=True)
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixpoint
            break
        prev_sum = cur_sum
    sym.unpersist()
    # The fixpoint frame is checkpoint-backed (materialized, constant
    # plan); hand it to the dedup cache tracker anyway so callers share
    # one release discipline with the pair operators.
    return _track(labels)


def _star_round(sym: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star transformation over an undirected edge
    frame ``(a, b)``. Γ⁺(v) = neighbors(v) ∪ {v}; m(v) = min Γ⁺(v).
    Large-star connects strictly larger neighbors to m(v); small-star
    connects not-larger neighbors (and v itself) to m(v). Both preserve
    connectivity (m(v) ∈ Γ⁺(v), so no edge ever crosses components) and
    monotonically pull nodes toward the component minimum."""
    both = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    with_self = both.unionByName(
        both.select("a").distinct().select("a", F.col("a").alias("b"))
    )
    m = with_self.groupBy("a").agg(F.min("b").alias("_m"))
    nbrs = with_self.join(m, "a")
    cmp_col = F.col("b") > F.col("a") if large else F.col("b") <= F.col("a")
    emitted = nbrs.where(cmp_col).select(F.col("b").alias("a"), F.col("_m").alias("b"))
    kept = m.select("a", F.col("_m").alias("b"))
    return emitted.unionByName(kept).where(F.col("a") != F.col("b")).distinct()


def _star_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int,
) -> DataFrame:
    sym = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iter):
        # one alternation = large-star then small-star; localCheckpoint
        # truncates the per-round plan growth exactly as in the label
        # variant (lineage doubles per iteration otherwise)
        sym = _star_round(_star_round(sym, large=True), large=False).localCheckpoint(
            eager=True
        )
        # fixpoint signature: edge count + exact decimal sum of endpoints
        # (monotone toward the star fixpoint; equal signature twice in a
        # row means both transforms are now identities)
        sig_row = sym.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("a").cast("decimal(38,0)")).alias("sa"),
            F.sum(F.col("b").cast("decimal(38,0)")).alias("sb"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["sa"], sig_row["sb"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # fixpoint: every edge is (member, component-min). Isolated nodes
    # (no edges) keep their own id.
    centers = sym.groupBy("a").agg(F.min("b").alias("_c"))
    out = (
        nodes.select(F.col(id_col).alias("id"))
        .join(centers, F.col("id") == F.col("a"), "left")
        .select("id", F.coalesce(F.col("_c"), F.col("id")).alias("component"))
        .localCheckpoint(eager=True)
    )
    return _track(out)


def cluster_members(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components plus per-cluster size.

    Returns ``(id, cluster_id, cluster_size)``; ``cluster_id`` is the
    minimum member id — the canonical survivor for keep-one-per-cluster
    dedup (``id == cluster_id`` selects survivors).
    """
    comp = connected_components(nodes, edges, id_col, src_col, dst_col, max_iter)
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("id"), F.col("component").alias("cluster_id")
    ).withColumn("cluster_size", F.count(F.lit(1)).over(w))
