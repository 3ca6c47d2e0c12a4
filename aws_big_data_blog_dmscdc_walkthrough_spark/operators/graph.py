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
) -> DataFrame:
    """Label every node with the minimum node id in its component.

    ``nodes`` must contain every vertex (isolated vertices keep their
    own id as the component); ``edges`` is undirected (symmetrized
    internally, direction and duplicates don't matter).

    Returns ``(id, component)`` — one row per node, materialized (the
    result does not depend on a persisted lineage).
    """
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
        # Neighbour b hears a's current label; min with own label.
        prop = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("component")
        )
        # localCheckpoint (not persist) each round: the round's plan
        # references `labels` twice, so without lineage TRUNCATION the
        # analyzed plan doubles per iteration — exponential analysis
        # cost and a JVM stack overflow near ~10 rounds. Checkpointing
        # resets the plan to a constant-size leaf; superseded checkpoint
        # blocks are freed by the ContextCleaner once unreferenced.
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
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
