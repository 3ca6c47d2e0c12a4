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
- Propagation runs over the ACTIVE node set only (edge endpoints) —
  isolated nodes can never change label, so the loop's cost is
  proportional to the sparse near-dup graph, not the corpus; the full
  node set is touched exactly once (the final re-attach left join).
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
    local_solve_edges: int = 250_000,
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

    ``local_solve_edges``: when the symmetrized edge list has at most
    this many rows (known from one count over the persisted frame), CC
    is solved with a driver-side union-find instead of iterated
    distributed rounds — the classic two-phase shape (distributed only
    while the graph exceeds driver capacity). Each distributed round
    costs several fixed-overhead jobs regardless of data volume, so a
    sparse dedup graph (thousands of edges under a billion-doc corpus)
    pays seconds of scheduler time for microseconds of work. The
    250k-edge default keeps the driver's REAL cost honest — the Arrow
    transfer is MBs, but the Python union-find walks up to 2·edges
    dict entries and ships the result back, ~1-2 s at the ceiling.
    Set to ``0`` to force the fully distributed path.

    Returns ``(id, component)`` — one row per node.
    """
    if algorithm == "star":
        return _star_components(nodes, edges, id_col, src_col, dst_col, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # Local-solve probe in ONE job: union-find needs neither the
    # symmetrized nor the deduplicated edge list (union(a,b) is
    # symmetric and re-unions are no-ops), so probe the RAW directed
    # edges with limit(cap+1) — if at most cap rows come back, that IS
    # the complete edge list and the driver solves it outright. The old
    # path paid a distinct shuffle over 2x the rows plus a persist +
    # count + separate toPandas (three jobs) before the same
    # union-find. Raw-edge count ≥ distinct-symmetrized count, so the
    # gate is conservative: a frame that passes here is never larger
    # than the old bound; one that fails falls through to the exact
    # distinct + count gate below (big graphs pay one cheap extra
    # limit job, small graphs save two jobs and an exchange).
    raw = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).where(
        F.col("a") != F.col("b")
    )
    probe = (
        raw.limit(local_solve_edges + 1).toPandas()
        if local_solve_edges > 0
        else None
    )
    if probe is not None and len(probe) <= local_solve_edges:
        # driver-solved labels are BOUNDED by local_solve_edges (the
        # rows already live on the driver), so the broadcast hint is
        # safe — and necessary: a createDataFrame frame carries no
        # stats, so the planner would otherwise sort-merge the
        # re-attach join against the full node set.
        labels = F.broadcast(
            _local_union_find_pdf(nodes.sparkSession, probe, raw.schema["a"].dataType)
        )
    else:
        sym = (
            raw.unionByName(
                edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")).where(
                    F.col("a") != F.col("b")
                )
            )
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_edges = sym.count()  # also materializes the persist
        if n_edges <= local_solve_edges:
            # raw edges overflowed the probe but the deduplicated
            # symmetric list fits (heavily duplicated pair input)
            labels = F.broadcast(_local_union_find(nodes.sparkSession, sym))
        else:
            # distributed fixpoint: no hint — AQE sees the materialized
            # size at runtime and picks broadcast vs shuffle, so a
            # pathological all-duplicates corpus can't OOM the driver.
            labels = _propagate_labels(sym, max_iter)
        sym.unpersist()
    # Re-attach isolated nodes (they are their own component); the
    # label side covers edge endpoints only, small relative to `nodes`.
    out = (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels.withColumnRenamed("component", "_cc"), "id", "left")
        .select("id", F.coalesce(F.col("_cc"), F.col("id")).alias("component"))
    )
    # Hand the result to the dedup cache tracker so callers share one
    # release discipline with the pair operators.
    return _track(out)


def _local_union_find(spark, sym: DataFrame) -> DataFrame:
    """Solve CC for a driver-sized symmetric edge frame ``(a, b)`` with
    an in-memory union-find; returns ``(id, component)`` for ACTIVE
    nodes only (edge endpoints), component = min member id — identical
    semantics to the distributed fixpoint."""
    # Arrow transfer (toPandas), not collect(): Row objects cost
    # ~150-200 bytes each; columnar arrays move the bounded edge list
    # at memcpy speed in both directions
    return _local_union_find_pdf(spark, sym.toPandas(), sym.schema["a"].dataType)


def _local_union_find_pdf(spark, pdf, id_type) -> DataFrame:
    """Union-find over an already-collected pandas edge list ``(a, b)``.
    Neither symmetrization nor deduplication is required: union is
    symmetric and repeated unions are no-ops, so raw directed edges
    produce the identical labeling."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    import pandas as pd

    out = pd.DataFrame(
        {"id": list(parent.keys()), "component": [find(n) for n in parent]}
    )
    schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    return spark.createDataFrame(out, schema)


def _propagate_labels(sym: DataFrame, max_iter: int) -> DataFrame:
    """Distributed min-label propagation over a persisted symmetric
    edge frame; returns the fixpoint ``(id, component)`` for active
    nodes (edge endpoints) only."""
    # Propagate over ACTIVE nodes only (edge endpoints): an isolated
    # node's label can never change, so shuffling the full node set each
    # hop — the dominant cost when the corpus is large and the dedup
    # graph sparse (the 100 TB shape: billions of docs, a few percent in
    # near-dup pairs) — buys nothing. Isolated nodes are re-attached
    # with one left join after the fixpoint. `sym` carries both edge
    # directions, so its `a` column alone covers every endpoint.
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    converged = False
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
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Diameter exceeded the propagation budget (long chains — e.g. a
        # near-critical random graph). Returning the partial labels
        # would be SILENTLY WRONG (measured: 148k-node "largest
        # component" vs the true 1.56M on a 5M-node/3M-edge graph), so
        # finish exactly: CONTRACT the graph by the current labels —
        # every ≤2·max_iter-hop neighborhood has already collapsed to
        # one super-node, shrinking long chains ~50× — and run the
        # large-star/small-star fixpoint (O(log² n) rounds regardless
        # of diameter) on the residual, then compose the mappings.
        residual = (
            sym.alias("e")
            .join(labels.alias("x"), F.col("e.a") == F.col("x.id"))
            .join(labels.alias("y"), F.col("e.b") == F.col("y.id"))
            .select(
                F.col("x.component").alias("src"), F.col("y.component").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        super_nodes = labels.select(F.col("component").alias("id")).distinct()
        star = _star_components(
            super_nodes, residual, "id", "src", "dst", max(max_iter, 30)
        ).withColumnRenamed("component", "_fc")
        labels = (
            labels.alias("l")
            .join(star.alias("s"), F.col("l.component") == F.col("s.id"))
            .select(F.col("l.id").alias("id"), F.col("_fc").alias("component"))
            .localCheckpoint(eager=True)
        )
    return labels


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
    prev_sym = None
    converged = False
    for _ in range(max_iter):
        # one alternation = large-star then small-star; localCheckpoint
        # truncates the per-round plan growth exactly as in the label
        # variant (lineage doubles per iteration otherwise)
        sym = _star_round(_star_round(sym, large=True), large=False).localCheckpoint(
            eager=True
        )
        # fixpoint signature: edge count + exact decimal sum of endpoints.
        # The signature is a cheap PRE-FILTER only — two distinct edge
        # states can alias to the same (n, sa, sb), so an equal signature
        # is confirmed with an exact set compare (both frames are small
        # checkpointed edge lists) before declaring the fixpoint.
        sig_row = sym.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("a").cast("decimal(38,0)")).alias("sa"),
            F.sum(F.col("b").cast("decimal(38,0)")).alias("sb"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["sa"], sig_row["sb"])
        if (
            sig == prev_sig
            and prev_sym is not None
            and sym.exceptAll(prev_sym).limit(1).count() == 0
        ):
            converged = True
            break
        prev_sig = sig
        prev_sym = sym
    if not converged:
        # wrong labels must never come back silently; star needs
        # O(log² n) alternations, so this only means max_iter is far
        # too low for the graph — say so
        raise RuntimeError(
            f"connected components did not converge in {max_iter} "
            "large/small-star alternations; raise max_iter"
        )
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


def keep_best(
    clusters: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Elect one survivor per near-dup cluster: the HIGHEST-``score_col``
    member, ties broken by smallest ``id_col`` (deterministic).

    Operates on a PRECOMPUTED cluster frame (``cluster_members`` output,
    or anything with ``id_col`` + ``cluster_col``) joined to a
    ``(id_col, score_col)`` frame — so a curation run computes connected
    components once and applies any survivor policy over the result,
    instead of re-deriving the edge+CC pipeline per policy.

    Returns the surviving rows only, with all of ``clusters``' columns
    plus ``score_col``. One shuffle join + one window; both partition on
    the cluster key, so AQE reuses the exchange.

    The join is LEFT and the ordering is nulls-last: a cluster member
    missing from ``scored`` (e.g. quality scoring filtered it out) must
    not silently vanish before ranking — an inner join would both drop
    potential survivors and delete fully-unscored clusters outright.
    Unscored members lose to any scored member; a fully-unscored
    cluster still elects its smallest id (with a NULL score).
    """
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc_nulls_last(score_col), F.asc(id_col)
    )
    return (
        clusters.join(scored, id_col, "left")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


# ----------------------------- weighted PageRank (fixed-round) (#155)

# At or below this many RAW edge rows (probed with one limit job, the
# connected-components local-solve pattern), the whole power iteration
# runs on the driver in numpy instead of 5 distributed rounds. Each
# distributed round costs a broadcast build + a node-keyed exchange + an
# eager localCheckpoint job REGARDLESS of data volume — ~10 fixed-
# overhead jobs for microseconds of arithmetic on a bench-scale graph —
# while the driver solve is one Arrow transfer (≤ ~6 MB at the cap) and
# a vectorized loop. Big graphs (the 100 TB shape) overflow the probe
# and run the distributed rounds unchanged. Floats: the local solve
# accumulates in (src, dst)-sorted edge order, so its ranks are a
# deterministic function of the edge SET — within the same ~1 ulp·degree
# envelope as the distributed shuffle-order sums (consumers gate on
# rows/tolerance, never hash; tests pin both paths against numpy).
PAGERANK_LOCAL_SOLVE_EDGES = 250_000

# Below this node count the per-round rank frame (16 B/node — ~80 MB at
# the cap) broadcasts to every executor, turning the rank⋈edges join,
# the dangling semi-join, and the nodes⋈contrib join into broadcast
# joins: the EDGE frame (the big side) is never shuffled inside the
# loop, and the one remaining exchange per round is the irreducible
# node-keyed receive aggregation. Above the cap — billion-node graphs
# at the 100 TB target — the shuffle path runs unchanged. n_nodes is an
# exact count the operator already computes, so the gate is free.
PAGERANK_BROADCAST_MAX_NODES = 5_000_000

# Target rows per partition for the loop frames. The loop runs ~3 jobs
# per round over these frames, so EMPTY partitions are pure per-task
# overhead multiplied by iterations: a 6k-node graph left at 32-64
# partitions pays ~0.7 s/round in task dispatch alone (measured), while
# a billion-node graph needs thousands of partitions. Sizing by the
# exact row counts the operator already has (n_nodes; one cheap count
# on the persisted edge frame, amortized over all rounds) serves both.
PAGERANK_ROWS_PER_PARTITION = 1_000_000


def _row_sized(df: DataFrame, rows: int) -> DataFrame:
    """Coalesce to ~PAGERANK_ROWS_PER_PARTITION rows per partition.
    coalesce() only merges (never shuffles, never grows the partition
    count), so a frame that is already narrower passes through."""
    return df.coalesce(max(1, int(rows // PAGERANK_ROWS_PER_PARTITION) + 1))


class _LocalCheckpointHandle:
    """Releasable stand-in for a ``localCheckpoint``-backed frame.

    ``DataFrame.unpersist()`` is a NO-OP on a checkpointed frame: the
    plan is a ``LogicalRDD`` whose blocks were persisted by the
    checkpoint call, never registered with the cache manager — so each
    superseded round's blocks would sit in executor storage until JVM
    GC. This handle grabs the underlying checkpointed RDD at creation
    time and frees its blocks on ``unpersist()`` (duck-typed so
    ``dedup._track``/``release_persisted`` can drain it like any
    persisted frame). Releasing makes the frame UNRECOMPUTABLE (a
    localCheckpoint truncates lineage), so it must only fire after the
    frame's consumers have evaluated — exactly the contract
    ``release_persisted`` already documents.
    """

    def __init__(self, df: DataFrame):
        try:
            self._jrdd = df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            self._jrdd = None  # internal accessor moved: degrade to no-op

    def unpersist(self, blocking: bool = False) -> None:
        if self._jrdd is not None:
            self._jrdd.unpersist(bool(blocking))
            self._jrdd = None


def _local_pagerank(
    spark,
    pdf,
    id_type,
    iterations: int,
    damping: float,
    return_delta: bool,
):
    """Driver-side power iteration over an already-collected edge list
    ``(_src, _dst, _w)`` — semantics identical to the distributed
    rounds: nodes = src∪dst, uniform init, per-edge share w/W(u),
    dangling mass redistributed uniformly, r' = (1−d)/N + d·(recv +
    dangling/N). Edges are sorted by (src, dst) first so the float
    accumulation order — hence every rank — is a deterministic function
    of the edge set, not of scan arrival order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    pdf = pdf.sort_values(["_src", "_dst"], kind="mergesort", ignore_index=True)
    codes, nodes = pd.factorize(
        pd.concat([pdf["_src"], pdf["_dst"]], ignore_index=True), sort=True
    )
    n_edges = len(pdf)
    si, di = codes[:n_edges], codes[n_edges:]
    n = len(nodes)
    if n == 0:
        raise ValueError("pagerank requires a non-empty edge frame")
    w = pdf["_w"].to_numpy(dtype="float64")
    outw = np.zeros(n)
    np.add.at(outw, si, w)
    # IEEE division like the distributed plan's w/W (a pathological
    # all-zero-weight source yields NaN there too); dangling = no
    # out-EDGE at all, matching the left-anti join on the out-weight
    # groups (not on the summed weight).
    with np.errstate(divide="ignore", invalid="ignore"):
        share = w / outw[si]
    is_src = np.zeros(n, dtype=bool)
    is_src[si] = True
    dangling_mask = ~is_src
    r = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    last_delta = 0.0
    for i in range(iterations):
        recv = np.zeros(n)
        np.add.at(recv, di, r[si] * share)
        dang = float(r[dangling_mask].sum())
        new_r = teleport + damping * (recv + dang / n)
        if return_delta and i == iterations - 1:
            last_delta = float(np.abs(new_r - r).sum())
        r = new_r
    out = spark.createDataFrame(
        pd.DataFrame({"node": nodes, "rank": r}),
        StructType(
            [StructField("node", id_type), StructField("rank", DoubleType())]
        ),
    )
    if return_delta:
        return out, last_delta
    return out


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    return_delta: bool = False,
    local_solve_edges: int = PAGERANK_LOCAL_SOLVE_EDGES,
):
    """Weighted PageRank, a fixed number of synchronous rounds (#155).

    Power iteration as DataFrame joins (the classic BSP formulation —
    public algorithm, Page et al. 1999): each round every node sends
    rank(u)·w(u,v)/W(u) along its out-edges, receivers sum, and
    r'(v) = (1−d)/N + d·(received + dangling/N) — mass from nodes with
    no out-edges redistributes uniformly so the total stays 1.0 every
    round (the invariant the tests pin). One node-keyed shuffle per
    round; each round's rank frame is persisted and the previous one
    released, so lineage stays one round deep instead of compounding
    ``iterations`` joins into a single exponential plan. Rows:
    (node, rank) over every node that appears as src or dst.

    Fixed rounds (not convergence-tested) keep the plan deterministic
    and replayable; five rounds ranks a co-purchase graph's head
    stably. ``return_delta=True`` additionally returns the LAST
    round's L1 rank movement ``Σ|r_i − r_{i-1}|`` (one join + one
    scalar aggregate over frames the loop already computed) so a
    caller can SEE whether the fixed budget sufficed on their graph —
    the result becomes ``(ranks, l1_delta)``. Float caveat:
    receiver-side sums are double adds in shuffle order, so ranks are
    deterministic to ~1 ulp·degree, not bit-pinned — consumers gate on
    rows/tolerance, never hash.

    Storage: each round truncates lineage with ``localCheckpoint`` —
    and every superseded round's checkpoint blocks are freed
    immediately (plain ``unpersist()`` is a no-op on a checkpointed
    frame; see :class:`_LocalCheckpointHandle`), so executor storage
    holds at most two rounds at any moment. The FINAL frame's blocks
    are registered with the dedup release registry and freed by the
    next ``release_persisted()`` — consume the result before that
    fires. ``localCheckpoint`` is executor-storage backed: losing an
    executor mid-run loses both data and the lineage to rebuild it, so
    a production run that must survive executor loss should pass
    ``checkpoint_dir`` — the driver calls ``setCheckpointDir`` and
    every ``checkpoint_every``-th round (and the last) writes a
    RELIABLE ``.checkpoint()`` to that directory instead, restartable
    on executor loss; intermediate rounds keep the cheap local form.
    Checkpoint files belong to the caller's directory (clean it up, or
    set ``spark.cleaner.referenceTracking.cleanCheckpoints``).
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    )
    # Local-solve probe (the connected_components pattern, see
    # PAGERANK_LOCAL_SOLVE_EDGES): one limit job decides; a graph that
    # fits runs the whole iteration in numpy on the driver, a graph
    # that doesn't pays one cheap extra limit job and runs the
    # distributed rounds below. checkpoint_dir opts OUT — a caller
    # asking for reliable checkpoints wants restartable distributed
    # rounds, not a driver solve.
    if checkpoint_dir is None and local_solve_edges > 0:
        probe = e.limit(local_solve_edges + 1).toPandas()
        if len(probe) <= local_solve_edges:
            return _local_pagerank(
                edges.sparkSession,
                probe,
                edges.schema[src].dataType,
                iterations,
                damping,
                return_delta,
            )
    e = _track(e.persist(StorageLevel.MEMORY_AND_DISK))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    nodes = _track(nodes.persist(StorageLevel.MEMORY_AND_DISK))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank requires a non-empty edge frame")
    # e was just materialized by the nodes count; counting the cached
    # frame is one trivial job, and the row count sizes the loop-
    # invariant edge frame's partitions for all subsequent rounds.
    n_edges = e.count()
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_outw"))
    # Normalize ONCE: the per-edge share w/W is loop-invariant, so the
    # out-weight join happens here instead of once per round (measured
    # ~2x on the co-purchase query's 5-round wall).
    e_norm = _track(
        _row_sized(
            e.join(out_w, "_src").select(
                "_src", "_dst", (F.col("_w") / F.col("_outw")).alias("_share")
            ),
            n_edges,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    dangling_nodes = _track(
        _row_sized(
            nodes.join(
                out_w.select(F.col("_src").alias("node")), "node", "left_anti"
            ),
            n_nodes,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    # One count up front (on the already-persisted frame) so the loop can
    # skip the whole dangling branch when there are no dangling nodes at
    # all — the common case for symmetrized graphs (every node has an
    # out-edge). The skipped term is exactly +0.0 (coalesce(sum over an
    # empty semi-join) = 0.0, and x + 0.0/N == x for the non-negative
    # receive sums), so ranks are bit-identical; what goes away is a
    # semi-join + scalar aggregate + broadcast + cross-join PER ROUND
    # (3 driver jobs/round on the bench graph — measured).
    n_dangling = dangling_nodes.count()
    ranks = _row_sized(
        nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")), n_nodes
    )
    ranks = _track(ranks.persist(StorageLevel.MEMORY_AND_DISK))
    ranks.count()
    if checkpoint_dir is not None:
        if checkpoint_every < 1:
            raise ValueError("checkpoint_every must be >= 1")
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    teleport = (1.0 - damping) / n_nodes
    # Size-gated broadcast plan (see PAGERANK_BROADCAST_MAX_NODES): the
    # rank-scale frames broadcast when they provably fit, so the edge
    # frame never shuffles inside the loop; the node-keyed receive
    # aggregation is the only per-round exchange.
    small = n_nodes <= PAGERANK_BROADCAST_MAX_NODES
    rank_side = (lambda df: F.broadcast(df)) if small else (lambda df: df)
    # (Tried and rejected: lazily chaining all rounds into one action —
    # with no dangling nodes the tree grows linearly, so it is SAFE, but
    # AQE then executes the chained broadcast/aggregate stages serially
    # inside one execution with the same per-stage overhead as the
    # separate per-round jobs; measured no win over the eager rounds.)
    prev_handle: _LocalCheckpointHandle | None = None
    last_delta: float | None = None
    for i in range(iterations):
        r = rank_side(ranks)
        # Fused receive aggregation: union a zero row per node into the
        # per-edge contributions and aggregate ONCE on the node key. The
        # zero rows (a) make every node present, replacing the old
        # contrib⋈nodes left join (which cost a second broadcast build +
        # join per round), and (b) reproduce coalesce(sum, 0.0) exactly —
        # adding 0.0 to a float sum never changes it (contributions are
        # non-negative, so no -0.0 edge case), and an otherwise-empty
        # group sums to exactly 0.0. One exchange per round remains: the
        # node-keyed aggregation, which is irreducible.
        contrib_rows = (
            r.join(e_norm, r["node"] == e_norm["_src"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_share")).alias("_c"),
            )
        )
        recv = (
            nodes.select("node", F.lit(0.0).alias("_c"))
            .unionByName(contrib_rows)
            .groupBy("node")
            .agg(F.sum("_c").alias("_recv"))
        )
        if n_dangling == 0:
            # no dangling mass ever exists: received + 0.0/N == received
            new_ranks = recv.select(
                "node",
                (
                    F.lit(teleport) + F.lit(damping) * F.col("_recv")
                ).alias("rank"),
            )
        else:
            # mass parked on dangling nodes (no out-edges) this round;
            # dangling_nodes is ≤ nodes, so it rides the same size gate
            dangling = (
                ranks.join(rank_side(dangling_nodes), "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_d"))
            )
            new_ranks = (
                recv.crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.lit(damping)
                        * (
                            F.col("_recv")
                            + F.col("_d") / F.lit(float(n_nodes))
                        )
                    ).alias("rank"),
                )
            )
        # Checkpoint, not persist: persist caches DATA but Catalyst
        # still re-analyzes the full logical tree every round, and with
        # two ranks references per round the tree doubles — measured
        # round walls of 1.4/1.3/1.7/3.0/5.5 s on a 6k-node graph.
        # Truncating lineage keeps each round's plan one round deep
        # (flat ~1.3 s rounds). Reliable rounds (checkpoint_dir set)
        # write to the checkpoint directory and survive executor loss.
        reliable = checkpoint_dir is not None and (
            i % checkpoint_every == 0 or i == iterations - 1
        )
        # size the checkpointed frame by its exact row count (n_nodes):
        # the checkpoint job and every consumer of this round otherwise
        # pay one task per inherited near-empty partition
        new_ranks = _row_sized(new_ranks, n_nodes)
        if reliable:
            new_ranks = new_ranks.checkpoint(eager=True)
        else:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if return_delta and i == iterations - 1:
            # last round's L1 movement, from the two frames already
            # materialized (node sets are identical: both span `nodes`)
            last_delta = (
                ranks.select("node", F.col("rank").alias("_r0"))
                .join(new_ranks.select("node", F.col("rank").alias("_r1")), "node")
                .agg(F.sum(F.abs(F.col("_r1") - F.col("_r0"))).alias("_l1"))
                .collect()[0]["_l1"]
            )
        # free the superseded round NOW: round 0's ranks is a plain
        # persisted frame; later rounds are checkpoint-backed and need
        # the block-level release (DataFrame.unpersist is a no-op there)
        if i == 0:
            ranks.unpersist()
        elif prev_handle is not None:
            prev_handle.unpersist()
        prev_handle = None if reliable else _LocalCheckpointHandle(new_ranks)
        ranks = new_ranks
    if prev_handle is not None:
        # the FINAL frame's blocks: freed by the next release_persisted()
        # (after the consumer has evaluated), same discipline as persists
        _track(prev_handle)
    if return_delta:
        return ranks, float(last_delta) if last_delta is not None else 0.0
    return ranks


# Same local-solve gate as PAGERANK_LOCAL_SOLVE_EDGES: each distributed
# peel round is a degree aggregation + two semi-joins + an eager
# localCheckpoint + a count — fixed job overhead per round that dwarfs
# the arithmetic on a driver-sized graph. Peeling is confluent and all
# counts are integers, so the local peel returns the IDENTICAL edge set
# the distributed rounds produce (only row order differs).
KCORE_LOCAL_SOLVE_EDGES = 250_000


def _local_kcore(spark, pdf, k: int, max_iters: int, u_type, v_type):
    """Driver-side synchronous peel over a collected canonical edge
    list ``(_u, _v)``; one loop iteration == one distributed round
    (degrees recomputed over the surviving frame, then both-endpoint
    filter), capped at ``max_iters`` exactly like the distributed
    path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    for _ in range(max_iters):
        if not len(pdf):
            break
        codes, uniq = pd.factorize(
            pd.concat([pdf["_u"], pdf["_v"]], ignore_index=True)
        )
        deg = np.bincount(codes, minlength=len(uniq))
        m = len(pdf)
        keep = (deg[codes[:m]] >= k) & (deg[codes[m:]] >= k)
        if keep.all():
            break
        pdf = pdf[keep]
    return spark.createDataFrame(
        pdf.reset_index(drop=True),
        StructType([StructField("_u", u_type), StructField("_v", v_type)]),
    )


def kcore(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iters: int = 50,
    local_solve_edges: int = KCORE_LOCAL_SOLVE_EDGES,
) -> DataFrame:
    """The k-core of an undirected graph (#190): iteratively peel every
    node of degree < k until a fixpoint — the classical
    Batagelj–Zaveršnik / Seidman coreness construction, run as
    synchronous distributed rounds (each round = one degree aggregation
    + one semi-join filter, both keyed on the node — the PageRank loop's
    shuffle footprint without the rank arithmetic).

    ``edges`` must be the CANONICAL undirected frame (one row per pair,
    src < dst); degrees count both endpoints. Returns the surviving
    canonical edge frame. Deterministic: peeling is confluent — the
    k-core is unique regardless of removal order — so rows-only
    verification plus invariant pytest (every surviving endpoint has
    core-degree ≥ k; re-running peel is a no-op) pins correctness
    without an oracle (the fixpoint loop is not SQL-expressible).

    Scale: the frame shrinks monotonically; each round localCheckpoints
    (truncating lineage) and frees the previous round's blocks, so a
    100-round peel on a billion-edge graph holds ONE generation in
    memory. Iterations cap at ``max_iters`` (real graphs converge in a
    handful of rounds; the cap bounds a pathological chain).
    """
    from .dedup import _track

    cur = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    if local_solve_edges > 0:
        probe = cur.limit(local_solve_edges + 1).toPandas()
        if len(probe) <= local_solve_edges:
            return _local_kcore(
                edges.sparkSession,
                probe,
                k,
                max_iters,
                edges.schema[src].dataType,
                edges.schema[dst].dataType,
            ).select(F.col("_u").alias(src), F.col("_v").alias(dst))
    cur = cur.localCheckpoint(eager=True)
    prev_handle = _LocalCheckpointHandle(cur)
    n_edges = cur.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = (
            cur.select(F.col("_u").alias("_n"))
            .unionByName(cur.select(F.col("_v").alias("_n")))
            .groupBy("_n")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        live = deg.where(F.col("_d") >= k).select("_n")
        nxt = (
            cur.join(live.withColumnRenamed("_n", "_u"), "_u", "left_semi")
            .join(live.withColumnRenamed("_n", "_v"), "_v", "left_semi")
            .select("_u", "_v")
        )
        nxt = _row_sized(nxt, n_edges).localCheckpoint(eager=True)
        new_count = nxt.count()
        prev_handle.unpersist()
        prev_handle = _LocalCheckpointHandle(nxt)
        converged = new_count == n_edges
        cur, n_edges = nxt, new_count
        if converged:
            break
    _track(prev_handle)
    return cur.select(F.col("_u").alias(src), F.col("_v").alias(dst))
