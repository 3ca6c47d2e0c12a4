"""Connected components: hand-built graphs + random graphs vs union-find."""

import pytest
import random

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.operators import dedup
from aws_big_data_blog_dmscdc_walkthrough_spark.operators.graph import (
    cluster_members,
    connected_components,
    keep_best,
)


def _run(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(int(n),) for n in node_ids], "id: long")
    if edge_pairs:
        edges = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edge_pairs], "src: long, dst: long"
        )
    else:
        edges = nodes.select(
            F.col("id").alias("src"), F.col("id").alias("dst")
        ).limit(0)
    out = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges, **kw).collect()
    }
    dedup.release_persisted()
    return out


def _union_find(node_ids, edge_pairs):
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to min id per component
    comp = {}
    groups = {}
    for n in node_ids:
        groups.setdefault(find(n), []).append(n)
    for members in groups.values():
        m = min(members)
        for n in members:
            comp[n] = m
    return comp


def test_chain_converges_past_diameter(spark):
    # chain 1-2-3-4-5: needs several propagation rounds
    out = _run(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singleton(spark):
    out = _run(spark, [1, 2, 3, 10, 11, 99], [(2, 1), (2, 3), (11, 10)])
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_no_edges_identity(spark):
    out = _run(spark, [7, 8, 9], [])
    assert out == {7: 7, 8: 8, 9: 9}


def test_duplicate_and_reversed_edges(spark):
    out = _run(spark, [1, 2, 3], [(1, 2), (2, 1), (1, 2), (3, 2)])
    assert out == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, nodes, edges) == _union_find(nodes, edges)


def test_distributed_path_matches_local_solve(spark):
    """local_solve_edges=0 forces the iterated distributed rounds; both
    paths must agree with the reference union-find."""
    rng = random.Random(99)
    nodes = list(range(40))
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(nodes, edges)
    assert _run(spark, nodes, edges, local_solve_edges=0) == want
    assert _run(spark, nodes, edges) == want


def test_distributed_chain_converges(spark):
    # chain via the distributed loop: needs several propagation rounds
    out = _run(
        spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)],
        local_solve_edges=0,
    )
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cluster_members_sizes(spark):
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4]], "id: long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src: long, dst: long")
    rows = {
        r["id"]: (r["cluster_id"], r["cluster_size"])
        for r in cluster_members(nodes, edges).collect()
    }
    dedup.release_persisted()
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (4, 1)}


def test_star_matches_label_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(nodes, edges)
    assert _run(spark, nodes, edges, algorithm="star") == want


@pytest.mark.slow
def test_star_handles_deep_chain_within_log_rounds(spark):
    """The deep-graph insurance: a 1,000-node chain has diameter 999 —
    label propagation needs ~999 rounds, large/small-star alternation
    O(log² n). max_iter=15 alternations must fully converge."""
    n = 1000
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    out = _run(spark, nodes, edges, algorithm="star", max_iter=15)
    assert out == {i: 0 for i in range(n)}


def test_star_no_edges_identity(spark):
    out = _run(spark, [3, 4, 5], [], algorithm="star")
    assert out == {3: 3, 4: 4, 5: 5}


def test_self_loop_edges_are_isolated(spark):
    # a node whose only edge is a self-loop stays its own component
    out = _run(spark, [1, 2, 3], [(1, 1), (2, 3)])
    assert out == {1: 1, 2: 2, 3: 2}


def test_keep_best_over_precomputed_clusters(spark):
    """keep_best is an operator over a PRECOMPUTED cluster frame — no
    edge-gen or CC re-run: highest score wins, ties -> smallest id,
    singletons survive with their own score."""
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 1)],
        "doc_id: long, cluster_id: long, cluster_size: long",
    )
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)],
        "doc_id: long, quality_score: double",
    )
    rows = {
        r["cluster_id"]: (r["doc_id"], r["cluster_size"], r["quality_score"])
        for r in keep_best(clusters, scored).collect()
    }
    assert rows == {1: (2, 3, 0.9), 4: (4, 1, 0.5)}


def test_distributed_path_medium_random_graph(spark):
    """Forced-distributed CC on a graph big enough for several
    propagation rounds (3k nodes, 2.4k edges, mixed chains + stars)
    must agree with the reference union-find exactly."""
    rng = random.Random(1234)
    n = 3000
    nodes = list(range(n))
    edges = []
    # random edges
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(1500)]
    # some deep chains (stress round count)
    for start in range(0, 900, 90):
        edges += [(i, i + 1) for i in range(start, start + 60)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(nodes, edges)
    assert _run(spark, nodes, edges, local_solve_edges=0, max_iter=40) == want


@pytest.mark.slow
def test_label_propagation_falls_back_to_star_on_deep_chain(spark):
    """A chain deeper than the propagation budget (2 hops x max_iter)
    must still resolve EXACTLY — the non-converged propagation contracts
    the graph and finishes with the star fixpoint instead of silently
    returning partial labels."""
    n = 300  # diameter 299 >> 2*10 hops
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    out = _run(spark, nodes, edges, local_solve_edges=0, max_iter=10)
    assert out == {i: 0 for i in range(n)}


def test_keep_best_keeps_unscored_members_and_clusters(spark):
    """A member missing from the scored frame must not vanish before
    ranking, and a fully-unscored cluster still elects its smallest id."""
    clusters = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2), (7, 7, 2), (8, 7, 2)],
        "doc_id: long, cluster_id: long, cluster_size: long",
    )
    scored = spark.createDataFrame(  # doc 2 and cluster 7 unscored
        [(1, 0.4)], "doc_id: long, quality_score: double"
    )
    rows = {r.cluster_id: (r.doc_id, r.quality_score) for r in keep_best(clusters, scored).collect()}
    assert rows == {1: (1, 0.4), 7: (7, None)}


def test_pagerank_matches_numpy_power_iteration(spark):
    """Five synchronous rounds must match the dense numpy power
    iteration with the same damping/rounds to float tolerance,
    including a dangling node whose mass redistributes uniformly."""
    import numpy as np

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    #   1 -> 2 (w2), 1 -> 3 (w1), 2 -> 3 (w1), 3 -> 1 (w1), 4 dangling
    edges = [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0), (3, 1, 1.0), (2, 4, 1.0)]
    df = spark.createDataFrame(edges, "s long, d long, w double")
    got = {
        r.node: r.rank
        for r in graph.pagerank(df, "s", "d", "w", iterations=5).collect()
    }

    nodes = [1, 2, 3, 4]
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] = w
    outw = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    damping = 0.85
    for _ in range(5):
        recv = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if outw[i] == 0:
                dangling += r[i]
                continue
            recv += r[i] * W[i] / outw[i]
        r = (1 - damping) / n + damping * (recv + dangling / n)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_query_shape(spark):
    """Co-purchase query returns the bounded top-k with positive ranks."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.plans import analytics

    rows = analytics.q_part_pagerank(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= analytics.PAGERANK_TOP_K
    assert all(r.rank > 0 for r in rows)
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def _toy_pagerank_edges(spark):
    edges = [(1, 2, 2.0), (1, 3, 1.0), (2, 3, 1.0), (3, 1, 1.0), (2, 4, 1.0)]
    return spark.createDataFrame(edges, "s long, d long, w double")


def test_pagerank_releases_superseded_rounds(spark):
    """Every superseded round's localCheckpoint blocks must be freed as
    the loop advances, and the FINAL frame's blocks must drain with
    release_persisted() — DataFrame.unpersist() alone is a no-op on
    checkpoint-backed frames, so without the block-level release each
    round would leak executor storage until JVM GC."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    jsc = spark.sparkContext._jsc.sc()

    def cached_rdds():
        return len(list(jsc.getRDDStorageInfo()))

    dedup.release_persisted()
    base = cached_rdds()
    ranks = graph.pagerank(_toy_pagerank_edges(spark), "s", "d", "w", iterations=5)
    total = {r.node: r.rank for r in ranks.collect()}
    assert abs(sum(total.values()) - 1.0) < 1e-9
    # alive: the 4 persisted inputs (e/nodes/e_norm/dangling) + exactly
    # ONE checkpoint frame (the final round) — not one per round
    assert cached_rdds() - base <= 5, (base, cached_rdds())
    dedup.release_persisted()
    assert cached_rdds() <= base, (base, cached_rdds())


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir switches rounds to RELIABLE .checkpoint() (files
    under the caller's directory, survives executor loss) and must not
    change a single rank."""
    import os

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    df = _toy_pagerank_edges(spark)
    local = {r.node: r.rank for r in graph.pagerank(df, "s", "d", "w").collect()}
    ckdir = str(tmp_path / "pr_ck")
    reliable = {
        r.node: r.rank
        for r in graph.pagerank(
            df, "s", "d", "w", checkpoint_dir=ckdir, checkpoint_every=2
        ).collect()
    }
    # checkpoint_dir opts out of the driver local-solve, so this also
    # compares the distributed rounds against the numpy path — equal up
    # to float summation order (both are pinned to 1e-9 vs numpy in
    # test_pagerank_matches_numpy_power_iteration)
    assert set(reliable) == set(local)
    for node, rank in local.items():
        assert abs(reliable[node] - rank) < 1e-12, (node, reliable[node], rank)
    # the reliable rounds actually wrote checkpoint files
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckdir)
        for f in files
        if f.startswith("part-")
    ]
    assert found, "no reliable checkpoint files written"
    dedup.release_persisted()


def test_pagerank_return_delta_converges(spark):
    """The last-round L1 delta readout: more rounds => smaller movement
    on a convergent graph, and the ranks are unchanged by asking."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    df = _toy_pagerank_edges(spark)
    plain = {r.node: r.rank for r in graph.pagerank(df, "s", "d", "w").collect()}
    ranks5, d5 = graph.pagerank(df, "s", "d", "w", iterations=5, return_delta=True)
    got5 = {r.node: r.rank for r in ranks5.collect()}
    _, d20 = graph.pagerank(df, "s", "d", "w", iterations=20, return_delta=True)
    assert got5 == plain
    assert 0.0 < d20 < d5 < 1.0, (d5, d20)
    dedup.release_persisted()


def test_kcore_hand_computed_triangle_plus_chain(spark):
    """Triangle {1,2,3} with a pendant chain 3-4-5: the 2-core is
    exactly the triangle (peeling 5 exposes 4, peeling 4 leaves the
    triangle — the cascade the iteration must follow)."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    core = graph.kcore(edges, "a", "b", 2)
    got = sorted((r.a, r.b) for r in core.collect())
    assert got == [(1, 2), (1, 3), (2, 3)]
    # k above the max coreness: empty
    assert graph.kcore(edges, "a", "b", 3).count() == 0


def test_kcore_invariants_and_idempotence(spark):
    """On a random-ish graph: every surviving endpoint has core-degree
    >= k, and peeling the core again is a no-op (fixpoint)."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph
    from pyspark.sql import functions as F

    rows = [(i, (i * 7 + 3) % 40) for i in range(120)]
    edges = (
        spark.createDataFrame(rows, "x long, y long")
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    core = graph.kcore(edges, "a", "b", 3).cache()
    deg = (
        core.select(F.col("a").alias("n"))
        .unionByName(core.select(F.col("b").alias("n")))
        .groupBy("n")
        .count()
    )
    if core.count():
        assert deg.agg(F.min("count")).first()[0] >= 3
    again = graph.kcore(core, "a", "b", 3)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, core.collect())
    )
    core.unpersist()  # keep the shared session cache-clean


def test_kcore_query_shape(spark):
    """The #190 plan query: deterministic rows, bounded output, rides
    the shared canonical edge frame."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.plans import analytics

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in analytics.q_part_kcore(spark, sf).collect()]
    b = [tuple(r) for r in analytics.q_part_kcore(spark, sf).collect()]
    assert a == b
    assert len(a) <= analytics.KCORE_TOP


def test_pagerank_local_solve_matches_distributed(spark):
    """The driver local-solve (default gate) and the distributed rounds
    (forced via local_solve_edges=0) must agree to float-summation
    tolerance on every rank, including the dangling node."""
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    df = _toy_pagerank_edges(spark)
    local = {r.node: r.rank for r in graph.pagerank(df, "s", "d", "w").collect()}
    dist = {
        r.node: r.rank
        for r in graph.pagerank(
            df, "s", "d", "w", local_solve_edges=0
        ).collect()
    }
    assert set(local) == set(dist)
    for node, rank in dist.items():
        assert abs(local[node] - rank) < 1e-12, (node, local[node], rank)
    assert abs(sum(local.values()) - 1.0) < 1e-9
    dedup.release_persisted()


def test_kcore_local_solve_identical_to_distributed(spark):
    """Peeling is confluent and integer-exact: the driver local peel
    (default gate) must return the IDENTICAL edge set as the
    distributed rounds (forced via local_solve_edges=0)."""
    from pyspark.sql import functions as F

    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import graph

    rows = [(i, (i * 11 + 5) % 60) for i in range(200)]
    edges = (
        spark.createDataFrame(rows, "x long, y long")
        .where(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    local = sorted(map(tuple, graph.kcore(edges, "a", "b", 3).collect()))
    dist = sorted(
        map(tuple, graph.kcore(edges, "a", "b", 3, local_solve_edges=0).collect())
    )
    assert local == dist
    dedup.release_persisted()
