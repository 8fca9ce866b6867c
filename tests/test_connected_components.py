"""Connected components (large-star/small-star) and near-dup clustering.

The path graph is the adversarial case: plain min-label propagation
needs O(diameter) rounds, so a 64-node path verifies the star rounds
actually give logarithmic convergence inside the max_iterations guard.
The randomized test differentially checks against a pure-Python
union-find on seeded Erdős–Rényi-ish graphs.
"""

import random

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import connected_components, near_dup_clusters


def _cc_reference(edges, nodes):
    """Union-find ground truth: node -> min id of its component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _run(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.filter(F.lit(False))
    n = (
        spark.createDataFrame([(x,) for x in nodes], "doc_id long")
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=n)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_path_graph_adversarial(spark):
    # 64-node path: diameter 63, needs log-round convergence to finish
    # inside max_iterations=25 (label propagation would need ~63 rounds)
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_two_cliques_and_singleton(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)]
    got = _run(spark, edges, nodes=[1, 2, 3, 10, 11, 12, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_empty_edges_all_singletons(spark):
    got = _run(spark, [], nodes=[5, 6])
    assert got == {5: 5, 6: 6}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(40))
        n_edges = (trial + 1) * 15
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _cc_reference(edges, nodes)
        got = _run(spark, edges, nodes=nodes)
        assert got == want, f"trial {trial} mismatch"


def test_near_dup_clusters_end_to_end(spark):
    # 3 exact copies of one doc, 1 unrelated doc, 1 near-copy of the
    # first (one word changed): copies + near-copy share LSH bands and
    # must land in one cluster keyed by the min doc_id.
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),
        (3, base),
        (4, base.replace("lazy", "sleepy")),
        (9, "completely different text about spark shuffle partitions here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dup_clusters(df, "doc_id", "text", n_hashes=16, bands=8,
                            shingle_k=3)
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in out.collect()}
    assert got[1] == (1, 4)
    assert got[2] == (1, 4)
    assert got[3] == (1, 4)
    assert got[4] == (1, 4)
    assert got[9] == (9, 1)


def test_near_dup_clusters_one_giant_cluster(spark):
    """The mega-cluster hazard case: every doc identical, so the whole
    corpus is ONE component and cluster_id is the hot key.  cluster_size
    must come back right (n) via the groupBy+join form — the window-
    over-cluster_id form this replaced funneled all n rows through one
    window task."""
    base = "identical boilerplate page text repeated across every doc in the corpus"
    n = 80
    df = spark.createDataFrame([(i, base) for i in range(n)],
                               "doc_id long, text string")
    out = near_dup_clusters(df, "doc_id", "text", n_hashes=16, bands=8,
                            shingle_k=3)
    rows = out.collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 and r["cluster_size"] == n for r in rows)
