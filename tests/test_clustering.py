"""Connected-components kernel vs a union-find oracle, plus cascading ops.

Mirrors SURVEY.md §5.2: CC against an oracle on random graphs; cluster
comparison is label-invariant frozenset-of-frozensets (the reference's own
criterion, tests/e2e/test_pipelines_main_schema.py:160-182).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.operators import clustering as G


# -- union-find oracle -------------------------------------------------------
def uf_components(edges: list[tuple[str, str]]) -> set[frozenset[str]]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comps: dict[str, set[str]] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {frozenset(v) for v in comps.values()}


def spark_components(spark, edges: list[tuple[str, str]]) -> set[frozenset[str]]:
    df = spark.createDataFrame(edges, "src string, dst string")
    assign = G.connected_components(df)
    rows = assign.collect()
    comps: dict[str, set[str]] = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return {frozenset(v) for v in comps.values()}


def test_cc_simple_chain(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    assert spark_components(spark, edges) == uf_components(edges)


def test_cc_cluster_ids_are_min_key(spark):
    df = spark.createDataFrame([("c", "b"), ("b", "a")], "src string, dst string")
    rows = {r["node"]: r["component"] for r in G.connected_components(df).collect()}
    assert rows == {"a": "a", "b": "a", "c": "a"}


def test_cc_random_graphs_match_oracle(spark):
    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(10, 120)
        m = rng.randint(5, 3 * n)
        edges = [
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert spark_components(spark, edges) == uf_components(edges), f"trial {trial}"


def test_cc_long_chain_converges(spark):
    # adversarial path graph: worst case for naive label propagation
    edges = [(f"v{i:04d}", f"v{i+1:04d}") for i in range(200)]
    comps = spark_components(spark, edges)
    assert comps == {frozenset(f"v{i:04d}" for i in range(201))}


def test_cc_hybrid_paths_identical(spark):
    """All three kernels — pure star rounds (small_graph_edges=0), pure
    union-find finish (threshold above |E|), and the hybrid (threshold mid
    contraction, exercising star-rounds-then-union-find) — must produce the
    IDENTICAL (node, component-min) map on adversarial shapes."""
    rng = random.Random(13)
    edges = []
    for comp in range(60):
        size = rng.randint(2, 15)
        ns = [f"c{comp:03d}_{i:02d}" for i in range(size)]
        shape = rng.random()
        if shape < 0.33:
            edges += [(ns[i], ns[i + 1]) for i in range(size - 1)]  # chain
        elif shape < 0.66:
            edges += [(ns[0], x) for x in ns[1:]]  # star
        else:
            edges += [(a, b) for a in ns for b in ns if a < b]  # clique
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    results = []
    for thr in (0, len(edges) // 3, 10**9):
        assign = G.connected_components(df, small_graph_edges=thr)
        results.append({(r["node"], r["component"]) for r in assign.collect()})
    assert results[0] == results[1] == results[2]


def test_cc_star_rounds_are_logarithmic(spark):
    """Large-star/small-star is provably O(log n) rounds; lock in the round
    count on a 256-node path graph (the adversarial depth case) so a kernel
    regression to linear label-propagation behavior fails loudly."""
    edges = [(f"p{i:04d}", f"p{i+1:04d}") for i in range(255)]
    df = spark.createDataFrame(edges, "src string, dst string")
    # force pure star rounds and count them via max_iter bisection: the
    # kernel raises if it exceeds max_iter, so the smallest passing
    # max_iter IS the round count (fixpoint included).
    rounds = None
    for k in range(1, 17):
        try:
            G.connected_components(df, max_iter=k, small_graph_edges=0).count()
            rounds = k
            break
        except RuntimeError:
            continue
    assert rounds is not None and rounds <= 12, (
        f"path-256 took {rounds} star rounds — expected O(log n) (<=12)"
    )


# -- links_to_clusters --------------------------------------------------------
def _links(spark, rows):
    return spark.createDataFrame(
        rows,
        f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
        f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string, "
        f"`{K.PROBABILITY}` double",
    )


def partition_of(clusters) -> set[frozenset[str]]:
    rows = clusters.collect()
    comps: dict[str, set[str]] = {}
    for r in rows:
        key = f"{r[K.INPUT_RECORD_DATASET]}-__-{r[K.INPUT_RECORD_ID]}"
        comps.setdefault(r[K.CLUSTER_ID], set()).add(key)
    return {frozenset(v) for v in comps.values()}


def test_links_to_clusters_threshold_and_exclusion(spark):
    links = _links(
        spark,
        [
            ("d", "1", "d", "2", 0.9),
            ("d", "2", "d", "3", 0.95),
            ("d", "4", "d", "5", 0.2),  # below threshold -> no edge
        ],
    )
    # Default = reference semantics (splink_links_to_clusters.py:28-34): the
    # node set is every key in the links table, so 4 and 5 come out as
    # singleton clusters even though their only link is sub-threshold.
    clusters = G.links_to_clusters(links, threshold=0.5)
    assert partition_of(clusters) == {
        frozenset({"d-__-1", "d-__-2", "d-__-3"}),
        frozenset({"d-__-4"}),
        frozenset({"d-__-5"}),
    }
    # Explicit exclusion flag = the cascading one-to-many semantic
    # (one_to_many_links_to_clusters.py:80-83): unlinked nodes dropped.
    excluded = G.links_to_clusters(links, threshold=0.5, emit_singletons=False)
    assert partition_of(excluded) == {
        frozenset({"d-__-1", "d-__-2", "d-__-3"})
    }


def test_links_to_clusters_hint_path_identical(spark):
    """The edge_count_hint fast path (fused singleton union-find, no probe
    job) must produce exactly the general path's clusters — singletons from
    sub-threshold links included."""
    random.seed(11)
    rows = []
    for i in range(200):
        a, b = random.randrange(60), random.randrange(60)
        rows.append(("d", str(a), "d", str(b), random.random()))
    links = _links(spark, rows)
    general = G.links_to_clusters(links, threshold=0.5)
    hinted = G.links_to_clusters(links, threshold=0.5, edge_count_hint=len(rows))
    assert partition_of(hinted) == partition_of(general)
    # emit_singletons=False with a hint: union-find over edges only
    gen_ex = G.links_to_clusters(links, threshold=0.5, emit_singletons=False)
    hint_ex = G.links_to_clusters(
        links, threshold=0.5, emit_singletons=False, edge_count_hint=len(rows)
    )
    assert partition_of(hint_ex) == partition_of(gen_ex)


def test_clusters_to_links_roundtrip(spark):
    clusters = spark.createDataFrame(
        [("d", "1", "c1"), ("d", "2", "c1"), ("d", "3", "c1"), ("e", "9", "c2")],
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        f"`{K.CLUSTER_ID}` string",
    )
    links = G.clusters_to_links(clusters)
    K.validate_links(links)
    got = {
        (r[K.LEFT_ID], r[K.RIGHT_ID], r[K.PROBABILITY]) for r in links.collect()
    }
    assert got == {("1", "2", 1.0), ("1", "3", 1.0), ("2", "3", 1.0)}


def test_update_clusters_merges_transitively(spark):
    schema = (
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        f"`{K.CLUSTER_ID}` string"
    )
    known = spark.createDataFrame([("d", "1", "k1"), ("d", "2", "k1")], schema)
    new = spark.createDataFrame(
        [("d", "2", "n1"), ("d", "3", "n1"), ("d", "4", "n2")], schema
    )
    merged = G.update_clusters(known, new)
    # record 4 is a singleton but still present (reference :90-92)
    assert partition_of(merged) == {
        frozenset({"d-__-1", "d-__-2", "d-__-3"}),
        frozenset({"d-__-4"}),
    }


def test_one_to_many_drop_ties(spark):
    links = _links(
        spark,
        [
            ("dup", "1", "ref", "10", 0.9),
            ("dup", "1", "ref", "11", 0.9),  # tie at 0.9 -> dropped
            ("dup", "2", "ref", "10", 0.8),
            ("dup", "3", "ref", "12", 0.4),  # below threshold
        ],
    )
    clusters = G.one_to_many_links_to_clusters(links, "ref", threshold=0.5)
    assert partition_of(clusters) == {frozenset({"dup-__-2", "ref-__-10"})}


def test_one_to_many_highest_id_breaks_ties(spark):
    links = _links(
        spark,
        [
            ("dup", "1", "ref", "10", 0.9),
            ("dup", "1", "ref", "11", 0.9),
        ],
    )
    clusters = G.one_to_many_links_to_clusters(
        links, "ref", threshold=0.5, break_ties_method="highest_id"
    )
    assert partition_of(clusters) == {frozenset({"dup-__-1", "ref-__-11"})}


def test_one_to_many_rejects_bad_links(spark):
    import pytest

    with pytest.raises(ValueError, match="within the no_duplicates_dataset"):
        G.one_to_many_links_to_clusters(
            _links(spark, [("ref", "1", "ref", "2", 0.9)]), "ref", 0.5
        )
    with pytest.raises(ValueError, match="don't involve"):
        G.one_to_many_links_to_clusters(
            _links(spark, [("a", "1", "b", "2", 0.9)]), "ref", 0.5
        )


def test_exclude_and_remove(spark):
    clusters = spark.createDataFrame(
        [("d", "1", "c1"), ("d", "2", "c1"), ("d", "3", "c3")],
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        f"`{K.CLUSTER_ID}` string",
    )
    dataset = spark.createDataFrame(
        [("1", "x"), ("2", "y"), ("3", "z"), ("4", "w")],
        f"`{K.RECORD_ID}` string, attr string",
    )
    ids = G.exclude_clustered(clusters, dataset, "d")
    assert {r[K.INPUT_RECORD_ID] for r in ids.collect()} == {"1", "2"}
    remaining = G.remove_records(dataset, ids)
    assert {r[K.RECORD_ID] for r in remaining.collect()} == {"3", "4"}
