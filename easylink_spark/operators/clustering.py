"""Graph / clustering operators (SURVEY.md §2.9 — the heart of the engine).

- ``connected_components``: iterative **large-star / small-star** (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14) over a
  DataFrame edge list.  O(log n) rounds; each round is two groupBy-join
  passes; lineage is truncated every round with ``localCheckpoint``.
  The reference reaches CC through splink's duckdb label propagation
  (steps/splink/splink_links_to_clusters.py:37-51) and networkx
  (steps/cascading/one_to_many_links_to_clusters.py:84-100) — both
  single-node; this kernel is the distributed replacement.
- ``links_to_clusters``: G1/G2 — threshold links, CC, stable cluster ids.
  Records NOT involved in an accepted link are excluded (the reference's
  explicit semantic, one_to_many_links_to_clusters.py:80-83 comment).
- ``clusters_to_links``: J2 — within-cluster pair expansion at P=1.
- ``update_clusters``: G3 — merge known+new cluster assignments through a
  bipartite record<->cluster-marker graph (cheaper than the reference's
  pairwise within-cluster edge expansion,
  update_clusters_by_connected_components.py:60-114: O(n) edges vs O(n^2)).
- ``one_to_many_links_to_clusters``: G6/A3/J6 — at most one accepted link
  per left record into a no-duplicates dataset, tie drop/highest-id.
- ``exclude_clustered`` / ``remove_records``: P6/J7 + P5 — cascading
  working-set reduction.

Cluster IDs are **stable**: Cluster ID := min record key in the component
(a pure function of the partition — identical across runs, seeds, and
parallelism levels; SURVEY §7.4.5), never monotonically_increasing_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from easylink_spark.contracts import (
    CLUSTER_ID,
    INPUT_RECORD_DATASET,
    INPUT_RECORD_ID,
    LEFT_DATASET,
    LEFT_ID,
    PROBABILITY,
    RIGHT_DATASET,
    RIGHT_ID,
    record_key,
    split_record_key,
    validate_clusters,
    validate_ids_to_remove,
)

SRC, DST = "src", "dst"


# ---------------------------------------------------------------------------
# Connected components: large-star / small-star fixpoint (G1)
# ---------------------------------------------------------------------------
def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """For each node u: emit (v, min(N(u) ∪ {u})) for every neighbor v > u.

    ``dedup=False`` skips the trailing distinct (one exchange + its
    planning).  Semantically safe always — ``_small_star``'s groupBy-min is
    duplicate-insensitive and its own trailing distinct restores the set —
    but duplicates inflate the intermediate row count by up to the node
    degree, so callers only skip it on SMALL frontiers where the inflation
    is bounded by the frontier size itself (the round-6 low-overhead round
    mode); large dense components keep the intermediate dedup."""
    bi = edges.select(SRC, DST).union(
        edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    nbr_min = bi.groupBy(SRC).agg(F.min(DST).alias("_m"))
    out = (
        bi.filter(F.col(DST) > F.col(SRC))
        .join(nbr_min, SRC)
        .select(
            F.col(DST).alias(SRC),
            F.least(F.col("_m"), F.col(SRC)).alias(DST),
        )
        .filter(F.col(SRC) != F.col(DST))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct edges large->small; for each u: m = min(N_small(u) ∪ {u});
    emit (v, m) for v in N_small(u) ∪ {u}, minus self-loops."""
    directed = edges.select(
        F.greatest(SRC, DST).alias(SRC), F.least(SRC, DST).alias(DST)
    ).filter(F.col(SRC) != F.col(DST))
    nbr_min = directed.groupBy(SRC).agg(F.min(DST).alias("_m"))
    to_nbrs = directed.join(nbr_min, SRC).select(
        F.col(DST).alias(SRC), F.col("_m").alias(DST)
    )
    to_self = nbr_min.select(F.col(SRC), F.col("_m").alias(DST))
    return (
        to_nbrs.union(to_self)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )


def _union_find_assignments(edges: DataFrame) -> DataFrame:
    """Small-frontier finish: single-partition union-find over the edge
    list, executor-side (``mapInPandas`` — no driver collect).  Emits
    (node, component=min node id in component) for every node appearing in
    either column — identical semantics to the star-forest extraction, and
    a pure function of the edge set (deterministic at any parallelism).

    Rows with a NULL ``dst`` are ISOLATED-NODE DECLARATIONS: the ``src``
    node joins the universe (and becomes its own singleton component unless
    some real edge connects it).  Callers fuse singleton emission into this
    one task instead of paying a distinct + anti-join + union of extra
    Spark jobs after the fact (links_to_clusters' small-graph path).

    Only called on frontiers below ``small_graph_edges`` (default 500k
    pairs ≈ tens of MB of string keys), where log-n distributed rounds are
    pure fixed overhead: each large-star/small-star round costs 2+ shuffles
    plus a driver job barrier, which no core count speeds up — this was THE
    serial tail in the round-3 scaling decomposition (CC scaled 1.79x 2->8
    vs 3.1-3.3x for every other stage).  At 100 TB the first distributed
    rounds shrink the frontier geometrically, so the tail handed to this
    kernel stays small.
    """
    import numpy as np
    import pandas as pd

    def uf(batches):
        srcs: list = []
        dsts: list = []
        for pdf in batches:
            srcs.append(pdf[SRC])
            dsts.append(pdf[DST])
        if not srcs:
            return
        s = pd.concat(srcs, ignore_index=True)
        d = pd.concat(dsts, ignore_index=True)
        # sort=True: codes are STRING RANKS, so the min-code fixpoint below
        # is directly the min-string component representative.  NULL dst
        # (isolated-node declaration) factorizes to code -1 and is excluded
        # from the unique universe; the edge mask below drops those rows
        # from propagation while their src stays a (singleton) node.
        code_of, uniq = pd.factorize(pd.concat([s, d], ignore_index=True),
                                     sort=True)
        n = len(uniq)
        m = len(s)
        src_c, dst_c = code_of[:m], code_of[m:]
        edge_mask = (dst_c >= 0) & (src_c >= 0)
        if not edge_mask.all():
            src_c, dst_c = src_c[edge_mask], dst_c[edge_mask]
        # vectorized min-label propagation with pointer jumping
        # (Shiloach-Vishkin flavor): labels only decrease; at the fixpoint
        # parent[i] == min code in i's component.  O(log n) outer rounds,
        # each O(m) in numpy — no per-edge Python loop.
        parent = np.arange(n, dtype=np.int64)
        while True:
            before = parent.copy()
            np.minimum.at(parent, src_c, parent[dst_c])
            np.minimum.at(parent, dst_c, parent[src_c])
            while True:
                jumped = parent[parent]
                if np.array_equal(jumped, parent):
                    break
                parent = jumped
            if np.array_equal(parent, before):
                break
        uniq = np.asarray(uniq)
        yield pd.DataFrame({"node": uniq, "component": uniq[parent]})

    return (
        edges.repartition(1)
        .mapInPandas(uf, schema="node string, component string")
    )


def _resolve_small_edges(small_graph_edges: int | None) -> int:
    """Resolve the hybrid-CC small-graph threshold (env
    ``EASYLINK_CC_SMALL_EDGES``, default 500k).  The union-find finish
    funnels the whole frontier through ONE task (repartition(1) + pandas
    concat) — its memory bound is the frontier size — so an oversized env
    override is clamped: a typo must not route a multi-GB edge set into a
    single executor task."""
    import os

    if small_graph_edges is not None:
        return small_graph_edges
    small_graph_edges = int(os.environ.get("EASYLINK_CC_SMALL_EDGES", "500000"))
    _CAP = 5_000_000
    if small_graph_edges > _CAP:
        import warnings

        warnings.warn(
            f"EASYLINK_CC_SMALL_EDGES={small_graph_edges} exceeds the "
            f"single-task union-find memory bound; clamping to {_CAP}",
            stacklevel=2,
        )
        small_graph_edges = _CAP
    return small_graph_edges


def connected_components(
    edges: DataFrame,
    src: str = SRC,
    dst: str = DST,
    max_iter: int = 50,
    checkpoint_every: int = 1,
    small_graph_edges: int | None = None,
    stats: dict | None = None,
    edge_count_hint: int | None = None,
) -> DataFrame:
    """Edge list (any orientation, string node ids) -> (node, component)
    where component = min node id in the component (total order = string
    order).  Nodes with no edges do not appear (callers decide singleton
    semantics, G4).

    Hybrid kernel: iterate large-star/small-star (Kiveris et al.) only
    while the frontier exceeds ``small_graph_edges`` (env
    ``EASYLINK_CC_SMALL_EDGES``, default 500_000); below that, finish with
    a one-job single-partition union-find (``_union_find_assignments``).
    The star rounds preserve connectivity and never drop a non-root node,
    so union-find over a partially-contracted frontier yields the same
    (node -> component-min) map as running the rounds to fixpoint.  Set
    ``small_graph_edges=0`` to force pure star rounds (property tests
    compare the two paths).

    ``edge_count_hint`` is an UPPER BOUND on the edge count the caller
    already knows without a job (e.g. the links stage's checkpoint manifest
    row count — parquet footer metadata, zero scans).  When the bound is
    at or under ``small_graph_edges`` the count-and-checksum probe job and
    the pre-dedup of the edge set are skipped entirely and the frontier
    goes straight to the union-find finish (duplicates and orientation do
    not change a union-find's result, and the bound caps the single task's
    memory the same way the measured count did).  At bench scale that probe
    job was ~1.5-2 s of per-run fixed cost that no core count divides; at
    100 TB the hint is simply absent (no caller knows a small bound) and
    the distributed star rounds run as before.

    Fixpoint detection: (edge count, xor-style hash checksum) stable across
    a large-star+small-star round.  Every round the result is
    localCheckpoint-ed to truncate lineage (SURVEY §4.2.2); on a real
    cluster with a checkpoint dir configured, ``DataFrame.checkpoint`` is
    the durable alternative.
    """
    small_graph_edges = _resolve_small_edges(small_graph_edges)
    cleaned = (
        edges.select(F.col(src).alias(SRC), F.col(dst).alias(DST))
        .filter(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .filter(F.col(SRC) != F.col(DST))
    )
    if (
        edge_count_hint is not None
        and 0 < small_graph_edges
        and edge_count_hint <= small_graph_edges
    ):
        if stats is not None:
            stats.update({
                "rounds": 0,
                "initial_edges": None,  # never counted — that's the point
                "edge_count_hint": edge_count_hint,
                "final_edges": None,
                "finish": "union_find",
            })
        return _union_find_assignments(cleaned)
    # Round-6: the no-hint probe no longer pre-deduplicates.  Routing to
    # the union-find finish needs only an UPPER BOUND on the edge count —
    # duplicates and orientation do not change a union-find's result (the
    # edge_count_hint argument) — and a plain count() is one narrow-scan
    # job, where the former distinct().localCheckpoint() probe eagerly
    # materialized a full shuffle (under AQE, localCheckpoint plans and
    # runs every query stage immediately even with eager=False): measured
    # 4.8 s -> ~1.2 s for a 100k-edge frontier at local[32].  A large graph
    # pays one extra narrow pass before the distinct below — a few percent
    # of a single star round's 4-5 shuffles.
    if 0 < small_graph_edges and edge_count_hint is None:
        # a present-but-large hint is authoritative: don't pay a count job
        # to second-guess an upper bound the caller already knows
        n_edges_raw = cleaned.count()
        if n_edges_raw <= small_graph_edges:
            if stats is not None:
                stats.update({
                    "rounds": 0,
                    # pre-dedup count: an upper bound, not the distinct size
                    "initial_edges": n_edges_raw,
                    "edge_count_hint": edge_count_hint,
                    "final_edges": None,
                    "finish": "union_find",
                })
            return _union_find_assignments(cleaned)
    cur = (
        cleaned.distinct()
        # lazy plan-side; under AQE the checkpoint still materializes at
        # the signature() action below — one job either way
        .localCheckpoint(eager=False)
    )

    def signature(df: DataFrame) -> tuple[int, int]:
        # bit_xor is an order-independent, overflow-free edge-set checksum
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64(SRC, DST)), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev_sig = signature(cur)
    initial_edges = prev_sig[0]
    rounds = 0
    at_fixpoint = False
    # Round-6, scale-adaptive round planning (guide §1.2 step 1, §2.4):
    # each star round is 4-5 Exchanges, and with AQE every exchange is a
    # separately materialized query stage with a driver re-planning barrier
    # — for a SMALL frontier the round wall is almost entirely that fixed
    # driver latency (measured ~1.6 s/round for a 5k-edge frontier at
    # local[32]).  The frontier size is known exactly from the signature,
    # so small rounds are planned with shuffle.partitions derived from the
    # edge count and AQE off; large frontiers keep AQE (runtime coalescing
    # + skew-join splitting matter there, and per-stage latency amortizes).
    # Conf mutation is safe here: the round loop is driver-sequential, and
    # the session confs are restored in the finally below.
    conf = edges.sparkSession.conf
    _SMALL_ROUND_EDGES = 4_000_000  # ~a few hundred MB of string pairs
    _ROUND_EDGES_PER_PARTITION = 250_000
    saved_conf = {
        k: conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    }

    def _plan_round(n_edges: int) -> None:
        if n_edges <= _SMALL_ROUND_EDGES:
            conf.set(
                "spark.sql.shuffle.partitions",
                str(max(1, n_edges // _ROUND_EDGES_PER_PARTITION)),
            )
            conf.set("spark.sql.adaptive.enabled", "false")
        else:
            for k, v in saved_conf.items():
                conf.set(k, v)

    try:
        for _ in range(max_iter):
            if prev_sig[0] <= small_graph_edges:
                break
            _plan_round(prev_sig[0])
            small_round = prev_sig[0] <= _SMALL_ROUND_EDGES
            cur = _small_star(_large_star(cur, dedup=not small_round))
            if checkpoint_every:
                cur = cur.localCheckpoint(eager=False)
            sig = signature(cur)
            rounds += 1
            if sig == prev_sig:
                at_fixpoint = True
                break
            prev_sig = sig
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter} rounds"
            )
    finally:
        for k, v in saved_conf.items():
            conf.set(k, v)

    if stats is not None:
        stats.update({
            "rounds": rounds,
            "initial_edges": initial_edges,
            "final_edges": prev_sig[0],
            "finish": "star_fixpoint" if at_fixpoint or prev_sig[0] == 0
            else "union_find",
        })
    if not at_fixpoint and prev_sig[0] > 0:
        return _union_find_assignments(cur)
    # At the fixpoint the edge set is a star forest: (node -> component min).
    members = cur.select(F.col(SRC).alias("node"), F.col(DST).alias("component"))
    roots = cur.select(F.col(DST).alias("node"), F.col(DST).alias("component")).distinct()
    return members.union(roots).distinct()


# ---------------------------------------------------------------------------
# links -> clusters (G1 driver)
# ---------------------------------------------------------------------------
def links_to_clusters(
    links: DataFrame,
    threshold: float = 0.5,
    validate: bool = True,
    emit_singletons: bool = True,
    edge_count_hint: int | None = None,
) -> DataFrame:
    """Threshold links, run CC, emit clusters contract.

    Mirrors splink_links_to_clusters.py:21-51: the node set is ALL record
    keys appearing in the links table (splink_links_to_clusters.py:28-34
    builds dummy_records_df from every left/right key), so a node whose
    links are all below ``threshold`` still gets a **singleton cluster**
    (cluster id = its own record key).  ``emit_singletons=False`` restricts
    output to nodes with >= 1 accepted link — the cascading one-to-many
    step's exclusion semantic (one_to_many_links_to_clusters.py:80-83
    comment), kept as an explicit flag.  Cluster ID = min record key in
    component (stable; splink's representative id is likewise the min node).
    """
    keyed = links.select(
        record_key(f"`{LEFT_DATASET}`", f"`{LEFT_ID}`").alias(SRC),
        record_key(f"`{RIGHT_DATASET}`", f"`{RIGHT_ID}`").alias(DST),
        F.col(PROBABILITY).alias("_p"),
    )
    edges = keyed.filter(F.col("_p") >= F.lit(threshold)).select(SRC, DST)
    # edge_count_hint: the caller's known row count of ``links`` (e.g. its
    # checkpoint manifest, parquet footer metadata — no job) bounds the
    # post-threshold edge count from above.  Round-6: when no hint is
    # known, ONE plain count of the thresholded edges takes its place —
    # connected_components would run an equivalent probe job anyway, so
    # this moves that job earlier at no extra cost and lets every caller
    # (tutorial, person-linkage, streaming merge — the round-5 VERDICT's
    # unplumbed call sites) reach the fused singleton union-find below.
    small = _resolve_small_edges(None)
    if edge_count_hint is None:
        edge_count_hint = edges.count()
    if (
        edge_count_hint is not None
        and 0 < small
        and edge_count_hint <= small
        and emit_singletons
    ):
        # Small-graph fast path with singletons FUSED into the one-task
        # union-find: every node of ``keyed`` (thresholded or not) rides
        # along as an isolated-node declaration (NULL dst), so the kernel
        # emits the complete assignment directly — no count-probe job and
        # no distinct + anti-join + union jobs after the fact.  Row volume
        # is bounded by 3x the hint (edges + both endpoints of every
        # link), well inside the single-task memory bound
        # _resolve_small_edges enforces.  Semantics identical to the
        # general path below — the singleton property tests compare them.
        null_dst = F.lit(None).cast("string").alias(DST)
        declared = keyed.select(F.col(SRC), null_dst).union(
            keyed.select(F.col(DST).alias(SRC), null_dst)
        )
        assign = _union_find_assignments(edges.union(declared))
    else:
        assign = connected_components(edges, edge_count_hint=edge_count_hint)
        if emit_singletons:
            nodes = (
                keyed.select(F.col(SRC).alias("node"))
                .union(keyed.select(F.col(DST).alias("node")))
                .distinct()
            )
            singles = nodes.join(assign, "node", "left_anti").select(
                "node", F.col("node").alias("component")
            )
            assign = assign.union(singles)
    ds, rid = split_record_key("node")
    out = assign.select(
        ds.alias(INPUT_RECORD_DATASET),
        rid.alias(INPUT_RECORD_ID),
        F.col("component").alias(CLUSTER_ID),
    )
    if validate:
        return validate_clusters(out)
    return out


# ---------------------------------------------------------------------------
# clusters -> links (J2)
# ---------------------------------------------------------------------------
def clusters_to_links(clusters: DataFrame) -> DataFrame:
    """All within-cluster record pairs at Probability 1.0, canonical order
    (default_clusters_to_links.py:30-61)."""
    c = clusters.select(
        F.col(f"`{CLUSTER_ID}`").alias("_cid"),
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
        record_key(f"`{INPUT_RECORD_DATASET}`", f"`{INPUT_RECORD_ID}`").alias("_rk"),
    )
    l, r = c.alias("l"), c.alias("r")
    pairs = l.join(
        r,
        (F.col("l._cid") == F.col("r._cid")) & (F.col("l._rk") < F.col("r._rk")),
    )
    # native-type id comparison (integer ids order numerically, matching the
    # reference's astype(int) pair ordering — see blocking.canonicalize_pairs)
    lds, rds = F.col("l._ds"), F.col("r._ds")
    lid, rid = F.col("l._id"), F.col("r._id")
    swap = (lds > rds) | ((lds == rds) & (lid > rid))
    return pairs.select(
        F.when(swap, rds).otherwise(lds).alias(LEFT_DATASET),
        F.when(swap, F.col("r._id")).otherwise(F.col("l._id")).alias(LEFT_ID),
        F.when(swap, lds).otherwise(rds).alias(RIGHT_DATASET),
        F.when(swap, F.col("l._id")).otherwise(F.col("r._id")).alias(RIGHT_ID),
        F.lit(1.0).alias(PROBABILITY),
    )


# ---------------------------------------------------------------------------
# updating clusters (G3 + G4)
# ---------------------------------------------------------------------------
def update_clusters(known_clusters: DataFrame, new_clusters: DataFrame) -> DataFrame:
    """Merge two cluster assignments transitively
    (update_clusters_by_connected_components.py:60-114).

    The reference expands each cluster into all O(n^2) within-cluster edges;
    here the graph is the **bipartite** record<->cluster-marker graph (O(n)
    edges), CC over it, then components are relabeled to the min *record*
    key (markers dropped).  Singleton records keep their own cluster —
    every record appears in the output (reference adds isolated nodes,
    :90-92).
    """
    def tagged(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            record_key(f"`{INPUT_RECORD_DATASET}`", f"`{INPUT_RECORD_ID}`").alias(SRC),
            F.concat(F.lit("\x7f" + prefix + "__"),
                     F.col(f"`{CLUSTER_ID}`").cast("string")).alias(DST),
        )

    # \x7f prefix sorts cluster-marker nodes after any printable record key,
    # so component minima are always record keys.
    edges = tagged(known_clusters, "known").union(tagged(new_clusters, "new"))
    assign = connected_components(edges)
    records_only = assign.filter(~F.col("node").startswith("\x7f"))
    ds, rid = split_record_key("node")
    out = records_only.select(
        ds.alias(INPUT_RECORD_DATASET),
        rid.alias(INPUT_RECORD_ID),
        F.col("component").alias(CLUSTER_ID),
    )
    return validate_clusters(out)


# ---------------------------------------------------------------------------
# one-to-many constrained clustering (G6 / A3 / J6)
# ---------------------------------------------------------------------------
def one_to_many_links_to_clusters(
    links: DataFrame,
    no_duplicates_dataset: str,
    threshold: float,
    break_ties_method: str = "drop",
) -> DataFrame:
    """At most one accepted link per left record into ``no_duplicates_dataset``
    (one_to_many_links_to_clusters.py).

    Steps: validate link shape, orient the no-duplicates side right, take the
    top link per left record by (Probability desc, right key desc) — A3 as a
    window — then either drop left records whose top probability is tied
    across >1 distinct links (``drop``; tie counting J6 against the *full*
    link set, mirroring the reference's merge-on-(key, probability)) or keep
    the highest right key (``highest_id``).  CC over accepted links.
    """
    lds, rds = F.col(f"`{LEFT_DATASET}`"), F.col(f"`{RIGHT_DATASET}`")
    left_nd = lds == no_duplicates_dataset
    right_nd = rds == no_duplicates_dataset
    # both shape checks in ONE aggregation job (two eager limit(1).count()
    # probes would each recompute the upstream links plan)
    shape = links.agg(
        F.sum((left_nd & right_nd).cast("int")).alias("_both"),
        F.sum((~(left_nd | right_nd)).cast("int")).alias("_neither"),
    ).collect()[0]
    if shape["_both"]:
        raise ValueError(
            f"links include links within the no_duplicates_dataset "
            f"({no_duplicates_dataset})"
        )
    if shape["_neither"]:
        raise ValueError(
            f"links include links that don't involve the no_duplicates_dataset "
            f"({no_duplicates_dataset})"
        )

    oriented = links.select(
        F.when(left_nd, rds).otherwise(lds).alias(LEFT_DATASET),
        F.when(left_nd, F.col(f"`{RIGHT_ID}`")).otherwise(F.col(f"`{LEFT_ID}`")).alias(LEFT_ID),
        F.when(left_nd, lds).otherwise(rds).alias(RIGHT_DATASET),
        F.when(left_nd, F.col(f"`{LEFT_ID}`")).otherwise(F.col(f"`{RIGHT_ID}`")).alias(RIGHT_ID),
        F.col(f"`{PROBABILITY}`"),
    ).withColumn(
        "_lk", record_key(f"`{LEFT_DATASET}`", f"`{LEFT_ID}`")
    ).withColumn(
        "_rk", record_key(f"`{RIGHT_DATASET}`", f"`{RIGHT_ID}`")
    )

    w = Window.partitionBy("_lk").orderBy(
        F.desc(PROBABILITY), F.desc("_rk")
    )
    best = (
        oriented.filter(F.col(PROBABILITY) >= F.lit(threshold))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    if break_ties_method == "drop":
        tie_counts = (
            best.select("_lk", PROBABILITY)
            .join(oriented.select("_lk", PROBABILITY, "_rk"), ["_lk", PROBABILITY])
            .groupBy("_lk")
            .agg(F.count(F.lit(1)).alias("_ties"))
        )
        best = best.join(tie_counts, "_lk").filter(F.col("_ties") == 1).drop("_ties")
    elif break_ties_method == "highest_id":
        pass  # window order already prefers the highest right key
    else:
        raise ValueError(f"Unknown break_ties_method {break_ties_method}")

    assign = connected_components(best.select(F.col("_lk").alias(SRC),
                                              F.col("_rk").alias(DST)))
    ds, rid = split_record_key("node")
    out = assign.select(
        ds.alias(INPUT_RECORD_DATASET),
        rid.alias(INPUT_RECORD_ID),
        F.col("component").alias(CLUSTER_ID),
    )
    return validate_clusters(out)


# ---------------------------------------------------------------------------
# cascading working-set reduction (P5 / P6 / J7)
# ---------------------------------------------------------------------------
def exclude_clustered(clusters: DataFrame, dataset: DataFrame,
                      dataset_name: str) -> DataFrame:
    """ids_to_remove = dataset record ids already in a cluster of size > 1
    (exclude_clustered.py:63-77): cluster-size count (A2) + semi join (J7)."""
    sizes = clusters.groupBy(F.col(f"`{CLUSTER_ID}`")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    clustered = (
        clusters.join(sizes.filter(F.col("_n") > 1), CLUSTER_ID)
        .filter(F.col(f"`{INPUT_RECORD_DATASET}`") == dataset_name)
        .select(F.col(f"`{INPUT_RECORD_ID}`"))
    )
    from easylink_spark.contracts import RECORD_ID

    ids = dataset.select(F.col(f"`{RECORD_ID}`").alias(INPUT_RECORD_ID)).join(
        clustered, INPUT_RECORD_ID, "left_semi"
    )
    return validate_ids_to_remove(ids.distinct())


def remove_records(dataset: DataFrame, ids_to_remove: DataFrame) -> DataFrame:
    """Drop records whose id is in ids_to_remove — left anti join (P5;
    reference uses isin, default_removing_records.py:55 — anti join scales)."""
    from easylink_spark.contracts import RECORD_ID

    ids = ids_to_remove.select(F.col(f"`{INPUT_RECORD_ID}`").alias("_rm"))
    return dataset.join(
        ids, dataset[f"`{RECORD_ID}`"] == F.col("_rm"), "left_anti"
    )
