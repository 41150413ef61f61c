"""Blocking: candidate-pair generation (SURVEY.md J1, §4.2.1).

The reference's blocking is splink's ``block_using_rules_sqls`` — a SQL
self-join of the concatenated records table per blocking rule, unioned with
``match_key`` dedup (splink_blocking_and_filtering.py:74-91).  Here the same
semantics are Spark-native, with three rule families per the north rule:

1. **Exact key** (``block_on_key``): self-join on an equality key
   (e.g. normalized first-turn prefix), with *explicit hot-key salting* —
   rows of an oversized block are split into S salt groups and the right
   side replicated across salts, so the quadratic pair-enumeration of a hot
   block spreads over S tasks instead of one straggler.  (AQE's skew-join
   splits shuffle partitions, but it cannot split the n^2 output of a single
   hot key — that needs this salt-replication, SURVEY §4.2.1.)
2. **MinHash-LSH** (``block_minhash_lsh``): token-shingle MinHash signatures
   banded into buckets; pairs = within-bucket self-join.  Hand-rolled with
   built-in functions (xxhash64 / transform / array_min) so the whole
   signature computation stays inside whole-stage codegen — no Python, no
   MLlib overhead, deterministic across parallelism levels.
3. **Sorted neighborhood** (``block_sorted_neighborhood``): rows within a
   +/-w window of the records sorted by a key.  Distributed via fixed prefix
   bucketing + per-bucket ranks + cumulative bucket offsets -> exact global
   sort positions, then a banded equi-self-join on floor(pos/w) — exact
   window semantics with no global sort, no driver collect, no Python.

All rule outputs are canonicalized (left < right; F5 in SURVEY.md) and
unioned with splink-style ``match_key`` retention (lowest rule index wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from easylink_spark.contracts import (
    BLOCK_ID,
    INPUT_RECORD_DATASET,
    INPUT_RECORD_ID,
    LEFT_DATASET,
    LEFT_ID,
    PAIR_COLS,
    RIGHT_DATASET,
    RIGHT_ID,
    record_key,
)

MATCH_KEY = "match_key"


# ---------------------------------------------------------------------------
# Canonical pair ordering (F5) — reference enforces by conditional column
# swap (splink_blocking_and_filtering.py:109-137,
#  one_to_many_links_to_clusters.py:29-47).
# ---------------------------------------------------------------------------
def canonicalize_pairs(pairs: DataFrame) -> DataFrame:
    """Swap (left, right) columns where needed so that left dataset <= right
    dataset and, within a dataset, left id < right id; drop self-pairs.

    Ids are compared on their NATIVE type: integer Record IDs order
    numerically, matching the reference's astype(int) canonicalization
    (splink_blocking_and_filtering.py astype(int) + ordering swap;
    validation_utils._validate_pairs) — string comparison would emit
    (10, 2)-style pairs the reference contract rejects.
    """
    lds, rds = F.col(f"`{LEFT_DATASET}`"), F.col(f"`{RIGHT_DATASET}`")
    lid, rid = F.col(f"`{LEFT_ID}`"), F.col(f"`{RIGHT_ID}`")
    swap = (lds > rds) | ((lds == rds) & (lid > rid))
    out = pairs
    extra = [c for c in pairs.columns if c not in PAIR_COLS]
    out = out.select(
        F.when(swap, rds).otherwise(lds).alias(LEFT_DATASET),
        F.when(swap, rid).otherwise(lid).alias(LEFT_ID),
        F.when(swap, lds).otherwise(rds).alias(RIGHT_DATASET),
        F.when(swap, lid).otherwise(rid).alias(RIGHT_ID),
        *[F.col(f"`{c}`") for c in extra],
    )
    not_self = ~((F.col(f"`{LEFT_DATASET}`") == F.col(f"`{RIGHT_DATASET}`"))
                 & (F.col(f"`{LEFT_ID}`") == F.col(f"`{RIGHT_ID}`")))
    return out.filter(not_self)


def _pair_select(left_prefix: str = "l", right_prefix: str = "r") -> list[Column]:
    return [
        F.col(f"{left_prefix}._ds").alias(LEFT_DATASET),
        F.col(f"{left_prefix}._id").alias(LEFT_ID),
        F.col(f"{right_prefix}._ds").alias(RIGHT_DATASET),
        F.col(f"{right_prefix}._id").alias(RIGHT_ID),
    ]


def _keyed(records: DataFrame, key: Column) -> DataFrame:
    return records.select(
        key.alias("_bkey"),
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
        record_key(f"`{INPUT_RECORD_DATASET}`", f"`{INPUT_RECORD_ID}`").alias("_rk"),
    ).filter(F.col("_bkey").isNotNull() & (F.col("_bkey") != ""))


# ---------------------------------------------------------------------------
# Rule 1: exact-key blocking with hot-key salting
# ---------------------------------------------------------------------------
def block_on_key(
    records: DataFrame,
    key: Column,
    hot_block_threshold: int = 512,
    max_salt: int = 64,
    link_only: bool = False,
) -> DataFrame:
    """All unordered record pairs sharing ``key`` exactly.

    Pairs within a block of size n are n*(n-1)/2.  Blocks larger than
    ``hot_block_threshold`` are salted: each left row lands in one of S salt
    groups (S = ceil(n / threshold), capped); right rows are replicated to
    every salt group.  Every cross pair is still produced exactly once
    (under the left row's salt), but the work for a hot key spreads over S
    tasks.  Small blocks take the S=1 fast path untouched.

    ``link_only=True`` emits only pairs SPANNING datasets (splink
    link_type="link_only"; reference splink_blocking_and_filtering.py
    LINK_ONLY env var).  The restriction is structural, not a post-filter:
    each cross dataset-pair (A, B) joins the A-side rows against the B-side
    rows, so the n^2/block intra-dataset combinations are never probed or
    materialized.
    """
    keyed = _keyed(records, key)
    # Broadcast only the HOT keys (count > threshold) — a handful even at
    # 10^11 records — never the full key-cardinality size table (whose
    # driver-side broadcast build is a serial bottleneck).  Cold keys get
    # salt factor 1 via the null branch of the left join.
    hot = (
        keyed.groupBy("_bkey")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > hot_block_threshold)
    )
    salted = keyed.join(F.broadcast(hot), "_bkey", "left").withColumn(
        "_s",
        F.when(
            F.col("_bn").isNull(), F.lit(1)
        ).otherwise(
            F.least(
                F.lit(max_salt),
                F.ceil(F.col("_bn") / F.lit(hot_block_threshold)),
            )
        ).cast("int"),
    )
    left = salted.withColumn(
        "_salt", F.pmod(F.xxhash64("_rk"), F.col("_s")).cast("int")
    )
    right = salted.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.col("_s") - 1))
    )
    if link_only:
        # one equi-join per ordered dataset pair, sides pre-filtered to one
        # dataset each — intra-dataset row combinations never enter a hash
        # bucket.  The dataset list is metadata-cardinality (a handful).
        datasets = sorted(
            r["_ds"] for r in keyed.select("_ds").distinct().collect()
        )
        if len(datasets) < 2:
            raise ValueError("link_only blocking needs >= 2 datasets")
        joined = []
        for i, a in enumerate(datasets):
            for b in datasets[i + 1:]:
                joined.append(
                    left.filter(F.col("_ds") == a).alias("l")
                    .join(
                        right.filter(F.col("_ds") == b).alias("r"),
                        (F.col("l._bkey") == F.col("r._bkey"))
                        & (F.col("l._salt") == F.col("r._salt")),
                    )
                    .select(*_pair_select())
                )
        pairs = joined[0]
        for j in joined[1:]:
            pairs = pairs.unionByName(j)
    else:
        pairs = (
            left.alias("l")
            .join(
                right.alias("r"),
                (F.col("l._bkey") == F.col("r._bkey"))
                & (F.col("l._salt") == F.col("r._salt"))
                & (F.col("l._rk") < F.col("r._rk")),
            )
            .select(*_pair_select())
        )
    return canonicalize_pairs(pairs)


# ---------------------------------------------------------------------------
# Rule 2: MinHash-LSH over token shingles (built-in functions only)
# ---------------------------------------------------------------------------
def _shingles(text: Column, k: int) -> Column:
    """k-token shingle hash array from a normalized-text column (JVM-side)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    return F.when(n >= k, F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(
            " ", F.slice(toks, i + 1, k)
        )),
    ))).otherwise(F.array(F.xxhash64(text)))


def minhash_signatures(
    records: DataFrame,
    text_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(_ds, _id, _rk, h0..h{H-1}) minhash signature table.

    Formulated as explode(shingles) -> H simple xxhash64 columns ->
    groupBy(record).min per column: each aggregate is a trivial codegen'd
    expression with map-side partial aggregation, instead of one giant
    H-way nested-transform expression (which Catalyst compiles slowly and
    which AQE happily schedules on a single task for byte-small inputs).
    The explicit repartition spreads the CPU-heavy hashing across the
    cluster even when the input is few bytes — minhash cost scales with
    rows x shingles, not bytes, so file-size-based partitioning
    under-parallelizes it.

    The exploded rows carry only a COMPACT 8-byte record key (xxhash64 of
    the string key) through the rows*shingles hash-aggregation — string
    keys on every shingle row triple the memory traffic of the hottest
    stage; the readable key columns are joined back onto the aggregated
    (one-row-per-record) signatures afterwards.  A 64-bit key collision
    merges two records' shingle sets in CANDIDATE generation only —
    downstream scoring verifies every candidate pair, so a collision can
    add a spurious candidate, never a wrong final link.
    """
    # multiple task waves (shuffle.partitions, not defaultParallelism) so
    # the CPU-heavy hashing stage doesn't end on its slowest single task
    sc_parallelism = int(
        records.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    keyed = records.select(
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
        record_key(f"`{INPUT_RECORD_DATASET}`", f"`{INPUT_RECORD_ID}`").alias("_rk"),
        F.col(f"`{text_col}`").alias("_txt"),
    ).withColumn("_k8", F.xxhash64("_rk")).repartition(sc_parallelism, "_k8")
    exploded = keyed.select(
        "_k8", F.explode(_shingles(F.col("_txt"), shingle_k)).alias("_sh")
    )
    hashed = exploded.select(
        "_k8",
        *[F.xxhash64(F.lit(i), "_sh").alias(f"h{i}") for i in range(num_hashes)],
    )
    sigs = hashed.groupBy("_k8").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return sigs.join(keyed.select("_k8", "_ds", "_id", "_rk"), "_k8").drop("_k8")


def block_minhash_lsh(
    records: DataFrame,
    text_col: str = "full_text_norm",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    hot_bucket_cap: int = 2000,
    link_only: bool = False,
) -> DataFrame:
    """Candidate pairs whose minhash signatures collide in >=1 LSH band.

    bands * rows_per_band = num_hashes; a pair with Jaccard similarity j
    collides w.p. 1-(1-j^r)^b.  Buckets larger than ``hot_bucket_cap`` are
    dropped (boilerplate text producing near-Cartesian buckets) with the
    drop surfaced in the plan via an explicit filter — the exact-key rule
    with salting is the path that owns genuinely hot keys.

    ``link_only=True`` restricts to cross-dataset pairs (splink
    link_type="link_only") via a join-side dataset split, mirroring
    ``block_on_key``.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(records, text_col, num_hashes, shingle_k)
    banded = sig.select(
        "_ds", "_id", "_rk",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * r + i}") for i in range(r)]).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("_bb"),
    ).select("_ds", "_id", "_rk", "_bb.band", "_bb.bucket")

    # Drop HOT buckets via a WINDOW count over the same (band, bucket)
    # partitioning the self-join below needs (round-6 optimization): the
    # former groupBy + broadcast-anti-join planned the banded subtree (and
    # the whole minhash signature pipeline under it) THREE times — once for
    # the bucket-size aggregation and once per self-join side, 52 Exchange
    # nodes and zero reuse in the round-start plan.  The window introduces
    # exactly ONE exchange, both join sides reuse it (ReusedExchange), and
    # the join needs no further shuffle or sort because the window already
    # partitioned AND sorted by the join key.  Guide §2.4 (remove shuffles /
    # share one exchange between operations keyed the same way).
    # Trade documented: rows of an over-cap bucket now cross the exchange
    # once before being dropped (linear, spills gracefully) where the anti
    # join dropped them pre-shuffle — the price of computing the signature
    # pipeline once instead of three times, which dominates at every scale.
    w_bucket = Window.partitionBy("band", "bucket")
    ok = (
        banded.withColumn("_bn", F.count(F.lit(1)).over(w_bucket))
        .filter(F.col("_bn") <= hot_bucket_cap)
        .drop("_bn")
    )
    if link_only:
        datasets = sorted(
            r["_ds"] for r in ok.select("_ds").distinct().collect()
        )
        if len(datasets) < 2:
            raise ValueError("link_only blocking needs >= 2 datasets")
        joined = []
        for i, a in enumerate(datasets):
            for b in datasets[i + 1:]:
                joined.append(
                    ok.filter(F.col("_ds") == a).alias("l")
                    .join(
                        ok.filter(F.col("_ds") == b).alias("r"),
                        (F.col("l.band") == F.col("r.band"))
                        & (F.col("l.bucket") == F.col("r.bucket")),
                    )
                    .select(*_pair_select())
                )
        pairs = joined[0]
        for j in joined[1:]:
            pairs = pairs.unionByName(j)
        pairs = pairs.dropDuplicates(PAIR_COLS)
    else:
        pairs = (
            ok.alias("l")
            .join(
                ok.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l._rk") < F.col("r._rk")),
            )
            .select(*_pair_select())
            .dropDuplicates(PAIR_COLS)
        )
    return canonicalize_pairs(pairs)


# ---------------------------------------------------------------------------
# Rule 3: sorted neighborhood (distributed, exact global-window semantics)
# ---------------------------------------------------------------------------
def block_sorted_neighborhood(
    records: DataFrame,
    sort_key: str = "first_text_norm",
    window: int = 3,
    bucket_prefix_len: int = 2,
) -> DataFrame:
    """Pairs of records within +/-``window`` positions of each other when
    globally sorted by ``(sort_key, dataset, id)`` — EXACT window semantics,
    fully executor-side.

    Distribution strategy (no global orderBy, no driver collect):

    1. bucket rows by a fixed-length key prefix (deterministic and
       partitioning-independent, unlike repartitionByRange's sampled
       boundaries) and rank within each bucket in parallel;
    2. per-bucket row counts -> cumulative offsets via a window over the
       *bucket-size table* (metadata-scale: one row per distinct prefix,
       single tiny partition) -> broadcast-joined back, giving every row its
       exact GLOBAL sort position;
    3. a pair (i, j) with 0 < pos_j - pos_i <= w has
       floor(pos_j/w) - floor(pos_i/w) in {0, 1}, so two equi-joins on the
       position band (same band + next band) + a range filter enumerate
       exactly the window pairs — windows spanning any number of bucket
       boundaries included, no head replication, no truncation.

    Each row lands in O(1) join rows and each pair is produced exactly once
    (same-band and next-band pair sets are disjoint), so the plan is two
    shuffles regardless of bucket-size distribution.
    """
    keyed = records.select(
        F.col(f"`{sort_key}`").alias("_k"),
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
    ).filter(F.col("_k").isNotNull() & (F.col("_k") != ""))
    keyed = keyed.withColumn("_bucket", F.substring("_k", 1, bucket_prefix_len))

    # rank within bucket (parallel across buckets)
    w_in = Window.partitionBy("_bucket").orderBy("_k", "_ds", "_id")
    ranked = keyed.withColumn("_rn", F.row_number().over(w_in))

    # bucket offsets: cumulative sum over the tiny distinct-bucket table
    # (single-partition window over metadata-cardinality rows, never data)
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        keyed.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
        .select("_bucket", "_off")
    )
    pos = ranked.join(F.broadcast(offsets), "_bucket").select(
        "_ds", "_id", (F.col("_off") + F.col("_rn") - 1).alias("_g")
    ).withColumn("_band", F.floor(F.col("_g") / F.lit(window)))

    l = pos.select(
        F.col("_ds").alias("_lds"), F.col("_id").alias("_lid"),
        F.col("_g").alias("_gl"), F.col("_band").alias("_bl"),
    )
    r = pos.select(
        F.col("_ds").alias("_rds"), F.col("_id").alias("_rid"),
        F.col("_g").alias("_gr"), F.col("_band").alias("_br"),
    )
    in_window = (F.col("_gr") > F.col("_gl")) & (
        F.col("_gr") - F.col("_gl") <= window
    )
    same = l.join(r, F.col("_bl") == F.col("_br")).filter(in_window)
    nxt = l.join(r, F.col("_bl") + 1 == F.col("_br")).filter(in_window)
    pairs = same.unionByName(nxt).select(
        F.col("_lds").alias(LEFT_DATASET),
        F.col("_lid").alias(LEFT_ID),
        F.col("_rds").alias(RIGHT_DATASET),
        F.col("_rid").alias(RIGHT_ID),
    )
    return canonicalize_pairs(pairs)


# ---------------------------------------------------------------------------
# Union of rules with splink-style match_key dedup
# ---------------------------------------------------------------------------
def union_blocking_rules(rule_pairs: list[DataFrame]) -> DataFrame:
    """Union candidate pairs of several rules; a pair produced by rules
    {i, j, ...} keeps the lowest rule index as ``match_key``
    (splink's match-key semantics, splink_blocking_and_filtering.py:74-91)."""
    tagged = [
        df.select(*[F.col(f"`{c}`") for c in PAIR_COLS],
                  F.lit(i).alias(MATCH_KEY))
        for i, df in enumerate(rule_pairs)
    ]
    allp = tagged[0]
    for t in tagged[1:]:
        allp = allp.unionByName(t)
    return (
        allp.groupBy(*[F.col(f"`{c}`") for c in PAIR_COLS])
        .agg(F.min(MATCH_KEY).alias(MATCH_KEY))
    )


def with_block_id(pairs: DataFrame) -> DataFrame:
    """Stamp a deterministic block id (reference's blocks-directory analog:
    one DataFrame with a block column instead of block_*/ subdirs)."""
    return pairs.withColumn(
        BLOCK_ID, F.pmod(F.xxhash64(F.col(f"`{LEFT_DATASET}`"),
                                    F.col(f"`{LEFT_ID}`")), F.lit(4096))
    )
