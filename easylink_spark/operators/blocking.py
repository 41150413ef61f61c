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
   bucketing + per-bucket sort inside ``applyInPandas``, with next-bucket
   head replication so windows spanning bucket boundaries are not lost.

All rule outputs are canonicalized (left < right; F5 in SURVEY.md) and
unioned with splink-style ``match_key`` retention (lowest rule index wins).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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
    dataset and, within a dataset, left id < right id; drop self-pairs."""
    lds, rds = F.col(f"`{LEFT_DATASET}`"), F.col(f"`{RIGHT_DATASET}`")
    lid = F.col(f"`{LEFT_ID}`").cast("string")
    rid = F.col(f"`{RIGHT_ID}`").cast("string")
    swap = (lds > rds) | ((lds == rds) & (lid > rid))
    out = pairs
    extra = [c for c in pairs.columns if c not in PAIR_COLS]
    out = out.select(
        F.when(swap, rds).otherwise(lds).alias(LEFT_DATASET),
        F.when(swap, F.col(f"`{RIGHT_ID}`")).otherwise(F.col(f"`{LEFT_ID}`")).alias(LEFT_ID),
        F.when(swap, lds).otherwise(rds).alias(RIGHT_DATASET),
        F.when(swap, F.col(f"`{LEFT_ID}`")).otherwise(F.col(f"`{RIGHT_ID}`")).alias(RIGHT_ID),
        *[F.col(f"`{c}`") for c in extra],
    )
    not_self = ~((F.col(f"`{LEFT_DATASET}`") == F.col(f"`{RIGHT_DATASET}`"))
                 & (F.col(f"`{LEFT_ID}`").cast("string")
                    == F.col(f"`{RIGHT_ID}`").cast("string")))
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
) -> DataFrame:
    """All unordered record pairs sharing ``key`` exactly.

    Pairs within a block of size n are n*(n-1)/2.  Blocks larger than
    ``hot_block_threshold`` are salted: each left row lands in one of S salt
    groups (S = ceil(n / threshold), capped); right rows are replicated to
    every salt group.  Every cross pair is still produced exactly once
    (under the left row's salt), but the work for a hot key spreads over S
    tasks.  Small blocks take the S=1 fast path untouched.
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
    """
    sc_parallelism = records.sparkSession.sparkContext.defaultParallelism
    keyed = records.select(
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
        record_key(f"`{INPUT_RECORD_DATASET}`", f"`{INPUT_RECORD_ID}`").alias("_rk"),
        F.col(f"`{text_col}`").alias("_txt"),
    ).repartition(sc_parallelism, "_rk")
    exploded = keyed.select(
        "_ds", "_id", "_rk", F.explode(_shingles(F.col("_txt"), shingle_k)).alias("_sh")
    )
    hashed = exploded.select(
        "_ds", "_id", "_rk",
        *[F.xxhash64(F.lit(i), "_sh").alias(f"h{i}") for i in range(num_hashes)],
    )
    return hashed.groupBy("_ds", "_id", "_rk").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )


def block_minhash_lsh(
    records: DataFrame,
    text_col: str = "full_text_norm",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    hot_bucket_cap: int = 2000,
) -> DataFrame:
    """Candidate pairs whose minhash signatures collide in >=1 LSH band.

    bands * rows_per_band = num_hashes; a pair with Jaccard similarity j
    collides w.p. 1-(1-j^r)^b.  Buckets larger than ``hot_bucket_cap`` are
    dropped (boilerplate text producing near-Cartesian buckets) with the
    drop surfaced in the plan via an explicit filter — the exact-key rule
    with salting is the path that owns genuinely hot keys.
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

    # drop HOT buckets via a broadcast anti join — the hot set is tiny (or
    # empty), unlike the full bucket-size table, whose broadcast build cost
    # was a measured serial bottleneck
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > hot_bucket_cap)
    )
    ok = banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
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
# Rule 3: sorted neighborhood (distributed, bucket + boundary-head replication)
# ---------------------------------------------------------------------------
def block_sorted_neighborhood(
    records: DataFrame,
    sort_key: str = "first_text_norm",
    window: int = 3,
    bucket_prefix_len: int = 2,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Pairs of records within +/-``window`` positions of each other when
    sorted by ``sort_key``.

    Distribution strategy: bucket rows by a fixed-length key prefix
    (deterministic, partitioning-independent), sort each bucket in
    ``applyInPandas``, emit sliding-window pairs; additionally replicate each
    bucket's first ``window`` rows into the *previous* bucket so windows that
    span a bucket boundary are found.  (A global orderBy+lead window would be
    a single-partition bottleneck at scale — SURVEY §2.5.)
    """
    keyed = records.select(
        F.col(f"`{sort_key}`").alias("_k"),
        F.col(f"`{INPUT_RECORD_DATASET}`").alias("_ds"),
        F.col(f"`{INPUT_RECORD_ID}`").alias("_id"),
    ).filter(F.col("_k").isNotNull() & (F.col("_k") != ""))
    keyed = keyed.withColumn("_bucket", F.substring("_k", 1, bucket_prefix_len))

    # first `window` rows of each bucket, re-tagged to the previous bucket
    w = Window.partitionBy("_bucket").orderBy("_k", "_ds", "_id")
    heads = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= window)
        .drop("_rn")
    )
    buckets = [r["_bucket"] for r in
               keyed.select("_bucket").distinct().orderBy("_bucket").collect()]
    prev = {b: buckets[i - 1] for i, b in enumerate(buckets) if i > 0}
    if prev:
        mapping = F.create_map(*[x for b, p in prev.items()
                                 for x in (F.lit(b), F.lit(p))])
        heads = heads.withColumn("_bucket", mapping[F.col("_bucket")]).filter(
            F.col("_bucket").isNotNull()
        )
        tagged = keyed.unionByName(heads)
    else:
        tagged = keyed

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_k", "_ds", "_id"]).reset_index(drop=True)
        if len(pdf) > max_bucket:
            pdf = pdf.iloc[:max_bucket]
        rows = []
        n = len(pdf)
        for i in range(n):
            for j in range(i + 1, min(i + 1 + window, n)):
                rows.append((pdf["_ds"].iat[i], pdf["_id"].iat[i],
                             pdf["_ds"].iat[j], pdf["_id"].iat[j]))
        return pd.DataFrame(rows, columns=["lds", "lid", "rds", "rid"])

    pairs = tagged.groupBy("_bucket").applyInPandas(
        emit, schema="lds string, lid string, rds string, rid string"
    ).select(
        F.col("lds").alias(LEFT_DATASET),
        F.col("lid").alias(LEFT_ID),
        F.col("rds").alias(RIGHT_DATASET),
        F.col("rid").alias(RIGHT_ID),
    )
    return canonicalize_pairs(pairs).dropDuplicates(PAIR_COLS)


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
