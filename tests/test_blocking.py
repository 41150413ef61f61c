"""Blocking rule tests (J1 family): exact key + salting, LSH, SNM, union."""

from __future__ import annotations

from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.operators import blocking as B


def _records(spark, rows):
    """rows: (dataset, id, key, text)"""
    return spark.createDataFrame(
        rows,
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        "key string, text string",
    )


def pair_set(df):
    return {
        (r[K.LEFT_DATASET], r[K.LEFT_ID], r[K.RIGHT_DATASET], r[K.RIGHT_ID])
        for r in df.collect()
    }


def test_canonicalize_pairs(spark):
    pairs = spark.createDataFrame(
        [("b", "1", "a", "2"), ("a", "5", "a", "3"), ("a", "4", "a", "4")],
        f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
        f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string",
    )
    out = B.canonicalize_pairs(pairs)
    K.validate_pairs(out)
    assert pair_set(out) == {("a", "2", "b", "1"), ("a", "3", "a", "5")}


def test_block_on_key_basic(spark):
    recs = _records(
        spark,
        [("d", "1", "k1", ""), ("d", "2", "k1", ""), ("d", "3", "k1", ""),
         ("d", "4", "k2", ""), ("d", "5", None, ""), ("d", "6", "k3", "")],
    )
    pairs = B.block_on_key(recs, F.col("key"))
    K.validate_pairs(pairs)
    assert pair_set(pairs) == {
        ("d", "1", "d", "2"), ("d", "1", "d", "3"), ("d", "2", "d", "3")
    }


def test_block_on_key_salting_preserves_pairs(spark):
    """A hot key must produce the exact same pair set whether salted or not."""
    rows = [("d", f"{i:03d}", "hot", "") for i in range(40)]
    rows += [("d", f"x{i}", f"cold{i}", "") for i in range(5)]
    recs = _records(spark, rows)
    unsalted = pair_set(B.block_on_key(recs, F.col("key"),
                                       hot_block_threshold=10_000))
    salted = pair_set(B.block_on_key(recs, F.col("key"),
                                     hot_block_threshold=8, max_salt=4))
    assert len(unsalted) == 40 * 39 // 2
    assert salted == unsalted


def test_minhash_lsh_finds_near_duplicates(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight")
    near = base.replace("quick", "swift").replace("tonight", "today")
    other = ("completely different words about spark partitions shuffles "
             "joins aggregations windows and catalyst optimization plans")
    recs = _records(
        spark,
        [("d", "1", "", base), ("d", "2", "", near), ("d", "3", "", other),
         ("d", "4", "", base)],
    )
    pairs = B.block_minhash_lsh(recs, "text", num_hashes=32, bands=16)
    got = pair_set(pairs)
    assert ("d", "1", "d", "2") in got
    assert ("d", "1", "d", "4") in got
    assert not any("3" in (p[1], p[3]) for p in got)


def test_sorted_neighborhood(spark):
    recs = _records(
        spark,
        [("d", "1", "aaa", ""), ("d", "2", "aab", ""), ("d", "3", "aac", ""),
         ("d", "4", "zzz", "")],
    )
    pairs = B.block_sorted_neighborhood(recs, "key", window=1, bucket_prefix_len=2)
    got = pair_set(pairs)
    # window=1: only adjacent-in-sort-order pairs; aac/zzz are in different
    # buckets AND adjacent, caught by boundary-head replication
    assert ("d", "1", "d", "2") in got
    assert ("d", "2", "d", "3") in got
    assert ("d", "1", "d", "3") not in got
    assert ("d", "3", "d", "4") in got


def test_sorted_neighborhood_spans_many_buckets(spark):
    # single-row buckets: a window-3 pair spans THREE bucket boundaries;
    # exact global-position semantics must still find it, and must also
    # produce exactly the |i-j|<=3 pair set and nothing else
    recs = _records(
        spark,
        [("d", "1", "aa", ""), ("d", "2", "bb", ""), ("d", "3", "cc", ""),
         ("d", "4", "dd", ""), ("d", "5", "ee", "")],
    )
    pairs = B.block_sorted_neighborhood(recs, "key", window=3, bucket_prefix_len=2)
    got = pair_set(pairs)
    expected = {
        ("d", str(i), "d", str(j))
        for i in range(1, 6) for j in range(i + 1, 6) if j - i <= 3
    }
    assert got == expected


def test_sorted_neighborhood_integer_ids_numeric_order(spark):
    # ids 2 and 10 in one bucket: canonical order must be numeric (2, 10)
    recs = spark.createDataFrame(
        [("d", 10, "aa"), ("d", 2, "ab")],
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` long, key string",
    )
    pairs = B.block_sorted_neighborhood(recs, "key", window=1, bucket_prefix_len=1)
    rows = [(r[K.LEFT_ID], r[K.RIGHT_ID]) for r in pairs.collect()]
    assert rows == [(2, 10)]


def test_union_blocking_rules_match_key(spark):
    schema = (
        f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
        f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string"
    )
    rule0 = spark.createDataFrame([("d", "1", "d", "2")], schema)
    rule1 = spark.createDataFrame([("d", "1", "d", "2"), ("d", "2", "d", "3")], schema)
    merged = B.union_blocking_rules([rule0, rule1])
    rows = {(r[K.LEFT_ID], r[K.RIGHT_ID]): r[B.MATCH_KEY] for r in merged.collect()}
    assert rows == {("1", "2"): 0, ("2", "3"): 1}
