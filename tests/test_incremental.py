"""Cascading passes (LoopStep semantics), streaming foreachBatch merge,
and 1:1 assignment (G5)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.operators import clustering as G
from easylink_spark.operators.assignment import one_to_one_assignment
from easylink_spark.streaming.incremental import (
    cascade_passes,
    incremental_foreachBatch,
)


def _clusters(spark, rows):
    return spark.createDataFrame(
        rows,
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        f"`{K.CLUSTER_ID}` string",
    )


def partition_of(clusters):
    comps = {}
    for r in clusters.collect():
        key = (r[K.INPUT_RECORD_DATASET], str(r[K.INPUT_RECORD_ID]))
        comps.setdefault(r[K.CLUSTER_ID], set()).add(key)
    return {frozenset(v) for v in comps.values()}


def test_cascade_two_passes(spark):
    """Pass 1 clusters {1,2}; pass 2 runs on the remaining records and
    clusters {3,4}; state accumulates both."""
    dataset = spark.createDataFrame(
        [(i, f"r{i}") for i in range(1, 6)], f"`{K.RECORD_ID}` long, attr string"
    )

    def pass1(records):
        return _clusters(spark, [("d", "1", "a"), ("d", "2", "a")])

    def pass2(records):
        # the exclusion must have removed records 1 and 2
        ids = {r[K.RECORD_ID] for r in records.collect()}
        assert ids == {3, 4, 5}, ids
        return _clusters(spark, [("d", "3", "b"), ("d", "4", "b")])

    final = cascade_passes(spark, dataset, "d", [pass1, pass2])
    assert partition_of(final) == {
        frozenset({("d", "1"), ("d", "2")}),
        frozenset({("d", "3"), ("d", "4")}),
    }


def test_incremental_foreach_batch(spark, tmp_ckpt):
    """Two micro-batches of links; state after both = transitive merge."""
    src_dir = tempfile.mkdtemp(prefix="elspark_stream_src_")
    state = tmp_ckpt + "/state"
    links_schema = (
        f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
        f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string, "
        f"`{K.PROBABILITY}` double"
    )
    batch1 = spark.createDataFrame([("d", "1", "d", "2", 0.9)], links_schema)
    batch1.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(links_schema).parquet(src_dir)
    q = incremental_foreachBatch(stream, tmp_ckpt + "/chk", state).start()
    q.awaitTermination(120)

    got1 = partition_of(spark.read.parquet(state))
    assert got1 == {frozenset({("d", "1"), ("d", "2")})}

    # second batch links 2-3: must merge transitively into {1,2,3}
    batch2 = spark.createDataFrame([("d", "2", "d", "3", 0.95)], links_schema)
    batch2.write.mode("append").parquet(src_dir)
    q2 = incremental_foreachBatch(stream, tmp_ckpt + "/chk", state).start()
    q2.awaitTermination(120)

    got2 = partition_of(spark.read.parquet(state))
    assert got2 == {frozenset({("d", "1"), ("d", "2"), ("d", "3")})}
    shutil.rmtree(src_dir, ignore_errors=True)


def test_one_to_one_assignment(spark):
    links = spark.createDataFrame(
        [
            ("a", "1", "b", "x", 0.9, 0),
            ("a", "1", "b", "y", 0.8, 0),  # 1 already matched to x
            ("a", "2", "b", "x", 0.85, 0),  # x already matched to 1
            ("a", "2", "b", "y", 0.6, 0),  # best remaining for 2
            ("a", "9", "b", "z", 0.7, 1),  # separate block
        ],
        f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
        f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string, "
        f"`{K.PROBABILITY}` double, block_id long",
    )
    out = one_to_one_assignment(links, "block_id")
    got = {(r[K.LEFT_ID], r[K.RIGHT_ID]) for r in out.collect()}
    # optimal 1:1 (both greedy and Hungarian agree here):
    assert got == {("1", "x"), ("2", "y"), ("9", "z")}
    # each left and right key used at most once
    assert out.groupBy(f"`{K.LEFT_ID}`").count().filter("count>1").count() == 0
    assert out.groupBy(f"`{K.RIGHT_ID}`").count().filter("count>1").count() == 0
