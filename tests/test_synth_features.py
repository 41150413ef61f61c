"""Synthetic corpus invariants (FIXTURES.md §1) + feature extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.operators.features import conversation_features, normalize_text
from easylink_spark.synth import labels_of, synth_transcripts


def test_synth_invariants(spark):
    t = synth_transcripts(spark, n_entities=40, seed=42).cache()
    # (conv_id, turn_idx) unique
    assert (
        t.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    )
    # turn_idx dense from 0
    bad = (
        t.groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"),
             F.count("*").alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    )
    assert bad.count() == 0
    # ts monotone within conversation
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    non_mono = t.withColumn("prev", F.lag("ts").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))
    )
    assert non_mono.count() == 0
    # some entities have duplicate conversations
    assert labels_of(t).groupBy("entity_id").count().filter("count>1").count() > 0
    t.unpersist()


def test_synth_partitioning_independent(spark):
    a = synth_transcripts(spark, n_entities=25, seed=7, partitions=1)
    b = synth_transcripts(spark, n_entities=25, seed=7, partitions=13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!  ",)], "s string")
    assert df.select(normalize_text(F.col("s")).alias("n")).collect()[0]["n"] == "hello world"


def test_conversation_features(spark):
    t = synth_transcripts(spark, n_entities=20, seed=42).drop("entity_id")
    feats = conversation_features(t).cache()
    n_convs = t.select("conv_id").distinct().count()
    assert feats.count() == n_convs
    row = feats.filter(
        F.col(f"`{K.INPUT_RECORD_ID}`") == "conv_00000000_00"
    ).collect()[0]
    # full text = ordered concat of normalized turns; first turn is its prefix
    assert row["full_text_norm"].startswith(row["first_text_norm"])
    assert row["first_prefix"] == row["first_text_norm"][:24]
    assert row["n_turns"] == len(row["turn_texts"])
    assert row["role_tool_sig"].startswith("user|assistant")
    feats.unpersist()


def test_duplicate_first_turns_normalize_identically(spark):
    """The per-turn perturbations on copies are normalization-recoverable in
    the first turn — the exact-blocking anchor."""
    t = synth_transcripts(spark, n_entities=30, seed=42)
    firsts = (
        t.filter(F.col("turn_idx") == 0)
        .select("entity_id", normalize_text(F.col("text")).alias("norm"))
        .groupBy("entity_id")
        .agg(F.countDistinct("norm").alias("k"))
    )
    assert firsts.filter("k > 1").count() == 0
