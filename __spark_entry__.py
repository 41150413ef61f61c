"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — derive a transcripts table from the
  sf0.001 documents parquet (each document becomes a multi-turn
  conversation, plus a deterministically perturbed near-duplicate copy),
  run the full block -> compare -> score -> cluster pipeline, and return
  the clusters DataFrame.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2, registered in easylink_spark/plans/driver_queries.py with
  the equivalent DuckDB SQL where SQL-expressible.
"""

from __future__ import annotations

import sys
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the driver's documents table into the
    transcripts contract: each document -> one conversation (12-token
    turns, alternating roles), plus one perturbed duplicate copy per even
    doc_id (uppercased first turn, last turn dropped) so the pipeline has
    true near-duplicates to find."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n_turns = F.greatest((F.size(toks) / 12).cast("int"), F.lit(2))
    base = docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_turns - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * 12 + 1, 12)
                ),
            )
        ).alias("turn_idx", "text"),
    ).filter(F.col("text") != "")
    base = base.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
        "text",
        F.when(F.col("turn_idx") % 3 == 2, "search").otherwise(None).alias("tool"),
        (
            F.lit("2025-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id") * 60 + F.col("turn_idx"))
        ).alias("ts"),
        "doc_id",
    )
    dup = (
        base.filter(F.col("doc_id") % 2 == 0)
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_dup")))
        .withColumn(
            "text",
            F.when(F.col("turn_idx") == 0, F.upper(F.col("text"))).otherwise(
                F.col("text")
            ),
        )
    )
    max_t = dup.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    dup = dup.join(max_t, "conv_id").filter(
        (F.col("turn_idx") < F.col("mx")) | (F.col("mx") == 1)
    ).drop("mx")
    return base.unionByName(dup).drop("doc_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from easylink_spark.plans.dedup import DedupConfig, run_dedup

    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    ckpt = tempfile.mkdtemp(prefix="elspark_entry_")
    return run_dedup(spark, transcripts, ckpt, DedupConfig(threshold=0.8))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from easylink_spark.plans import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible)."""
    from easylink_spark.plans import driver_queries

    return driver_queries.oracle_sql()
