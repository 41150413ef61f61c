"""Physical-plan regression tests — the scale properties the prose claims.

The 100 TB arguments in ARCHITECTURE.md rest on specific Catalyst plan
shapes: no cartesian products anywhere in pair generation, column pruning
reaching the parquet scan, hash (not nested-loop) joins in the scoring
attach, and broadcast of the tiny hot-key tables.  A refactor can silently
lose any of these while every row-level test stays green — these tests pin
the plan text itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easylink_spark.operators import blocking as B
from easylink_spark.operators import scoring as S
from easylink_spark.operators.features import conversation_features
from easylink_spark.synth import synth_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def records(spark, tmp_path_factory):
    """Records read from PARQUET (not an in-memory frame) so scan-level
    pushdown/pruning is actually observable in the plan."""
    d = str(tmp_path_factory.mktemp("plan") / "records")
    t = synth_transcripts(spark, n_entities=60, seed=5).drop("entity_id")
    conversation_features(t, validate=False).write.parquet(d)
    return spark.read.parquet(d)


def test_blocking_has_no_cartesian_product(spark, records):
    pairs = B.union_blocking_rules([
        B.block_on_key(records, F.col("first_prefix")),
        B.block_minhash_lsh(records, "full_text_norm"),
    ])
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocking_prunes_record_columns(spark, records):
    """The pairs plan must not drag the fat per-turn array through the
    blocking shuffles: the parquet scans feeding pair generation read only
    the key + id columns."""
    pairs = B.block_on_key(records, F.col("first_prefix"))
    plan = _plan(pairs)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "turn_texts" not in line, line
            assert "full_text_norm" not in line, line
            assert "full_tokens" not in line, line


def test_scoring_attach_uses_hash_join(spark, records):
    """Pairs x records attribute attach must be a hash join (shuffled hash
    per the explicit hint, or broadcast if Catalyst sizes it so) — never a
    sort-merge of the fat side at scale, and never a nested loop."""
    pairs = B.block_on_key(records, F.col("first_prefix"))
    gammas = S.attach_pair_attributes(
        pairs, records, ["first_text_norm", "n_turns"]
    )
    plan = _plan(gammas)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_filter_pushdown_reaches_scan(spark, records):
    flt = records.filter(F.col("n_turns") > 3).select("n_turns")
    plan = _plan(flt)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(n_turns)" in plan or "GreaterThan(n_turns,3)" in plan
