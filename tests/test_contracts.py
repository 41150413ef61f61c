"""Contract validator tests (mirrors reference tests/unit/test_validations.py)."""

from __future__ import annotations

import pytest

from easylink_spark import contracts as K


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_dataset_valid(spark):
    df = _df(spark, [(1, "a"), (2, "b")], f"`{K.RECORD_ID}` long, name string")
    K.validate_dataset(df)


def test_dataset_duplicate_id(spark):
    df = _df(spark, [(1, "a"), (1, "b")], f"`{K.RECORD_ID}` long, name string")
    with pytest.raises(K.ContractViolation, match="duplicate"):
        K.validate_dataset(df)


def test_dataset_missing_column(spark):
    df = _df(spark, [("a",)], "name string")
    with pytest.raises(K.ContractViolation, match="missing required"):
        K.validate_dataset(df)


def test_records_unique_pair(spark):
    schema = f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string"
    K.validate_records(_df(spark, [("d1", "1"), ("d2", "1")], schema))
    with pytest.raises(K.ContractViolation):
        K.validate_records(_df(spark, [("d1", "1"), ("d1", "1")], schema))


PAIRS_SCHEMA = (
    f"`{K.LEFT_DATASET}` string, `{K.LEFT_ID}` string, "
    f"`{K.RIGHT_DATASET}` string, `{K.RIGHT_ID}` string"
)


def test_pairs_canonical_order_enforced(spark):
    K.validate_pairs(_df(spark, [("a", "1", "a", "2"), ("a", "9", "b", "1")], PAIRS_SCHEMA))
    with pytest.raises(K.ContractViolation, match="canonical"):
        K.validate_pairs(_df(spark, [("a", "2", "a", "1")], PAIRS_SCHEMA))
    with pytest.raises(K.ContractViolation, match="canonical"):
        K.validate_pairs(_df(spark, [("b", "1", "a", "2")], PAIRS_SCHEMA))
    # self-pair is a canonical violation too (left id must be strictly less)
    with pytest.raises(K.ContractViolation, match="canonical"):
        K.validate_pairs(_df(spark, [("a", "1", "a", "1")], PAIRS_SCHEMA))


def test_pairs_subset_of_records(spark):
    pairs = _df(spark, [("a", "1", "a", "2")], PAIRS_SCHEMA)
    records = _df(
        spark,
        [("a", "1")],
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string",
    )
    with pytest.raises(K.ContractViolation, match="not in records"):
        K.validate_pairs(pairs, records)


LINKS_SCHEMA = PAIRS_SCHEMA + f", `{K.PROBABILITY}` double"


def test_links_probability_bounds(spark):
    K.validate_links(_df(spark, [("a", "1", "a", "2", 0.5)], LINKS_SCHEMA))
    with pytest.raises(K.ContractViolation, match="Probability"):
        K.validate_links(_df(spark, [("a", "1", "a", "2", 1.5)], LINKS_SCHEMA))


def test_clusters_unique(spark):
    schema = (
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        f"`{K.CLUSTER_ID}` string"
    )
    K.validate_clusters(_df(spark, [("d", "1", "c1"), ("d", "2", "c1")], schema))
    with pytest.raises(K.ContractViolation):
        K.validate_clusters(_df(spark, [("d", "1", "c1"), ("d", "1", "c2")], schema))


def test_transcripts_contract(spark):
    schema = "conv_id string, turn_idx int, role string, text string"
    K.validate_transcripts(
        _df(spark, [("c1", 0, "user", "hi"), ("c1", 1, "assistant", "yo")], schema)
    )
    with pytest.raises(K.ContractViolation, match="duplicate"):
        K.validate_transcripts(
            _df(spark, [("c1", 0, "user", "hi"), ("c1", 0, "user", "hi")], schema)
        )
    with pytest.raises(K.ContractViolation, match="missing"):
        K.validate_transcripts(_df(spark, [("c1",)], "conv_id string"))


def test_record_key_roundtrip(spark):
    df = _df(spark, [("ds", "id-__-weird")], "d string, i string")
    from pyspark.sql import functions as F

    out = df.select(K.record_key("d", "i").alias("k")).select(
        *[c.alias(n) for c, n in zip(K.split_record_key("k"), ["d2", "i2"])]
    ).collect()[0]
    assert out["d2"] == "ds" and out["i2"] == "id-__-weird"
