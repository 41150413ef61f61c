"""Framework tests: validated slots, pipeline execution, graph operators
(mirrors the reference's tests/unit/test_step.py concerns at our altitude)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.plans.framework import Pipeline, Slot, Stage, choice, clone, loop
from easylink_spark.sources.readers import read_datasets_dir, read_table, resolve_inputs


def test_stage_validates_input_and_output(spark):
    bad = spark.createDataFrame([(1,), (1,)], f"`{K.RECORD_ID}` long")

    st = Stage(
        "s",
        lambda ins: {"out": ins["in"]},
        inputs=[Slot("in", K.validate_dataset)],
        outputs=[Slot("out")],
    )
    with pytest.raises(K.ContractViolation):
        st.run({"in": bad})

    good = spark.createDataFrame([(1,), (2,)], f"`{K.RECORD_ID}` long")
    out = st.run({"in": good})
    assert out["out"].count() == 2


def test_stage_missing_slot(spark):
    st = Stage("s", lambda ins: {}, inputs=[Slot("nope")], outputs=[])
    with pytest.raises(KeyError, match="missing input slots"):
        st.run({})


def test_pipeline_dataflow(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "`Record ID` long, v long")
    double = Stage(
        "double",
        lambda ins: {"doubled": ins["src"].withColumn("v", F.col("v") * 2)},
        [Slot("src")], [Slot("doubled")],
    )
    total = Stage(
        "total",
        lambda ins: {"sum": ins["doubled"].agg(F.sum("v").alias("s"))},
        [Slot("doubled")], [Slot("sum")],
    )
    env = Pipeline([double, total]).run({"src": df})
    assert env["sum"].collect()[0]["s"] == 22


def test_loop_operator(spark):
    df = spark.createDataFrame([(1,)], "v long")
    inc = Stage(
        "inc",
        lambda ins: {"state": ins["state"].withColumn("v", F.col("v") + 1)},
        [Slot("state")], [Slot("state")],
    )
    looped = loop(inc, 3, "state")
    out = looped.run({"state": df})
    assert out["state"].collect()[0]["v"] == 4


def test_clone_operator(spark):
    df = spark.createDataFrame([(1,)], "v long")
    tag = Stage(
        "tag",
        lambda ins: {"tagged": ins["src"].withColumn("tag", F.lit(ins["label"]))},
        [Slot("src")], [Slot("tagged")],
    )
    cloned = clone(tag, [{"label": "a"}, {"label": "b"}], "tagged")
    out = cloned.run({"src": df})
    assert {r["tag"] for r in out["tagged"].collect()} == {"a", "b"}


def test_choice_operator(spark):
    a = Stage("a", lambda ins: {"o": ins["i"]}, [Slot("i")], [Slot("o")])
    b = Stage("b", lambda ins: {"o": ins["i"].limit(0)}, [Slot("i")], [Slot("o")])
    assert choice({"a": a, "b": b}, "a") is a
    with pytest.raises(ValueError, match="unknown choice"):
        choice({"a": a}, "zzz")


def test_readers(spark, tmp_ckpt):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    df.write.mode("overwrite").parquet(tmp_ckpt + "/alpha.parquet")
    df.write.mode("overwrite").option("header", True).csv(tmp_ckpt + "/beta.csv")

    assert read_table(spark, tmp_ckpt + "/alpha.parquet").count() == 1
    assert read_table(spark, tmp_ckpt + "/beta.csv").count() == 1

    tables = read_datasets_dir(spark, tmp_ckpt)
    assert set(tables) == {"alpha", "beta"}

    resolved = resolve_inputs(spark, {"one": tmp_ckpt + "/alpha.parquet"})
    assert resolved["one"].columns == ["id", "s"]
