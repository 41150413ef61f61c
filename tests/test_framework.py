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


def test_pipeline_topological_order_and_cycles(spark):
    """A shuffled stage list must produce identical output (Pipeline.run
    topo-sorts by slot dataflow, reference pipeline_graph.py:164-300), and a
    dataflow cycle must raise instead of silently mis-running."""
    from easylink_spark.plans.framework import PipelineGraphError

    src = spark.createDataFrame([(1,), (2,)], "v long")
    double = Stage("double", lambda ins: {"d": ins["raw"].selectExpr("v*2 AS v")},
                   [Slot("raw")], [Slot("d")])
    inc = Stage("inc", lambda ins: {"out": ins["d"].selectExpr("v+1 AS v")},
                [Slot("d")], [Slot("out")])
    ordered = Pipeline([double, inc]).run({"raw": src})
    shuffled = Pipeline([inc, double]).run({"raw": src})  # wrong caller order
    assert sorted(r.v for r in ordered["out"].collect()) == [3, 5]
    assert sorted(r.v for r in shuffled["out"].collect()) == [3, 5]

    cyc_a = Stage("a", lambda ins: {"x": ins["y"]}, [Slot("y")], [Slot("x")])
    cyc_b = Stage("b", lambda ins: {"y": ins["x"]}, [Slot("x")], [Slot("y")])
    with pytest.raises(PipelineGraphError, match="cycle"):
        Pipeline([cyc_a, cyc_b]).run({})
    dup = Stage("dup", lambda ins: {"d": ins["raw"]}, [Slot("raw")], [Slot("d")])
    with pytest.raises(PipelineGraphError, match="produced by both"):
        Pipeline([double, dup]).run({"raw": src})


def test_spec_yaml_pipeline(spark, tmp_ckpt):
    """YAML spec -> configured pipeline run (reference `easylink run` UX,
    configuration.py:278-328), with unknown-key validation."""
    import pytest as _pytest
    import yaml

    from easylink_spark.plans.spec import SpecError, load_spec, run_spec
    from easylink_spark.synth import synth_transcripts

    t_path = tmp_ckpt + "/transcripts"
    synth_transcripts(spark, n_entities=30, seed=7).drop("entity_id") \
        .write.mode("overwrite").parquet(t_path)
    spec_path = tmp_ckpt + "/spec.yaml"
    with open(spec_path, "w") as f:
        yaml.safe_dump({
            "pipeline": "dedup",
            "input": {"transcripts": t_path},
            "checkpoint_dir": tmp_ckpt + "/ckpt",
            "config": {"threshold": 0.85, "use_lsh": False},
        }, f)
    spec = load_spec(spec_path)
    clusters = run_spec(spec, spark)
    assert clusters.count() > 0
    assert "Cluster ID" in clusters.columns

    with open(spec_path, "w") as f:
        yaml.safe_dump({
            "pipeline": "dedup",
            "input": {"transcripts": t_path},
            "checkpoint_dir": tmp_ckpt + "/ckpt2",
            "config": {"no_such_option": 1},
        }, f)
    with _pytest.raises(SpecError, match="no_such_option"):
        run_spec(load_spec(spec_path), spark)
    with open(spec_path, "w") as f:
        yaml.safe_dump({"pipeline": "bogus", "input": {"x": t_path}}, f)
    with _pytest.raises(SpecError, match="pipeline must be one of"):
        load_spec(spec_path)


def test_subpipeline_nested_graphs(spark):
    """HierarchicalStep analog: a whole Pipeline wrapped as one Stage of an
    outer pipeline, nested composition + topo ordering at both levels."""
    from easylink_spark.plans.framework import subpipeline

    src = spark.createDataFrame([(2,), (4,)], "v long")
    inner = Pipeline([
        Stage("sq", lambda ins: {"sq": ins["x"].selectExpr("v*v AS v")},
              [Slot("x")], [Slot("sq")]),
        Stage("neg", lambda ins: {"y": ins["sq"].selectExpr("-v AS v")},
              [Slot("sq")], [Slot("y")]),
    ])
    outer = Pipeline([
        subpipeline("inner", inner, [Slot("x")], [Slot("y")]),
        Stage("shift", lambda ins: {"out": ins["y"].selectExpr("v+1 AS v")},
              [Slot("y")], [Slot("out")]),
    ])
    env = outer.run({"x": src})
    assert sorted(r.v for r in env["out"].collect()) == [-15, -3]


def test_spec_tutorial_pipeline(spark, tmp_ckpt):
    """Spec-driven main-schema tutorial run (`python -m easylink_spark run`)
    with the naive demo configuration: LINK_ONLY blocking, one-to-many into
    the no-duplicates dataset @ 0.996 — reproduces the reference golden
    partition end-to-end from a YAML file (VERDICT round-2 item #10)."""
    import pandas as pd
    import yaml

    from easylink_spark.plans.spec import load_spec, run_spec

    spec_path = tmp_ckpt + "/tutorial.yaml"
    with open(spec_path, "w") as f:
        yaml.safe_dump({
            "pipeline": "tutorial",
            "input": {
                "input_file_ssa":
                    "/root/reference/docs/source/tutorial/2020/input_file_ssa.parquet",
                "input_file_w2":
                    "/root/reference/docs/source/tutorial/2020/input_file_w2.parquet",
            },
            "config": {
                "comparisons":
                    "ssn:exact,first_name:exact,middle_initial:exact,last_name:exact",
                "blocking_rules": ["first_name", "last_name"],
                "training_rules": ["first_name", "last_name"],
                "prior": 0.0001,
                "threshold": 0.996,
                "no_duplicates_dataset": "input_file_ssa",
            },
        }, f)
    clusters = run_spec(load_spec(spec_path), spark)
    got = clusters.toPandas()
    gold = pd.read_csv("/root/reference/tests/e2e/pipeline_naive_results.csv")

    def part(df, ds_col, id_col, cl_col):
        return frozenset(
            df.groupby(cl_col).apply(
                lambda g: frozenset(zip(g[ds_col], g[id_col].astype(int))),
                include_groups=False,
            )
        )

    assert part(got, "Input Record Dataset", "Input Record ID", "Cluster ID") \
        == part(gold, "Input Record Dataset", "Input Record ID", "Cluster ID")


def test_to_dot_golden():
    """generate-dag analog (reference runner.py:338-357): the dedup stage
    graph renders to deterministic graphviz text — golden-string compare,
    mirroring the reference's rule-string golden tests
    (tests/unit/rule_strings/)."""
    noop = lambda ins: {}  # noqa: E731 — to_dot never calls fn
    features = Stage("features", noop,
                     [Slot("transcripts", K.validate_transcripts)],
                     [Slot("records")])
    blocking = Stage("blocking", noop,
                     [Slot("records")], [Slot("pairs")])
    scoring = Stage("scoring", noop,
                    [Slot("pairs"), Slot("records")], [Slot("links")])
    clustering = Stage("clustering", noop,
                       [Slot("links", K.validate_links)], [Slot("clusters")])
    dot = Pipeline([features, blocking, scoring, clustering]).to_dot(
        sources={"transcripts"}, name="dedup"
    )
    assert dot == """\
digraph dedup {
  rankdir=TB;
  node [shape=box, fontname="Helvetica"];
  "src:transcripts" [label="transcripts", shape=ellipse, style=dashed];
  "features";
  "blocking";
  "scoring";
  "clustering";
  "src:transcripts" -> "features" [label="transcripts\\n[validate_transcripts]"];
  "features" -> "blocking" [label="records"];
  "blocking" -> "scoring" [label="pairs"];
  "features" -> "scoring" [label="records"];
  "scoring" -> "clustering" [label="links\\n[validate_links]"];
  "out:clusters" [label="clusters", shape=ellipse];
  "clustering" -> "out:clusters" [label="clusters"];
}"""


def test_to_dot_rejects_bad_graph():
    a = Stage("a", lambda ins: {}, [Slot("x")], [Slot("y")])
    b = Stage("b", lambda ins: {}, [Slot("y")], [Slot("x")])
    from easylink_spark.plans.framework import PipelineGraphError

    with pytest.raises(PipelineGraphError):
        Pipeline([a, b]).to_dot(sources=set())


def test_readme_authoring_example_runs(spark):
    """The README 'Authoring a custom stage' snippet must execute verbatim
    (doctest-style: extracted from README.md, not duplicated here)."""
    import re
    from pathlib import Path

    readme = Path(__file__).parent.parent.joinpath("README.md").read_text()
    section = readme.split("## Authoring a custom stage", 1)[1]
    code = re.search(r"```python\n(.*?)```", section, re.S).group(1)
    transcripts = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, None), ("c1", 1, "assistant", "yo", None, None),
         ("c2", 0, "user", "solo", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ns = {"transcripts": transcripts, "spark": spark}
    exec(compile(code, "README.md", "exec"), ns)  # noqa: S102 — our own docs
    assert ns["env"]["filtered"].count() == 2  # c2 (1 turn) dropped
    assert '"drop_short_convs"' in ns["pipe"].to_dot(sources={"transcripts"})


def test_cli_dag_subcommand(tmp_ckpt):
    """`python -m easylink_spark dag spec.yaml` prints graphviz text for
    the spec's pipeline (reference `easylink generate-dag`)."""
    import contextlib
    import io

    import yaml

    from easylink_spark.__main__ import main as cli_main

    spec_path = tmp_ckpt + "/spec.yaml"
    with open(spec_path, "w") as f:
        yaml.safe_dump({
            "pipeline": "tutorial_cascade",
            "input": {"input_file_w2": tmp_ckpt},
        }, f)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["dag", spec_path])
    assert rc == 0
    dot = buf.getvalue()
    assert dot.startswith("digraph tutorial_cascade {")
    for stage in ("pass1_exact_linkage", "determining_exclusions",
                  "removing_records", "pass2_improved_linkage",
                  "updating_clusters"):
        assert f'"{stage}"' in dot
    assert "[validate_clusters]" in dot
