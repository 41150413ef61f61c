"""The shipped examples/ must stay runnable — spec files accepted by the
CLI, generator produces the inputs, and the dedup example executes
end-to-end (reference analog: tests/specifications/e2e/*.yaml are loaded
by the reference's own e2e suite)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = [os.path.join(REPO, "examples", f)
            for f in ("dedup.yaml", "tutorial.yaml")]


@pytest.mark.parametrize("spec", EXAMPLES, ids=os.path.basename)
def test_cli_validate_accepts_example(spec):
    out = subprocess.run(
        [sys.executable, "-m", "easylink_spark", "validate", spec],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert "spec OK" in out.stdout


def test_cli_dag_renders_example():
    out = subprocess.run(
        [sys.executable, "-m", "easylink_spark", "dag", EXAMPLES[0]],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("digraph dedup {")


def test_example_dedup_spec_runs(spark, tmp_path):
    """Generate the example inputs into a tmp dir, then run the SHIPPED
    dedup spec with only its paths re-rooted — the spec itself (pipeline,
    config keys, slot names) is exercised verbatim."""
    from examples.make_inputs import main as make_inputs

    from easylink_spark.plans.spec import load_spec, run_spec

    data = tmp_path / "data"
    make_inputs(out=str(data), n_entities=40)
    spec = load_spec(os.path.join(REPO, "examples", "dedup.yaml"))
    spec["input"]["transcripts"] = str(data / "transcripts.parquet")
    spec["checkpoint_dir"] = str(tmp_path / "ckpt")
    spec["output"] = str(tmp_path / "clusters")
    clusters = run_spec(spec, spark)
    assert clusters.count() > 0
    assert {"Input Record Dataset", "Input Record ID", "Cluster ID"} \
        <= set(clusters.columns)


def test_example_tutorial_spec_runs(spark, tmp_path):
    from examples.make_inputs import main as make_inputs

    from easylink_spark.plans.spec import load_spec, run_spec

    data = tmp_path / "data"
    make_inputs(out=str(data), n_entities=5)  # transcripts unused here
    spec = load_spec(os.path.join(REPO, "examples", "tutorial.yaml"))
    spec["input"] = {
        "input_file_ssa": str(data / "input_file_ssa.parquet"),
        "input_file_w2": str(data / "input_file_w2.parquet"),
    }
    clusters = run_spec(spec, spark)
    pdf = clusters.toPandas()
    assert len(pdf) > 0
    # the generated universes overlap person-for-person: the linkage must
    # find multi-record clusters (true links), not only singletons
    assert (pdf.groupby("Cluster ID").size() > 1).any()
