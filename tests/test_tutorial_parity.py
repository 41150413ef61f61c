"""Golden parity against the reference's tutorial-scale e2e fixtures.

The reference's real end-to-end bar (tests/e2e/test_pipelines_main_schema.py)
runs the full main-schema demo pipelines on the 2020 w2 (9,903 rows) + ssa
(15,984 rows) fixtures and asserts CLUSTER-PARTITION equality against shipped
golden CSVs: exact for the deterministic naive pipeline
(test_pipelines_main_schema.py:160-182), and <= 0.5% of clusters differing
per direction for the EM-trained "improved" pipelines (:173-180).

Here the same pipelines run through this engine's composition
(plans/tutorial.py) against the same fixtures and the same golden files.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from easylink_spark.contracts import (
    CLUSTER_ID,
    INPUT_RECORD_DATASET,
    INPUT_RECORD_ID,
)
from easylink_spark.plans.tutorial import (
    improved_config,
    run_cascade_pipeline,
    run_tutorial_pipeline,
)

GOLDEN_NAIVE = "/root/reference/tests/e2e/pipeline_naive_results.csv"
GOLDEN_IMPROVED = "/root/reference/tests/e2e/pipeline_improved_results.csv"
GOLDEN_CASCADE = "/root/reference/tests/e2e/pipeline_improved_cascade_results.csv"


def _partition_ours(clusters_df) -> frozenset:
    pdf = clusters_df.toPandas()
    return frozenset(
        pdf.groupby(CLUSTER_ID).apply(
            lambda g: frozenset(
                zip(g[INPUT_RECORD_DATASET], g[INPUT_RECORD_ID].astype(int))
            ),
            include_groups=False,
        )
    )


def _partition_golden(csv_path: str) -> frozenset:
    gold = pd.read_csv(csv_path)
    return frozenset(
        gold.groupby("Cluster ID").apply(
            lambda g: frozenset(
                zip(g["Input Record Dataset"], g["Input Record ID"])
            ),
            include_groups=False,
        )
    )


def test_naive_demo_golden_parity(spark):
    """pipeline_demo_naive.yaml: EXACT partition equality on the 15,816-row
    golden (dataset-aware — strictly stronger than the reference's
    dataset-blind frozenset comparison)."""
    clusters = run_tutorial_pipeline(spark)
    ours = _partition_ours(clusters)
    golden = _partition_golden(GOLDEN_NAIVE)
    only_ours = ours - golden
    only_gold = golden - ours
    assert ours == golden, (
        f"partition mismatch: {len(only_ours)} clusters only in ours "
        f"(sample {list(only_ours)[:3]}), {len(only_gold)} only in golden "
        f"(sample {list(only_gold)[:3]})"
    )


@pytest.mark.slow
def test_improved_demo_golden_parity(spark):
    """pipeline_demo_improved.yaml: EM-trained JW/levenshtein comparisons;
    the reference's own tolerance is 0.5% of clusters per direction."""
    clusters = run_tutorial_pipeline(spark, config=improved_config())
    ours = _partition_ours(clusters)
    golden = _partition_golden(GOLDEN_IMPROVED)
    wiggle = math.floor(0.005 * sum(len(c) for c in golden))
    d1, d2 = len(ours - golden), len(golden - ours)
    print(f"improved drift: ours-only={d1} golden-only={d2} allowed={wiggle}")
    assert d1 <= wiggle and d2 <= wiggle


@pytest.mark.slow
def test_improved_demo_2030_golden_parity(spark):
    """Same improved pipeline on the 2030 fixtures (w2 11,039 + ssa 18,339
    rows) vs pipeline_improved_results_2030.csv — the reference's
    generalization check that the trained model is not tuned to one year
    (test_pipelines_main_schema.py input_data_demo_2030 rows)."""
    from easylink_spark.plans.tutorial import load_tutorial_inputs

    datasets, known = load_tutorial_inputs(spark, year="2030")
    clusters = run_tutorial_pipeline(spark, datasets, known,
                                     config=improved_config())
    ours = _partition_ours(clusters)
    golden = _partition_golden(
        "/root/reference/tests/e2e/pipeline_improved_results_2030.csv")
    wiggle = math.floor(0.005 * sum(len(c) for c in golden))
    d1, d2 = len(ours - golden), len(golden - ours)
    print(f"improved-2030 drift: ours-only={d1} golden-only={d2} "
          f"allowed={wiggle}")
    assert d1 <= wiggle and d2 <= wiggle


@pytest.mark.slow
def test_cascade_demo_golden_parity(spark):
    """pipeline_demo_improved_cascade.yaml: exact-agreement pass, exclusion
    of clustered w2 records, improved pass on the remainder, transitive
    cluster update; reference tolerance 0.5% per direction."""
    clusters = run_cascade_pipeline(spark)
    ours = _partition_ours(clusters)
    golden = _partition_golden(GOLDEN_CASCADE)
    wiggle = math.floor(0.005 * sum(len(c) for c in golden))
    d1, d2 = len(ours - golden), len(golden - ours)
    print(f"cascade drift: ours-only={d1} golden-only={d2} allowed={wiggle}")
    assert d1 <= wiggle and d2 <= wiggle
