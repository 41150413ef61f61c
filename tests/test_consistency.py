"""Cross-configuration consistency + SNM property tests.

1. The reference asserts that differently-configured pipelines (splink vs
   fastLink vs the two-pass cascade) induce the SAME cluster partition on
   the same fixture, up to relabeling
   (tests/e2e/test_pipelines_main_schema.py:232-295
   ``test_pipelines_same_output_relabeled``).  The engine analog: the
   flagship dedup pipeline under exact-key-only / +LSH / +SNM blocking, and
   a two-pass cascade of those configs, must all produce the identical
   partition on a fixture whose duplicates the weakest config already
   recovers — extra candidate rules add candidates, never links, because
   every candidate passes the same scoring.

2. Sorted-neighborhood blocking is checked against a brute-force window
   oracle on adversarial inputs (all-identical keys, buckets smaller than
   the window, single-record buckets) — the distributed position-band
   scheme must produce EXACTLY the global-sort window pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from easylink_spark import contracts as K
from easylink_spark.operators import blocking as B


# ---------------------------------------------------------------------------
# cross-config partition consistency (reference :232-295 analog)
# ---------------------------------------------------------------------------
def _partition(clusters) -> frozenset:
    rows = clusters.select(
        F.col(f"`{K.INPUT_RECORD_ID}`").alias("rid"),
        F.col(f"`{K.CLUSTER_ID}`").alias("cl"),
    ).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cl"], set()).add(r["rid"])
    return frozenset(frozenset(v) for v in by_cluster.values())


def test_cross_config_same_partition(spark, tmp_path):
    from easylink_spark.plans.dedup import DedupConfig, run_dedup
    from easylink_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_entities=60, seed=7).drop("entity_id").cache()
    configs = {
        "exact_only": DedupConfig(use_lsh=False),
        "exact_lsh": DedupConfig(use_lsh=True),
        "exact_lsh_snm": DedupConfig(use_lsh=True, use_sorted_neighborhood=True),
    }
    parts = {}
    for name, cfg in configs.items():
        clusters = run_dedup(spark, t, str(tmp_path / name), cfg)
        parts[name] = _partition(clusters)
    assert parts["exact_only"] == parts["exact_lsh"] == parts["exact_lsh_snm"], (
        {k: len(v) for k, v in parts.items()}
    )


def test_cascade_matches_single_pass(spark, tmp_path):
    """Two cascade passes (exact-key pass, then LSH pass over the remainder)
    must induce the same partition as the one-shot full config — the
    reference's cascade-vs-splink equivalence on fixtures where the first
    pass already finds every within-reach duplicate."""
    from easylink_spark.plans.dedup import DedupConfig, run_dedup
    from easylink_spark.streaming.incremental import cascade_passes
    from easylink_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_entities=60, seed=7).drop("entity_id").cache()
    single = run_dedup(spark, t, str(tmp_path / "single"),
                       DedupConfig(use_lsh=True))

    def mk_pass(cfg: DedupConfig, ckpt: str):
        def run(records):
            return run_dedup(spark, records.drop(K.RECORD_ID), ckpt, cfg)
        return run

    # cascade's exclusion step keys on the dataset's `Record ID`; for
    # transcripts that is the conversation id
    cascaded = cascade_passes(
        spark, t.withColumn(K.RECORD_ID, F.col("conv_id")), "transcripts",
        [mk_pass(DedupConfig(use_lsh=False), str(tmp_path / "p1")),
         mk_pass(DedupConfig(use_lsh=True), str(tmp_path / "p2"))],
    )
    # cascade emits every record (update_clusters adds singletons); compare
    # on non-singleton clusters, the informative part of the partition
    single_part = {c for c in _partition(single) if len(c) > 1}
    cascade_part = {c for c in _partition(cascaded) if len(c) > 1}
    assert single_part == cascade_part


# ---------------------------------------------------------------------------
# SNM against a brute-force global-window oracle (adversarial inputs)
# ---------------------------------------------------------------------------
def _snm_oracle(rows, window):
    """rows: (ds, id, key); global sort by (key, ds, id); pairs within
    +/-window positions, canonical (left < right by ds then numeric-ish id
    — ids here are strings compared as the operator emits them)."""
    ordered = sorted(rows, key=lambda r: (r[2], r[0], r[1]))
    out = set()
    for i in range(len(ordered)):
        for j in range(i + 1, min(i + window + 1, len(ordered))):
            a, b = ordered[i], ordered[j]
            l, r = (a, b) if (a[0], a[1]) <= (b[0], b[1]) else (b, a)
            if (l[0], l[1]) != (r[0], r[1]):
                out.add((l[0], l[1], r[0], r[1]))
    return out


def _snm_records(spark, rows):
    return spark.createDataFrame(
        [(ds, rid, key) for ds, rid, key in rows],
        f"`{K.INPUT_RECORD_DATASET}` string, `{K.INPUT_RECORD_ID}` string, "
        "skey string",
    )


def _snm_pairs(df, window, prefix_len):
    out = B.block_sorted_neighborhood(
        df, sort_key="skey", window=window, bucket_prefix_len=prefix_len
    )
    return {
        (r[K.LEFT_DATASET], r[K.LEFT_ID], r[K.RIGHT_DATASET], r[K.RIGHT_ID])
        for r in out.collect()
    }


@pytest.mark.parametrize("window,prefix_len", [(1, 1), (3, 1), (3, 2), (7, 2)])
def test_snm_all_identical_keys(spark, window, prefix_len):
    """Every row shares one key: one bucket holds everything; window pairs
    are decided purely by the (ds, id) tiebreak order."""
    rows = [("d", str(i), "zz") for i in range(12)]
    assert _snm_pairs(_snm_records(spark, rows), window, prefix_len) == \
        _snm_oracle(rows, window)


@pytest.mark.parametrize("window", [2, 3, 5])
def test_snm_buckets_smaller_than_window(spark, window):
    """Single-record buckets (every key has a distinct first char): every
    window must span bucket boundaries."""
    rows = [("d", str(i), chr(ord("a") + i)) for i in range(10)]
    assert _snm_pairs(_snm_records(spark, rows), window, 1) == \
        _snm_oracle(rows, window)


def test_snm_adversarial_mixed(spark):
    """Hypothesis-style generated corpus: skewed bucket sizes (many 'aa'
    keys), empty-adjacent buckets, multi-dataset rows, keys longer and
    shorter than the bucket prefix."""
    import random

    rng = random.Random(1234)
    alphabet = ["aa", "ab", "b", "ca", "cb", "zzz"]
    for trial in range(5):
        rows = []
        for i in range(rng.randint(5, 60)):
            key = rng.choice(alphabet) + rng.choice(["", "x", "xy"])
            ds = rng.choice(["d1", "d2"])
            rows.append((ds, f"{trial}_{i}", key))
        # ids must be unique per dataset
        window = rng.choice([1, 2, 3, 4])
        got = _snm_pairs(_snm_records(spark, rows), window, 2)
        want = _snm_oracle(rows, window)
        assert got == want, (trial, window, got ^ want)
