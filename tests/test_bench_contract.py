"""Bench ↔ registry contract.

Round-3 postmortem: a query retired from driver_queries.REGISTRY stayed in
bench.py's hardcoded timing list, so the round bench crashed with KeyError
and the driver recorded no BENCH JSON.  This test makes that class of
regression impossible to commit: every name bench.py times must resolve in
the registry, and the bench output contract fields must exist.
"""

import bench
from easylink_spark.plans import driver_queries as DQ


def test_every_bench_query_is_registered():
    missing = [n for n in bench.BENCH_QUERY_NAMES if n not in DQ.REGISTRY]
    assert not missing, (
        f"bench.py times queries not in driver_queries.REGISTRY: {missing} — "
        "update bench.BENCH_QUERY_NAMES when retiring a query"
    )


def test_entry_queries_and_oracles_consistent():
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    # every oracle key must have a query; every query should be registry-backed
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert set(q) == set(DQ.REGISTRY), (
        sorted(set(q) ^ set(DQ.REGISTRY)))


def test_host_sampler_summary_fields():
    s = bench._HostSampler(interval=0.01)
    with s:
        import time

        time.sleep(0.05)
    out = s.summary()
    assert set(out) == {"load_p90", "steal_p90"}
    assert out["load_p90"] >= 0.0


def test_scaling_report_refuses_contaminated_only_log(tmp_path):
    """Round-4 postmortem: one contaminated post-commit campaign overwrote
    the accepted-window BASELINE.md with a rejected-only warning table.
    The report writer must instead refuse (SystemExit) and leave any
    existing report byte-identical when the log has no acceptable pair."""
    import json

    import pytest

    log = tmp_path / "attempts_test.jsonl"
    # both sides drowned: load p90 far above self-load -> no estimator
    # (strict or cpu-floor) can accept either side
    log.write_text(json.dumps({
        "attempt": 0, "n": [2, 8],
        "wall_small": 900.0, "wall_big": 800.0,
        "cpu_small": 1400.0, "cpu_big": 1700.0,
        "load_p90_small": 30.0, "load_p90_big": 31.0,
        "steal_p90_small": 22.0, "steal_p90_big": 25.0,
        "accepted_small": False, "accepted_big": False,
        "cpuset_small": None, "cpuset_big": None,
    }) + "\n")
    out = tmp_path / "BASELINE.md"
    prior = "# accepted-window report — must survive\n"
    out.write_text(prior)
    with pytest.raises(SystemExit):
        bench.main_scaling_report(log_path=str(log), out_path=str(out))
    assert out.read_text() == prior


def test_scaling_report_writes_from_accepted_rows(tmp_path, capsys):
    """With one clean pair in the log the report regenerates, stamps the
    log's content hash, and headline eff comes from the accepted walls."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [
        {  # clean pair: quiet load, steal under 4, cpu at floor
            "attempt": 0, "n": [2, 8],
            "wall_small": 640.0, "wall_big": 195.0,
            "cpu_small": 1340.0, "cpu_big": 1500.0,
            "load_p90_small": 2.1, "load_p90_big": 8.0,
            "steal_p90_small": 1.5, "steal_p90_big": 2.0,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
        {  # contaminated pair: must not shadow the clean one
            "attempt": 1, "n": [2, 8],
            "wall_small": 900.0, "wall_big": 700.0,
            "cpu_small": 2400.0, "cpu_big": 2900.0,
            "load_p90_small": 28.0, "load_p90_big": 29.0,
            "steal_p90_small": 20.0, "steal_p90_big": 21.0,
            "accepted_small": False, "accepted_big": False,
            "cpuset_small": None, "cpuset_big": None,
        },
    ]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rpt["value"] == round(640.0 / (4 * 195.0), 3)
    assert rpt["estimator"] == "strict"
    md = out.read_text()
    assert "attempts_test.jsonl (sha256 " in md


def test_scaling_report_partitions_by_corpus_size(tmp_path, capsys):
    """Rows from different corpus sizes must never share estimator minima:
    a 120k-entity wall in the same (N, mode) as 60k rows would corrupt
    both sections' floors.  Sections are keyed (N, mode, entities); rows
    predating the entities stamp default to the 60k corpus they all used."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [
        {  # pre-stamp row (no "entities") -> 60000 bucket
            "attempt": 0, "n": [2, 8],
            "wall_small": 640.0, "wall_big": 195.0,
            "cpu_small": 1340.0, "cpu_big": 1500.0,
            "load_p90_small": 2.1, "load_p90_big": 8.0,
            "steal_p90_small": 1.5, "steal_p90_big": 2.0,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
        {  # bigger corpus, same (N, mode): must land in its own section
            "attempt": 0, "n": [2, 8], "entities": 120000,
            "wall_small": 1300.0, "wall_big": 380.0,
            "cpu_small": 2700.0, "cpu_big": 3000.0,
            "load_p90_small": 2.2, "load_p90_big": 8.1,
            "steal_p90_small": 1.4, "steal_p90_big": 2.2,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
    ]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rpt["per_config"]) == {"2_async_60000_r5a", "2_async_120000_r5a"}
    # each section's eff uses only its own walls
    assert rpt["per_config"]["2_async_60000_r5a"]["eff"] == round(
        640.0 / (4 * 195.0), 3)
    assert rpt["per_config"]["2_async_120000_r5a"]["eff"] == round(
        1300.0 / (4 * 380.0), 3)
    md = out.read_text()
    assert "— async checkpointing, 60000 entities" in md
    assert "— async checkpointing, 120000 entities" in md
    # headline picks the best config and names its corpus size
    assert rpt["entities"] == 120000


def test_scaling_report_partitions_by_engine_rev(tmp_path, capsys):
    """Rows measured on different engine versions must never share
    estimator minima (a faster engine appended to an old campaign's log
    would silently dominate that section's floors), and the headline must
    come from the CURRENT engine — the one stamped on the newest row —
    even when an older engine's section scored a higher efficiency."""
    import json

    base = {
        "attempt": 0, "n": [2, 8], "entities": 60000,
        "load_p90_small": 2.1, "load_p90_big": 8.0,
        "steal_p90_small": 1.5, "steal_p90_big": 2.0,
        "accepted_small": True, "accepted_big": True,
        "cpuset_small": None, "cpuset_big": None,
    }
    rows = [
        # old engine (pre-stamp): slower walls but BETTER efficiency
        dict(base, wall_small=900.0, wall_big=250.0,
             cpu_small=1800.0, cpu_big=1900.0),
        # new engine: faster walls, slightly lower efficiency
        dict(base, engine="abc1234", wall_small=600.0, wall_big=180.0,
             cpu_small=1200.0, cpu_big=1350.0),
    ]
    log = tmp_path / "attempts_test.jsonl"
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rpt["per_config"]) == {"2_async_60000_r5a",
                                      "2_async_60000_abc1234"}
    # each engine's eff from its own walls only
    assert rpt["per_config"]["2_async_60000_r5a"]["eff"] == round(
        900.0 / (4 * 250.0), 3)
    assert rpt["per_config"]["2_async_60000_abc1234"]["eff"] == round(
        600.0 / (4 * 180.0), 3)
    # headline is the newest engine, not the best-scoring old one
    assert rpt["engine"] == "abc1234"
    assert rpt["value"] == round(600.0 / (4 * 180.0), 3)
    md = out.read_text()
    assert "engine abc1234" in md and "engine r5a" in md


def test_scaling_report_strict_section_outranks_floor_only(tmp_path, capsys):
    """Within the current engine, a STRICT-accepted section (steal <= 4%
    both sides) must headline over a cpu-floor-only (contaminated) section
    even when the floor number is higher — a noisy campaign appended after
    a strict verdict must never shadow it (round-5 postmortem: a 4v16
    floor-only 0.482 briefly headlined over a strict 0.860; the dual
    failure — a HIGH contaminated number shadowing a lower strict one —
    would overstate the engine, which is worse)."""
    import json

    base = {
        "attempt": 0, "entities": 60000, "engine": "eng5555",
        "cpuset_small": None, "cpuset_big": None,
        "accepted_small": True, "accepted_big": True,
    }
    rows = [
        # strict window at 1v4: steal <= 4 both sides, eff 0.820
        dict(base, n=[1, 4], wall_small=820.0, wall_big=250.0,
             cpu_small=850.0, cpu_big=900.0,
             load_p90_small=1.2, load_p90_big=4.0,
             steal_p90_small=2.0, steal_p90_big=3.0),
        # contaminated 4v16: steal 12% on the big side -> floor-only,
        # and its floor eff (0.950) is HIGHER than the strict 0.820
        dict(base, n=[4, 16], wall_small=260.0, wall_big=68.4,
             cpu_small=950.0, cpu_big=1000.0,
             load_p90_small=4.1, load_p90_big=12.0,
             steal_p90_small=2.0, steal_p90_big=12.0),
    ]
    log = tmp_path / "attempts_test.jsonl"
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rpt["per_config"]["4_async_60000_eng5555"]["strict"] is None
    assert rpt["per_config"]["4_async_60000_eng5555"]["eff"] == 0.95
    # headline: the strict 1v4 verdict, not the higher contaminated floor
    assert rpt["n"] == [1, 4]
    assert rpt["value"] == round(820.0 / (4 * 250.0), 3)
    assert "estimator:\nstrict" in out.read_text()


def test_scaling_report_cross_config_model_fit(tmp_path, capsys):
    """When one (mode, entities) group holds >= 3 distinct core counts,
    the report publishes an Amdahl fit wall(c) = F + W/c solved on the two
    narrowest configs, with wider configs as out-of-sample bandwidth
    residuals.  Exact walls here: F=20, W=960 -> 980/500/260/140."""
    import json

    log = tmp_path / "attempts_test.jsonl"

    def row(n_small, ws, wb, cs, cb):
        # stage 'work' is a pure F=4, W=96 Amdahl curve at every core count
        stage = lambda c: {"work": 4.0 + 96.0 / c}  # noqa: E731
        return {
            "attempt": 0, "n": [n_small, 4 * n_small], "entities": 60000,
            "async_ckpt": "0",
            "wall_small": ws, "wall_big": wb,
            "cpu_small": cs, "cpu_big": cb,
            "stage_walls_small": stage(n_small),
            "stage_walls_big": stage(4 * n_small),
            "load_p90_small": 1.0, "load_p90_big": float(n_small),
            "steal_p90_small": 1.0, "steal_p90_big": 1.0,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        }

    rows = [row(1, 980.0, 260.0, 990.0, 1000.0),
            row(2, 500.0, 140.0, 995.0, 1010.0)]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    fit = rpt["model"]["sync_60000_r5a"]
    assert fit["fit_cores"] == [1, 2]
    assert abs(fit["F_sec"] - 20.0) < 0.2
    assert abs(fit["W_sec"] - 960.0) < 1.0
    assert abs(fit["ideal_eff_1v4"] - (980.0 / (4 * 260.0))) < 1e-3
    stage_fit = fit["stages"]["work"]
    assert abs(stage_fit["F_sec"] - 4.0) < 0.2
    assert abs(stage_fit["W_sec"] - 96.0) < 0.5
    md = out.read_text()
    assert "Cross-configuration model fit — sync checkpointing" in md
    assert "OUT-OF-SAMPLE" in md
    assert "Per-stage decomposition" in md
    assert "| work | 4.0 | 96.0 |" in md


def test_scaling_report_model_fit_skipped_on_two_points(tmp_path, capsys):
    """A single campaign (two core counts) cannot validate the fit
    out-of-sample, so no model section may be published from it."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    log.write_text(json.dumps({
        "attempt": 0, "n": [2, 8], "entities": 60000, "async_ckpt": "0",
        "wall_small": 640.0, "wall_big": 195.0,
        "cpu_small": 1340.0, "cpu_big": 1500.0,
        "load_p90_small": 2.1, "load_p90_big": 8.0,
        "steal_p90_small": 1.5, "steal_p90_big": 2.0,
        "accepted_small": True, "accepted_big": True,
        "cpuset_small": None, "cpuset_big": None,
    }) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rpt["model"] == {}
    assert "Cross-configuration model fit" not in out.read_text()


def _fit_row(n_small, ws, wb, entities=60000):
    return {
        "attempt": 0, "n": [n_small, 4 * n_small], "entities": entities,
        "async_ckpt": "0",
        "wall_small": ws, "wall_big": wb,
        "cpu_small": 990.0, "cpu_big": 1000.0,
        "load_p90_small": 1.0, "load_p90_big": float(n_small),
        "steal_p90_small": 1.0, "steal_p90_big": 1.0,
        "accepted_small": True, "accepted_big": True,
        "cpuset_small": None, "cpuset_big": None,
    }


def test_scaling_report_model_fit_skips_contaminated_pair(tmp_path, capsys):
    """A measured min-wall is an UPPER bound of the true wall, so a fit
    whose curve exceeds any measured point is self-contradicted.  Here the
    c=2 wall (1100) is contaminated: the (1,2) pair gives W < 0, and the
    fit must fall through to the narrowest FEASIBLE pair (1,4) — whose
    curve (F=20, W=960) sits at or below every measured point."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [_fit_row(1, 980.0, 260.0), _fit_row(2, 1100.0, 140.0)]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    fit = rpt["model"]["sync_60000_r5a"]
    assert fit["fit_cores"] == [1, 4]
    assert abs(fit["F_sec"] - 20.0) < 0.2
    assert abs(fit["W_sec"] - 960.0) < 1.0


def test_scaling_report_model_fit_skips_infeasible_pair(tmp_path, capsys):
    """A pair can be physical (W > 0, F >= 0) yet still contaminated: its
    curve rises ABOVE a quieter measured point elsewhere.  c=1:990,
    c=2:600 gives F=210, W=780 -> model(4)=405 > measured 260: skip to
    (1,4) (F=16.7, W=973.3), which is feasible everywhere."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [_fit_row(1, 990.0, 260.0), _fit_row(2, 600.0, 150.0)]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    fit = rpt["model"]["sync_60000_r5a"]
    assert fit["fit_cores"] == [1, 4]
    assert abs(fit["F_sec"] - (990.0 - (990.0 - 260.0) / 0.75)) < 0.2


def test_scaling_report_model_fit_refuses_nonphysical(tmp_path, capsys):
    """When EVERY pair is non-physical (walls that grow with core count:
    W <= 0 for all pairs), the report must refuse to publish a fit rather
    than print garbage physics."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [_fit_row(1, 980.0, 1200.0), _fit_row(2, 1100.0, 1300.0)]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rpt["model"] == {}
    assert "Cross-configuration model fit" not in out.read_text()


def test_scaling_report_zero_steal_window_counts_as_strict(tmp_path, capsys):
    """A measured steal p90 of exactly 0.0 is the quietest possible window
    and MUST enter the strict set; only a missing field (old rows predating
    the steal sampler) disqualifies.  Regression: `or 99.0` coercion
    treated 0.0 as missing, so the strict minima were taken over the
    noisier nonzero-steal rows and the verdict inflated (round-5: a 0.907
    headline where the honest all-quiet-windows value was 0.844)."""
    import json

    log = tmp_path / "attempts_test.jsonl"
    rows = [
        {  # zero-steal pair: QUIETEST window, fastest walls -> strict minima
            "attempt": 0, "n": [1, 4],
            "wall_small": 700.0, "wall_big": 207.0,
            "cpu_small": 780.0, "cpu_big": 886.0,
            "load_p90_small": 1.2, "load_p90_big": 3.9,
            "steal_p90_small": 0.0, "steal_p90_big": 0.0,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
        {  # nonzero-steal quiet pair: slower walls, still strict-eligible
            "attempt": 1, "n": [1, 4],
            "wall_small": 756.0, "wall_big": 208.5,
            "cpu_small": 848.0, "cpu_big": 893.0,
            "load_p90_small": 1.8, "load_p90_big": 4.1,
            "steal_p90_small": 0.2, "steal_p90_big": 0.1,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
        {  # pre-sampler row (no steal fields): excluded from strict even
           # though its walls would dominate both minima
            "attempt": 2, "n": [1, 4],
            "wall_small": 600.0, "wall_big": 150.0,
            "cpu_small": 700.0, "cpu_big": 800.0,
            "load_p90_small": 1.0, "load_p90_big": 3.5,
            "accepted_small": True, "accepted_big": True,
            "cpuset_small": None, "cpuset_big": None,
        },
    ]
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # strict minima come from the zero-steal row, not the 0.2/0.1 row and
    # not the steal-less row
    assert rpt["estimator"] == "strict"
    assert rpt["value"] == round(700.0 / (4 * 207.0), 3)


def test_scaling_report_partitions_by_protocol(tmp_path, capsys):
    """Warm-protocol rows (untimed full-pipeline warm-up before the timed
    window) measure a JIT/worker-pool-warmed session; their walls must
    never share estimator minima with cold rows of the same engine — the
    protocol forks the section key exactly like an engine revision, and
    the headline follows the newest row's protocol."""
    import json

    base = {
        "attempt": 0, "n": [2, 8], "entities": 60000, "engine": "abc1234",
        "load_p90_small": 2.1, "load_p90_big": 8.0,
        "steal_p90_small": 1.5, "steal_p90_big": 2.0,
        "accepted_small": True, "accepted_big": True,
        "cpuset_small": None, "cpuset_big": None,
    }
    rows = [
        # cold row (pre-warmup protocol; no "protocol" field)
        dict(base, wall_small=650.0, wall_big=200.0,
             cpu_small=1350.0, cpu_big=1500.0),
        # warm row, same engine: faster walls — must not pollute cold minima
        dict(base, protocol="warm", warmup_small=61.0, warmup_big=28.0,
             wall_small=560.0, wall_big=160.0,
             cpu_small=1180.0, cpu_big=1300.0),
    ]
    log = tmp_path / "attempts_test.jsonl"
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "BASELINE.md"
    bench.main_scaling_report(log_path=str(log), out_path=str(out))
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rpt["per_config"]) == {"2_async_60000_abc1234",
                                      "2_async_60000_abc1234+warm"}
    assert rpt["per_config"]["2_async_60000_abc1234"]["eff"] == round(
        650.0 / (4 * 200.0), 3)
    assert rpt["per_config"]["2_async_60000_abc1234+warm"]["eff"] == round(
        560.0 / (4 * 160.0), 3)
    # headline follows the newest row (warm), and the md names the protocol
    assert rpt["engine"] == "abc1234+warm"
    assert rpt["value"] == round(560.0 / (4 * 160.0), 3)
    md = out.read_text()
    assert "engine abc1234+warm" in md and "Warm protocol" in md
