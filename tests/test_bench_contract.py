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
