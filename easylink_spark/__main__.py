"""CLI: ``python -m easylink_spark run <spec.yaml>`` (reference:
`easylink run`, cli.py:153-221) and ``validate <spec.yaml>`` (the
generate-dag-style dry check, runner.py:338-357 analog without graphviz)."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="easylink_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    p_run = sub.add_parser("run", help="run a pipeline from a YAML spec")
    p_run.add_argument("spec", help="path to spec.yaml")
    p_run.add_argument("--show", type=int, default=10,
                       help="rows of the result to print (0 = none)")
    p_val = sub.add_parser("validate", help="validate a spec without running")
    p_val.add_argument("spec")
    p_dag = sub.add_parser(
        "dag",
        help="print the pipeline's stage/slot graph as graphviz dot "
             "(reference `easylink generate-dag`; pipe to `dot -Tsvg`)",
    )
    p_dag.add_argument("spec")
    args = parser.parse_args(argv)

    from easylink_spark.plans.spec import load_spec, run_spec

    spec = load_spec(args.spec)
    if args.command == "dag":
        from easylink_spark.plans.spec import spec_pipeline_graph

        pipe, sources = spec_pipeline_graph(spec["pipeline"])
        print(pipe.to_dot(sources=sources, name=spec["pipeline"]))
        return 0
    if args.command == "validate":
        print(f"spec OK: pipeline={spec['pipeline']} "
              f"inputs={sorted(spec['input'])}")
        return 0
    clusters = run_spec(spec)
    n = clusters.count()
    print(f"pipeline={spec['pipeline']} cluster_rows={n}")
    if args.show:
        clusters.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
