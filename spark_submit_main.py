#!/usr/bin/env python
"""spark-submit entrypoint for the dedup pipeline.

Cluster usage (the north rule's deployment shape):

    zip -r easylink_spark.zip easylink_spark
    spark-submit --py-files easylink_spark.zip spark_submit_main.py \
        --input <transcripts table/path> --checkpoint-dir <dir> \
        --output <clusters path> [--threshold 0.85] [--format parquet]

In local test mode (--synthetic N) it generates the deterministic corpus
instead of reading an input table.  The session is created WITHOUT a master
override, so spark-submit's --master (yarn/k8s/standalone) wins; locally it
falls back to local[*].
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="transcripts table path (parquet) or "
                                   "catalog table name with --format iceberg")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", help="final clusters path (default: stays in "
                                    "the checkpoint dir)")
    p.add_argument("--threshold", type=float, default=0.85)
    p.add_argument("--prior", type=float, default=0.01)
    p.add_argument("--dataset-name", default="transcripts")
    p.add_argument("--no-lsh", action="store_true")
    p.add_argument("--sorted-neighborhood", action="store_true")
    p.add_argument("--estimate-u", action="store_true")
    p.add_argument("--em-iterations", type=int, default=0)
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic entities instead of reading input")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from easylink_spark.plans.dedup import DedupConfig, run_dedup
    from easylink_spark.session import get_spark

    spark = get_spark("easylink_spark.dedup")
    if args.synthetic:
        from easylink_spark.synth import synth_transcripts

        transcripts = synth_transcripts(
            spark, n_entities=args.synthetic, seed=args.seed
        ).drop("entity_id")
    elif args.format == "iceberg":
        transcripts = spark.table(args.input)
    else:
        # durable parquet input: pass the PATH so the input stage
        # checkpoints by reference (no copy of the corpus)
        transcripts = args.input

    cfg = DedupConfig(
        dataset_name=args.dataset_name,
        threshold=args.threshold,
        prior=args.prior,
        use_lsh=not args.no_lsh,
        use_sorted_neighborhood=args.sorted_neighborhood,
        estimate_u=args.estimate_u,
        em_iterations=args.em_iterations,
    )
    clusters = run_dedup(spark, transcripts, args.checkpoint_dir, cfg)
    if args.output:
        clusters.write.mode("overwrite").parquet(args.output)
    n = clusters.count()
    print(f"clusters written: {n} rows "
          f"({args.output or args.checkpoint_dir + '/clusters'})")


if __name__ == "__main__":
    main()
