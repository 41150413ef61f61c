"""easylink_spark — a PySpark-native entity-resolution (record-linkage) engine.

A from-scratch rebuild of the query/data-processing capabilities of
ihmeuw/easylink (reference at /root/reference, read-only), expressed as
idiomatic Spark: DataFrame/SQL plans, Arrow-vectorized pandas UDF comparators,
and iterative DataFrame algorithms (large-star/small-star connected
components).  Where easylink orchestrates containerized pandas/duckdb/splink/R
steps via Snakemake, this package implements the same pipeline semantics
in-process:

    schema alignment -> blocking -> candidate pairs -> pairwise Fellegi-Sunter
    scoring -> threshold -> transitive clustering -> incremental updating

Package layout
--------------
- ``contracts``   : the reference's six validated data contracts as Spark
                    schemas + DataFrame assertion validators
                    (ref: src/easylink/utilities/validation_utils.py)
- ``session``     : SparkSession builder tuned for local[N] testing
- ``synth``       : deterministic synthetic transcript corpus generator
- ``operators/``  : blocking, scoring, clustering, cascading operators
- ``sources/``    : readers/writers + stage checkpointing (parquet; Iceberg
                    ``writeTo`` when a catalog is configured)
- ``functions/``  : scalar comparator functions (builtin-composed + pandas UDF)
- ``plans/``      : end-to-end pipeline drivers (the easylink "schema" analog)
- ``streaming/``  : batch-incremental (cascading) pass drivers; the reference
                    has no true streaming (SURVEY.md 2.10)
"""

__version__ = "0.1.0"
