"""Source readers (SURVEY.md S1-S3, S6).

The reference reads parquet-or-CSV per step (validation_utils.py:32-40) and
walks dataset directories (default_schema_alignment.py:29-38); input names
map to paths via the YAML input spec (configuration.py:313-328).  Here:

- ``read_table``      : format-dispatched single-table reader
- ``read_datasets_dir``: one table per file in a directory, keyed by stem
  (the `datasets dir` contract)
- ``resolve_inputs``  : name->path spec dict -> name->DataFrame dict
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_TABULAR_SUFFIXES = {".parquet", ".csv"}


def read_table(spark: SparkSession, path: str | Path,
               fmt: str | None = None) -> DataFrame:
    p = str(path)
    fmt = fmt or Path(p).suffix.lstrip(".") or "parquet"
    if fmt == "parquet":
        return spark.read.parquet(p)
    if fmt == "csv":
        return spark.read.csv(p, header=True, inferSchema=True)
    raise ValueError(f"unknown file format {fmt!r} for {p}")


def _is_single_table(p: Path) -> bool:
    """A file with a tabular suffix, or a Spark-written table directory
    (name carries the suffix, e.g. foo.parquet/part-*.parquet)."""
    return p.suffix in _TABULAR_SUFFIXES


def read_datasets_dir(spark: SparkSession, dir_path: str | Path) -> dict[str, DataFrame]:
    """Directory of tabular files -> {dataset name (file stem): DataFrame}
    (the reference's datasets-dir slot, validation_utils.py:192-219).
    Entries may be plain files or Spark-written table directories."""
    out: dict[str, DataFrame] = {}
    for f in sorted(Path(dir_path).iterdir()):
        if _is_single_table(f):
            out[f.stem] = read_table(spark, f)
    if not out:
        raise ValueError(f"no tabular files found in {dir_path}")
    return out


def resolve_inputs(spark: SparkSession, spec: dict[str, str]) -> dict[str, DataFrame]:
    """Input spec {name: path} -> {name: DataFrame}; a non-table directory
    becomes a datasets-dir read flattened as name/stem."""
    out: dict[str, DataFrame] = {}
    for name, path in spec.items():
        p = Path(path)
        if p.is_dir() and not _is_single_table(p):
            for stem, df in read_datasets_dir(spark, p).items():
                out[f"{name}/{stem}"] = df
        else:
            out[name] = read_table(spark, p)
    return out
