"""Local pre-flight for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables (default
sf0.01), then compares row count, column-name set, and values
(columns sorted by name, rows sorted, floats compared to 1e-6 rel).
Exit 0 iff every query matches.  Usage::

    python tools/oracle_check.py [sf_dir]
"""
from __future__ import annotations

import math
import sys
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _norm(v):
    # NO float rounding here: rounding inside the sort key reorders
    # near-tie rows differently per engine and misaligns the row zip —
    # tolerance belongs in _approx_eq, not in the ordering.
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, Decimal):
        return float(v)  # DuckDB DECIMAL vs Spark DOUBLE: one numeric type
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows),
                  key=lambda t: tuple((x is None, str(type(x)), x if not
                                       isinstance(x, tuple) else str(x))
                                      for x in t))


def _approx_eq(a, b) -> bool:
    num = (int, float)
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, num) and isinstance(b, num):
            return math.isclose(float(a), float(b),
                                rel_tol=1e-5, abs_tol=1e-6)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entry
    from easylink_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name:28s} rows={len(srows):>7} (rows-only, no oracle)")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_schema = sorted(scols) == sorted(ocols)
            ok_vals = False
            if ok_rows and ok_schema:
                sk, ok_ = _rows_key(srows, scols), _rows_key(orows, ocols)
                ok_vals = all(_approx_eq(a, b) for a, b in zip(sk, ok_))
            status = "OK " if (ok_rows and ok_schema and ok_vals) else "FAIL"
            print(f"  {name:28s} {status} rows={len(srows)}/{len(orows)} "
                  f"schema={ok_schema} vals={ok_vals}")
            if status == "FAIL":
                failed.append(name)
                if not ok_schema:
                    print(f"    spark cols:  {sorted(scols)}")
                    print(f"    oracle cols: {sorted(ocols)}")
        except Exception as e:  # keep going; report all failures at the end
            print(f"  {name:28s} ERROR {type(e).__name__}: {e}")
            failed.append(name)
    print(f"\n{len(qs) - len(failed)}/{len(qs)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
