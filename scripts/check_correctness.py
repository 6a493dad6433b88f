"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count
+ column names + order-insensitive values. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

from pdftext_spark.queries import QUERIES
from pdftext_spark.sources.session import build_session

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, (fn, sql_fn) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sql = sql_fn(sf_dir)
            dres = con.sql(sql)
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
        except Exception as exc:
            failures.append((name, f"EXEC ERROR: {exc}"))
            print(f"{name:24s} ERROR {str(exc)[:160]}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rows {len(srows)} vs {len(drows)}")
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            status.append(f"cols {scols} vs {dcols}")
        sset = sorted(tuple(norm(v) for v in row) for row in srows)
        dset = sorted(tuple(norm(v) for v in row) for row in drows)
        if sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:2]
            extra_s = [r for r in sset if r not in dset][:2]
            extra_d = [r for r in dset if r not in sset][:2]
            status.append(f"values differ; first diffs {diff or (extra_s, extra_d)}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name:24s} FAIL  {'; '.join(status)[:400]}")
        else:
            print(f"{name:24s} OK    ({len(srows)} rows)")
    spark.stop()
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} queries match"
          if not only else "")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
