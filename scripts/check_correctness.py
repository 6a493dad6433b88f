"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count
+ column names + order-insensitive values. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pdftext_spark.queries import QUERIES  # noqa: E402
from pdftext_spark.sources.session import build_session  # noqa: E402

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


# -- type-strict comparison ---------------------------------------------------
# The driver's value-hash is TYPE-sensitive across type FAMILIES (round 1:
# DuckDB sum(BIGINT) widens to HUGEINT and hash-fails vs Spark BIGINT even
# though the Python values compare equal) but NOT within integer widths
# (round 1: every extraction query passed with Spark int32 vs oracle int64).
# So: canonicalize both engines' column types, collapse integer widths into
# one "int" family, and require exact equality otherwise — this replica then
# can't report green where the driver reports red (HUGEINT/decimal/float vs
# int) and can't report red where the driver reports green (int32 vs int64).

_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float32", "double": "float64", "string": "string",
    "boolean": "bool", "date": "date", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp", "binary": "binary",
}


def canon_spark_type(dt: str) -> str:
    dt = dt.strip()
    if dt in _SPARK_CANON:
        return _SPARK_CANON[dt]
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("array<") and dt.endswith(">"):
        return f"list<{canon_spark_type(dt[6:-1])}>"
    return "complex"  # struct/map: value compare covers these


def canon_arrow_type(t) -> str:
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return {"double": "float64", "float": "float32"}.get(str(t), str(t))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    return "complex"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd filter must not run zero queries and exit green
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(QUERIES)}", file=sys.stderr)
        sys.exit(2)
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
            stypes = [canon_spark_type(dt) for _, dt in sdf.dtypes]
            sql = sql_fn(sf_dir)
            dres = con.sql(sql)
            darrow = dres.arrow()
            dcols = darrow.column_names
            dtypes_c = [canon_arrow_type(f.type) for f in darrow.schema]
            drows = [tuple(r.values()) for r in darrow.to_pylist()]
        except Exception as exc:
            failures.append((name, f"EXEC ERROR: {exc}"))
            print(f"{name:24s} ERROR {str(exc)[:160]}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rows {len(srows)} vs {len(drows)}")
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            status.append(f"cols {scols} vs {dcols}")
        elif stypes != dtypes_c:
            bad = [(c, a, b) for c, a, b in zip(scols, stypes, dtypes_c) if a != b]
            status.append(f"dtypes differ {bad}")
        # key=repr: None/mixed-type cells are not mutually orderable, but
        # identical multisets sort identically under repr
        sset = sorted((tuple(norm(v) for v in row) for row in srows), key=repr)
        dset = sorted((tuple(norm(v) for v in row) for row in drows), key=repr)
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
