"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction (per-turn plain text) over the
  deterministic fixture transcript corpus (BASELINE.json input_hint — the
  driver's TPC-H-ish tables carry no transcripts, so the corpus is
  synthesized byte-stably per tier; see pdftext_spark/sources/fixtures.py).
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline operators (dedup / similarity / text analysis /
  multimodal / relational) — see pdftext_spark/queries.py.
- ``oracle_sql()``: DuckDB equivalents. Extraction queries read expected
  parquet produced by the independent naive oracle
  (tests/oracle_naive.py via pdftext_spark/sources/expected.py); all other
  queries are genuine two-engine SQL implementations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdftext_spark.queries import QUERIES  # noqa: E402

_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # driver's correctness scale


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the sf0.001 tier; driver checks rows>0. The
    gated extract_plain row now carries all three render modes; entry's
    smoke-check schema stays the stable 3-column flagship shape."""
    fn, _ = QUERIES["extract_plain"]
    return fn(spark, "/root/testdata/sf0.001").select(
        "conv_id", "turn_idx", "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql_fn(_ORACLE_SF_DIR)
            for name, (_fn, sql_fn) in QUERIES.items()}
