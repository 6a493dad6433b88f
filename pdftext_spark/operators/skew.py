"""Skew probe → salted repartition: the measured-skew side-input pattern.

The north_rule's corpus is 10^12 turns keyed by conv_id/user_id, and web
corpora have bot keys holding whole-percent shares — a plain
`repartition(key)` or `groupBy(key)` serializes each hot key onto one
task. The production-standard fix is a two-job shape:

  1. PROBE (one pre-aggregated shuffle over the corpus, tiny output):
     measure each key's share and derive the salt factor that levels it,
     salt_k = ceil(share x parallelism). `skew_report` generalizes the
     gated `events_skew_report` query to any DataFrame/key.
  2. APPLY (the heavy job): carry `salt_k` to the driver as a config
     literal — one `.collect()` of a <=topn-row report, the same
     legitimate side-input shape as k-means centroids or ANN query
     vectors — and spread each key over `salt_k` sub-keys with
     `salted_repartition` before the expensive per-partition work.

The salt sub-key must be DETERMINISTIC per row (re-runs and speculative
retries land a row in the same partition — rand() would break
idempotent sinks), so it hashes caller-chosen spread columns (e.g. the
event timestamp) rather than calling rand().

At 10^12 rows the probe costs one map-side-combined count per key; its
report is also a gate row (`events_skew_report`), so the numbers feeding
the salt decision are themselves two-engine verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: list[str], parallelism: int,
                topn: int = 10) -> DataFrame:
    """Top-`topn` hottest keys with exact integer corpus share (ppm) and
    the salt factor that would level each: salt_k = ceil(share x
    parallelism). One partial-aggregated shuffle + partial top-k
    (TakeOrderedAndProject) — diagnosing a 10^12-row shuffle costs one
    pre-aggregated pass."""
    tot = df.groupBy().agg(F.count(F.lit(1)).alias("total"))
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    # each key column is its own selectExpr argument — joining them into
    # one comma-separated string parses only for single-column keys
    # (ADVICE r5: multi-key callers hit PARSE_SYNTAX_ERROR)
    return (per.crossJoin(F.broadcast(tot))
            .selectExpr(*key_cols, "cast(n_rows as long) n_rows",
                        "n_rows * 1000000 div total as share_ppm",
                        f"(n_rows * {int(parallelism)} + total - 1) "
                        "div total as salt_k")
            .orderBy(F.desc("n_rows"), *key_cols).limit(topn))


def recommended_salt(df: DataFrame, key_cols: list[str],
                     parallelism: int) -> int:
    """The PROBE job: run the skew report and return the hottest key's
    salt_k as a driver literal (>=1). The collect is one row — the
    documented side-input shape, not a distributed-data collect."""
    row = (skew_report(df, key_cols, parallelism, topn=1)
           .select("salt_k").collect())
    return max(1, int(row[0]["salt_k"])) if row else 1


def salted_repartition(df: DataFrame, key_cols: list[str], salt_k: int,
                       n_parts: int, spread_cols: list[str] | None = None,
                       salt_col: str = "__salt") -> DataFrame:
    """The APPLY side: spread each key across `salt_k` deterministic
    sub-keys and repartition on (keys..., salt) — xxhash64 of the spread
    columns mod salt_k, so retries are stable and a salt_k=1 corpus
    degrades to the plain keyed exchange. The salt column stays on the
    frame so per-partition consumers can group by it; drop it after the
    heavy stage.

    Pass `spread_cols` explicitly as a CHEAP high-cardinality column
    (an event timestamp, a monotonic id) whenever one exists: the
    default — every non-key column — hashes full payloads in the
    exchange, and hot-key rows that are exact duplicates all hash to
    the same sub-key, defeating the salt on duplicate-heavy bot keys
    (ADVICE r5). The default therefore prefers narrow non-string
    columns when any exist and falls back to the full payload only
    when the frame has nothing else."""
    if salt_k <= 1:
        return df.repartition(n_parts, *key_cols)
    if spread_cols is None:
        non_key = [f for f in df.schema.fields if f.name not in key_cols]
        narrow = [f.name for f in non_key
                  if f.dataType.typeName() in (
                      "timestamp", "timestamp_ntz", "date", "long", "integer",
                      "short", "byte", "double", "float", "boolean")]
        spread_cols = narrow or [f.name for f in non_key]
    spread = spread_cols
    if not spread:
        raise ValueError("need at least one non-key column to spread on")
    salted = df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in spread]),
                         F.lit(int(salt_k))).cast("int"))
    return salted.repartition(n_parts, *key_cols, salt_col)
