"""Shared helpers for the query registry: fixture paths, the
per-tier extraction cache, tokenizer/shingle SQL fragments, persisted-
side-table registry, and the cross-engine hash/cosine primitives."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdftext_spark.config import ExtractConfig
from pdftext_spark.operators.extract import extract
from pdftext_spark.sources.expected import ensure_expected_outputs
from pdftext_spark.sources.fixture_io import (
    ensure_fixture_dir,
    tier_for_sf_dir,
    transcripts_path,
)

# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

_EXTRACT_CACHE: dict = {}

# Per-query persisted intermediates (e.g. minhash signature tables) whose
# consumers are lazy DataFrames — they cannot be unpersisted inside the
# query function without recomputing, so they register here and a
# long-lived session (notebook, service) calls unpersist_registered()
# between invocations. Bounded: each entry is a tiny side table.
_PERSISTED_REGISTRY: list = []


def _register_persisted(df: DataFrame) -> DataFrame:
    _PERSISTED_REGISTRY.append(df)
    return df


def unpersist_registered(blocking: bool = False) -> int:
    """Release every per-query persisted side table registered since the
    last call. Safe at any time: unpersist only drops the cache, the
    plans stay valid (they recompute if re-executed)."""
    n = 0
    while _PERSISTED_REGISTRY:
        df = _PERSISTED_REGISTRY.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n


def unpersist_tier(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Evict the per-tier extraction cache and release the kernel output
    persisted inside extract() — the seam a long-lived service uses when
    switching tiers so storage memory does not accumulate (VERDICT r2).
    sf_dir=None evicts every tier of this application."""
    app = spark.sparkContext.applicationId
    tier = None if sf_dir is None else tier_for_sf_dir(sf_dir)
    keys = [k for k in _EXTRACT_CACHE
            if k[0] == app and (tier is None or k[1] == tier)]
    from pdftext_spark.operators.refs import release_persisted
    n = 0
    for key in keys:
        df = _EXTRACT_CACHE.pop(key, None)
        if df is not None:
            n += release_persisted(df)
    return n


def _extracted_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction over the fixture tier matching sf_dir. extract()
    itself caches the single kernel pass (links_via="persist"), so the
    several extraction queries share one kernel run per session; only the
    cheap JVM-side ref-rewrite projection re-runs per consumer. No outer
    persist — that would hold a second copy of the heavy page column.
    Evict with unpersist_tier() when done with a tier."""
    tier = tier_for_sf_dir(sf_dir)
    key = (spark.sparkContext.applicationId, tier)
    if key not in _EXTRACT_CACHE:
        df = extract(
            spark.read.parquet(transcripts_path(tier)),
            ExtractConfig(),
        )
        _EXTRACT_CACHE[key] = df
    return _EXTRACT_CACHE[key]


def _fixture_path(sf_dir: str, name: str) -> str:
    tier = tier_for_sf_dir(sf_dir)
    ensure_expected_outputs(tier)
    return os.path.join(ensure_fixture_dir(tier), name)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# Spark-side md5-derived 32-bit hash
def _h(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_H_SQL = "('0x'||substr(md5({c}),1,8))::BIGINT"


def _let(value_expr: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``value_expr`` ONCE per row, bind it as
    ``var`` inside ``body`` (a single-element ``transform`` lambda —
    lambda variables hold the already-computed value). Higher-order
    array functions run INTERPRETED (outside whole-stage codegen, so no
    common-subexpression elimination), and chained withColumn steps
    collapse into one Project where each reference to a prior step
    re-inlines its full expression — step k+1's lambda indexing step
    k's array then re-evaluates the entire step-k array per element,
    which compounds exponentially across steps (measured: mm_phash went
    from minutes per 500 tiny docs to milliseconds with the bindings).
    Nested lambdas may reference outer let variables."""
    return f"element_at(transform(array({value_expr}), {var} -> {body}), 1)"

_TOKS_SPARK = "filter(split(text, ' '), t -> t != '')"
_TOKS_DUCK = "list_filter(str_split(text, ' '), t -> t != '')"

# 3-word shingles (1-based element_at on both sides)
_SHINGLES_SPARK = (
    "CASE WHEN size(toks) < 3 THEN array(concat_ws(' ', toks)) ELSE "
    "transform(sequence(1, size(toks)-2), i -> "
    "concat(element_at(toks, i), ' ', element_at(toks, i+1), ' ', element_at(toks, i+2))) END"
)
_SHINGLES_DUCK = (
    "CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] ELSE "
    "list_transform(range(1, len(toks)-1), i -> "
    "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END"
)

_STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def _sw_list(lang):
    return ", ".join(f"'{w}'" for w in _STOPWORDS[lang])




# --- relocated here to break the dedup<->ann import cycle ---
def _cos6(a: str, b: str):
    """6-dp-rounded cosine of two array<float> columns — index-ordered
    fold so both engines sum in the same order (the single shared
    definition; every embedding query scores through this)."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
                 "cast(0.0 as double), (acc, v) -> acc + v)")
    na = F.expr(f"sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    nb = F.expr(f"sqrt(aggregate({b}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    return F.round(dot / (na * nb), 6)


