"""Materialize the deterministic fixture corpus to parquet, cached on disk.

One cache dir per (n_convs, max_turns, seed) under `.fixtures/`; contents
are byte-stable, so tests, the driver's correctness gate, and bench all
see identical inputs. Expected-output tables (from the naive oracle /
generator facts) are written beside the inputs so DuckDB oracle SQL can
`read_parquet` them.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdftext_spark.sources.fixtures import build_fixture_tables

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_ROOT = os.environ.get("PDFTEXT_SPARK_FIXTURES",
                              os.path.join(REPO_ROOT, ".fixtures"))

# fixture scale tiers, keyed like the driver's sf dirs
TIERS = {
    "sf0.001": dict(n_convs=30, max_turns=40, seed=7),
    "sf0.01": dict(n_convs=60, max_turns=80, seed=7),
    "sf0.1": dict(n_convs=22000, max_turns=400, seed=7),
}


def tier_for_sf_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir or ""))
    if base not in TIERS:
        # refuse, don't guess: a silent sf0.01 fallback once let a typo'd
        # SPARK_GRAFT_SF_DIR label a 60-conversation run as a large-scale
        # benchmark headline
        raise ValueError(
            f"unknown fixture tier {base!r} (from sf_dir={sf_dir!r}); "
            f"known tiers: {sorted(TIERS)}")
    return base


def _write(path: str, rows: list[dict], schema: pa.Schema | None = None) -> None:
    if rows:
        table = pa.Table.from_pylist(rows, schema=schema)
    elif schema is not None:
        # keep the real columns even when empty — readers select them
        table = pa.Table.from_pylist([], schema=schema)
    else:
        table = pa.Table.from_pylist([{"conv_id": "x", "turn_idx": 0}]).slice(0, 0)
    # small row groups so Spark's file splits can actually parallelize the
    # scan (one huge row group = one scan task no matter the cluster size)
    pq.write_table(table, path, row_group_size=1000)


_TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us", tz="UTC")),
])


def ensure_fixture_dir(tier: str) -> str:
    """Generate (once) and return the fixture dir for a tier."""
    cfg = TIERS[tier]
    out = os.path.join(FIXTURE_ROOT, tier)
    marker = os.path.join(out, "_COMPLETE")
    # v3: messy external-link URL surface forms (refs_canonical)
    # v4: PII-shaped tokens in pdf prose (text_pii)
    stamp = f"v4:{sorted(cfg.items())}"
    if os.path.exists(marker) and open(marker).read() == stamp:
        return out
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rows, html_exp, table_exp, sup_exp = build_fixture_tables(**cfg)
    _write(os.path.join(out, "transcripts.parquet"), rows, _TRANSCRIPT_SCHEMA)
    _write(os.path.join(out, "expected_html.parquet"), html_exp)
    _write(os.path.join(out, "expected_table_facts.parquet"), table_exp)
    _write(os.path.join(out, "expected_superscripts.parquet"), sup_exp)
    with open(marker, "w") as f:
        f.write(stamp)
    return out


def transcripts_path(tier: str) -> str:
    return os.path.join(ensure_fixture_dir(tier), "transcripts.parquet")
