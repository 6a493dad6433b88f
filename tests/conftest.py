import collections

import pytest

from pdftext_spark.sources.fixture_io import ensure_fixture_dir, transcripts_path
from pdftext_spark.sources.fixtures import build_fixture_tables

TEST_TIER = "sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pdftext_spark.sources.session import build_session
    s = build_session(app="pdftext_spark-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    return ensure_fixture_dir(TEST_TIER)


@pytest.fixture(scope="session")
def transcripts(spark, fixture_dir):
    return spark.read.parquet(transcripts_path(TEST_TIER))


@pytest.fixture(scope="session")
def fixture_rows():
    """Raw fixture rows + generator facts, grouped per conversation."""
    from pdftext_spark.sources.fixture_io import TIERS
    rows, html_exp, table_exp, sup_exp = build_fixture_tables(**TIERS[TEST_TIER])
    convs = collections.defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(r)
    for turns in convs.values():
        turns.sort(key=lambda r: r["turn_idx"])
    return {"rows": rows, "convs": convs, "html": html_exp,
            "tables": table_exp, "sups": sup_exp}
