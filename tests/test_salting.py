"""Skew handling: the anti-skew salt engages exactly when it should."""

from pdftext_spark.config import ExtractConfig
from pdftext_spark.operators.extract import extract


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_salt_engages_for_coarse_input(spark, transcripts):
    """A conversation-clustered single-partition source must be
    repartitioned on (conv_id, turn_idx) before the kernel."""
    coarse = transcripts.coalesce(1)
    plan = _plan(extract(coarse, ExtractConfig(), resolve_links=False))
    assert "REPARTITION_BY_NUM" in plan
    assert "hashpartitioning(conv_id" in plan


def test_salt_skipped_for_fine_input(spark, transcripts):
    """Byte-balanced fine-grained scans skip the full-payload shuffle."""
    fine = transcripts.repartition(64)  # already finer than 2x parallelism
    plan = _plan(extract(fine, ExtractConfig(), resolve_links=False))
    # only the caller's own round-robin repartition appears; no additional
    # hash repartition on (conv_id, turn_idx) feeds the kernel
    assert "hashpartitioning(conv_id, turn_idx" not in plan.replace("#", " ") \
        or plan.count("REPARTITION_BY_NUM") == 1


def test_salt_never_trusts_source(spark, transcripts):
    plan = _plan(extract(transcripts.coalesce(1), ExtractConfig(salt="never"),
                         resolve_links=False))
    assert "REPARTITION_BY_NUM" not in plan


def test_salt_always_forces_shuffle(spark, transcripts):
    plan = _plan(extract(transcripts.repartition(64),
                         ExtractConfig(salt="always"), resolve_links=False))
    assert "hashpartitioning(conv_id" in plan
