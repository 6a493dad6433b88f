"""Physical-plan assertions: the scale-critical plan properties the
queries claim in their docstrings must actually appear in the executed
plan — broadcasts broadcast, partial top-k stays partial, scans that
should not shuffle do not."""

from pdftext_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = Q.QUERIES[name][0](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan):
    # data-moving exchanges only (broadcast exchanges are the cheap side)
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def test_sample_hash_is_pure_scan(spark):
    p = _plan(spark, "sample_hash")
    assert _shuffles(p) == 0 and "BroadcastHashJoin" not in p


def test_dedup_apply_broadcast_anti_join(spark):
    p = _plan(spark, "dedup_apply")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    # the corpus side never shuffles; only the tiny drop-list pipeline does
    assert "Exchange hashpartitioning(doc_id" not in p.split("LeftAnti")[0]


def test_contamination_broadcasts_benchmark(spark):
    p = _plan(spark, "contamination")
    assert "BroadcastHashJoin" in p


def test_topterms_partial_topk(spark):
    p = _plan(spark, "text_topterms")
    assert "TakeOrderedAndProject" in p  # no global sort
    assert _shuffles(p) == 1            # exactly the term aggregation


def test_minhash_signatures_no_aggregation_shuffle(spark):
    # signatures are row-wise; the only data shuffle left is the band join
    p = _plan(spark, "dedup_minhash_lsh")
    assert _shuffles(p) <= 1
    assert p.count("BroadcastHashJoin") >= 2  # candidate + verify joins


def test_simhash_no_shuffle(spark):
    p = _plan(spark, "dedup_simhash")
    assert _shuffles(p) == 0 and "Generate" not in p  # no explode at all


def test_repetition_no_shuffle(spark):
    p = _plan(spark, "text_repetition")
    assert _shuffles(p) == 0


def test_chunks_no_shuffle(spark):
    # explode multiplies rows but must not move them
    p = _plan(spark, "text_chunks")
    assert _shuffles(p) == 0 and "Generate" in p


def test_tfidf_broadcasts_df_table(spark):
    # corpus term stats come back as a broadcast, not a doc-keyed shuffle
    p = _plan(spark, "text_tfidf")
    assert "BroadcastHashJoin" in p


def test_surprisal_broadcasts_term_counts(spark):
    # corpus term counts come back as a broadcast onto the exploded
    # tokens, not a term-keyed shuffle of the corpus
    p = _plan(spark, "text_surprisal")
    assert "BroadcastHashJoin" in p


def test_blocklist_no_shuffle(spark):
    # blocklist folded into the expression tree; scrub is a pure scan
    p = _plan(spark, "text_blocklist")
    assert _shuffles(p) == 0 and "Join" not in p


def test_emb_quantize_no_shuffle(spark):
    p = _plan(spark, "emb_quantize")
    assert _shuffles(p) == 0 and "Join" not in p


def test_passages_single_aggregation(spark):
    # explode stays put; only (passage_md5, counts) rows move — the
    # distinct-doc count plans as the standard two-phase distinct (2
    # hash-keyed exchanges of pre-aggregated rows), never the corpus
    p = _plan(spark, "dedup_passages")
    assert "Generate" in p and _shuffles(p) <= 2
    assert "Exchange hashpartitioning(doc_id" not in p


def test_sample_stratified_pure_scan(spark):
    # the per-lang rate CASE lives in the expression tree; no join, no
    # shuffle — same scan-only shape as sample_hash
    p = _plan(spark, "sample_stratified")
    assert _shuffles(p) == 0 and "Join" not in p


def test_text_pack_single_sharded_shuffle(spark):
    # one hash-partitioning on (source, shard) for the window cumsum —
    # the shard salt means no source ever serializes onto one task
    p = _plan(spark, "text_pack")
    assert _shuffles(p) == 1
    assert "Exchange hashpartitioning(source" in p and "shard" in p


def test_events_window_partial_agg(spark):
    # one (window, type)-keyed shuffle of map-side partially aggregated
    # rows; no sort, no join
    p = _plan(spark, "events_window")
    assert _shuffles(p) == 1
    assert "partial_count" in p or "partial" in p
    assert "Join" not in p and "Sort" not in p


def test_refs_domains_partial_agg(spark):
    # Downstream of the span explode (plan head, above the first Generate)
    # only domain-keyed aggregation remains: map-side partials, the
    # standard two-phase distinct (2 exchanges of pre-aggregated rows),
    # and no page column — the heavy struct never moves.
    p = _plan(spark, "refs_domains")
    head = p.split("Generate")[0]
    assert head.count("Exchange") == 2
    assert "partial_count" in head
    assert "page#" not in head


def test_refs_canonical_partial_agg(spark):
    # Same shape as refs_domains: the whole normalization chain is
    # projection-side regexp_replace, then two exchanges of
    # pre-aggregated rows (two-phase distinct); the heavy page struct
    # never moves above the explode.
    p = _plan(spark, "refs_canonical")
    head = p.split("Generate")[0]
    assert head.count("Exchange") == 2
    assert "partial_count" in head
    assert "page#" not in head
    assert "regexp_replace" in head


def test_text_pii_no_extra_shuffle(spark):
    # PII scrub is a pure projection over the kernel output: no data
    # exchange of its own above the extraction boundary (the boundary is
    # the cache scan when the kernel output is cached, else the Arrow
    # kernel node itself — the salt exchange below it belongs to
    # extraction, not the scrub).
    p = _plan(spark, "text_pii")
    for boundary in ("InMemoryTableScan", "MapInArrow"):
        if boundary in p:
            head = p.split(boundary)[0]
            break
    else:
        head = p
    assert head.count("Exchange") - head.count("BroadcastExchange") == 0
    assert "SortMergeJoin" not in head


def test_text_perplexity_broadcast_counts(spark):
    # bigram stream joins its two count tables by broadcast; the only
    # data shuffles are the two vocabulary-bounded count aggregations +
    # the final doc-keyed aggregation of longs.
    p = _plan(spark, "text_perplexity")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_text_features_single_scan(spark):
    # the fused feature export is ONE corpus scan: no shuffle, no join,
    # no explode — everything lives in the projection
    p = _plan(spark, "text_features")
    assert _shuffles(p) == 0 and "Join" not in p and "Generate" not in p


def test_source_stats_single_shuffle(spark):
    # both window functions and the aggregation share ONE source-keyed
    # exchange; rank-selected percentiles add no joins
    p = _plan(spark, "source_stats")
    assert _shuffles(p) == 1 and "Join" not in p


def test_contamination_lsh_broadcasts(spark):
    # benchmark bands + shingle sets ride broadcasts; the only data
    # shuffles are the candidate distinct and the final per-doc agg
    p = _plan(spark, "contamination_lsh")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p and _shuffles(p) <= 2


def test_events_asof_single_user_shuffle(spark):
    # the as-of join is a window scan, not a join: ONE user-keyed
    # exchange feeds the sort + running last(), and no join operator of
    # any kind appears (the naive formulation would be a per-user range
    # join)
    p = _plan(spark, "events_asof")
    assert _shuffles(p) == 1
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Exchange hashpartitioning(user_id" in p


def test_events_range_join_is_bucketed_equi_join(spark):
    # the interval-containment join must run as a bucket equi-join, not
    # the nested-loop plan Spark picks for a bare inequality join
    p = _plan(spark, "events_range_join")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or \
        "ShuffledHashJoin" in p


def test_sample_mix_corpus_pass_is_pure_scan(spark):
    # the rates are driver-side literals; the corpus pass itself must be
    # scan + filter only (the tiny count job is a separate 2-long agg)
    p = _plan(spark, "sample_mix")
    assert _shuffles(p) == 0 and "Join" not in p


def test_dedup_scrub_broadcasts_boilerplate(spark):
    # the repeated-passage vocabulary rides a broadcast back onto the
    # hash stream; the corpus text column meets only the per-doc mask
    # join — no nested-loop anywhere
    p = _plan(spark, "dedup_scrub")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert _shuffles(p) <= 4


def test_rel_ship_priority_broadcast_star(spark):
    # both dimension filters broadcast onto the fact scan; the global
    # top-10 must be a partial top-k, not a full sort
    p = _plan(spark, "rel_ship_priority")
    assert p.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_events_retention_single_user_shuffle(spark):
    # one user-keyed shuffle + the cells aggregation of pre-aggregated
    # rows; the naive self-join form never appears
    p = _plan(spark, "events_retention")
    assert "Join" not in p and _shuffles(p) <= 2


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-located-join scale path the docstrings reference: two
    tables bucketed AND sorted on the join key join with ZERO exchanges
    and zero sorts — at 100 TB this is how a fact table meets its
    per-doc side tables (masks, scores, dedup verdicts) repeatedly
    without re-shuffling the corpus each time."""
    import uuid

    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a, b = (f"t{uuid.uuid4().hex[:8]}" for _ in range(2))
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (d.select("doc_id", "source").write.mode("overwrite")
         .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(a))
        (d.select("doc_id", "n_chars").write.mode("overwrite")
         .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(b))
        j = spark.table(a).join(spark.table(b), "doc_id")
        n = j.count()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert n == d.count()
        assert "Exchange" not in p          # bucketing replaces the shuffle
        assert "SortMergeJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_aqe_skew_join_splits_hot_key(spark):
    """The skew remedy the docstrings lean on must actually engage: a
    join where half the left side shares ONE key gets its hot partition
    split by AQE at runtime — SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead in the FINAL adaptive plan (captured after
    execution; the pre-execution plan says isFinalPlan=false)."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") < 200_000, 0)
            .otherwise((F.col("id") % 999) + 1).alias("k"),
            F.concat(F.lit("payloadpayloadpayload"), F.col("id")).alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = left.join(right, "k")
        assert len(j.collect()) == 400_000
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p and "skewed" in p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sketch_trio_preaggregated_shuffles(spark):
    """hll/cms: token mass collapses map-side (partial agg) before the
    tiny key shuffles (<=64 / <=256 pre-aggregated rows per task);
    bloom's bit_or merge costs exactly one shuffle. None of the three
    reads the corpus twice. cms allows one extra shuffle since round 6:
    the slot md5s moved onto the DISTINCT (source, token) table, whose
    pre-count groupBy is itself map-side combined — the added exchange
    carries distinct tokens, and the hash work drops by the corpus
    repetition factor (4x md5 per occurrence -> per distinct token)."""
    for name, max_sh in (("text_hll", 2), ("text_cms", 3),
                         ("text_bloom", 1)):
        p = _plan(spark, name)
        assert _shuffles(p) <= max_sh, name
        assert "partial_" in p, name
        assert p.count("FileScan") == 1, name


def test_doc_profile_prunes_each_branch_to_one_column(spark):
    """The columnar-win claim holds for real: every UNION branch's
    parquet scan reads EXACTLY its one profiled column (profiling 5 of
    500 columns must read 1% of the bytes, not all of them)."""
    import re
    p = _plan(spark, "doc_profile")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert sorted(schemas) == sorted(
        ["doc_id:bigint", "text:string", "lang:string",
         "source:string", "n_chars:bigint"])


def test_dataset_split_single_shuffle(spark):
    p = _plan(spark, "dataset_split")
    assert _shuffles(p) == 1 and "partial_" in p


def test_postings_two_stage_aggregation(spark):
    # (term, doc) tf partial-aggregates before the term-keyed assembly
    p = _plan(spark, "text_postings")
    assert _shuffles(p) <= 2 and "partial_count" in p


def test_pmi_no_cartesian_blowup(spark):
    # the one-row total rides a broadcast; unigram joins are equi-joins
    p = _plan(spark, "text_pmi")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p  # top-k never global-sorts


def test_substr_exact_broadcasts_candidates_no_cartesian(spark):
    """Exact substring dedup: the repeated-hash set and repeated-window
    set ride broadcasts back onto the streams; nothing degenerates to a
    cartesian/nested-loop product."""
    for name in ("dedup_substr_exact", "dedup_substr_scrub"):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_quantile_sketch_windows_ride_preaggregated_rows(spark):
    """The sketch's rank windows must run over the (event_type, bucket)
    pre-aggregate, never the raw event rows: <= 2 data shuffles total
    (the groupBy + the window's repartition, which AQE may fuse)."""
    p = _plan(spark, "events_quantiles_sketch")
    assert _shuffles(p) <= 2
    assert "partial_count" in p  # map-side combine before the shuffle


def test_bpe_encode_no_cartesian(spark):
    p = _plan(spark, "text_bpe_encode")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
