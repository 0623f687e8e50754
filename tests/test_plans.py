"""Physical-plan regression tests: the scale properties the engine is
designed around, asserted on the optimized plans so a refactor can't
silently reintroduce a bad shape.

  * featurization shares ONE exchange + ONE sort across all features;
  * dim joins broadcast (no shuffled fact-fact join in the star query);
  * the interval join never degrades to BroadcastNestedLoopJoin;
  * parquet scans get predicate pushdown + column pruning.
"""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def catalog(spark):
    import __spark_entry__ as e

    return e.queries()


def test_featurize_pipeline_single_exchange(spark, catalog):
    plan = _plan(catalog["featurize_pipeline"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1


def test_taylor_single_exchange(spark, catalog):
    plan = _plan(catalog["taylor_trailing"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1


def test_star_join_broadcasts_dims(spark, catalog):
    plan = _plan(catalog["join_star"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no shuffled join for dim lookups


def test_interval_join_no_nested_loop(spark, catalog):
    plan = _plan(catalog["range_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_exchange_no_join(spark, catalog):
    # union + last-value: a window op, not a join — no join operator at all
    plan = _plan(catalog["asof_join"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_scan_pushdown_and_pruning(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id")
    )
    plan = _plan(ev)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(event_type,click\)", plan)
    scan_schema = re.search(r"ReadSchema: ([^\n]*)", plan).group(1)
    assert "props" not in scan_schema  # unused wide column pruned
    assert "user_id" in scan_schema


def test_bucketed_table_eliminates_window_exchange(spark, tmp_path):
    """bucketBy(group) metadata lets Window.partitionBy(group) skip the
    shuffle entirely — featurization over a bucketed table is a pure map
    stage (the 100 TB zero-shuffle path)."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.window_features import lag
    from timeseriesutils_spark.sources.sinks import write_bucketed_table
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    write_bucketed_table(
        li, "li_bucketed", "l_suppkey", ["l_shipdate", "l_orderkey", "l_linenumber"],
        n_buckets=4,
    )
    try:
        bucketed = spark.table("li_bucketed")
        out, _ = lag(
            bucketed, "l_extendedprice", ["l_suppkey"], window_size=3,
            order_by=["l_shipdate", "l_orderkey", "l_linenumber"],
        )
        plan = _plan(out)
        assert "Exchange" not in plan  # bucketing satisfies the distribution
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan
        # results identical to the unbucketed path
        ref, _ = lag(
            li, "l_extendedprice", ["l_suppkey"], window_size=3,
            order_by=["l_shipdate", "l_orderkey", "l_linenumber"],
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")


def test_bucketed_query_plan_no_exchange(spark, catalog):
    """The DECLARED bucketed featurization query must keep the
    zero-exchange property end to end (write → catalog read → window)."""
    df = catalog["bucketed_featurize"](spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan
    spark.sql("DROP TABLE IF EXISTS li_bucketed_q")


def test_explode_shingles_no_inferred_generate_filter(spark, catalog):
    """Round-2 regression: InferFiltersFromGenerate re-evaluated the whole
    interpreted shingle tree per row inside a scan-pushed Filter (6x
    measured).  The rule is excluded in configure_session; no plan may
    contain a Filter over the higher-order shingle expression."""
    plan = _plan(catalog["dedup_ngram_jaccard"](spark, SF_DIR))
    for line in plan.splitlines():
        if "Filter" in line and "lambdafunction" in line:
            raise AssertionError(f"inferred generate filter is back: {line[:200]}")


def test_regularize_single_exchange_no_join(spark, catalog):
    """Fused spine+fill: one exchange, one sort, no spine join."""
    plan = _plan(catalog["interpolate"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_funnel_single_exchange(spark, catalog):
    """Every funnel step reuses the same user partitioning: exactly one
    hash exchange regardless of step count."""
    plan = _plan(catalog["funnel"](spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_bm25_broadcasts_stats(spark, catalog):
    """df/N/avgdl are broadcast into the scoring projection; the corpus
    is never on the build side of a shuffled join."""
    plan = _plan(catalog["bm25_search"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_forecast_eval_single_exchange(spark, catalog):
    # lag window and per-group aggregate share the l_suppkey partitioning
    plan = _plan(catalog["forecast_eval"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1


def test_rolling_corr_single_exchange(spark, catalog):
    # all five quantized window sums evaluate in one WindowExec pass
    plan = _plan(catalog["rolling_corr"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 1


def test_perrow_projections_no_exchange(spark, catalog):
    # calendar features and text chunking are pure per-row plans
    for name in ("calendar_features", "chunk_text"):
        assert "Exchange" not in _plan(catalog[name](spark, SF_DIR)), name


def test_winsorize_broadcast_clip(spark, catalog):
    # clip bounds broadcast back: the fact side is never re-shuffled
    plan = _plan(catalog["winsorize"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ohlc_single_exchange(spark, catalog):
    # rank window and bar aggregate share the (type, bucket) partitioning
    plan = _plan(catalog["ohlc_bars"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1


def test_window_aggregates_not_duplicated(spark, catalog):
    # Catalyst keeps every inlined reference to a window aggregate as its
    # own WindowExec slot; the z-score/corr operators must materialize the
    # base sums once (rolling_zscore: exactly count+sum+sum2+q; a regression
    # to inlined form compiles to 35 slots)
    plan = catalog["rolling_zscore"](spark, SF_DIR)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert len(re.findall(r"windowspecdefinition", plan)) <= 4
    plan = catalog["rolling_corr"](spark, SF_DIR)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert len(re.findall(r"windowspecdefinition", plan)) <= 6


def test_kmeans_assignment_no_python(spark, catalog):
    # the per-iteration assignment is pure JVM expressions: no Arrow/python
    # eval node anywhere in the final assignment plan
    plan = _plan(catalog["kmeans"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_shard_assign_single_exchange(spark, catalog):
    # hash projection + one shard exchange for the per-shard positions —
    # exactly the shuffle the partitioned write needs anyway
    plan = _plan(catalog["shard_assign"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1


def test_pagerank_rounds_broadcast_not_smj(spark):
    # node-sized sides broadcast into the edge join; a regression to
    # sort-merge would re-shuffle the edge set every power iteration.
    # The public pagerank() eagerly checkpoints every round (the r5
    # ADVICE laziness fix), so the returned frame's plan is an
    # ExistingRDD scan — assert the shape on one LAZY round instead.
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.graph import _pagerank_one_round

    e = spark.createDataFrame(
        [(a, b) for a in range(20) for b in range(20) if a != b],
        "src long, dst long",
    )
    nodes = e.select(F.col("src").alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(1000).cast("bigint").alias("rank_q"))
    rnd = _pagerank_one_round(
        ranks, nodes, deg, e, F.broadcast, 50, 17, 20
    )
    plan = _plan(rnd)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_skew_salted_join_broadcasts_dim(spark, catalog):
    plan = _plan(catalog["skew_salted_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_domfreq_single_exchange(spark, catalog):
    # row-local top-k (array_sort + slice + posexplode): only the seq
    # window's exchange — an explode + window-rank form would re-shuffle
    # every output row on (group, seq) just to rank 4 bins
    plan = _plan(catalog["domfreq"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1


def test_knn_ivf_portable_assignment_no_python(spark, catalog):
    # portable IVF: corpus/query centroid assignment and the rerank are
    # pure JVM expressions (literal-centroid folds + quantized cosine) —
    # no Arrow/Python eval node may appear in the final plan, and the
    # query side broadcasts into the probed-list join
    plan = _plan(catalog["knn_ivf"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_lsh_broadcast_bucket_join(spark, catalog):
    # bucketed probe: corpus scans once, query side broadcasts on the
    # bucket id; the quantized sign decision stays JVM-side
    plan = _plan(catalog["knn_lsh"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_portable_signature_no_python(spark, catalog):
    # md5 mode keeps every hash (shingle md5, affine minima, band
    # buckets) in built-in expressions — codegen, no Python eval
    plan = _plan(catalog["dedup_minhash_lsh"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_simhash_portable_single_exchange_no_python(spark, catalog):
    # explode → conv(md5) ints → 64 codegen vote aggregates → pack:
    # one exchange (the per-doc aggregation), zero Python nodes
    plan = _plan(catalog["simhash"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert len(re.findall(r"Exchange", plan)) == 1


def test_cusum_single_exchange(spark, catalog):
    """Closed-form CUSUM: the two chained window passes share one
    partitioning/sort — one exchange, one sort, no Python."""
    plan = _plan(catalog["cusum_drift"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rolling_mad_one_window_slot(spark, catalog):
    """Round-14: the catalog query serves the grouped-Arrow median/MAD
    kernel — one exchange, one FlatMapGroupsInPandas, NO WindowExec.
    The relational HOF chain (A/B control) keeps the r3
    WindowExec-slot-multiplication pin: the sorted window array is
    collected ONCE; median and MAD derive from it as projections."""
    plan = _plan(catalog["rolling_mad"](spark, SF_DIR))
    assert len(re.findall(r"FlatMapGroupsInPandas", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 0
    assert len(re.findall(r"Exchange", plan)) == 1

    from timeseriesutils_spark.operators.series_math import rolling_mad
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"
    )
    rel = _plan(
        rolling_mad(
            li, "l_quantity", ["l_suppkey"],
            order_by=["l_orderkey", "l_linenumber"], engine="relational",
        )
    )
    assert len(re.findall(r"\bWindow\b", rel)) == 1
    assert len(re.findall(r"Exchange", rel)) == 1


def test_dup_spans_no_cartesian_no_python(spark, catalog):
    """Span detection is posting-count shaped: equi-joins only, no
    pair explosion path, everything JVM-side."""
    plan = _plan(catalog["dup_spans"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_count_equijoins_only(spark, catalog):
    plan = _plan(catalog["triangle_count"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_active_users_no_python(spark, catalog):
    plan = _plan(catalog["rolling_active_users"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_item_cooccur_no_pairwise_join(spark, catalog):
    # pairs come from row-local array expansion (Generate), never a
    # self-join of the incidence table against itself without keys
    plan = _plan(catalog["item_cooccur"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the flatten/transform pair expansion


def test_grouped_ols2_single_exchange_no_python(spark, catalog):
    # one map-combinable groupBy carries all ten sufficient statistics
    plan = _plan(catalog["grouped_ols2"](spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_counter_rate_single_exchange(spark, catalog):
    # the (type)-keyed window partitioning satisfies the (type, bucket)
    # groupBy clustering, so the whole op is ONE exchange
    plan = _plan(catalog["counter_rate"](spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_fifo_allocation_no_nested_loop(spark, catalog):
    # the interval-overlap join keeps its item equi-key: SMJ/SHJ, never
    # a nested-loop or cartesian fallback
    plan = _plan(catalog["fifo_allocation"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kaplan_meier_broadcasts_dim(spark, catalog):
    # the customer stratum join must broadcast, not shuffle
    plan = _plan(catalog["kaplan_meier"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_attribution_no_python_no_cartesian(spark, catalog):
    plan = _plan(catalog["attribution"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_anova_two_light_exchanges_no_python(spark, catalog):
    # per-level agg + k-row reduce: two exchanges max, all JVM
    plan = _plan(catalog["anova_oneway"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bootstrap_single_scan_no_explode(spark, catalog):
    # 32 replicates live as aggregate expressions, not exploded rows
    plan = _plan(catalog["bootstrap_ci"](spark, SF_DIR))
    assert "Generate" not in plan  # no explode
    assert plan.count("FileScan") == 1  # one pass over the facts


def test_merge_intervals_single_exchange(spark, catalog):
    # window + groupBy share the user partitioning: ONE exchange
    plan = _plan(catalog["merge_intervals"](spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_state_dwell_partial_agg_before_state_exchange(spark, catalog):
    # user-keyed LEAD then state-keyed reduce: exactly two exchanges, and
    # the second moves map-side-combined partials, not raw intervals
    plan = _plan(catalog["state_dwell"](spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "partial_sum" in plan


def test_snapshot_diff_no_payload_in_exchange(spark, catalog):
    plan = _plan(catalog["snapshot_diff"](spark, SF_DIR))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "o_orderpriority" not in line and "o_totalprice" not in line


def test_nowcast_reuses_pinned_triangle(spark, catalog):
    """nowcast_triangle's four consumers of the tiny (occ, delay, count)
    triangle read the pinned frame (InMemoryTableScan), never re-running
    the fact join+aggregation per branch, and no branch degrades to a
    shuffled SortMergeJoin."""
    df = catalog["nowcast_triangle"](spark, SF_DIR)
    df.count()  # materialize the pin so the plan shows cache reads
    plan = _plan(df)
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan


def test_theilsen_pair_join_not_nested_loop(spark, catalog):
    """The Theil-Sen pair stage must stay an equi-join on the group key
    (hash or sort-merge) - a BNLJ/cartesian over the weekly series would
    be quadratic in ROWS ACROSS groups, not within."""
    plan = _plan(catalog["theilsen_trend"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dirichlet_filters_postings_before_shuffle(spark, catalog):
    """dirichlet_lm_search prunes non-query-term postings with a literal
    IN filter before any exchange, and collection stats arrive as
    broadcast one-row frames."""
    plan = _plan(catalog["dirichlet_lm_search"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the word IN (...) filter must appear below the first aggregate
    assert re.search(r"Filter .*word.*IN|Filter .*word#\d+ IN", plan) or "isin" in plan.lower() or " IN (" in plan


def test_renewal_rt_single_window_pass(spark, catalog):
    """renewal_rt's lag kernel is ONE window pass (one Sort over the
    grid), not one per serial-interval tap."""
    plan = _plan(catalog["renewal_rt"](spark, SF_DIR))
    import re as _re
    assert len(_re.findall(r"Window ", plan)) == 1


def test_hurst_single_exchange_single_scan(spark, catalog):
    """hurst_exponent computes all 5 level statistics from ONE fact
    scan and ONE group-key exchange (the single-pass block-array
    design) — the branched per-level form re-scanned the facts once
    per level."""
    plan = _plan(catalog["hurst_exponent"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_tech_indicators_single_exchange(spark, catalog):
    """Both window passes (indicators + MACD signal) and the daily
    aggregation share one HashPartitioning(supplier) exchange."""
    plan = _plan(catalog["tech_indicators"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1


def test_granger_single_exchange_no_python(spark, catalog):
    """granger_lag: lag window + sufficient-stats aggregation on one
    exchange; closed-form F — no Python evaluation anywhere."""
    plan = _plan(catalog["granger_lag"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_rules_no_python_single_scan(spark, catalog):
    """The Gopher rule battery is pure built-in expressions over one
    documents scan (no row UDFs, no plan forks)."""
    plan = _plan(catalog["gopher_rules"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1


# --- round-7 nonparametric battery + spectral entropy + containment -------


def test_ks_test_two_exchanges_no_python(spark, catalog):
    """ks_test: one exchange collapses rows to (group, value) counts,
    one re-clusters for the ECDF windows + final max — the merged-ECDF
    formulation never joins the two samples."""
    plan = _plan(catalog["ks_test"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_kruskal_wallis_single_chain_no_fork(spark, catalog):
    """kruskal_wallis is ONE forward chain: the tie correction is folded
    into the level aggregation (Σ_lvl tl·(t²−1) = t³−t), so the count
    pipeline is scanned once and never recomputed by a second branch."""
    plan = _plan(catalog["kruskal_wallis"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"Exchange", plan)) <= 6


def test_spearman_single_exchange_no_python(spark, catalog):
    """spearman_corr: both rank windows and the sufficient-stats
    aggregation share one HashPartitioning(group) exchange."""
    plan = _plan(catalog["spearman_corr"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spectral_entropy_single_exchange_single_scan(spark, catalog):
    """spectral_entropy shares domfreq's shape: one seq-window exchange,
    one lineitem scan, pure expressions to the entropy output."""
    plan = _plan(catalog["spectral_entropy"](spark, SF_DIR))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bh_fdr_no_python(spark, catalog):
    """bh_fdr_trend: the MK pair pass + BH windows stay JVM-side; the
    hypothesis table the BH windows run on is m≈suppliers rows, so the
    single-partition ordered windows are driver-scale by design."""
    plan = _plan(catalog["bh_fdr_trend"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_containment_shares_jaccard_shape(spark, catalog):
    """containment_dedup reuses the posting-list machinery: no
    sort-merge self-join of the exploded shingle table (the pair list
    comes from per-shingle posting arrays), broadcast size rejoin."""
    plan = _plan(catalog["containment_dedup"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2


# --- round-7 inference / selection batch ----------------------------------


def test_rank_family_shapes(spark, catalog):
    """mann_whitney / roc_auc reuse the kruskal count-rank chain: one
    scan, ≤2 exchanges (count collapse + group re-cluster), no joins,
    no Python."""
    for name in ("mann_whitney", "roc_auc"):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert len(re.findall(r"Scan parquet", plan)) == 1, name
        assert len(re.findall(r"Exchange", plan)) <= 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_single_exchange_window_chains(spark, catalog):
    """runs_test / theta_forecast / page_hinkley / sample_entropy /
    holt_winters are ONE window chain each: single scan, a single
    hash exchange, no joins, no plan forks, no row-at-a-time Python
    (sample_entropy's default engine is the vectorized Arrow
    pair-count kernel — a MapInPandas node, not BatchEvalPython)."""
    for name in (
        "runs_test", "theta_forecast", "page_hinkley", "sample_entropy",
        "holt_winters",
    ):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert len(re.findall(r"Scan parquet", plan)) == 1, name
        assert len(re.findall(r"Exchange", plan)) == 1, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aggregate_only_tests(spark, catalog):
    """diebold_mariano / cochran_armitage / wis_eval / calibration_curve
    collapse to sufficient statistics in ≤2 exchanges with no joins."""
    for name in (
        "diebold_mariano", "cochran_armitage", "wis_eval",
        "calibration_curve",
    ):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert len(re.findall(r"Scan parquet", plan)) == 1, name
        assert len(re.findall(r"Exchange", plan)) <= 2, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_survival_inference_broadcast_only(spark, catalog):
    """logrank_test / cumulative_incidence: the customer dim joins in
    broadcast; the event aggregation + risk-set windows never
    sort-merge."""
    for name in ("logrank_test", "cumulative_incidence"):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert len(re.findall(r"BroadcastHashJoin", plan)) == 1, name
        assert "SortMergeJoin" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_pinned_single_pass(spark, catalog):
    """dsir_select: the doc-bucket counts, the bucket model, and the
    per-doc scores are each pinned — every heavy aggregation runs once
    and the threshold branch reads caches; the model joins broadcast;
    the top-k cut is TakeOrderedAndProject, never a global window."""
    plan = _plan(catalog["dsir_select"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_friedman_no_join_no_python(spark, catalog):
    """friedman_test: cell collapse + block-rank windows + two reduces,
    all on one chain — no joins, no Python."""
    plan = _plan(catalog["friedman_test"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_distinct_ngrams_no_python(spark, catalog):
    """distinct_ngrams: the n-gram union feeds one two-level
    count-distinct aggregation; everything stays JVM-side."""
    plan = _plan(catalog["distinct_ngrams"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


# --- round-8 wirings: mleval / stats appends / sketches / kendall ----------


def test_pr_curve_count_fanout_no_join(spark, catalog):
    """pr_curve: rows collapse to per-(group, quantized score) counts
    BEFORE the threshold grid fans out — the explode runs over counts,
    never raw rows; tp/fp/fn need no join (joinless F1 identity)."""
    plan = _plan(catalog["pr_curve"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_single_aggregation_scorecards(spark, catalog):
    """log_loss / jarque_bera / mcnemar_test are ONE map-combinable
    aggregation each: single scan, single exchange, no joins, no
    Python."""
    for name in ("log_loss", "jarque_bera", "mcnemar_test"):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert len(re.findall(r"Scan parquet", plan)) == 1, name
        assert len(re.findall(r"Exchange", plan)) == 1, name
        assert "Join" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ranking_metrics_two_windows_one_exchange(spark, catalog):
    """ranking_metrics: the system-order and ideal-order rank windows
    share ONE exchange on the query key; the per-query reduce rides the
    same partitioning, and only the report-group reduce re-shuffles.
    No collect_list, no joins, no Python."""
    plan = _plan(catalog["ranking_metrics"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert len(re.findall(r"Window", plan)) == 2
    assert "Join" not in plan
    assert "collect_list" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_levene_bf_single_chain(spark, catalog):
    """levene_bf: per-level median window + two grouped reduces on one
    forward chain — the first reduce rides the window's partitioning,
    so ≤2 exchanges, no joins, no Python."""
    plan = _plan(catalog["levene_bf"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"Exchange", plan)) <= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cohens_kappa_pinned_cells(spark, catalog):
    """cohens_kappa: the confusion-cell frame feeds three consumers
    (row marginals, column marginals, diagonal base) — pinned, so the
    scan+count runs once and the branches read cache; the marginal
    joins stay on k²-row frames."""
    plan = _plan(catalog["cohens_kappa"](spark, SF_DIR))
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kendall_tau_pinned_series(spark, catalog):
    """kendall_tau: the quantized series is pinned (pair self-join +
    two tie rollups all read the cache); the O(n²) pair join is the
    documented verify-tier envelope."""
    plan = _plan(catalog["kendall_tau"](spark, SF_DIR))
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_estimate_takeordered_broadcast(spark, catalog):
    """cms_estimate: per-key counts pinned (cells + candidates read the
    cache); the top-k candidate cut is TakeOrderedAndProject (never a
    global window); estimates join the ≤ depth·width cell table
    broadcast."""
    plan = _plan(catalog["cms_estimate"](spark, SF_DIR))
    assert len(re.findall(r"TakeOrderedAndProject", plan)) == 1
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 2
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_estimate_register_reduce(spark, catalog):
    """hll_estimate: documented two-pass shape — one pass collapses to
    (group, bucket) registers, one computes the exact distinct truth;
    the group-level join of the two ≤|groups|-row frames broadcasts."""
    plan = _plan(catalog["hll_estimate"](spark, SF_DIR))
    assert len(re.findall(r"Scan parquet", plan)) == 2
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round9_additions_plan_shapes(spark, catalog):
    """Round-9 operator plan pins: classification_report is one scan +
    two hash aggregations (cells, then per-class sums) with no join;
    gains_curve is one scan + count collapse + window (no join, no
    ntile); theil_u is one scan, one window, one aggregation;
    flesch_readability and simpson_diversity never join; pacf's
    Durbin–Levinson levels are projections over the single acf
    aggregate (no extra exchanges beyond acf's own + the pivot)."""
    plan = _plan(catalog["classification_report"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1

    plan = _plan(catalog["gains_curve"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1

    plan = _plan(catalog["theil_u"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1

    plan = _plan(catalog["flesch_readability"](spark, SF_DIR))
    assert "Join" not in plan and "Exchange" not in plan  # pure per-row

    plan = _plan(catalog["simpson_diversity"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1

    plan = _plan(catalog["pacf_features"](spark, SF_DIR))
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_ad_test_pins_its_base(spark, catalog):
    """ad_test's one-row-per-group base feeds both the harmonic frame
    and the final join — the pin keeps the count-collapse upstream
    from running twice (InMemoryTableScan present, one parquet scan)."""
    from timeseriesutils_spark.functions.cache import release_all

    try:
        plan = _plan(catalog["ad_test"](spark, SF_DIR))
        # both consumers read the pinned one-row-per-group frame (the
        # printed plan repeats the cached subtree's lineage under each
        # InMemoryTableScan, so counting 'Scan parquet' text would
        # double-count — the cache hits are the real assertion)
        assert len(re.findall(r"InMemoryTableScan", plan)) >= 2
    finally:
        release_all()
