"""Physical-plan regression gate: the 100 TB design promises live
here. If a refactor turns a broadcast dim join into a sort-merge
shuffle, drops scan pushdown, or widens a pruned read schema, these
fail before any benchmark notices.
"""

from __future__ import annotations

from easy_etl_spark.plans.explain import plan_facts
from easy_etl_spark.queries import QUERIES


def _facts(spark, sf_dir, name):
    return plan_facts(QUERIES[name](spark, sf_dir))


def test_q1_pushdown_and_pruning(spark, sf_dir):
    f = _facts(spark, sf_dir, "q1_pricing_summary")
    assert any("l_shipdate" in p for p in f.pushed_filters), "shipdate filter not pushed to scan"
    assert f.scans_only_columns(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ), f"scan reads more than needed: {f.read_schemas}"
    # codegen stage ids only appear in executed AQE plans, so plan-text
    # assertions stop at pushdown/pruning here


def test_q3_all_dim_joins_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "q3_top_orders")
    assert f.sort_merge_joins == 0, "dim join degraded to sort-merge"
    assert f.broadcast_joins >= 2
    assert any("c_mktsegment" in p for p in f.pushed_filters)


def test_q5_no_cartesian_no_smj(spark, sf_dir):
    f = _facts(spark, sf_dir, "q5_region_volume")
    assert f.cartesian == 0
    assert f.sort_merge_joins == 0
    assert f.broadcast_joins >= 4


def test_link_is_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "link_customer_nation")
    assert f.broadcast_joins >= 1 and f.sort_merge_joins == 0


def test_ignore_prunes_scan(spark, sf_dir):
    # dropping columns must narrow the parquet scan itself
    f = _facts(spark, sf_dir, "ignore_drop")
    assert f.scans_only_columns("o_orderkey", "o_custkey", "o_orderstatus"), f.read_schemas


def test_incremental_watermark_pushdown(spark, sf_dir):
    f = _facts(spark, sf_dir, "incremental_watermark")
    assert any("o_orderkey" in p and "GreaterThan" in p for p in f.pushed_filters), (
        "watermark predicate not pushed to scan: " + str(f.pushed_filters)
    )


def test_q9_dim_joins_broadcast_and_like_pushdown(spark, sf_dir):
    f = _facts(spark, sf_dir, "q9_profit_by_nation")
    assert f.cartesian == 0
    assert f.broadcast_joins >= 3, "part/supplier/nation should all broadcast at this SF"
    # LIKE '%red%' reaches the part scan as a pushed Contains filter
    assert any("p_name" in p for p in f.pushed_filters), f.pushed_filters


def test_q7_nation_broadcasts(spark, sf_dir):
    f = _facts(spark, sf_dir, "q7_nation_volume")
    assert f.cartesian == 0
    assert f.broadcast_joins >= 2


def test_systematic_sample_predicate_pushed(spark, sf_dir):
    # o_orderkey % 20 isn't a parquet-native predicate, but column
    # pruning must still hold: only the two needed columns are read
    f = _facts(spark, sf_dir, "systematic_sample")
    assert f.scans_only_columns("o_orderkey", "o_totalprice"), f.read_schemas


def test_q15_scalar_max_is_broadcast_not_sort(spark, sf_dir):
    f = _facts(spark, sf_dir, "q15_top_supplier")
    assert f.broadcast_joins >= 1
    assert f.sort_merge_joins == 0, "scalar-max comparison degraded to sort-merge"


def test_interval_join_shuffles_on_user_only(spark, sf_dir):
    f = _facts(spark, sf_dir, "events_interval_join")
    assert f.cartesian == 0, "interval join must stay an equi-join with range residual"


def test_pii_redaction_prunes_scan_no_shuffle(spark, sf_dir):
    f = _facts(spark, sf_dir, "pii_redaction")
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas
    assert f.exchanges == 0, "per-row redaction must not shuffle"


def test_text_repetition_prunes_scan_no_shuffle(spark, sf_dir):
    f = _facts(spark, sf_dir, "text_repetition")
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas
    assert f.exchanges == 0


def test_decontaminate_gram_join_is_broadcast(spark, sf_dir):
    # exploded training grams must never shuffle: the benchmark gram
    # set is broadcast, so the only exchanges are the broadcast itself
    # + the final (post-match, tiny) groupBy
    f = _facts(spark, sf_dir, "decontaminate_overlap")
    assert f.broadcast_joins >= 1
    assert f.sort_merge_joins == 0, "gram join degraded to sort-merge"


def test_sequence_packing_no_global_window(spark, sf_dir):
    # the prefix sum must be partitioned by __pid — an empty
    # PARTITION BY would serialize 100 TB through one task
    f = _facts(spark, sf_dir, "sequence_packing")
    assert "__pid" in f.text, "partition-offset window missing"
    import re

    assert not re.search(r"Window .*partitionBy=\[\]", f.text)
    # Spark renders a global window as Window [...], [order] with no
    # partition spec; assert every Window node mentions __pid
    for line in f.text.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "__pid" in line, line


def test_vocab_encode_join_is_broadcast(spark, sf_dir):
    # the token stream must never shuffle: the (bounded) vocab is the
    # broadcast side of the encode join
    f = _facts(spark, sf_dir, "vocab_encode")
    assert f.broadcast_joins >= 1
    assert f.sort_merge_joins == 0, "encode join degraded to sort-merge"


def test_session_flush_windows_partitioned_by_user(spark, sf_dir):
    # the gaps-and-islands twin must never plan a global window
    f = _facts(spark, sf_dir, "events_session_flush")
    assert "No Partition Defined" not in f.text
    assert f.scans_only_columns("user_id", "event_id", "ts"), f.read_schemas


def test_multimodal_codec_queries_shuffle_free(spark, sf_dir):
    # synth -> decode -> stats is a pure mapInPandas chain: blobs must
    # never shuffle, and the scan must read only doc_id
    for name in ("multimodal_decode_png", "multimodal_decode_jpeg"):
        f = _facts(spark, sf_dir, name)
        assert f.exchanges == 0, f"{name}: media blobs crossed an exchange"
        assert f.scans_only_columns("doc_id"), (name, f.read_schemas)


def test_vocab_rank_distributed_no_driver_or_single_partition(spark, sf_dir):
    # the vocabulary ranking must stay fully distributed: no driver
    # round-trip (a collect would appear as LocalTableScan/CollectLimit
    # feeding the encode join), no single-partition TakeOrdered merge,
    # and every rank window partitioned by __pid
    f = _facts(spark, sf_dir, "vocab_encode")
    assert "CollectLimit" not in f.text, "vocab rank collects to the driver"
    assert "TakeOrderedAndProject" not in f.text, "vocab rank merges on one task"
    assert "LocalTableScan" not in f.text, "vocab rows re-entered via the driver"
    for line in f.text.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "__pid" in line, line


def test_knn_filtered_pushes_metadata_predicate(spark, sf_dir):
    # hybrid search: the label filter must reach the parquet scan so
    # excluded vectors are never read
    f = _facts(spark, sf_dir, "knn_filtered")
    assert any("label" in p and "EqualTo" in p for p in f.pushed_filters), f.pushed_filters
    assert f.broadcast_joins >= 1 and f.sort_merge_joins == 0


def test_source_token_budget_window_partitioned_by_source(spark, sf_dir):
    # the budget cumsum must be per-source — a global window would
    # serialize the whole corpus through one task
    f = _facts(spark, sf_dir, "source_token_budget")
    for line in f.text.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "source" in line, line


def test_scd2_merge_no_cartesian(spark, sf_dir):
    # the type-2 merge is one keyed full-outer join: never a cartesian,
    # and every exchange hashes on the natural key
    f = _facts(spark, sf_dir, "scd2_history")
    assert f.cartesian == 0
    assert "BroadcastNestedLoopJoin" not in f.text


def test_salted_join_no_skew_single_key(spark, sf_dir):
    # the salted join must join on (key, salt) — the salt column has to
    # survive into the join condition, not be optimized away
    f = _facts(spark, sf_dir, "skew_salted_join")
    assert f.cartesian == 0
    assert "__salt" in f.text, "salt column missing from the physical plan"


def test_fuzzy_pairs_blocked_join_no_cartesian(spark, sf_dir):
    # deletion-neighborhood blocking must produce an equi-join on the
    # block key — a cartesian/BNLJ here means the blocking collapsed
    f = _facts(spark, sf_dir, "fuzzy_name_pairs")
    assert f.cartesian == 0
    assert "BroadcastNestedLoopJoin" not in f.text


def test_funnel_single_aggregation_no_joins(spark, sf_dir):
    # the funnel is conditional aggregation — any join or window in the
    # plan means it regressed to self-join funnel matching
    f = _facts(spark, sf_dir, "events_funnel")
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0 and f.cartesian == 0
    assert "Window" not in f.text


def test_resample_grid_is_broadcast(spark, sf_dir):
    # the dense hour x key grid is tiny and must broadcast onto the
    # hourly aggregate, never shuffle it
    f = _facts(spark, sf_dir, "events_resample_fill")
    assert f.cartesian == 0
    assert f.sort_merge_joins == 0, "grid join degraded to sort-merge"


def test_q2_decorrelated_min_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "q2_min_cost_supplier")
    assert f.cartesian == 0
    assert f.broadcast_joins >= 3  # part, supplier, nation
    assert any("p_size" in p for p in f.pushed_filters), "part slice not pushed"


def test_q16_not_in_is_broadcast_anti(spark, sf_dir):
    f = _facts(spark, sf_dir, "q16_supplier_counts")
    assert f.sort_merge_joins == 0
    assert f.broadcast_joins >= 2  # anti vs bad suppliers + part dim
    assert "Expand" not in f.text, "distinct agg planned an Expand"


def test_q20_semi_chain_pushdown(spark, sf_dir):
    f = _facts(spark, sf_dir, "q20_promo_excess_suppliers")
    assert f.sort_merge_joins == 0 and f.cartesian == 0
    assert any("l_shipdate" in p for p in f.pushed_filters), "date not pushed"


def test_language_id_no_shuffle_before_agg(spark, sf_dir):
    # per-row profile scoring must stay map-side: one exchange total
    # (the final confusion-count aggregate; formatted explain prints
    # each node twice — tree line + detail header)
    f = _facts(spark, sf_dir, "language_id")
    assert f.exchanges <= 2, f.text
    assert f.scans_only_columns("text", "lang"), f.read_schemas


def test_orders_by_calendar_dim_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "orders_by_calendar")
    assert f.sort_merge_joins == 0, "generated calendar dim must broadcast"
    assert f.broadcast_joins >= 1


def test_null_safe_join_is_hash_not_nested_loop(spark, sf_dir):
    f = _facts(spark, sf_dir, "null_safe_join")
    assert f.cartesian == 0
    assert "BroadcastNestedLoopJoin" not in f.text, "eqNullSafe degraded to BNLJ"


def test_containment_no_cartesian(spark, sf_dir):
    # inverted-index self-join: key is the shingle, never a cross join
    f = _facts(spark, sf_dir, "dedup_containment")
    assert f.cartesian == 0


def test_event_transitions_single_pass_and_pruned_scan(spark, sf_dir):
    # round 11: the row totals are a window SUM over the |types|^2
    # transition frame — the events scan -> lag window -> count
    # pipeline must appear ONCE (the old aggregate+broadcast-join form
    # executed it twice, once per branch)
    f = _facts(spark, sf_dir, "event_transitions")
    assert f.broadcast_joins == 0 and f.sort_merge_joins == 0, f.text
    assert f.text.count("Scan parquet") <= 2, f.text  # tree line + detail header
    assert f.scans_only_columns("user_id", "ts", "event_id", "event_type"), f.read_schemas


def test_query_caches_do_not_leak_into_base_scans(spark, sf_dir):
    # round 11 regression: recursive_org_rollup used to track_cache the
    # VERBATIM customer load_table — CacheManager then substituted the
    # InMemoryRelation into every later customer scan in the session,
    # silently killing pushdown/pruning (q3 lost its c_mktsegment
    # PushedFilters). Query-level caches must be query-specific
    # projections that never match another query's scan.
    from easy_etl_spark.session import release_caches

    try:
        QUERIES["recursive_org_rollup"](spark, sf_dir)  # construct only
        f = _facts(spark, sf_dir, "q3_top_orders")
        assert any("c_mktsegment" in p for p in f.pushed_filters), (
            "a query-level cache leaked into the base customer scan:\n" + f.text
        )
    finally:
        release_caches()


def test_chi2_marginals_broadcast(spark, sf_dir):
    # row/column/grand totals all derive from the tiny cell frame and
    # must broadcast back — never shuffle the fact table again
    f = _facts(spark, sf_dir, "chi2_type_value")
    assert f.broadcast_joins >= 3 and f.sort_merge_joins == 0
    assert f.scans_only_columns("event_type", "value"), f.read_schemas


def test_nearest_centroid_centroids_broadcast(spark, sf_dir):
    # |labels| x dims centroid table joins the exploded vectors via
    # broadcast; a sort-merge here would shuffle every (vec, dim) row
    f = _facts(spark, sf_dir, "nearest_centroid_confusion")
    assert f.broadcast_joins >= 1
    assert f.cartesian == 0


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    # new-index x base-index must equi-join on the shingle key
    f = _facts(spark, sf_dir, "dedup_incremental")
    assert f.cartesian == 0


def test_triangle_count_degree_joins_broadcast_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "triangle_count")
    assert f.cartesian == 0
    assert f.scans_only_columns("l_orderkey", "l_partkey"), f.read_schemas


def test_dau_wau_no_window_single_scan(spark, sf_dir):
    # the whole rolling-distinct computation must run windowless
    f = _facts(spark, sf_dir, "dau_wau_stickiness")
    assert "Window" not in f.text
    assert f.scans_only_columns("user_id", "ts"), f.read_schemas


def test_cusum_window_partitioned_and_stats_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "cusum_changepoints")
    assert f.broadcast_joins >= 1 and f.sort_merge_joins == 0
    assert "No Partition Defined" not in f.text, "CUSUM window must partition by type"


def test_skew_profile_uses_takeordered_not_global_sort(spark, sf_dir):
    f = _facts(spark, sf_dir, "join_key_skew_profile")
    assert "TakeOrderedAndProject" in f.text, "top-10 must be a bounded heap, not a sort"
    assert f.scans_only_columns("o_custkey"), f.read_schemas


def test_attribution_single_window_pass_no_self_join(spark, sf_dir):
    # both touch lookbacks must share one user-partitioned window; the
    # naive purchases x history self-join would show extra joins here
    f = _facts(spark, sf_dir, "attribution_touch")
    assert f.sort_merge_joins == 0 and f.cartesian == 0
    assert f.scans_only_columns("user_id", "ts", "event_id", "event_type"), f.read_schemas


def test_keyword_tfidf_df_table_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "keyword_tfidf_top3")
    assert f.broadcast_joins >= 1, "vocab-sized df table must broadcast"
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas


def test_robust_mad_windows_partitioned(spark, sf_dir):
    f = _facts(spark, sf_dir, "robust_outliers_mad")
    assert "No Partition Defined" not in f.text, "MAD rank windows must partition by type"
    assert f.sort_merge_joins == 0


def test_split_census_no_shuffle_before_agg(spark, sf_dir):
    # md5 bucketing is a per-row map: exactly one exchange (the census
    # aggregate; formatted explain prints nodes twice)
    f = _facts(spark, sf_dir, "train_val_test_split")
    assert f.exchanges <= 2, f.text
    assert f.scans_only_columns("doc_id", "source", "n_chars"), f.read_schemas


def test_destutter_windows_partition_by_doc(spark, sf_dir):
    f = _facts(spark, sf_dir, "destutter_tokens")
    assert "No Partition Defined" not in f.text
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas


def test_audio_rms_is_pure_map(spark, sf_dir):
    # decode + window energies happen inside one mapInPandas pass; the
    # only exchange is the (doc, win) result aggregation inside the UDF
    f = _facts(spark, sf_dir, "audio_rms_windows")
    assert f.exchanges == 0, f.text
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas


def test_classifier_eval_single_scan_two_columns(spark, sf_dir):
    f = _facts(spark, sf_dir, "classifier_eval")
    assert f.scans_only_columns("event_type", "value"), f.read_schemas


def test_hard_negatives_broadcast_queries_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "hard_negative_mining")
    assert f.broadcast_joins >= 1
    assert f.cartesian == 0


def test_covariance_partials_single_linear_pass(spark, sf_dir):
    # the d^2 partial cells shuffle once; the vector scan itself must
    # not shuffle before mapInPandas
    from easy_etl_spark.operators.similarity import covariance_partials
    from easy_etl_spark.plans.explain import plan_facts
    from easy_etl_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    f = plan_facts(covariance_partials(emb))
    assert f.exchanges == 0, f.text


def test_winsorize_bounds_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "winsorize_values")
    assert f.broadcast_joins >= 1 and f.sort_merge_joins == 0
    assert "No Partition Defined" not in f.text


def test_item_recommendations_broadcast_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "item_recommendations")
    assert f.cartesian == 0
    assert f.broadcast_joins >= 2, "anchor and popularity frames must broadcast"
    assert f.scans_only_columns("l_orderkey", "l_partkey"), f.read_schemas


def test_interpolate_windows_partition_by_type(spark, sf_dir):
    f = _facts(spark, sf_dir, "events_interpolate")
    assert "No Partition Defined" not in f.text
    assert f.scans_only_columns("event_type", "ts", "value"), f.read_schemas


def test_growth_wow_window_partitioned(spark, sf_dir):
    f = _facts(spark, sf_dir, "growth_wow")
    assert "No Partition Defined" not in f.text
    assert f.scans_only_columns("event_type", "ts", "value"), f.read_schemas


def test_mmr_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "mmr_rerank_topk")
    assert f.cartesian == 0


def test_video_frame_sample_pure_map(spark, sf_dir):
    f = _facts(spark, sf_dir, "video_frame_sample")
    assert f.exchanges == 0, f.text
    assert f.scans_only_columns("doc_id", "text"), f.read_schemas


def test_dedup_pair_explain_no_cartesian(spark, sf_dir):
    f = _facts(spark, sf_dir, "dedup_pair_explain")
    assert f.cartesian == 0


def test_topk_family_uses_window_group_limit(spark, sf_dir):
    # Spark 4's rank-limit pushdown: per-partition partial top-k BEFORE
    # the exchange — the property that keeps rnk<=k filters from
    # shuffling every scored row at scale. Must hold for every top-k
    # window query.
    for name in (
        "topk_per_group",
        "knn_brute_force",
        "keyword_tfidf_top3",
        "item_recommendations",
        "hard_negative_mining",
    ):
        f = _facts(spark, sf_dir, name)
        assert "WindowGroupLimit" in f.text, f"{name}: rank-limit pushdown missing"


def test_priority_sample_uses_take_ordered(spark, sf_dir):
    # the top-K must be per-partition heaps (TakeOrderedAndProject),
    # never a full-corpus global rank window
    f = _facts(spark, sf_dir, "priority_sample")
    assert "TakeOrderedAndProject" in f.text, f.text


def test_range_join_binned_never_materializes_pairs(spark, sf_dir):
    # round-9 regression pin: the query once exploded both interval
    # sets onto an hour grid and dedup'd (span, incident) candidates —
    # a pair set that grows ~K^2 in SF (JVM OOM at sf2.5). The CDF-
    # difference plan must keep pairs out: no Generate (explode) and
    # no aggregate keyed by the candidate triple anywhere in the plan.
    f = _facts(spark, sf_dir, "range_join_binned")
    assert "Generate" not in f.text, "explode reappeared — pair-set plan is back"
    assert "event_id" not in f.text, "incident ids in plan — pairs are being enumerated"
    assert f.cartesian == 0 and f.sort_merge_joins == 0
