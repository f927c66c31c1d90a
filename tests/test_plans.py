"""Physical-plan regression tests — the scale contract, pinned.

Correctness says WHAT a query returns; these tests pin HOW Spark executes it:
filters must reach the parquet scan (PushedFilters), projections must prune
the read schema (ReadSchema), map-only operators must not shuffle (no
Exchange), and tiny sides must broadcast. A refactor that silently turns a
pruned scan into a full scan passes every oracle test and then falls over at
100 TB — this file is what catches it.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flink_job_spark.queries import all_queries


import pytest


@pytest.fixture(autouse=True)
def _clear_sql_cache(spark):
    """Plan captures must be order-independent: a live .persist() left by an
    earlier test in the shared session gets substituted into later plans as
    an InMemoryRelation (CacheManager matches subtrees), changing exchange
    counts. Clear BEFORE each test — never after the query fn runs, because
    several pins assert the query's OWN persist shows as InMemoryTableScan."""
    spark.catalog.clearCache()
    yield


def plan(df) -> str:
    """Formatted physical plan (same text as df.explain('formatted'))."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def read_schema_columns(p: str) -> set[str]:
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def test_watermark_filter_pushes_down(spark, sf_dir):
    q = all_queries()["q_watermark_filter"]
    p = plan(q.fn(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed, f"no PushedFilters in plan:\n{p}"
    assert "LessThanOrEqual(o_orderkey" in pushed.group(1), pushed.group(1)


def test_snapshot_count_prunes_to_key_column(spark, sf_dir):
    q = all_queries()["q_snapshot_count"]
    p = plan(q.fn(spark, sf_dir))
    assert read_schema_columns(p) == {"o_orderkey"}, (
        f"count-under-cutoff should scan ONLY the key column, got "
        f"{read_schema_columns(p)}"
    )


def test_max_watermark_prunes_to_one_column(spark, sf_dir):
    q = all_queries()["q_max_watermark"]
    p = plan(q.fn(spark, sf_dir))
    assert read_schema_columns(p) == {"o_orderdate"}


def test_row_hash_is_map_only(spark, sf_dir):
    """Dual-hash stamping is pure projection — any Exchange is a regression."""
    q = all_queries()["q_row_hash"]
    p = plan(q.fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "q_row_hash")
    # formatted mode stars codegen nodes; the hash projection must be one.
    # With the fan-out exchange the pre-execution plan is adaptive
    # (isFinalPlan=false) and codegen stars only appear in the final plan,
    # so accept the adaptive form as long as the projection is there.
    assert "* Project" in p or ("AdaptiveSparkPlan" in p and "Project" in p), (
        f"hash projection fell out of codegen:\n{p}")


def test_text_queries_are_map_only(spark, sf_dir):
    for name in ["q_token_count", "q_text_quality", "q_lang_id", "q_doc_fingerprint"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, name)


def test_ann_topk_broadcasts_query_side(spark, sf_dir):
    p = plan(all_queries()["q_ann_cosine_topk"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_point_lookup_pushes_limit(spark, sf_dir):
    p = plan(all_queries()["q_point_lookup"].fn(spark, sf_dir))
    assert "Limit" in p or "limit" in p


def test_scan_project_pushes_cutoff(spark, sf_dir):
    p = plan(all_queries()["q_scan_project"].fn(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "LessThanOrEqual(l_orderkey" in pushed.group(1), p


def test_simhash_vocab_join_broadcasts(spark, sf_dir):
    p = plan(all_queries()["q_dedup_simhash"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"vocab join should broadcast:\n{p}"


def test_envelope_is_map_only(spark, sf_dir):
    p = plan(all_queries()["q_tech_columns"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "envelope stamping")


def _n_exchanges(p: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", p))


def _n_key_exchanges(p: str) -> int:
    """Shuffle exchanges excluding fan_out's round-robin parallelism
    restore (a no-op at production scan widths — see sources/tables.py)."""
    return _n_exchanges(p) - len(re.findall(r"RoundRobinPartitioning", p))


def _assert_cached_media_shape(p: str, name: str) -> None:
    """Cached-media codec keys: one Arrow-batched map chain over the
    pruned fixture cache. The ONLY exchange allowed is the cache-read
    ROUND-ROBIN repartition that restores scan parallelism over the
    KB-scale cache files (r8 catch: the file-packing reader coalesced
    them into one partition and serialized decode onto one core —
    q_media_webp_lossy measured 47 s single-task vs ~4 s parallel). Any
    hash/range partitioning would mean a real data shuffle crept in."""
    assert "MapInPandas" in p or "ArrowEvalPython" in p, (name, p)
    n = _n_exchanges(p)
    assert n <= 1, (name, p)
    if n:
        assert "RoundRobinPartitioning" in p, (name, p)
    assert "hashpartitioning" not in p, (name, p)
    assert "rangepartitioning" not in p, (name, p)
    assert read_schema_columns(p) == {"media_id", "payload"}, (name, p)


def assert_map_only_modulo_fanout(p: str, name: str = "") -> None:
    """Map-only pin, r9 form: the computation must introduce NO key-based
    shuffle (hash/range partitioning = a real data exchange), but may carry
    the ONE round-robin exchange `fan_out` (sources/tables.py) inserts when
    the bench's single-file/single-rowgroup scan would otherwise serialize
    the whole expression forest onto one task. At production scan widths
    fan_out is a no-op and these plans are exchange-free again."""
    assert "hashpartitioning" not in p, (name, p)
    assert "rangepartitioning" not in p, (name, p)
    n = _n_exchanges(p)
    assert n <= 1, (name, p)
    if n:
        assert "RoundRobinPartitioning" in p, (name, p)


def test_asof_join_is_two_shuffles(spark, sf_dir):
    """Union-merge as-of join: one shuffle for the right-side dedup, one for
    the merge window — never a range/nested-loop join."""
    p = plan(all_queries()["q_asof_join"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, f"as-of join gained shuffles:\n{p}"
    assert "NestedLoop" not in p, p


def test_asof_tolerance_same_plan_as_plain_asof(spark, sf_dir):
    """The tolerance bound is a post-pick projection: it must add ZERO
    exchanges over q_asof_join's two-shuffle union-merge."""
    p = plan(all_queries()["q_asof_tolerance"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, f"tolerance added shuffles:\n{p}"
    assert "NestedLoop" not in p, p


def test_merkle_buckets_single_combine_agg(spark, sf_dir):
    """Bucketed digest tree: one combine-enabled hash aggregate (64 x 32
    bytes of partials per partition) plus the output sort — a second
    data-sized exchange or a Python stage is a regression."""
    p = plan(all_queries()["q_merkle_buckets"].fn(spark, sf_dir))
    assert _n_key_exchanges(p) <= 2, p
    assert "partial_" in p.lower() or "HashAggregate" in p, p
    assert "ArrowEvalPython" not in p and "MapInPandas" not in p, p


def test_range_join_avoids_nested_loop(spark, sf_dir):
    """Bucketized containment join must be an equi-join, not a BETWEEN
    cross/nested-loop join."""
    p = plan(all_queries()["q_range_join"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, f"range join degraded to nested loop:\n{p}"
    assert _n_exchanges(p) <= 3, p


def test_corpus_pipeline_is_two_shuffles(spark, sf_dir):
    """Filter (map-only) → dedup window (1 shuffle) → rollup (1 shuffle)."""
    p = plan(all_queries()["q_corpus_pipeline"].fn(spark, sf_dir))
    assert _n_key_exchanges(p) <= 2, f"pipeline gained shuffles:\n{p}"


def test_star_join_broadcasts_every_dimension(spark, sf_dir):
    """orders⋈customer⋈nation⋈region: all three dims hinted broadcast — the
    fact side must never shuffle for a join; the only shuffle exchange allowed
    is the final single-key aggregation."""
    p = plan(all_queries()["q_join_broadcast"].fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 3, p
    assert _n_exchanges(p) <= 1, f"fact side shuffled for a join:\n{p}"


def test_fact_fact_join_is_hash_based(spark, sf_dir):
    """lineitem⋈orders unhinted: any equi-join strategy is fine (SMJ at scale,
    broadcast when a side is tiny) but never a nested loop, and no more than
    one shuffle per side plus one for the aggregation."""
    p = plan(all_queries()["q_join_shuffle"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 3, f"join gained shuffles:\n{p}"


def test_rollup_is_single_shuffle(spark, sf_dir):
    """ROLLUP expands grouping sets before the exchange and partial-aggregates
    map-side — one shuffle for all three levels."""
    p = plan(all_queries()["q_agg_rollup"].fn(spark, sf_dir))
    assert "Expand" in p, f"rollup lost its grouping-set expand:\n{p}"
    assert _n_exchanges(p) <= 1, f"rollup gained shuffles:\n{p}"


def test_distinct_agg_is_two_phase(spark, sf_dir):
    """COUNT(DISTINCT): partial dedup on (group, user) then final count —
    two shuffles max, both carrying distinct pairs, not raw events."""
    p = plan(all_queries()["q_distinct_agg"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, f"distinct agg gained shuffles:\n{p}"


def test_stratified_sample_is_map_only(spark, sf_dir):
    """md5-bucket sampling is a pure filter — it must ride the scan with no
    Exchange, so at 100 TB it costs exactly one pass."""
    p = plan(all_queries()["q_stratified_sample"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "sampling")


def test_running_window_is_single_shuffle(spark, sf_dir):
    """row_number + lag + running sum share one (partition, order) → Spark
    must plan ONE Window node over one hash-partition of user_id."""
    p = plan(all_queries()["q_window_running"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"analytic trio gained shuffles:\n{p}"
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_cdc_apply_is_single_shuffle(spark, sf_dir):
    """CDC latest-state: ONE key-partitioned window shuffle, nothing else."""
    p = plan(all_queries()["q_cdc_apply"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"CDC apply gained shuffles:\n{p}"


def test_tfidf_broadcasts_corpus_size(spark, sf_dir):
    """tf·N/df: the 1-row corpus-size side must broadcast (no shuffle for the
    cross join) and the df join is a plain equi-join — no nested loop over
    the TF table."""
    p = plan(all_queries()["q_tfidf_topk"].fn(spark, sf_dir))
    assert "BroadcastExchange" in p, p
    assert "InMemoryTableScan" in p, f"TF table must be persisted once:\n{p}"
    # TF build (1) + two 2-phase countDistincts (4) + doc window (1); the df
    # and N sides broadcast — the TF table itself never shuffles for a join
    assert _n_key_exchanges(p) <= 6, f"tf-idf gained shuffles:\n{p}"
    assert "WindowGroupLimit" in p, f"rank<=k must push into the window:\n{p}"


def test_pivot_is_single_shuffle_no_discovery_job(spark, sf_dir):
    """Explicit pivot values: one partial-aggregated shuffle, and no separate
    distinct-values pass anywhere in the plan."""
    p = plan(all_queries()["q_pivot_events"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"pivot gained shuffles:\n{p}"


def test_gapfill_grid_joins_without_nested_loop(spark, sf_dir):
    """Grid ⟕ buckets must stay an equi-join; bucket agg + bounds agg +
    fill window bound the shuffle count; hourly buckets persist once."""
    p = plan(all_queries()["q_gapfill_locf"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert "InMemoryTableScan" in p, f"hourly buckets must persist:\n{p}"
    assert _n_exchanges(p) <= 4, f"gap-fill gained shuffles:\n{p}"


def test_group_sample_truncates_before_shuffle(spark, sf_dir):
    """Per-group sampling must plan WindowGroupLimit (map-side top-k
    truncation before the exchange) and exactly one shuffle."""
    p = plan(all_queries()["q_group_sample"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in p, f"rank<=k did not push into the window:\n{p}"
    assert _n_exchanges(p) <= 1, f"group sample gained shuffles:\n{p}"


def test_salted_agg_is_two_phase(spark, sf_dir):
    """Salted aggregation: exactly two exchanges — (key, salt) shards, then
    the tiny per-key merge. Any third shuffle is a regression."""
    p = plan(all_queries()["q_skew_salted_agg"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 2, f"salted agg lost its two-phase shape:\n{p}"


def test_semi_anti_join_prune_and_no_multiplication(spark, sf_dir):
    """Existence joins: probe side prunes to the join key (+ pushed filter for
    anti) and the join is semi/anti hash-based — never an inner join that
    multiplies rows, never a nested loop."""
    for name, extra in [("q_semi_join", set()), ("q_anti_join", {"o_orderpriority"})]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        assert "NestedLoop" not in p, p
        assert "Semi" in p or "Anti" in p, f"{name} lost its existence-join shape:\n{p}"
        orders_cols = {c for c in read_schema_columns(p) if c.startswith("o_")}
        assert orders_cols == {"o_custkey"} | extra, (
            f"{name}: orders scan reads {orders_cols}, not just the key"
        )


def test_cube_is_single_shuffle(spark, sf_dir):
    """CUBE expands all four grouping sets before one exchange (same contract
    as ROLLUP)."""
    p = plan(all_queries()["q_cube_agg"].fn(spark, sf_dir))
    assert "Expand" in p, f"cube lost its grouping-set expand:\n{p}"
    assert _n_exchanges(p) <= 1, f"cube gained shuffles:\n{p}"


def test_histogram_prunes_and_single_shuffle(spark, sf_dir):
    """Literal-bound bucketing: one column read, one tiny aggregation
    exchange — no extra min/max pass over the data."""
    p = plan(all_queries()["q_histogram"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"o_totalprice"}, read_schema_columns(p)
    assert _n_exchanges(p) <= 1, f"histogram gained shuffles:\n{p}"


def test_pii_redact_is_map_only(spark, sf_dir):
    p = plan(all_queries()["q_pii_redact"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "q_pii_redact")


def test_rolling_range_is_single_shuffle(spark, sf_dir):
    """Value-RANGE rolling frame: one user_id partition shuffle, one Window."""
    p = plan(all_queries()["q_rolling_range"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"rolling range gained shuffles:\n{p}"
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_scd2_merge_is_single_join_pass(spark, sf_dir):
    """SCD2: the open-slice⋈snapshot join runs ONCE (conditional-array emit,
    not three references to the join) and history unions in shuffle-free."""
    p = plan(all_queries()["q_scd2_merge"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    n_joins = len(re.findall(r"\(\d+\) SortMergeJoin|\(\d+\) BroadcastHashJoin|\(\d+\) ShuffledHashJoin", p))
    assert n_joins == 1, f"SCD2 merge re-executes its join ({n_joins} joins):\n{p}"


def test_ntile_is_single_shuffle(spark, sf_dir):
    """Both rank functions share one (partition, order) → one Window node."""
    p = plan(all_queries()["q_ntile"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"ntile gained shuffles:\n{p}"
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_zorder_is_map_only(spark, sf_dir):
    """Morton key is pure bit arithmetic — must ride the scan, no Exchange."""
    p = plan(all_queries()["q_zorder_layout"].fn(spark, sf_dir))
    assert "Exchange" not in p, f"z-order key computation shuffles:\n{p}"
    assert read_schema_columns(p) == {"o_orderkey", "o_custkey", "o_orderdate"}


def test_incr_agg_merge_reuses_partitioning(spark, sf_dir):
    """State and delta both hash-partition on user_id; the merge join must
    not add a third exchange on top of the two aggregations."""
    p = plan(all_queries()["q_incr_agg_merge"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 2, f"merge join re-shuffled the aggregates:\n{p}"


def test_fuzzy_editdist_blocks_and_persists(spark, sf_dir):
    """Block-then-verify: the blocked frame persists once (both self-join
    sides), the join is equi on the block key — never a cartesian."""
    p = plan(all_queries()["q_fuzzy_editdist"].fn(spark, sf_dir))
    assert "NestedLoop" not in p and "Cartesian" not in p, p
    assert "InMemoryTableScan" in p, f"blocked frame must persist:\n{p}"


def test_profile_table_is_one_pass(spark, sf_dir):
    """All per-column stats in one aggregation: Expand for the distincts,
    two exchanges (partial-distinct + final), never |cols| table scans."""
    p = plan(all_queries()["q_profile_table"].fn(spark, sf_dir))
    assert "Expand" in p, f"profile lost its one-pass expand:\n{p}"
    assert _n_exchanges(p) <= 2, f"profile gained shuffles:\n{p}"
    n_scans = len(set(re.findall(r"\((\d+)\) Scan parquet", p)))
    assert n_scans == 1, f"profile re-scans the table ({n_scans} scans):\n{p}"


def test_funnel_joins_on_aggregated_users(spark, sf_dir):
    """Stage aggregates reduce to one row per user before joining; all stages
    share the user_id partitioning (≤3 exchanges), no nested loop."""
    p = plan(all_queries()["q_funnel"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 3, f"funnel gained shuffles:\n{p}"


def test_cohort_retention_dedups_before_join(spark, sf_dir):
    """first-seen agg + user-day dedup + join + final rollup: ≤4 exchanges,
    the join carries distinct user-days."""
    p = plan(all_queries()["q_cohort_retention"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 4, f"cohort retention gained shuffles:\n{p}"


def test_impute_broadcasts_means(spark, sf_dir):
    """The |groups|-row mean table broadcasts back onto the fact — the fact
    side must not shuffle for the join (one agg exchange only)."""
    p = plan(all_queries()["q_impute_group_mean"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"means join must broadcast:\n{p}"
    assert _n_exchanges(p) <= 1, f"impute fact side shuffled:\n{p}"


def test_graph_degree_reuses_pair_graph(spark, sf_dir):
    """Degrees come from the persisted pair list (InMemoryTableScan), never a
    rescan of the text; no nested loop anywhere in the composition."""
    p = plan(all_queries()["q_graph_degree"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert "InMemoryTableScan" in p, f"pair graph must persist:\n{p}"


def test_keep_best_is_single_shuffle(spark, sf_dir):
    """Best-representative dedup: rank + group count share ONE md5-key
    partitioning — a second exchange is a regression. (No WindowGroupLimit
    by design: the group count needs every row.)"""
    p = plan(all_queries()["q_dedup_keep_best"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"keep-best gained shuffles:\n{p}"


def test_doc_chunks_is_map_only(spark, sf_dir):
    """Tokenize-and-chunk must ride the scan: explode, no Exchange, and the
    text is split once (a single codegen'd Generate over the words array)."""
    p = plan(all_queries()["q_doc_chunks"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "q_doc_chunks")


def test_minmax_scale_broadcasts_stats(spark, sf_dir):
    """|groups|-row min/max stats broadcast back — fact side never shuffles
    for the join (one agg exchange only)."""
    p = plan(all_queries()["q_minmax_scale"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"stats join must broadcast:\n{p}"
    assert _n_exchanges(p) <= 1, f"scale fact side shuffled:\n{p}"


def test_sequence_pack_never_sorts_globally(spark, sf_dir):
    """Packing is per-source; a SinglePartition exchange would mean a global
    sort crept in and the 100 TB story is dead."""
    q = all_queries()["q_sequence_pack"]
    p = plan(q.fn(spark, sf_dir))
    assert "SinglePartition" not in p, f"sequence packing went global:\n{p}"


def test_mixture_resample_broadcasts_rates(spark, sf_dir):
    q = all_queries()["q_mixture_resample"]
    p = plan(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"rate table must broadcast:\n{p}"


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    q = all_queries()["q_contamination"]
    p = plan(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"benchmark inventory must broadcast:\n{p}"
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_block_dedup_no_cartesian(spark, sf_dir):
    q = all_queries()["q_block_dedup"]
    p = plan(q.fn(spark, sf_dir))
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_group_median_single_shuffle_pruned(spark, sf_dir):
    q = all_queries()["q_group_median"]
    p = plan(q.fn(spark, sf_dir))
    # one key exchange (the grouped percentile); fan_out may add its
    # round-robin parallelism restore below it (r9)
    assert _n_key_exchanges(p) <= 1, f"grouped percentile gained shuffles:\n{p}"
    assert read_schema_columns(p) == {"l_returnflag", "l_extendedprice"}, (
        read_schema_columns(p)
    )


def test_impute_mode_broadcasts_mode(spark, sf_dir):
    q = all_queries()["q_impute_mode"]
    p = plan(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"mode table must broadcast:\n{p}"
    assert "NestedLoop" not in p, p


def test_winsorize_broadcasts_bounds(spark, sf_dir):
    q = all_queries()["q_winsorize"]
    p = plan(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"percentile bounds must broadcast:\n{p}"
    assert "NestedLoop" not in p, p


def test_streak_uses_grouped_pandas_after_distinct(spark, sf_dir):
    """The pandas operator must see deduped (user, day) rows — distinct
    BEFORE FlatMapGroupsInPandas keeps per-group state bounded."""
    q = all_queries()["q_streak_pandas"]
    p = plan(q.fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p, p
    assert "HashAggregate" in p, f"distinct (user, day) dedup disappeared:\n{p}"


def test_partition_prune_reads_one_partition(spark, sf_dir, tmp_path):
    q = all_queries()["q_partition_prune"]
    p = plan(q.fn(spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m, f"no PartitionFilters in plan:\n{p}"
    assert "o_month" in m.group(1) and "1995-03" in m.group(1), m.group(1)


def test_cooccurrence_joins_on_user(spark, sf_dir):
    q = all_queries()["q_cooccurrence"]
    p = plan(q.fn(spark, sf_dir))
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_share_window_aggregates_before_window(spark, sf_dir):
    """The window must run over the (type,user) aggregate, not raw events."""
    q = all_queries()["q_share_window"]
    p = plan(q.fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, f"ratio-to-report gained shuffles:\n{p}"
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_weighted_sample_is_top_k(spark, sf_dir):
    """orderBy+limit must fuse to TakeOrderedAndProject (per-partition top-k,
    driver merges k·partitions rows) — a global Sort is the scale failure."""
    q = all_queries()["q_weighted_sample"]
    p = plan(q.fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, f"weighted sample lost top-k fuse:\n{p}"


def test_triangle_count_persists_edges_no_cartesian(spark, sf_dir):
    """Wedge joins must be equi-joins; the only NestedLoop allowed is the
    broadcast of the 1-row n_edges aggregate (same pattern as tfidf's
    corpus-size side)."""
    q = all_queries()["q_triangle_count"]
    p = plan(q.fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert not re.findall(r"(?<!Broadcast)NestedLoopJoin", p), (
        f"non-broadcast nested loop:\n{p}"
    )
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1, p
    assert "InMemoryTableScan" in p, f"edge list must persist:\n{p}"


def test_transition_matrix_windows_stay_partitioned(spark, sf_dir):
    """Both windows (per-user lag, per-prev normalization) must be hash
    partitioned — a SinglePartition exchange means a global sort crept in."""
    q = all_queries()["q_transition_matrix"]
    p = plan(q.fn(spark, sf_dir))
    assert "SinglePartition" not in p, f"transition matrix went global:\n{p}"
    assert len(re.findall(r"\(\d+\) Window", p)) == 2, p


def test_label_centroids_single_shuffle(spark, sf_dir):
    """Vector flatten is map-side; ONE combine-enabled exchange on
    (label, dim) carries |labels|·|dims| partial rows, not the corpus."""
    q = all_queries()["q_label_centroids"]
    p = plan(q.fn(spark, sf_dir))
    assert _n_key_exchanges(p) <= 1, f"centroid agg gained shuffles:\n{p}"
    assert "Generate" in p, p  # the posexplode


def test_rolling_distinct_broadcasts_observed_days(spark, sf_dir):
    """k-day replicate is map-side (Generate), observed-days join broadcasts,
    ONE distinct-agg shuffle keyed by report_day."""
    q = all_queries()["q_rolling_distinct"]
    p = plan(q.fn(spark, sf_dir))
    assert "Generate" in p, p
    assert "BroadcastHashJoin" in p, f"observed-days join must broadcast:\n{p}"


def test_outlier_mad_broadcasts_both_stats(spark, sf_dir):
    """Median and MAD reductions broadcast back — the fact side must never
    shuffle for either join. r9: the deviation frame is persisted (both
    the MAD reduction and the final rollup read it — one scan+join pass
    instead of two) and the scan fans out so the sort-based percentile
    partials run wider than one task; the cached dev subplan appears as
    InMemoryTableScan at least twice."""
    q = all_queries()["q_outlier_mad"]
    p = plan(q.fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 2, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert p.count("InMemoryTableScan") >= 2, p


def test_correlation_single_shuffle(spark, sf_dir):
    """Six moment aggregates ride ONE combine-enabled exchange."""
    q = all_queries()["q_correlation"]
    p = plan(q.fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, f"moment agg gained shuffles:\n{p}"


# --- round-2 second-wave keys: ML/analytics + retrieval ------------------------------

def test_knn_classify_broadcasts_queries_and_prunes(spark, sf_dir):
    """The query side must broadcast (the big side never shuffles for
    scoring) and the scan must read only the three used columns."""
    p = plan(all_queries()["q_knn_classify"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert read_schema_columns(p) <= {"vec_id", "embedding", "label"}, (
        read_schema_columns(p))


def test_vector_dim_stats_single_shuffle(spark, sf_dir):
    """posexplode + one combine-enabled agg: exactly one exchange (on dim),
    and the scan reads only the embedding column."""
    p = plan(all_queries()["q_vector_dim_stats"].fn(spark, sf_dir))
    assert _n_key_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"embedding"}, read_schema_columns(p)


def test_bm25_filters_terms_before_aggregation(spark, sf_dir):
    """The query-term filter must appear in the plan before any exchange —
    only query-term postings may shuffle — and df/stats sides broadcast."""
    p = plan(all_queries()["q_bm25_search"].fn(spark, sf_dir))
    assert "BroadcastExchange" in p, p
    first_exchange = p.find("Exchange")
    term_filter = p.find("spark")  # the literal query term in the Filter node
    assert 0 <= term_filter, p
    assert "Filter" in p, p


def test_skyline_broadcasts_bucket_maxima(spark, sf_dir):
    """Phase-2 prefix maxima must broadcast; no global sort of the full
    point set may appear (only per-bucket window sorts)."""
    p = plan(all_queries()["q_skyline_2d"].fn(spark, sf_dir))
    assert "BroadcastExchange" in p, p


def test_target_encoding_single_window_no_join(spark, sf_dir):
    """LOO encoding is one category-partitioned window — a join-back
    formulation would add a second scan + a join exchange."""
    p = plan(all_queries()["q_target_encoding"].fn(spark, sf_dir))
    assert "Join" not in p, f"target encoding grew a join:\n{p}"
    assert _n_exchanges(p) == 1, p


def test_quantile_normalize_no_global_sort(spark, sf_dir):
    """Rank windows are per-segment: the only exchange is the segment hash
    partitioning, never a single-partition global sort."""
    p = plan(all_queries()["q_quantile_normalize"].fn(spark, sf_dir))
    assert "SinglePartition" not in p, p
    assert _n_exchanges(p) == 1, p


def test_class_weights_two_bounded_exchanges(spark, sf_dir):
    """Label counts shuffle once (combine-enabled); the N/k window runs on
    the k-row label aggregate, so its single-partition exchange is bounded
    by label cardinality — two exchanges total."""
    p = plan(all_queries()["q_class_weights"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 2, p
    assert "HashAggregate" in p, p


# --- TPC-H classics ------------------------------------------------------------------

def test_pricing_summary_one_exchange_pushed_date(spark, sf_dir):
    """Q1: one combine-enabled shuffle; the shipdate cutoff reaches the
    parquet scan."""
    p = plan(all_queries()["q_pricing_summary"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "l_shipdate" in pushed.group(1), p


def test_revenue_forecast_all_filters_pushed_no_shuffle(spark, sf_dir):
    """Q6: the predicate trio pushes down; the only exchange is the 1-row
    partial→final hop of the global aggregate (map-side combine did the
    work)."""
    p = plan(all_queries()["q_revenue_forecast"].fn(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed, p
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed.group(1), (c, pushed.group(1))
    assert _n_exchanges(p) <= 1, p
    assert "partial_sum" in p, p  # combine-enabled: partials before the hop


def test_shipping_priority_broadcasts_dims_and_fuses_topk(spark, sf_dir):
    """Q3: both dimension sides broadcast (lineitem never shuffles for the
    joins) and the sort+limit fuses into TakeOrderedAndProject."""
    p = plan(all_queries()["q_shipping_priority"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 2, p
    assert "TakeOrderedAndProject" in p, p
    assert _n_exchanges(p) <= 1, p


def test_feature_hash_single_shuffle_map_side_bucket(spark, sf_dir):
    """Hashing-trick featurization: bucket assignment is map-side; the only
    exchange is the (doc, bucket) reduction."""
    p = plan(all_queries()["q_feature_hash"].fn(spark, sf_dir))
    assert _n_key_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"doc_id", "text"}, read_schema_columns(p)


def test_media_ahash_no_shuffle(spark, sf_dir):
    """The whole encode→decode→hash path is one Arrow-batched map pass."""
    p = plan(all_queries()["q_media_ahash"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "q_media_ahash")
    assert "ArrowEvalPython" in p or "MapInPandas" in p, p


def test_decay_score_single_shuffle(spark, sf_dir):
    """Decay weights are map-side integer shifts; one user-keyed exchange."""
    p = plan(all_queries()["q_decay_score"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p


def test_dedup_incremental_broadcasts_batch_keys(spark, sf_dir):
    """The historical corpus must never shuffle on content_key — both the
    semi-join probe and the verdict join broadcast batch-bounded sides."""
    p = plan(all_queries()["q_dedup_incremental"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 2, p
    assert "SortMergeJoin" not in p, f"corpus shuffled for the join:\n{p}"


def test_exists_late_semi_join_with_pushed_window(spark, sf_dir):
    """Q4 shape: the correlated EXISTS must execute as a SEMI join (never a
    row-multiplying inner join), the date window must reach the orders scan,
    and lineitem must be pruned to the two columns the condition touches."""
    p = plan(all_queries()["q_exists_late"].fn(spark, sf_dir))
    assert "LeftSemi" in p or "Semi" in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderdate" in s for s in pushed), pushed
    assert {"l_orderkey", "l_shipdate"} <= read_schema_columns(p), (
        read_schema_columns(p))


def test_small_qty_revenue_copartitioned_join_broadcast_dim(spark, sf_dir):
    """Q17 shape: the per-part pre-aggregate joins back on the SAME key the
    groupBy shuffled on, and the part dim broadcasts — lineitem shuffles on
    l_partkey only (never once per join)."""
    p = plan(all_queries()["q_small_qty_revenue"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    # lineitem appears twice (probe + aggregate build): both shuffle on
    # l_partkey, plus the final brand aggregate — bounded, never a cartesian
    assert "CartesianProduct" not in p, p
    assert "l_partkey" in p, p


def test_set_intersect_reduces_to_distinct_before_match(spark, sf_dir):
    """INTERSECT must rewrite to aggregate/semi-join on DISTINCT keys — both
    date predicates push into their scans of the shared table."""
    p = plan(all_queries()["q_set_intersect"].fn(spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderdate" in s for s in pushed), pushed
    assert "HashAggregate" in p, p
    assert read_schema_columns(p) == {"o_custkey", "o_orderdate"}, (
        read_schema_columns(p))


def test_array_ops_single_shuffle(spark, sf_dir):
    """collect_set aggregation: one combine-enabled user_id exchange; the
    array post-processing (sort/join/contains) is map-side on the aggregate."""
    p = plan(all_queries()["q_array_ops"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"user_id", "event_type"}, (
        read_schema_columns(p))


def test_window_firstlast_single_shuffle(spark, sf_dir):
    """All four window expressions share one (user_id, day) partitioning —
    a second Exchange would mean the frames didn't fuse."""
    p = plan(all_queries()["q_window_firstlast"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p


def test_percentile_disc_single_sort_shared_partitioning(spark, sf_dir):
    """Rank + per-type count ride the same event_type partitioning: one
    exchange for the windows + the tiny final aggregate."""
    p = plan(all_queries()["q_percentile_disc"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, p
    assert read_schema_columns(p) == {"event_type", "value", "event_id"}, (
        read_schema_columns(p))


def test_seasonality_map_only_derivation(spark, sf_dir):
    """Calendar features are pure projection; the only exchange is the
    84-cell-bounded aggregate hop."""
    p = plan(all_queries()["q_seasonality"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"o_orderdate", "o_totalprice"}, (
        read_schema_columns(p))


def test_naive_bayes_broadcasts_model_stats(spark, sf_dir):
    """Class totals and vocabulary size broadcast onto the (lang, word)
    table; the big text explode is shuffled once on (lang, word)."""
    p = plan(all_queries()["q_naive_bayes"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 2, p
    assert "SortMergeJoin" not in p, p


def test_schema_evolution_merged_scan_groups_once(spark, sf_dir):
    """The merged read is a single parquet scan over both generations; one
    combine-enabled aggregate exchange follows."""
    p = plan(all_queries()["q_schema_evolution"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p


def test_unpivot_expands_map_side(spark, sf_dir):
    """The melt is an in-place Expand (k=3 rows per input row) — never a
    shuffle; the only exchange is the bounded (flag, measure) aggregate."""
    p = plan(all_queries()["q_unpivot"].fn(spark, sf_dir))
    assert "Expand" in p, p
    assert _n_exchanges(p) == 1, p
    assert read_schema_columns(p) == {
        "l_returnflag", "l_extendedprice", "l_discount", "l_tax"}, (
        read_schema_columns(p))


def test_bpe_merges_reduces_to_vocabulary_first(spark, sf_dir):
    """Pair counting must explode the vocabulary aggregate, not the raw
    corpus: plan order is word-agg exchange → pair-agg exchange → one
    constant-sized global top-k hop; only text is read."""
    p = plan(all_queries()["q_bpe_merges"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 3, p
    assert read_schema_columns(p) == {"text"}, read_schema_columns(p)


def test_media_wav_rms_no_shuffle(spark, sf_dir):
    """Encode→decode is one Arrow-batched map pass; bytes never shuffle."""
    p = plan(all_queries()["q_media_wav_rms"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "wav plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p


def test_media_video_frames_no_shuffle(spark, sf_dir):
    """AVI encode -> idx1-sampled frame decode is one Arrow-batched map
    chain over doc_id only; video bytes never shuffle and only doc_id is
    read from parquet — the shape that holds when the payload column is
    100 TB."""
    p = plan(all_queries()["q_media_video_frames"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "video plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_kmv_window_group_limit_and_pruning(spark, sf_dir):
    """KMV sketches: the rank<=K filter must reach WindowGroupLimit so each
    partition truncates to K rows BEFORE the window shuffle (O(K) state per
    segment at any scale); only the two needed columns are read; the tiny
    pair/stat joins broadcast, never cartesian."""
    p = plan(all_queries()["q_kmv_set_ops"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p, p
    assert read_schema_columns(p) == {"o_orderpriority", "o_custkey"}, \
        read_schema_columns(p)


def test_spatial_close_pairs_grid_join_no_cartesian(spark, sf_dir):
    """Grid-bucketed spatial self-join: candidates come from a (cell) hash
    equi-join of the 9-cell-exploded left vs home-cell right — a cartesian
    or nested-loop product is exactly the failure mode this key exists to
    avoid; only the key+nation columns are read."""
    p = plan(all_queries()["q_spatial_close_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoop" not in p, p
    assert "Generate" in p, p        # the 3x3 neighborhood explode
    assert read_schema_columns(p) == {"c_custkey", "c_nationkey"}, \
        read_schema_columns(p)


def test_tpch_q2_min_cost_no_fact_rescan(spark, sf_dir):
    """Q2 shape: the per-part MIN aggregates the ALREADY-reduced offers
    frame; dims broadcast; no cartesian/nested-loop from the decorrelated
    join-back."""
    p = plan(all_queries()["q_min_cost_supplier"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p


def test_tpch_q9_profit_broadcast_dims(spark, sf_dir):
    """Q9 shape: part and supplier+nation broadcast into the fact scan; the
    only big-big join is lineitem-orders."""
    p = plan(all_queries()["q_product_profit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p


def test_tpch_q11_scalar_total_broadcast(spark, sf_dir):
    """Q11 shape: the global total is a 1-row broadcast back onto the
    per-part aggregate, and BOTH consumers (total + output) must read the
    persisted val frame — never recompute the fact aggregation."""
    p = plan(all_queries()["q_important_lines"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert p.count("InMemoryTableScan") >= 2, p


def test_tpch_q16_anti_join_broadcast(spark, sf_dir):
    """Q16 shape: NOT IN decorrelates to a broadcast left-anti join; the
    part predicate broadcasts; COUNT DISTINCT expands JVM-side."""
    p = plan(all_queries()["q_supplier_part_counts"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "ArrowEvalPython" not in p, p


def test_tpch_q20_reuses_reduced_aggregate(spark, sf_dir):
    """Q20 shape: part_tot aggregates shipped (already part,supplier-
    reduced); lineitem is scanned exactly once."""
    p = plan(all_queries()["q_excess_stock_suppliers"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    import re
    li_scans = len(re.findall(r"Scan parquet[^\n]*lineitem", p))
    assert li_scans <= 1, f"lineitem scanned {li_scans}x:\n{p}"


def test_attribution_linear_bucketed_join(spark, sf_dir):
    """Multi-touch attribution: purchase-click pairing must be the bucketed
    (user_id, time-bucket) equi-join (1-D grid pattern) — a per-user
    cross/nested-loop product is the failure mode; ranking then runs per
    purchase only."""
    p = plan(all_queries()["q_attribution_linear"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p, p
    assert "Generate" in p, p        # the 2-bucket explode
    assert "Window" in p, p


def test_media_resize_real_no_shuffle(spark, sf_dir):
    """Real resample: encode -> decode -> nearest-neighbor gather is one
    Arrow-batched map chain; decoded frames never shuffle, only doc_id is
    read."""
    p = plan(all_queries()["q_media_resize_real"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "resize plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_moving_avg_single_shuffle_running_frame(spark, sf_dir):
    """The trailing ROWS frame evaluates with O(frame) running state on one
    user_id partitioning — a second exchange or a re-sort is a regression."""
    p = plan(all_queries()["q_moving_avg"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "RunningWindowFunction" in p or "Window" in p, p


def test_regex_extract_map_side_bounded_agg(spark, sf_dir):
    """Extraction is pure projection; one exchange for the 25-brand-bounded
    aggregate; only the three touched columns are read."""
    p = plan(all_queries()["q_regex_extract"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"p_brand", "p_retailprice", "p_name"}, (
        read_schema_columns(p))


def test_grouping_sets_expands_only_requested_sets(spark, sf_dir):
    """GROUPING SETS must expand 2 sets per row (CUBE would expand 4);
    one exchange."""
    p = plan(all_queries()["q_grouping_sets"].fn(spark, sf_dir))
    assert "Expand" in p, p
    assert _n_exchanges(p) == 1, p


def test_order_count_dist_outer_join_keeps_condition(spark, sf_dir):
    """Q13: the priority predicate must live in the OUTER join condition —
    if a rewrite pushes it to a post-join filter the join went inner and
    bucket 0 vanishes; custkey join + tiny distribution agg only."""
    p = plan(all_queries()["q_order_count_dist"].fn(spark, sf_dir))
    assert "LeftOuter" in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderpriority" in s for s in pushed), pushed


def test_top_supplier_single_revenue_scan(spark, sf_dir):
    """Q15: the revenue view must be computed once (persisted) — a second
    lineitem scan for the MAX subquery is the classic double-compute; both
    the 1-row max and the supplier dim broadcast."""
    p = plan(all_queries()["q_top_supplier"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert p.count("BroadcastExchange") >= 2, p
    # generic "Scan parquet" labels repeat inside cached-plan descriptions;
    # the file PATH appears once per real scan
    assert p.count("lineitem.parquet") == 1, p
    assert p.count("supplier.parquet") == 1, p


def test_lonely_late_supplier_no_self_joins(spark, sf_dir):
    """Q21: the EXISTS/NOT-EXISTS pair must collapse into per-order
    aggregates — any lineitem self-join (3+ parquet scans) is the quadratic
    plan this formulation exists to avoid."""
    p = plan(all_queries()["q_lonely_late_supplier"].fn(spark, sf_dir))
    assert p.count("lineitem.parquet") == 1, p  # a self-join would scan twice
    assert p.count("orders.parquet") == 1, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderstatus" in s for s in pushed), pushed


def test_ann_quantized_scans_embeddings_once_broadcasts_queries(spark, sf_dir):
    """SQ8 rerank: codes build off ONE persisted embeddings scan; the query
    set broadcasts; exact floats only touch the candidate-bounded rerank."""
    p = plan(all_queries()["q_ann_quantized"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert p.count("BroadcastExchange") >= 1, p
    assert p.count("embeddings.parquet") <= 1, p


def test_heavy_hitters_two_pass_broadcast_candidates(spark, sf_dir):
    """Misra-Gries candidates come from a bounded mapInPandas pass; the
    exact phase joins the big word stream to the BROADCAST candidate union
    (never a shuffle on the full vocabulary); two corpus passes by design."""
    p = plan(all_queries()["q_heavy_hitters"].fn(spark, sf_dir))
    assert "MapInPandas" in p, p
    assert p.count("BroadcastExchange") >= 2, p
    assert p.count("documents.parquet") <= 2, p
    assert "SortMergeJoin" not in p, p


def test_cusum_single_shuffle_arrow_groups(spark, sf_dir):
    """The CUSUM recurrence rides ONE user_id-grouped Arrow pass — a second
    exchange or a JVM-side sort duplication is a regression."""
    p = plan(all_queries()["q_cusum"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p or "ApplyInPandas" in p, p
    assert _n_key_exchanges(p) == 1, p


def test_csv_badrecords_single_cached_parse(spark, sf_dir):
    """PERMISSIVE parse is cached once; good/corrupt counts and the clean
    aggregate ride ONE aggregation over it (no second CSV parse)."""
    p = plan(all_queries()["q_csv_badrecords"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert _n_exchanges(p) <= 1, p


# --- TPC-H completion pack (queries/tpch.py) ----------------------------------

def test_local_supplier_volume_broadcast_suppliers_pushed_dates(spark, sf_dir):
    """Q5: the region-pruned supplier⋈nation side broadcasts (lineitem never
    shuffles for it) and the order-date window reaches the orders scan."""
    p = plan(all_queries()["q_local_supplier_volume"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderdate" in s for s in pushed), pushed


def test_trade_volume_nation_sides_broadcast(spark, sf_dir):
    """Q7: both nation role-plays resolve via broadcast; the shipdate window
    is pushed; lineitem read prunes to the five columns the query touches."""
    p = plan(all_queries()["q_trade_volume"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("l_shipdate" in s for s in pushed), pushed
    li_cols = {c for c in read_schema_columns(p) if c.startswith("l_")}
    assert li_cols == {"l_suppkey", "l_orderkey", "l_shipdate",
                      "l_extendedprice", "l_discount"}, li_cols


def test_market_share_single_agg_broadcast_parts(spark, sf_dir):
    """Q8: the type-filtered part key-set and the supplier-nation map
    broadcast; numerator and denominator ride ONE grouped aggregation
    (a second pass over the join for the CASE-sum is a regression)."""
    p = plan(all_queries()["q_market_share"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 2, p
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) <= 2, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("p_type" in s for s in pushed), pushed


def test_returned_items_fuses_topk_pushes_flag(spark, sf_dir):
    """Q10: the returnflag filter reaches the lineitem scan and the
    sort+limit fuses into TakeOrderedAndProject (20 rows, never a global
    sort of all customers)."""
    p = plan(all_queries()["q_returned_items"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("l_returnflag" in s for s in pushed), pushed


def test_promo_revenue_broadcast_part_two_col(spark, sf_dir):
    """Q14: part is reduced to (p_partkey, is_promo) before broadcasting —
    the part read schema must show exactly the two source columns — and the
    month window reaches the lineitem scan."""
    p = plan(all_queries()["q_promo_revenue"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    assert "SortMergeJoin" not in p, p
    part_cols = {c for c in read_schema_columns(p) if c.startswith("p_")}
    assert part_cols == {"p_partkey", "p_type"}, part_cols
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("l_shipdate" in s for s in pushed), pushed


def test_big_orders_one_lineitem_scan_broadcast_survivors(spark, sf_dir):
    """Q18: lineitem is scanned ONCE (the HAVING set is the reused
    aggregate, not an IN-subquery rescan), the surviving key-set broadcasts
    into orders, and the top-k fuses."""
    p = plan(all_queries()["q_big_orders"].fn(spark, sf_dir))
    assert p.count("lineitem.parquet") == 1, p
    assert p.count("BroadcastExchange") >= 1, p
    assert "TakeOrderedAndProject" in p, p
    li_cols = {c for c in read_schema_columns(p) if c.startswith("l_")}
    assert li_cols == {"l_orderkey", "l_quantity"}, li_cols


def test_disjunctive_revenue_part_arms_prune_before_join(spark, sf_dir):
    """Q19: the brand+size legs of the disjunction must prune the part scan
    (PushedFilters mentioning p_brand), and part broadcasts."""
    p = plan(all_queries()["q_disjunctive_revenue"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    assert "SortMergeJoin" not in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("p_brand" in s for s in pushed), pushed


def test_idle_rich_customers_anti_join_pruned_probe(spark, sf_dir):
    """Q22: the NOT EXISTS runs as a LEFT ANTI join, the recent-order date
    filter reaches the orders scan, and orders is pruned to the two columns
    the anti join needs."""
    p = plan(all_queries()["q_idle_rich_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in p or "Anti" in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderdate" in s for s in pushed), pushed
    o_cols = {c for c in read_schema_columns(p) if c.startswith("o_")}
    assert o_cols == {"o_custkey", "o_orderdate"}, o_cols


# --- ML-eval / time-series pack (queries/mleval.py) ---------------------------

def test_auc_exact_bounded_serial_window(spark, sf_dir):
    """AUC: the fact stream collapses to distinct-score counts BEFORE the
    serial window — the plan shows a partial-aggregated HashAggregate under
    the Window, and no more than three exchanges total (score agg, 1-part
    window hop, final 1-row agg)."""
    p = plan(all_queries()["q_auc_exact"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert "partial_sum" in p, p
    assert _n_exchanges(p) <= 3, p


def test_chi2_features_broadcast_totals_fused_topk(spark, sf_dir):
    """Chi2: the 1-row class-totals side broadcasts back (never a shuffle,
    never a collect) and the top-k fuses into TakeOrderedAndProject."""
    p = plan(all_queries()["q_chi2_features"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert "Broadcast" in p, p
    assert read_schema_columns(p) >= {"doc_id", "lang", "text"}, (
        read_schema_columns(p))


def test_max_concurrent_day_partitioned_sweep(spark, sf_dir):
    """Sweep-line: the running sum is partitioned by day (bounded state,
    parallel days) and the day rollup reuses that partitioning — at most
    two exchanges; the explode emits (t, delta) scalars only."""
    p = plan(all_queries()["q_max_concurrent"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert "Generate" in p, p  # the explode
    assert _n_exchanges(p) <= 2, p


def test_autocorr_day_agg_before_serial_lag(spark, sf_dir):
    """Autocorrelation: day totals aggregate (combine-enabled) before the
    serial LAG window; the orders read prunes to the two needed columns."""
    p = plan(all_queries()["q_autocorr_lag1"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert read_schema_columns(p) == {"o_orderdate", "o_totalprice"}, (
        read_schema_columns(p))
    assert _n_exchanges(p) <= 3, p


def test_mom_growth_grid_agg_before_window(spark, sf_dir):
    """MoM growth: the (segment, month) totals aggregate before the LAG
    window walks the bounded grid — three exchanges max (join side, grid
    agg, window re-key)."""
    p = plan(all_queries()["q_mom_growth"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert _n_exchanges(p) <= 3, p


def test_calibration_bins_single_combine_enabled_shuffle(spark, sf_dir):
    """Calibration: map-side bin assignment, ONE combine-enabled shuffle to
    the bin cells; events read prunes to (event_type, value)."""
    p = plan(all_queries()["q_calibration_bins"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "partial_count" in p or "partial_sum" in p, p
    cols = {c for c in read_schema_columns(p) if c in ("event_type", "value")}
    assert cols == {"event_type", "value"}, read_schema_columns(p)


# --- operational-insights pack (queries/insights.py) ---------------------------

def test_item_similarity_persisted_baskets_broadcast_counts(spark, sf_dir):
    """Co-purchase CF: the distinct basket table is computed once
    (persisted) and reused for pairs + item counts; the per-item count
    joins broadcast; top-k fuses. A nested-loop pair join is a regression."""
    p = plan(all_queries()["q_item_similarity"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert p.count("BroadcastExchange") >= 1, p
    assert "TakeOrderedAndProject" in p, p
    assert "NestedLoop" not in p, p


def test_benford_two_bounded_exchanges(spark, sf_dir):
    """Benford: one combine-enabled shuffle to <=9 digit cells, one 9-row
    window hop for the total — the fact table is read once, one column."""
    p = plan(all_queries()["q_benford"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, p
    assert read_schema_columns(p) == {"o_totalprice"}, read_schema_columns(p)


def test_burst_minutes_broadcast_day_stats(spark, sf_dir):
    """Burst detection: minute counts shuffle once, day moments aggregate
    from them, and the tiny day-stats side broadcasts back — the minute
    table never shuffles again for the join."""
    spark.catalog.clearCache()  # a prior parity run leaves m cached; the
    # already-cached plan shape differs (test_ivf_recall precedent)
    p = plan(all_queries()["q_burst_minutes"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    assert "SortMergeJoin" not in p, p
    assert "InMemoryTableScan" in p, p
    assert p.count("events.parquet") <= 1, p
    assert _n_exchanges(p) <= 2, p


def test_date_gaps_anti_join_pruned_scan(spark, sf_dir):
    """Calendar gaps: the missing-day set comes from a LEFT ANTI join and
    orders is read once, one column (o_orderdate)."""
    p = plan(all_queries()["q_date_gaps"].fn(spark, sf_dir))
    assert "LeftAnti" in p or "Anti" in p, p
    assert read_schema_columns(p) == {"o_orderdate"}, read_schema_columns(p)


def test_ohlc_bars_single_hour_partitioning(spark, sf_dir):
    """OHLC: the rank window and the bar aggregate share the hour
    partitioning — no more than two exchanges — and the purchase filter
    reaches the events scan."""
    p = plan(all_queries()["q_ohlc_bars"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 2, p
    assert "Window" in p, p


def test_shingle_containment_reuses_persisted_index(spark, sf_dir):
    """Containment rides the SAME persisted shingle index machinery as
    Jaccard: in-memory scans, equi-joins only."""
    p = plan(all_queries()["q_shingle_containment"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert "NestedLoop" not in p, p


def test_pack_bins_single_grouped_arrow_pass(spark, sf_dir):
    """Next-fit packing: ONE source-grouped Arrow pass carries the whole
    recurrence; the documents read prunes to (source, doc_id, text)."""
    p = plan(all_queries()["q_pack_bins"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p or "ApplyInPandas" in p, p
    assert _n_key_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"source", "doc_id", "text"}, (
        read_schema_columns(p))


def test_pareto_cover_aggregates_before_serial_window(spark, sf_dir):
    """Pareto cover: lineitem combines to per-part revenue BEFORE the
    serial prefix window; the scan reads exactly the three fact columns."""
    p = plan(all_queries()["q_pareto_cover"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert "partial_sum" in p, p
    assert read_schema_columns(p) == {"l_partkey", "l_extendedprice",
                                      "l_discount"}, read_schema_columns(p)
    assert _n_exchanges(p) <= 3, p


def test_first_touch_is_union_merge_not_range_join(spark, sf_dir):
    """First-touch attribution must ride the as-of union-merge (two
    shuffles max, no nested-loop range join)."""
    p = plan(all_queries()["q_first_touch"].fn(spark, sf_dir))
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 2, p


def test_hhi_two_bounded_aggregations(spark, sf_dir):
    """HHI: (segment, customer) revenue then segment moments — the fact
    side shuffles for the join/agg, never more than three exchanges, with
    map-side partials."""
    p = plan(all_queries()["q_hhi_concentration"].fn(spark, sf_dir))
    assert "partial_sum" in p, p
    assert _n_exchanges(p) <= 3, p


def test_gini_pruned_scan_single_window(spark, sf_dir):
    """Gini: the positive-balance filter pushes down, the scan reads only
    the three needed columns, and rank + moments share one segment
    partitioning."""
    p = plan(all_queries()["q_gini"].fn(spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("c_acctbal" in s for s in pushed), pushed
    assert read_schema_columns(p) == {"c_mktsegment", "c_acctbal",
                                      "c_custkey"}, read_schema_columns(p)
    assert _n_exchanges(p) <= 2, p


# --- behavioral / growth-curve pack (queries/behavior.py) ----------------------

def test_session_paths_shares_user_partitioning(spark, sf_dir):
    """Path mining: the gap flag, island sum, and per-session rank all ride
    the user_id partitioning — at most three exchanges incl. the tiny path
    count — and the top-k fuses."""
    p = plan(all_queries()["q_session_paths"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert _n_exchanges(p) <= 3, p


def test_group_ols_one_shuffle_broadcast_brand(spark, sf_dir):
    """Grouped OLS: brand broadcasts onto lineitem, five moments in ONE
    combine-enabled shuffle."""
    p = plan(all_queries()["q_group_ols_slope"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 1, p
    assert "partial_sum" in p, p
    assert _n_exchanges(p) == 1, p


def test_seasonal_index_broadcast_grand_total(spark, sf_dir):
    """Seasonal index: day totals -> 7-row weekday rollup -> 1-row grand
    total broadcast back; the orders scan reads two columns."""
    p = plan(all_queries()["q_seasonal_index"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"o_orderdate", "o_totalprice"}, (
        read_schema_columns(p))
    assert "Broadcast" in p, p


def test_vocab_growth_word_agg_before_doc_spine(spark, sf_dir):
    """Vocabulary growth: the word->first-doc aggregate is combine-enabled
    and the serial cumsum walks the DOC spine, not words; docs read once
    per branch (spine + explode), never more."""
    p = plan(all_queries()["q_vocab_growth"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert "partial_min" in p or "partial_count" in p, p
    assert p.count("documents.parquet") <= 2, p


def test_sql_api_compiles_to_same_shape(spark, sf_dir):
    """The SQL-text key must get the SAME physical shape as the DataFrame
    Q1: one combine-enabled exchange, shipdate pushed to the scan."""
    p = plan(all_queries()["q_sql_pricing"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "partial_sum" in p, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("l_shipdate" in s for s in pushed), pushed


def test_lift_rules_broadcast_counts_fused_topk(spark, sf_dir):
    """Association rules: same basket engine as item-similarity — persisted
    distinct baskets, broadcast item counts and basket total, fused top-k."""
    spark.catalog.clearCache()
    p = plan(all_queries()["q_lift_rules"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, p
    assert p.count("BroadcastExchange") >= 2, p
    assert "TakeOrderedAndProject" in p, p


def test_recommend_topn_broadcast_edges_no_cartesian(spark, sf_dir):
    """Recommender: the similarity edge list broadcasts into ownership
    (pair-count bounded), owned candidates leave via an anti join, and no
    nested-loop join appears anywhere in the two-hop plan."""
    spark.catalog.clearCache()
    p = plan(all_queries()["q_recommend_topn"].fn(spark, sf_dir))
    assert "LeftAnti" in p or "Anti" in p, p
    assert p.count("BroadcastExchange") >= 1, p
    assert "CartesianProduct" not in p, p


def test_holt_forecast_grouped_arrow_single_exchange_chain(spark, sf_dir):
    """Holt smoothing: day totals aggregate, then ONE segment-grouped Arrow
    pass carries both recurrences — no extra exchanges beyond the join/agg/
    group chain, no nested loop."""
    p = plan(all_queries()["q_holt_forecast"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p or "ApplyInPandas" in p, p
    assert "NestedLoop" not in p, p
    assert _n_exchanges(p) <= 3, p


def test_interval_union_single_user_exchange(spark, sf_dir):
    """Interval coalescing: the flagging window, island rollup, and per-user
    rollup all reuse ONE user_id partitioning — a second fact-side exchange
    means the shared-partitioning contract broke."""
    p = plan(all_queries()["q_interval_union"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, p
    assert "CartesianProduct" not in p, p


def test_twap_single_type_day_exchange(spark, sf_dir):
    """TWAP: the LEAD window and the rollup share the (event_type, day)
    partitioning; the filter on value must reach the scan."""
    p = plan(all_queries()["q_twap"].fn(spark, sf_dir))
    assert _n_exchanges(p) <= 1, p
    assert "PushedFilters: [IsNotNull(value)" in p, p


def test_seat_allocation_broadcast_nation_integer_plan(spark, sf_dir):
    """Apportionment: nation broadcasts, the orders-customer key shuffle is
    the only big exchange; the 25-row quota windows may repartition but
    never nested-loop."""
    p = plan(all_queries()["q_seat_allocation"].fn(spark, sf_dir))
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p
    assert "NestedLoop" not in p, p


def test_weighted_median_grid_then_window(spark, sf_dir):
    """Weighted median: facts collapse to the (flag, qty) grid in one
    combine-enabled shuffle before any serial window touches the data."""
    p = plan(all_queries()["q_weighted_median"].fn(spark, sf_dir))
    assert "partial_sum" in p or "HashAggregate" in p, p
    assert _n_exchanges(p) <= 3, p


def test_rolling_corr_day_grid_before_window(spark, sf_dir):
    """Rolling correlation: the serial moment window runs over the bounded
    day grid (post-aggregate), and only the day column plus the two inputs
    are read."""
    p = plan(all_queries()["q_rolling_corr"].fn(spark, sf_dir))
    assert read_schema_columns(p) <= {"o_orderdate", "o_totalprice"}, (
        read_schema_columns(p))
    assert _n_exchanges(p) <= 2, p


def test_stock_balance_pushed_filter_grouped_arrow(spark, sf_dir):
    """Clamped balance: the supplier cap reaches the parquet scan and the
    replay is ONE grouped Arrow pass on the l_suppkey shuffle."""
    p = plan(all_queries()["q_stock_balance"].fn(spark, sf_dir))
    assert "LessThanOrEqual(l_suppkey" in p, p
    assert "FlatMapGroupsInPandas" in p, p
    assert _n_exchanges(p) <= 1, p


def test_percent_rank_pushes_nation_filter_single_sort(spark, sf_dir):
    """Nation filter reaches the scan; one exchange (segment hash) and one
    sort feed all three rank expressions."""
    p = plan(all_queries()["q_percent_rank"].fn(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "EqualTo(c_nationkey,1)" in pushed.group(1), p
    assert _n_exchanges(p) == 1, p
    assert "Window" in p, p


def test_bitmap_active_days_two_aggs_pruned_scan(spark, sf_dir):
    """Bitmap rollup reads only (custkey, orderdate); bit_or is a real
    partial aggregate (two HashAggregate pairs, two exchanges total)."""
    p = plan(all_queries()["q_bitmap_active_days"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"o_custkey", "o_orderdate"}, p
    assert _n_exchanges(p) == 3, p  # 2 hash aggs + final presentation sort
    assert "CartesianProduct" not in p


def test_bfs_reach_no_cartesian_prunes_edges(spark, sf_dir):
    """Every hop is an equi-join; the edge build reads only the two key
    columns of each fact table."""
    p = plan(all_queries()["q_bfs_reach"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    cols = read_schema_columns(p)
    assert cols <= {"l_orderkey", "l_suppkey", "o_orderkey", "o_custkey",
                    "s_suppkey", "s_nationkey"}, cols


def test_k_anonymity_two_aggs_only(spark, sf_dir):
    """Histogram then suppression-fold: exactly two hash aggregations, the
    second over cell counts, and a 3-column pruned scan."""
    p = plan(all_queries()["q_k_anonymity"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"c_nationkey", "c_mktsegment",
                                      "c_acctbal"}, p
    assert _n_exchanges(p) == 3, p  # 2 hash aggs + final presentation sort
    assert "Join" not in p, p


def test_bloom_semi_join_broadcasts_filter_words(spark, sf_dir):
    """The bloom word table broadcasts (the probe side never shuffles to
    check membership) and the probe scan is pruned to key+quantity."""
    p = plan(all_queries()["q_bloom_semi_join"].fn(spark, sf_dir))
    assert p.count("BroadcastExchange") >= 2, p
    assert "CartesianProduct" not in p
    cols = read_schema_columns(p)
    assert "l_quantity" in cols and "l_orderkey" in cols, cols
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("1-URGENT" in s for s in pushed), pushed


def test_percentile_cont_one_agg_pruned(spark, sf_dir):
    """Exact percentile is one (object-hash) aggregation: one data
    exchange plus the presentation sort, over a 3-column scan."""
    p = plan(all_queries()["q_percentile_cont"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"l_returnflag", "l_quantity",
                                      "l_extendedprice"}, p
    assert _n_exchanges(p) == 2, p
    assert "Join" not in p, p


def test_time_rollup_expands_before_shuffle(spark, sf_dir):
    """ROLLUP expands grouping sets map-side (Expand node below the
    exchange) and the scan reads only ts + user_id."""
    p = plan(all_queries()["q_time_rollup"].fn(spark, sf_dir))
    assert "Expand" in p, p
    assert read_schema_columns(p) == {"ts", "user_id"}, p
    assert "Join" not in p, p


def test_source_minhash_broadcasts_pairwise_stage(spark, sf_dir):
    """Signatures aggregate through shuffles; the sources x sources
    pairwise stage is a broadcast (nested-loop on the < predicate), never
    a shuffle of signatures."""
    p = plan(all_queries()["q_source_minhash"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert read_schema_columns(p) == {"source", "text"}, p
    assert "SortMergeJoin" not in p, p


def test_table_checksum_single_exchange_full_width(spark, sf_dir):
    """A table digest is ONE partial-aggregated exchange (32 bytes per
    partition); the row hash necessarily reads every column."""
    p = plan(all_queries()["q_table_checksum"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "Join" not in p, p
    assert read_schema_columns(p) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"}, read_schema_columns(p)


def test_skew_salted_join_never_shuffles_fact_on_key(spark, sf_dir):
    """The fact side joins via broadcast on (key, salt) — a SortMergeJoin
    or fact-side hashpartitioning on event_type alone is the regression
    this pins against."""
    p = plan(all_queries()["q_skew_salted_join"].fn(spark, sf_dir))
    assert "BroadcastExchange" in p, p
    assert "SortMergeJoin" not in p, p
    cols = read_schema_columns(p)
    assert "event_id" in cols and "value" in cols, cols


def test_sql_lateral_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL LIMIT must decorrelate into a ranked join —
    a Window node in ONE plan, never a subquery per outer row."""
    p = plan(all_queries()["q_sql_lateral"].fn(spark, sf_dir))
    assert "Window" in p, p
    assert "Join" in p, p
    assert "CartesianProduct" not in p, p


def test_ks_test_prunes_and_pushes_type_filter(spark, sf_dir):
    """KS reads only (event_type, value), pushes the IN filter, and needs
    at most grid-agg + serial window + final agg exchanges."""
    p = plan(all_queries()["q_ks_test"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"event_type", "value"}, p
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("In(event_type" in s for s in pushed), pushed
    assert _n_exchanges(p) <= 3, p


def test_udtf_chunks_is_shuffle_free(spark, sf_dir):
    """The UDTF fan-out runs where the rows live: scan -> Python eval ->
    project, no Exchange anywhere."""
    p = plan(all_queries()["q_udtf_chunks"].fn(spark, sf_dir))
    assert "Exchange" not in p, p


def test_asof_nearest_is_window_merge_not_join(spark, sf_dir):
    """Nearest-match composes two union-merge carries: window passes over
    (user, time), never a row-pairing join or cartesian."""
    p = plan(all_queries()["q_asof_nearest"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert p.count("Window") >= 2, p
    assert read_schema_columns(p) == {"event_id", "user_id", "ts",
                                      "event_type"}, p


def test_null_safe_join_stays_hash_equi_join(spark, sf_dir):
    """EqualNullSafe must plan as a broadcast HASH join (NULL is a join
    key) — a nested-loop fallback would be quadratic."""
    p = plan(all_queries()["q_null_safe_join"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_count_windows_single_exchange(spark, sf_dir):
    """The rank window partitions by user_id and the (user, win_idx)
    aggregate reuses that clustering — one exchange for the whole key."""
    p = plan(all_queries()["q_count_windows"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert read_schema_columns(p) == {"user_id", "ts", "event_id",
                                      "value"}, p


def test_rbo_rankings_data_work_is_one_aggregate(spark, sf_dir):
    """Everything above the revenue groupBy is constant-size (top-K and
    literal depth ranges): pruned 3-column scan, no cartesian on data."""
    p = plan(all_queries()["q_rbo_rankings"].fn(spark, sf_dir))
    assert read_schema_columns(p) == {"l_partkey", "l_shipdate",
                                      "l_extendedprice"}, p
    assert "CartesianProduct" not in p, p


def test_cep_pattern_is_one_window_pass(spark, sf_dir):
    """Strict-contiguity CEP = two leads over one per-user sort: one
    exchange, no joins, pruned scan."""
    p = plan(all_queries()["q_cep_pattern"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "Join" not in p, p
    assert read_schema_columns(p) == {"user_id", "event_id", "event_type",
                                      "ts"}, p


def test_binaryfile_scan_is_map_only(spark, sf_dir):
    """Whole-file binary ingestion + fingerprinting never shuffles."""
    p = plan(all_queries()["q_binaryfile_scan"].fn(spark, sf_dir))
    assert "Exchange" not in p, p


def test_argmax_struct_has_no_window_or_sort_below_agg(spark, sf_dir):
    """arg-max must stay ONE combine-enabled aggregation: no rank window,
    no per-group sort; the only exchanges are the agg + presentation sort."""
    p = plan(all_queries()["q_argmax_struct"].fn(spark, sf_dir))
    assert "Window" not in p, p
    assert _n_exchanges(p) == 2, p
    assert read_schema_columns(p) == {"c_nationkey", "c_acctbal",
                                      "c_custkey"}, p


def test_running_median_one_sort_pruned(spark, sf_dir):
    """Expanding-frame median: one exchange + one sort per user partition,
    4-column scan, no joins."""
    p = plan(all_queries()["q_running_median"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    assert "Join" not in p, p
    assert read_schema_columns(p) == {"user_id", "event_id", "ts",
                                      "value"}, p


def test_gapfill_lerp_one_sort_both_directions(spark, sf_dir):
    """Backward and forward carries share one per-series sort: a second
    sort or exchange for the forward window is the regression."""
    p = plan(all_queries()["q_gapfill_lerp"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) Sort", p)) <= 2, p  # series sort + join side
    assert read_schema_columns(p) == {"event_type", "ts", "value"}, p


def test_bitmap_overlap_intersects_words_not_members(spark, sf_dir):
    """One member-level shuffle (bitmap build); the pair stage joins
    word-indexed masks and broadcasts the size lookups — no member-level
    self-join, no cartesian."""
    p = plan(all_queries()["q_bitmap_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastExchange") >= 2, p
    assert read_schema_columns(p) == {"event_type", "user_id"}, p


def test_array_hof_is_shuffle_free(spark, sf_dir):
    """Lambda HOFs run in the row pipeline: no Exchange, 2-column scan."""
    p = plan(all_queries()["q_array_hof"].fn(spark, sf_dir))
    assert "Exchange" not in p, p
    assert read_schema_columns(p) == {"vec_id", "embedding"}, p


def test_rank_variants_share_one_sort(spark, sf_dir):
    """Both window specs lead with the same key: one exchange, and the
    nation filter reaches the scan."""
    p = plan(all_queries()["q_rank_variants"].fn(spark, sf_dir))
    assert _n_exchanges(p) == 1, p
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert pushed and "EqualTo(c_nationkey,3)" in pushed.group(1), p


def test_bpe_train_rounds_read_cache_not_corpus(spark, sf_dir):
    """q_bpe_train's per-round pair count must read the persisted (word,
    freq) VOCABULARY, never re-explode the corpus: the round plan has zero
    parquet scans (InMemoryTableScan only) and exactly one pair-count
    Exchange."""
    from flink_job_spark.functions.text import words
    from flink_job_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    v = (
        d.select(F.explode(words("text")).alias("word"))
         .filter(F.col("word").rlike("^[a-z]+$"))
         .groupBy("word")
         .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
         .select(F.regexp_replace("word", "(.)", "#$1#").alias("ws"), "freq")
    ).persist()
    try:
        v.count()
        sdf = (
            v.select(F.expr("split(btrim(ws, '#'), '##')").alias("s"), "freq")
             .filter(F.size("s") >= 2)
        )
        pairs = sdf.select(
            "freq",
            F.explode(F.expr(
                "transform(sequence(1, size(s) - 1), "
                "i -> struct(element_at(s, i) AS lhs, "
                "element_at(s, i + 1) AS rhs))")).alias("pr"),
        )
        best = (pairs.groupBy("pr.lhs", "pr.rhs")
                     .agg(F.sum("freq").cast("bigint").alias("cnt"))
                     .orderBy(F.desc("cnt"), "lhs", "rhs").limit(1))
        p = plan(best)
        # NB: formatted explain prints the cached relation's ORIGINAL child
        # subtree (its parquet scan) under InMemoryTableScan even though
        # execution reads cached blocks — so pin the cache node, not the
        # absence of the scan text.
        assert "InMemoryTableScan" in p, f"round does not read the cache:\n{p}"
        # the printed cached subtree contributes its build-time exchanges
        # (corpus explode -> word groupBy); the live round itself is ONE
        # pair-count Exchange + TakeOrderedAndProject on top of the cache.
        live = p.split("InMemoryTableScan", 1)[0]
        assert _n_exchanges(live) <= 1, f"pair count gained shuffles:\n{p}"
        assert "TakeOrderedAndProject" in live, p
    finally:
        v.unpersist()


def test_media_jpeg_stats_no_shuffle(spark, sf_dir):
    """JPEG encode→decode (the transform-codec path) is one Arrow-batched
    map chain over doc_id only; payload bytes never shuffle — the shape
    that holds when the binary column is 100 TB."""
    p = plan(all_queries()["q_media_jpeg_stats"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "jpeg plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_jpeg_color_err_no_shuffle(spark, sf_dir):
    p = plan(all_queries()["q_media_jpeg_color_err"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "jpeg color plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_embedding_cosine_lsh_bucket_local_scoring(spark, sf_dir):
    """r4 sf1-slope fix: scoring happens INSIDE the (band, bucket) group
    (one exchange to group, vectorized pandas scoring, survivors-only
    output, one distinct exchange) — never a candidate-pair join that
    re-attaches 64-dim arrays per pair (the r3 shape measured at 116x on
    10x data)."""
    p = plan(all_queries()["q_embedding_cosine_lsh"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p, p
    assert _n_exchanges(p) <= 3, p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p, p


def test_media_jpeg_prog_stats_no_shuffle(spark, sf_dir):
    """The progressive (SOF2) key (r5) keeps the exact shape of the other
    JPEG keys: a single Arrow-batched map chain over doc_id, zero
    exchanges — the multi-scan entropy layout changes codec bytes, never
    plan shape."""
    p = plan(all_queries()["q_media_jpeg_prog_stats"].fn(spark, sf_dir))
    # r7 fixture cache: the scan reads cached media blobs (pruned to the
    # decode inputs), so the bench measures DECODE, not fixture synthesis
    _assert_cached_media_shape(p, "q_media_jpeg_prog_stats")


def test_media_jpeg_cmyk_stats_no_shuffle(spark, sf_dir):
    """The Adobe YCCK progressive key (r5) keeps the exact shape of the
    other JPEG keys: a single Arrow-batched map chain over doc_id, zero
    exchanges."""
    p = plan(all_queries()["q_media_jpeg_cmyk_stats"].fn(spark, sf_dir))
    _assert_cached_media_shape(p, "q_media_jpeg_cmyk_stats")


def test_media_jpeg_420_stats_no_shuffle(spark, sf_dir):
    """The 4:2:0 subsampled key (r5) keeps the exact shape of the 4:4:4
    one: a single Arrow-batched map chain over doc_id, zero exchanges —
    subsampling changes codec math, never plan shape."""
    p = plan(all_queries()["q_media_jpeg_420_stats"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "jpeg 420 plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_exif_meta_no_shuffle(spark, sf_dir):
    """EXIF metadata extraction (r5 wave 3) is one Arrow-batched map chain
    over doc_id — a metadata-only marker walk per payload, zero exchanges,
    so a 100 TB crawl pays header bytes and no shuffle."""
    p = plan(all_queries()["q_media_exif_meta"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "exif meta plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_exif_orient_no_shuffle(spark, sf_dir):
    """Orientation-normalized decode keeps the JPEG-key shape: decode,
    tag read and flip/transpose all happen inside the one map stage."""
    p = plan(all_queries()["q_media_exif_orient"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "exif orient plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_mp3_meta_no_shuffle(spark, sf_dir):
    """MP3 container triage (r5 wave 4) is one Arrow-batched map chain
    over doc_id — frame-header walk + ID3, zero exchanges, no PCM."""
    p = plan(all_queries()["q_media_mp3_meta"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "mp3 meta plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_mp4_meta_no_shuffle(spark, sf_dir):
    """MP4 box-walk triage keeps the same shape: one map stage, zero
    exchanges — the mdat payload is never read."""
    p = plan(all_queries()["q_media_mp4_meta"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "mp4 meta plan")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p
    assert read_schema_columns(p) == {"doc_id"}, read_schema_columns(p)


def test_media_container_triage_no_shuffle(spark, sf_dir):
    """All r5 wave-5 container-triage keys (FLAC/Ogg/WARC/ZIP/TAR) keep
    the canonical media shape: one Arrow-batched map chain over doc_id,
    zero exchanges — inventory walks, never payload decode."""
    for key in ("q_media_flac_meta", "q_media_ogg_meta",
                "q_media_warc_stats", "q_media_zip_stats",
                "q_media_tar_stats"):
        p = plan(all_queries()[key].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, key)
        assert "MapInPandas" in p or "ArrowEvalPython" in p, (key, p)
        assert read_schema_columns(p) == {"doc_id"}, (key, p)


def test_crawl_text_keys_no_shuffle(spark, sf_dir):
    """r5 wave-6 crawl→text keys (HTML extract, URL normalize): one
    Arrow-batched map stage over doc_id, zero exchanges."""
    for key in ("q_html_extract", "q_url_normalize"):
        p = plan(all_queries()[key].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, key)
        assert "MapInPandas" in p or "ArrowEvalPython" in p, (key, p)
        assert read_schema_columns(p) == {"doc_id"}, (key, p)


def test_round6_keys_are_map_only(spark, sf_dir):
    """The r6 additions are all scan-side passes: script-aware
    segmentation (two JVM regex passes + array ops in one projection) and
    the three codec keys (Arrow-batched mapInPandas encode+decode). Any
    Exchange is a regression — at 100 TB these must stay pure map."""
    for name in ["q_segment_multiscript", "q_media_jpeg_arith_stats",
                 "q_media_jpeg12_stats", "q_media_jpeg_lossless"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, name)


def test_round7_keys_are_map_only(spark, sf_dir):
    """r7 codec keys stay pure map stages: VP8L WebP and MKV metadata
    ride the binaryFile partitioning at 100 TB; an Exchange is a
    regression."""
    for name in ["q_media_mkv_meta"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, name)
        assert "MapInPandas" in p or "ArrowEvalPython" in p, (name, p)
        assert read_schema_columns(p) == {"doc_id"}, (name, p)
    # the pure-Python-codec keys read their fixture CACHE (pruned to the
    # decode inputs) so the bench measures decode, not synthesis
    for name in ["q_media_webp_stats", "q_media_jpeg_hier",
                 "q_media_mjpeg_frames"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        _assert_cached_media_shape(p, name)


def test_round8_keys_are_map_only(spark, sf_dir):
    """r8 keys keep the canonical crawl shape: HTTP metadata from WARC
    payloads is one Arrow-batched map stage over doc_id, zero
    exchanges — the chain summary is per-payload state."""
    for name in ["q_warc_http_meta"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        assert_map_only_modulo_fanout(p, name)
        assert "MapInPandas" in p or "ArrowEvalPython" in p, (name, p)
        assert read_schema_columns(p) == {"doc_id"}, (name, p)
    # the lossy-VP8 and VP8X keys read their fixture cache (decode
    # inputs only)
    for name in ["q_media_webp_lossy", "q_media_webp_alpha"]:
        p = plan(all_queries()[name].fn(spark, sf_dir))
        _assert_cached_media_shape(p, name)
    # the Avro roundtrip's only shuffle is the final aggregation — the
    # codec pass itself rides the scan partitioning (one OCF per batch)
    p = plan(all_queries()["q_avro_roundtrip"].fn(spark, sf_dir))
    assert "MapInPandas" in p, p
    assert _n_key_exchanges(p) == 1, f"avro roundtrip gained shuffles:\n{p}"


def test_gopher_rules_tokenizes_once(spark, sf_dir):
    """r6 regression pin: the five Gopher signals share ONE words() alias
    in a staged projection. If CollapseProject ever inlines the non-cheap
    split expression back into its many uses (4 projection references +
    10 lambda-bound stopword probes), the tokenizer count in the plan
    jumps and the 1.8x bench regression returns."""
    p = plan(all_queries()["q_gopher_rules"].fn(spark, sf_dir))
    assert_map_only_modulo_fanout(p, "q_gopher_rules")
    # the split(...NORM...) expression must appear exactly once per plan
    n_splits = p.count("split(trim(regexp_replace(")
    assert n_splits == 1, (
        f"words() evaluated {n_splits}x — staging collapsed:\n{p[:2000]}")
