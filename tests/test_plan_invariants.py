"""Physical-plan regression guards: every promise the query docstrings
make about plan shape (pushdown reached the scan, partial aggregation
before the exchange, single-shuffle windows, no Expand traps) is
asserted against the actual Catalyst output, so a future edit that
silently degrades a plan fails CI rather than a benchmark round.

Plans are inspected BEFORE execution (initial AdaptiveSparkPlan) —
shapes asserted here are decided by the optimizer, not by runtime
re-planning, and stay valid at any scale factor.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    import __spark_entry__ as m

    df = m.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q04_pushes_point_predicate_to_scan(spark):
    # the parameterized point lookup must reach parquet (row-group skip)
    plan = _plan(spark, "q03_scan_stats_offset")
    assert "PushedFilters" in plan
    assert "EqualTo(o_custkey,7)" in plan.replace(" ", "")


def test_q01_pushes_segment_filter_to_customer_scan(spark):
    plan = _plan(spark, "q01_folder_results_latest")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "")


def test_q16_partial_aggregation_before_exchange(spark):
    # TPC-H Q1 shape: map-side combine means partial_* functions appear
    plan = _plan(spark, "q16_pricing_summary")
    assert "partial_" in plan


def test_q72_funnel_single_exchange(spark):
    # three stacked windows + per-user agg share one hash partitioning
    plan = _plan(spark, "q72_funnel_stages")
    assert plan.count("Exchange") == 1, plan


def test_q69_centroids_single_exchange_no_expand(spark):
    plan = _plan(spark, "q69_label_centroids")
    assert plan.count("Exchange") == 1, plan
    assert "Expand" not in plan


def test_q76_profiler_avoids_expand_trap(spark):
    # the two-phase rework must keep COUNT DISTINCT out of Expand form
    plan = _plan(spark, "q76_column_profile")
    assert "Expand" not in plan, plan


def test_q67_novelty_reduces_to_fingerprints_before_join(spark):
    # the anti join must be keyed on md5 fingerprints, not documents
    plan = _plan(spark, "q67_novelty_ingest")
    assert "LeftAnti" in plan
    assert "md5" in plan


def test_q20_dedup_partial_combines_mapside(spark):
    plan = _plan(spark, "q20_dedup_exact")
    assert "partial_min" in plan or "partial_count" in plan


def test_no_forced_broadcast_of_fact_scale_frames(spark):
    # VERDICT r1 flagged forced customer broadcasts as 100×
    # scale-killers; the fix must not regress. Logical-plan hints are
    # visible as ResolvedHint/UnresolvedHint before planning — check
    # the optimized logical plan of the two queries that were flagged.
    import __spark_entry__ as m

    for name in ("q15_revenue_by_nation", "q37_rollup_hierarchy"):
        df = m.queries()[name](spark, SF)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        # broadcast hints may exist for region/nation/supplier — but a
        # hint directly above a customer scan is the regression
        for line_block in logical.split("ResolvedHint")[1:]:
            head = line_block[:400]
            assert "customer" not in head, (name, head)


@pytest.mark.parametrize(
    "name", ["q42_asof_click_purchase", "q19_sessionize"]
)
def test_event_pipelines_shuffle_on_user_not_global(spark, name):
    # as-of join and sessionization partition by user_id — a global
    # (empty-partition-key) window would appear as SinglePartition
    plan = _plan(spark, name)
    assert "SinglePartition" not in plan, plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """100 TB posture: a fact table partitioned on its join key must be
    pruned AT RUNTIME when the dimension side is filtered on an
    attribute (classic star-schema DPP — the fact scan reads only the
    partitions the filtered dim keys select, without a literal
    partition predicate in the query)."""
    import pyspark.sql.functions as F

    fact_path = str(tmp_path / "fact")
    li = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("part_key"),
            (F.col("id") * 2).alias("val"),
        )
    )
    li.write.mode("overwrite").partitionBy("part_key").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(5)],
        ["part_key", "label"],
    )
    joined = fact.join(dim, "part_key").filter(F.col("label") == "keep")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is correct: only part_key 0 and 1 survive
    assert joined.count() == 800


def test_q94_quantize_is_shuffle_free(spark):
    # within-row column algebra must compile to a scan-only plan:
    # no Exchange, no Python UDF evaluation node
    plan = _plan(spark, "q94_embedding_quantize")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_q92_shuffle_has_no_global_single_partition_window(spark):
    # the global position must come from the two-phase rank, never a
    # partition-less Window.orderBy (SinglePartition funnel)
    plan = _plan(spark, "q92_training_shuffle")
    assert "SinglePartition" not in plan, plan


def test_multiprobe_lsh_broadcasts_query_side(spark):
    # probes > 0 triples the probe rows but the corpus side must still
    # stream (broadcast join, no corpus shuffle)
    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.operators.similarity import lsh_topk

    import pyspark.sql.functions as F

    emb = load_table(spark, SF, "embeddings")
    df = lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, probes=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_codebook_ivf_arrow_assignment_has_no_literal_centroids(spark):
    # the serving path's plan must not inline the codebook as
    # expressions — assignment happens inside the Arrow UDF
    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.operators.similarity import (
        _hyperplanes,
        codebook_ivf_topk,
    )

    import pyspark.sql.functions as F

    emb = load_table(spark, SF, "embeddings")
    df = codebook_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), _hyperplanes(16, 64, seed=2), k=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan


def test_q96_pair_generation_is_banding_bounded(spark):
    """The scale-path resolution's pair source must be the (band,
    bucket) equi-join — never a corpus self-join: no cartesian or
    nested-loop join anywhere in the candidate plan, and the join keys
    are the banded bucket columns. (Asserted on the lazy candidate
    frame: q96 itself materializes candidates eagerly via
    localCheckpoint, which would hide the join from its final plan.)"""
    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = load_table(spark, SF, "documents")
    cand = minhash_lsh_candidates(docs, num_hashes=64, bands=16, family="md5")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "band" in plan and "bucket" in plan, plan


def test_q04_global_nth_bounded_by_take_ordered(spark):
    # the global latest-run lookup must cut to top-k via
    # TakeOrderedAndProject before its single-partition window — the
    # window then sees <= offset+1 rows at ANY input size
    plan = _plan(spark, "q04_scan_results_single")
    assert "TakeOrderedAndProject" in plan, plan


def test_q97_intradoc_dedup_is_rowlocal(spark):
    # segment dedup is within-row array algebra: the only allowed
    # exchange is spread_for_compute's round-robin scan widening —
    # never a hash/range shuffle, never a Python eval node
    plan = _plan(spark, "q97_intradoc_dedup")
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Python" not in plan, plan


def test_q98_bloom_bitset_broadcasts(spark):
    # the m-bounded bit set must broadcast (corpus never shuffles into
    # the membership join) and nothing may degrade to a nested loop
    plan = _plan(spark, "q98_bloom_membership")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q99_scd2_no_global_window(spark):
    # every window partitions by custkey — a partition-less window
    # would funnel the whole change log through one task
    plan = _plan(spark, "q99_scd2_intervals")
    assert "SinglePartition" not in plan, plan


def test_q101_count_min_sketch_broadcasts(spark):
    # the depth x width-bounded sketch must broadcast into the estimate
    # join, and the occurrence explode must combine map-side
    plan = _plan(spark, "q101_count_min_heavy_hitters")
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan, plan


def test_q102_binned_quantiles_combines_mapside(spark):
    # every lineitem row buckets row-locally against the broadcast
    # stats row; the shuffle must carry <= 4096 partial bin counts,
    # never raw rows (partial_count before the exchange)
    plan = _plan(spark, "q102_binned_quantiles")
    assert "partial_count" in plan, plan


def test_q103_hamming_pairs_block_bounded(spark):
    # candidates must come from the (block, value) equi-join — no
    # all-pairs scan anywhere in the plan
    plan = _plan(spark, "q103_simhash_hamming_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q109_boilerplate_df_combines_mapside_without_expand(spark):
    # array_distinct per row turns COUNT(DISTINCT doc_id) into a plain
    # count -> partial combine before the exchange, no distinct-Expand
    # two-level shuffle; the per-source totals join must broadcast
    plan = _plan(spark, "q109_boilerplate_ngrams")
    assert "partial_count" in plan, plan
    assert "Expand" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q110_budget_select_uses_two_phase_prefix_sum(spark):
    # the running sum must ride scalable_cumsum: a window keyed by the
    # physical partition id plus the broadcast offsets join — never a
    # partition-less global-order window over the corpus
    plan = _plan(spark, "q110_token_budget_select")
    assert "_pid" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q111_crossdoc_winners_min_combine_no_text_window(spark):
    # winner election is groupBy(hash).min(struct) -> map-side partial
    # min; a row_number window over the exploded segments would shuffle
    # the segment text and sort per group instead
    plan = _plan(spark, "q111_crossdoc_dedup")
    assert "partial_min" in plan, plan
    assert "row_number" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q29_simhash_rowlocal_no_doc_exchange(spark):
    # row-local vote folds over the staged hash array: no explode, no
    # doc-keyed hash exchange — the only exchange is the round-robin
    # scan widening (same guard family as q97)
    plan = _plan(spark, "q29_simhash")
    assert "hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan


def test_q112_pipeline_composition_shapes(spark):
    """The composed pipeline must inherit every stage's scale shape.
    The final plan only shows the two_phase_rank tail (the cumsum and
    rank stages localCheckpoint, so upstream becomes Scan ExistingRDD)
    — assert the dedup stage on the LAZY upstream frame (the q96
    pattern) and the _pid-keyed window on the final plan."""
    import pyspark.sql.functions as F

    from nessus_client_etl_scripts_spark.catalog import load_table
    from nessus_client_etl_scripts_spark.operators.text import (
        normalize_text,
        quality_keep,
    )

    quality = load_table(spark, SF, "documents").filter(quality_keep("text"))
    winners = (
        quality.groupBy(normalize_text("text").alias("nt"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(winners, "doc_id", "leftsemi")
    up = deduped._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in up, up
    assert "LeftSemi" in up, up

    plan = _plan(spark, "q112_corpus_pipeline")
    assert "_pid" in plan, plan


def test_q156_hrw_assignment_is_shuffle_free(spark):
    # the HRW argmax is row-local column algebra: the ONLY exchanges
    # are the two 9-group count aggregates and their join
    plan = _plan(spark, "q156_rendezvous_sharding")
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan  # no explode — argmax via sort_array


def test_q161_prefix_filter_no_cartesian_and_partial_agg(spark):
    plan = _plan(spark, "q161_prefix_filter_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # equi-join candidates
    assert "partial_" in plan  # df counts combine map-side


def test_q159_bootstrap_partial_aggregation(spark):
    # the x32 explode must collapse map-side: partial sum before the
    # 32-group exchange
    plan = _plan(spark, "q159_poisson_bootstrap")
    assert "partial_sum" in plan


def test_q160_range_window_on_aggregated_frame(spark):
    # window runs AFTER the (type, hour) aggregate — specifiedwindowframe
    # over the dimension frame, input aggregated first
    plan = _plan(spark, "q160_burst_detection")
    assert "partial_count" in plan
    assert plan.index("Window") < plan.index("Scan parquet") or \
        "RangeFrame" in plan or "specifiedwindowframe" in plan


def test_q162_grouping_sets_single_expand_single_agg_pair(spark):
    plan = _plan(spark, "q162_grouping_sets")
    assert plan.count("Expand") == 1
    assert "partial_" in plan


def test_q266_quintiles_have_no_ntile_window(spark):
    # the three quintile cuts are closed-form tile rules on two-phase
    # row numbers (PLANS.md rule #14) — a native ntile() in the plan
    # would mean the single-partition global window came back
    plan = _plan(spark, "q266_rfm_segmentation")
    assert "ntile(" not in plan, plan
    assert "_pid" in plan  # the range-exchange staging is in the plan


def test_q326_topk_is_take_ordered_and_project(spark):
    # global top-k must be per-partition heaps + k-row merge, never a
    # partition-less row_number window over the parts frame
    plan = _plan(spark, "q326_wilson_ranking")
    assert "TakeOrderedAndProject" in plan, plan


def test_q299_reference_side_broadcasts(spark):
    # the medoid pair generator joins candidates against a bounded
    # (≤ |labels|·max(cap, m) rows) reference — that side must ship as
    # a broadcast, so no shuffle ever touches the candidate frame on
    # the label key
    plan = _plan(spark, "q299_cluster_medoid")
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["q259_abc_classification", "q330_abc_migration", "q227_token_gini"],
)
def test_parts_scale_analytics_ride_two_phase(spark, name):
    # parts/vocabulary-sized rank and running-share frames go through
    # the range-exchange two-phase machinery (visible as the _pid
    # staging column), never a global ordered window
    plan = _plan(spark, name)
    assert "_pid" in plan, plan


def test_q344_single_exchange_fold(spark):
    # per-user array fold: ONE hash exchange (map-side partial
    # collect_list), the recurrence itself is row-local
    plan = _plan(spark, "q344_token_bucket_admission")
    assert plan.count("Exchange") == 1, plan
    assert "partial_collect_list" in plan


def test_q347_two_exchanges_with_partials(spark):
    # prompt-keyed window + 8-group pos rollup; the rollup must show
    # map-side partial aggregation
    plan = _plan(spark, "q347_grpo_advantage")
    assert plan.count("Exchange") == 2, plan
    assert "partial_count" in plan


def test_q348_single_exchange_into_kernel(spark):
    # the ANN-cell kernel is the only shuffle consumer — pair frame
    # never materializes engine-side
    plan = _plan(spark, "q348_provenance_attribution")
    assert plan.count("Exchange") == 1, plan
    assert "FlatMapGroupsInPandas" in plan
