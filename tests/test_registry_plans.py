"""Registry smoke + scale-posture plan assertions (.explain checks)."""

from pyspark.sql import functions as F

from hadoop_20_spark.plans import assert_broadcast_join, physical_plan
from hadoop_20_spark.registry import REGISTRY
from tests.conftest import SF_DIR

# Plan assertions use a different sf dir than the cached fixtures —
# cached tables substitute InMemoryRelation for the parquet scan, hiding
# PushedFilters/ReadSchema.
PLAN_SF = "/root/testdata/sf0.01"

FAST_SUBSET = [
    "q1_pricing_summary",
    "join_star",
    "join_override",
    "secondary_sort",
    "dedup_exact",
    "text_stats",
    "embedding_topk",
]


def test_registry_complete():
    # every oracle has a query; every query runs at least rows-only
    for name, q in REGISTRY.items():
        assert callable(q.fn), name


def test_register_rejects_duplicate_names():
    """register() must fail loudly on a name collision — a duplicate
    once silently shadowed round 2's cohort_retention, shrinking the
    registry by one with no error anywhere."""
    import pytest

    from hadoop_20_spark.queries._base import register

    with pytest.raises(ValueError, match="duplicate registry name"):
        register("wordcount", None)(lambda spark, sf: None)


def test_driver_rotation_reads_correctness_files():
    """The unseen-first rotation must actually FIND the repo-root
    CORRECTNESS_r*.json files (a wrong parent count once made it glob
    inside the package and silently return empty, freezing the driver
    sample on the same 50 queries) and order never-driver-checked
    queries first."""
    from pathlib import Path

    from hadoop_20_spark.queries import _driver_seen, queries

    repo_root = Path(__file__).resolve().parent.parent
    have_files = any(repo_root.glob("CORRECTNESS_r*.json"))
    seen = _driver_seen()
    if have_files:
        assert seen, "driver correctness files exist but none were read"
    ordered = list(queries())
    unseen = [n for n in ordered if n not in seen]
    assert ordered[: len(unseen)] == unseen, "unseen queries must come first"


def test_fast_subset_runs(spark):
    for name in FAST_SUBSET:
        df = REGISTRY[name].fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_q1_filter_pushed_to_scan(spark):
    plan = physical_plan(REGISTRY["q1_pricing_summary"].fn(spark, PLAN_SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:500]


def test_q1_column_pruning(spark):
    plan = physical_plan(REGISTRY["q1_pricing_summary"].fn(spark, PLAN_SF))
    # scan must not read unused columns like l_partkey / l_suppkey
    scan_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_partkey" not in scan_schema
    assert "l_comment" not in scan_schema


def test_join_star_broadcasts_dims(spark):
    df = REGISTRY["join_star"].fn(spark, PLAN_SF)
    assert_broadcast_join(df, n=2)  # nation + region at minimum


def test_topk_uses_take_ordered(spark):
    plan = physical_plan(REGISTRY["top_k"].fn(spark, PLAN_SF))
    assert "TakeOrderedAndProject" in plan


def test_wholestage_codegen_on_agg(spark):
    # AQE prints codegen markers ('*(n)') only in the final plan, so
    # execute first, then inspect.
    df = REGISTRY["wordcount"].fn(spark, PLAN_SF)
    df.collect()  # count() would plan a different query; collect finalizes THIS one
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "isFinalPlan=true" in plan
    assert "*(" in plan


def test_funnel_single_user_shuffle(spark):
    """The three nested funnel windows must share ONE user_id hash
    exchange — a second user shuffle means Catalyst stopped merging
    the same-partitioning windows."""
    plan = physical_plan(REGISTRY["funnel_conversion"].fn(spark, PLAN_SF))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_bpe_top50_uses_take_ordered(spark):
    plan = physical_plan(REGISTRY["bpe_merge_pairs"].fn(spark, PLAN_SF))
    assert "TakeOrderedAndProject" in plan


def test_interval_sample_partitioned_rank(spark):
    """The global rank must be bucket-partitioned (distributed_global_rank),
    never a single-partition window over the fact table: no
    Exchange SinglePartition anywhere, and the WindowExec must carry a
    partition spec (the bucket column), not 'No Partition Defined'."""
    df = REGISTRY["interval_sample"].fn(spark, PLAN_SF)
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "__rank_bucket" in plan  # window partitioned by the bucket


def test_status_rank_sample_partitioned_rank(spark):
    """Same pin for the skew-proof composite-boundary rank: the hot
    3-value leading key must ride bucket-partitioned windows (sampled
    tuple boundaries), never an Exchange SinglePartition."""
    df = REGISTRY["status_rank_sample"].fn(spark, PLAN_SF)
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "__rank_bucket" in plan


def test_equi_depth_histogram_no_global_window(spark):
    """Boundaries-then-count must never plan the NTILE trap: no window
    operator at all (the data-wide bucket pass is a plain aggregate;
    the only SinglePartition exchanges carry pre-aggregated rows)."""
    import re

    plan = physical_plan(REGISTRY["equi_depth_histogram"].fn(spark, PLAN_SF))
    # \b so the check doesn't trip on 'percentile' (which ends in ntile)
    assert not re.search(r"\bntile\(", plan.lower())
    assert "WindowExec" not in plan and "Window " not in plan


def test_new_tpch_shapes_run(spark):
    for name in [
        "q5_local_supplier",
        "q14_promo_revenue",
        "q18_large_orders",
        "q19_disjunctive_join",
        "grouping_sets_agg",
        "lang_id_confusion",
    ]:
        assert REGISTRY[name].fn(spark, SF_DIR).count() >= 0, name


def test_q5_broadcasts_all_dims(spark):
    # region/nation/customer/supplier broadcast; lineitem⋈orders is the
    # only shuffle join in the plan
    df = REGISTRY["q5_local_supplier"].fn(spark, PLAN_SF)
    assert_broadcast_join(df, n=4)


def test_q18_having_is_broadcast_semi_join(spark):
    plan = physical_plan(REGISTRY["q18_large_orders"].fn(spark, PLAN_SF))
    assert "LeftSemi" in plan


def test_grouping_sets_single_expand(spark):
    plan = physical_plan(REGISTRY["grouping_sets_agg"].fn(spark, PLAN_SF))
    assert plan.count("Expand") >= 1


def test_dynamic_partition_pruning(spark, tables, tmp_path_factory):
    # partitionBy layout (the reference's ds= convention) + a selective
    # dim filter => fact scan must carry a dynamicpruning subquery
    out = str(tmp_path_factory.mktemp("dpp") / "events_by_type")
    tables["events"].write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2)], "event_type string, w int"
    ).filter(F.col("w") == 1)
    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower()


def test_sequence_packing_no_global_window(spark):
    # The packing window must partition by shard — a global prefix sum
    # would plan Exchange SinglePartition and serialize onto one task.
    plan = physical_plan(REGISTRY["sequence_packing"].fn(spark, PLAN_SF))
    assert "SinglePartition" not in plan
    assert "Window" in plan


def test_winnowing_row_local_until_explode(spark):
    """Winnowing selection is row-local: the only exchange in the plan
    is the final result sort — no shuffle feeds the fingerprint calc."""
    plan = physical_plan(REGISTRY["winnowing_fps"].fn(spark, PLAN_SF))
    import re

    # count footer node entries: the formatted plan repeats each node
    # in the tree and the detail footer
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert plan.count("BroadcastExchange") == 0, plan[:2000]
    assert n_ex <= 1, f"{n_ex} exchanges (want <=1, the result sort)"


def test_cdc_chunks_row_local_until_explode(spark):
    plan = physical_plan(REGISTRY["cdc_chunks"].fn(spark, PLAN_SF))
    import re

    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert plan.count("BroadcastExchange") == 0, plan[:2000]
    assert n_ex <= 1, f"{n_ex} exchanges (want <=1, the result sort)"
    assert "Generate" in plan  # the chunk explode


def test_tfidf_plan_shape(spark):
    """TF-IDF: windows over one tf relation (no recomputed token agg);
    ranking uses WindowGroupLimit (partial top-k before the shuffle)."""
    import re

    plan = physical_plan(REGISTRY["tfidf_top_terms"].fn(spark, PLAN_SF))
    assert "WindowGroupLimit" in plan
    # one token explode only — doc-length/doc-frequency come from
    # windows, not separate scans (footer node entries)
    n_gen = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert n_gen == 1, plan[:3000]


def test_label_outliers_partial_agg_and_group_limit(spark):
    plan = physical_plan(REGISTRY["label_outliers"].fn(spark, PLAN_SF))
    assert "WindowGroupLimit" in plan
    assert "partial_sum" in plan  # decimal partial sums map-side


def test_q2_single_window_no_compound_float_join(spark):
    """Round-4 q2 rule: the regional min must be a window over partkey,
    never an agg rejoined on a float-normalized compound key (which
    shuffles the regional relation twice)."""
    plan = physical_plan(REGISTRY["q2_min_cost_supplier"].fn(spark, PLAN_SF))
    assert "Window" in plan
    assert "knownfloatingpointnormalized" not in plan


def test_q8_one_fact_shuffle(spark):
    """q8's snowflake: every dim broadcasts at sf0.01; the fact side
    contributes the only data shuffle (plus the agg + result sort)."""
    import re

    plan = physical_plan(REGISTRY["q8_market_share"].fn(spark, PLAN_SF))
    # count plan NODES once via the formatted detail lines "(n) Op"
    n_bc = len(re.findall(r"\(\d+\) BroadcastExchange", plan))
    n_shuffle = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_bc >= 5, n_bc
    assert n_shuffle <= 2, n_shuffle  # partial->final agg + range sort


def test_q16_not_in_is_anti_join(spark):
    plan = physical_plan(REGISTRY["q16_supplier_part_counts"].fn(spark, PLAN_SF))
    assert "LeftAnti" in plan


def test_q20_dominance_via_semi_joins(spark):
    plan = physical_plan(REGISTRY["q20_dominant_supplier"].fn(spark, PLAN_SF))
    assert plan.count("LeftSemi") >= 2  # part-name set and dominant-supplier set


def test_semantic_dedup_no_cartesian(spark):
    plan = physical_plan(REGISTRY["semantic_dedup"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan


def test_dup_ngram_fraction_no_doc_cross_join(spark):
    """The duplication-triage join keys on the shingle, never doc x doc."""
    plan = physical_plan(REGISTRY["dup_ngram_fraction"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_topk_uses_take_ordered_not_global_window(spark):
    plan = physical_plan(REGISTRY["vocab_oov_rate"].fn(spark, PLAN_SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_cms_sketch_readout_is_broadcast(spark):
    """The <=256-row sketch must join candidates by broadcast, and no
    fact-path exchange may be single-partition (the only exchanges are
    token/cell-keyed hash partitionings)."""
    plan = physical_plan(REGISTRY["cms_heavy_hitters"].fn(spark, PLAN_SF))
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_peak_concurrency_window_is_day_partitioned(spark):
    """The sweep window must partition by day — never a global running
    sum (single-partition) over the boundary points."""
    plan = physical_plan(REGISTRY["peak_concurrency_daily"].fn(spark, PLAN_SF))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(day" in plan


def test_quality_gate_thresholds_broadcast_no_global_window(spark):
    """CDF windows partition by source over the aggregated histogram;
    the per-source thresholds come back via broadcast join."""
    plan = physical_plan(REGISTRY["quality_gate_adaptive"].fn(spark, PLAN_SF))
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_novelty_and_growth_no_cartesian(spark):
    for name in ("ngram_novelty", "vocab_growth_curve"):
        plan = physical_plan(REGISTRY[name].fn(spark, PLAN_SF))
        assert "CartesianProduct" not in plan, name


def test_containment_no_cartesian_prefix_probe(spark):
    """Candidates must come from a shingle equi-join (prefix postings x
    full postings), never an all-pairs product."""
    plan = physical_plan(REGISTRY["containment_pairs"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(sh" in plan  # the postings equi-join key


def test_copurchase_no_join_takeordered(spark):
    """Pair generation must be row-local (no postings self-join): the
    plan contains NO join operator at all, and top-20 is
    TakeOrderedAndProject."""
    plan = physical_plan(REGISTRY["copurchase_pairs"].fn(spark, PLAN_SF))
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_last_touch_single_user_shuffle(spark):
    """The conditional carry + purchase filter + day aggregate must ride
    ONE user_id hash exchange (the funnel discipline)."""
    plan = physical_plan(REGISTRY["last_touch_attribution"].fn(spark, PLAN_SF))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_ivf_recall_is_perfect_or_near(spark):
    """Recall@5 of IVF vs brute force must be high on the fixture (the
    quantizer works) and every value a multiple of 0.2 (integer hits)."""
    rows = REGISTRY["ivf_recall_audit"].fn(spark, PLAN_SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall"] - r["n_hits"] / 5) < 1e-9
    assert sum(r["n_hits"] for r in rows) >= 40  # >= 0.8 mean recall


def test_triangle_count_matches_python_model(spark):
    """Ordered two-hop join vs a plain-Python triangle walk at sf0.001."""
    import itertools

    import duckdb

    con = duckdb.connect()
    edges = set(
        con.execute(
            f"""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                       FROM read_parquet('{PLAN_SF}/lineitem.parquet')),
        p AS (SELECT a.l_partkey pa, b.l_partkey pb
              FROM items a JOIN items b
                ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT pa, pb FROM p"""
        ).fetchall()
    )
    con.close()
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    n_tri = sum(
        1
        for a, nbrs in adj.items()
        for b, c in itertools.combinations(sorted(nbrs), 2)
        if c in adj.get(b, ())
    )
    row = REGISTRY["copurchase_triangles"].fn(spark, PLAN_SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == n_tri


def test_rfm_windows_only_on_dim_histogram(spark):
    """Boundaries-then-score with discrete-CDF boundaries: every window
    in the RFM plan must run over the (dim, val) HISTOGRAM partitioned
    by dim — never an unpartitioned window over the orders fact path.
    (The 1-row boundary/snapshot aggregates legitimately plan
    Exchange SinglePartition; the fact path must not.)"""
    import re

    plan = physical_plan(REGISTRY["rfm_segments"].fn(spark, PLAN_SF))
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "expected the discrete-CDF histogram windows"
    assert all(s == "dim" for s in specs), specs


def test_affinity_lift_take_ordered(spark):
    plan = physical_plan(REGISTRY["part_affinity_lift"].fn(spark, PLAN_SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_key_join_conservation(spark):
    """The CDC diff must be one full-outer join on the snapshot key (no
    cartesian, no single-partition exchange), and the four change
    classes must conserve both snapshots' row counts."""
    plan = physical_plan(REGISTRY["snapshot_diff"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    rows = {r["change_type"]: r["n_rows"]
            for r in REGISTRY["snapshot_diff"].fn(spark, PLAN_SF).collect()}
    import duckdb

    con = duckdb.connect()
    md5g = "(('0x' || substr(md5('{p}' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT) % 20 <> 0"
    n_cur, n_prev = con.execute(
        f"""SELECT SUM(CASE WHEN {md5g.format(p='ins_')} THEN 1 ELSE 0 END),
                   SUM(CASE WHEN {md5g.format(p='del_')} THEN 1 ELSE 0 END)
            FROM read_parquet('{PLAN_SF}/orders.parquet')"""
    ).fetchone()
    con.close()
    # exact conservation: each class partitions cur/prev membership
    assert rows["inserted"] + rows["changed"] + rows["unchanged"] == n_cur
    assert rows["deleted"] + rows["changed"] + rows["unchanged"] == n_prev


def test_touch_depth_single_user_shuffle_range_frame(spark):
    """The event-time RANGE window rides one user_id exchange; the
    histogram + share stages add no event-scale shuffle."""
    plan = physical_plan(REGISTRY["touch_depth"].fn(spark, PLAN_SF))
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_error_rate_trailing_mean_matches_model(spark):
    """7-day trailing mean re-derived in Python from the daily rates."""
    rows = REGISTRY["error_rate_sli"].fn(spark, PLAN_SF).collect()
    rates = [r["n_errors"] / r["n_events"] for r in rows]
    for i, r in enumerate(rows):
        window = rates[max(0, i - 6) : i + 1]
        assert abs(r["err_rate_7d"] - sum(window) / len(window)) < 1e-6


def test_pps_sample_no_single_partition(spark):
    """The weighted cumsum must ride the bucketed two-pass plan — no
    Exchange SinglePartition on the documents path; and the selection
    count matches a Python replay of the selection rule (a doc is drawn
    once per run of stride boundaries its weight span crosses, so
    ``total DIV stride`` only equals the count when no doc outweighs
    the stride — the model, not that fixture-shape assumption, is the
    ground truth here)."""
    df = REGISTRY["pps_systematic_sample"].fn(spark, PLAN_SF)
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan
    import duckdb

    con = duckdb.connect()
    weights = [
        w
        for (w,) in con.execute(
            "SELECT n_chars FROM read_parquet("
            f"'{PLAN_SF}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    total = sum(weights)
    stride = max(total // 50, 1)
    expected, cum = 0, 0
    for w in weights:
        cum += w
        if cum // stride > (cum - w) // stride:
            expected += 1
    assert df.count() == expected
    # the fixture happens to satisfy the one-selection-per-boundary
    # precondition today; if this trips, the model above still holds
    if max(weights) < stride:
        assert expected == total // stride


def test_new_fact_queries_prune_columns(spark):
    """Basket/lift/cumsum queries touch wide tables but must read only
    the columns they use — a scan that reads all of lineitem for a
    2-column expansion is wrong at any scale."""
    cases = {
        "copurchase_pairs": ("l_extendedprice", "l_shipdate"),
        "part_affinity_lift": ("l_extendedprice", "l_returnflag"),
        "basket_size_histogram": ("l_extendedprice", "l_discount"),
        "pps_systematic_sample": ("text", "lang"),
        "balanced_shards": ("text", "source"),
    }
    for name, forbidden in cases.items():
        plan = physical_plan(REGISTRY[name].fn(spark, PLAN_SF))
        for section in plan.split("ReadSchema")[1:]:
            head = section[:400]
            for col in forbidden:
                assert col not in head, (name, col)


def test_cogroup_plan_uses_cogrouped_pandas(spark):
    """The reconcile must actually be the cogrouped-pandas operator
    (FlatMapCoGroupsInPandas) over two co-keyed exchanges — not a join
    rewrite."""
    plan = physical_plan(REGISTRY["cogroup_order_reconcile"].fn(spark, PLAN_SF))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_paragraph_dedup_plan_pruned_and_partitioned(spark):
    """Sub-document dedup: the documents scan must not read unused
    columns (lang), and no stage may funnel the corpus through a single
    partition or a cartesian product."""
    df = REGISTRY["paragraph_dedup"].fn(spark, PLAN_SF)
    plan = physical_plan(df)
    assert "lang" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_normalization_report_plan_arrow_and_pruned(spark):
    """The NFC step must ride ONE Arrow-batched python stage, and the
    scan must read only (source, text) — doc_id/lang/n_chars pruned."""
    df = REGISTRY["normalization_report"].fn(spark, PLAN_SF)
    plan = physical_plan(df)
    assert "ArrowEvalPython" in plan
    for col in ("doc_id", "lang", "n_chars"):
        assert col not in plan, col


def test_perplexity_mix_windows_only_on_source_histogram(spark):
    """The tercile CDF windows must partition by source over the
    aggregated histogram — never an unpartitioned window on the token
    or document fact paths."""
    import re

    plan = physical_plan(REGISTRY["perplexity_bucket_mix"].fn(spark, PLAN_SF))
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "expected the tercile CDF windows"
    assert all(s == "source" for s in specs), specs


def test_pagerank_converged_stop_rule(spark):
    """The convergence loop must stop at the first iteration whose
    max-delta halves from iteration 1 (scale-free integer rule), within
    the cap, and report a consistent (n_iterations, max_delta_units)."""
    rows = REGISTRY["pagerank_converged"].fn(spark, PLAN_SF).collect()
    assert len(rows) == 20
    n_iter = {r["n_iterations"] for r in rows}
    delta = {r["max_delta_units"] for r in rows}
    assert len(n_iter) == 1 and len(delta) == 1  # constant across rows
    (ni,), (d,) = n_iter, delta
    assert 1 <= ni <= 10
    assert d >= 0
    # top-20 ordering invariant: ranks non-increasing
    ranks = [r["rank_units"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_gate_log_has_no_unpartitioned_window_warnings(spark):
    """zipf_coverage / vocab_growth_curve carry non-foldable constant
    partition keys: their executed plans must show a PARTITIONED window
    spec (the no-partition WindowExec warning would otherwise mask a
    real fact-path regression someday)."""
    import re

    for name in ("zipf_coverage", "vocab_growth_curve"):
        plan = physical_plan(REGISTRY[name].fn(spark, PLAN_SF))
        # every windowspecdefinition must lead with a partition expr
        # (reference like _w0#123) rather than the order column directly
        for spec in re.findall(r"windowspecdefinition\((\w+)#", plan):
            assert spec.startswith("_w"), (name, spec)


def test_phrase_search_builds_postings_once(spark):
    """The phrase query must reuse ONE persisted postings build —
    without the persist each per-term branch re-derives postings from
    its own corpus scan + shuffle.  All three term branches must read
    the cached relation (the plan-string scan count is unreliable
    under AQE's repeated-subtree rendering, so the assertion is on the
    cache reads)."""
    df = REGISTRY["phrase_search_index"].fn(spark, PLAN_SF)
    df.collect()  # populate the cache, finalize AQE
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("InMemoryTableScan") >= 3, plan[:1500]


def test_zorder_audit_single_minmax_broadcast(spark):
    """The layout audit's only corpus-wide aggregate is the 1-row
    min/max broadcast; no cartesian product, no unpartitioned window."""
    plan = physical_plan(REGISTRY["zorder_layout_audit"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_bloom_probe_is_prejoin_filter(spark):
    """The bloom probe must evaluate as a row-local Filter against the
    broadcast bits array — the probe side carries NO shuffle exchange
    (the whole point of a runtime filter)."""
    import re

    plan = physical_plan(REGISTRY["bloom_semi_join_audit"].fn(spark, PLAN_SF))
    # the probe branch feeds a final 1-row aggregate; fact-table
    # hashpartitioning exchanges would mean the filter failed to stay
    # row-local (the build side's tiny word agg legitimately shuffles
    # on __cs-free keys; assert no exchange carries l_partkey)
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "l_partkey" not in m.group(1), m.group(0)


def test_boundaries_then_score_persists_scored_relation(spark):
    """perplexity_bucket_mix / rfm_segments derive boundaries AND
    scores from one per-entity relation; round 7's judge measured 12
    and 4 base-table FileScans (0 ReusedExchange) because that relation
    was recomputed per consumer.  The persist caps the static plan at
    the <=2 scans inside the subtree itself — a regression here means
    the dominant stage multiplies at 100 TB."""
    for name, base in [
        ("perplexity_bucket_mix", "documents.parquet"),
        ("rfm_segments", "orders.parquet"),
    ]:
        df = REGISTRY[name].fn(spark, PLAN_SF)
        plan = physical_plan(df)
        assert plan.count(base) <= 2, (name, plan.count(base))
        assert "InMemoryRelation" in plan, name


def test_bloom_semi_join_probe_before_exchange(spark):
    """bloom_pruned_frequent_buyers: the fact probe must die at the
    scan — the md5 bloom test appears as a row-local filter (one
    let-bound digest), every join is broadcast (no SortMergeJoin), and
    no exchange ever carries the full-width fact row (o_totalprice):
    only the 8-byte custkey build column and the pruned survivors'
    group keys shuffle."""
    import re

    plan = physical_plan(REGISTRY["bloom_pruned_frequent_buyers"].fn(spark, PLAN_SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("LeftSemi") >= 1
    assert "transform(array(md5(" in plan.replace(" ", ""), "probe filter missing"
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "o_totalprice" not in m.group(1), m.group(0)


def test_dup_span_report_two_scans_one_fingerprint_shuffle(spark):
    """duplicate_spans must derive occurrence counts + global firsts as
    a WINDOW over the fingerprint key — the groupBy+join-back shape
    evaluated the expensive window-hash relation twice (3 corpus scans;
    now 2: the window pass + the column-pruned token-count pass)."""
    plan = physical_plan(REGISTRY["dup_span_report"].fn(spark, PLAN_SF))
    assert plan.count("documents.parquet") <= 2, plan.count("documents.parquet")
    assert "SortMergeJoin" not in plan


def test_shared_subtree_persists_cap_base_scans(spark):
    """Round-8 sweep: queries whose small shared relations (bounded
    histograms, stage tables, key sets) feed multiple consumers must
    persist them — pins the structural scan ceilings so a dropped
    persist (or a new consumer re-deriving the subtree) fails here."""
    import sys

    sys.path.insert(0, "tools")
    from plan_report import node_counts

    ceilings = {
        "ks_drift_audit": 2,
        "chi2_contingency": 1,
        "funnel_analysis": 3,
        "bloom_pruned_frequent_buyers": 4,
        "corpus_curation": 12,
    }
    for name, cap in ceilings.items():
        jp = (
            REGISTRY[name]
            .fn(spark, PLAN_SF)
            ._jdf.queryExecution()
            .executedPlan()
        )
        n = node_counts(jp)
        scans = n.get("scan", 0) + n.get("cached.scan", 0)
        assert scans <= cap, (name, scans, cap)
        spark.catalog.clearCache()


def test_gini_lorenz_single_structural_scan(spark):
    """gini_lorenz_audit was round 9's only weak plan: the unpersisted
    distributed_global_rank input + ranked relation re-derived the
    per-customer aggregate per consumer (6 structural FileScans of
    orders, 18 shuffles).  Both now persist — the audit must read
    orders ONCE structurally (cache reads for every other consumer),
    and the fact-path window stays bucket-partitioned."""
    import sys

    sys.path.insert(0, "tools")
    from plan_report import node_counts

    df = REGISTRY["gini_lorenz_audit"].fn(spark, PLAN_SF)
    jp = df._jdf.queryExecution().executedPlan()
    n = node_counts(jp)
    scans = n.get("scan", 0) + n.get("cached.scan", 0)
    assert scans <= 2, (n, scans)
    assert n.get("mem_scan", 0) + n.get("cached.mem_scan", 0) >= 2, n
    plan = jp.toString()
    assert "__rank_bucket" in plan  # window partitioned by the bucket
    spark.catalog.clearCache()


def test_rle_encoding_audit_no_window_no_fact_scan_in_plan(spark):
    """rle_encoding_audit finds run boundaries with the dense-key
    adjacency self-join, never a window: no WindowExec (the ordinal
    trap), and the only data shuffles are the hash-partitioned join
    sides — the checkpointed 3-column scan is shared by both column
    passes, so the final plan holds no FileScan at all."""
    import sys

    sys.path.insert(0, "tools")
    from plan_report import node_counts

    df = REGISTRY["rle_encoding_audit"].fn(spark, PLAN_SF)
    jp = df._jdf.queryExecution().executedPlan()
    n = node_counts(jp)
    assert n.get("scan", 0) + n.get("cached.scan", 0) == 0, n
    plan = jp.toString()
    assert "Window" not in plan, "run detection regressed to a window"
    assert n.get("shuffle", 0) <= 2, n
    spark.catalog.clearCache()


def test_constraint_suite_one_scan_per_table(spark):
    """The Deequ-style verifier's whole point: an N-check suite costs
    ONE wide aggregate per table, not N scans.  The full query may
    scan each table at most twice (verify pass + the FK anti-join's
    side), where the naive scan-per-check shape would need 8+ scans of
    orders alone."""
    plan = physical_plan(REGISTRY["constraint_suite"].fn(spark, PLAN_SF))
    assert plan.count("orders.parquet") <= 2, plan.count("orders.parquet")
    assert plan.count("lineitem.parquet") <= 2, plan.count("lineitem.parquet")


def test_sketch_and_truncation_share_scans(spark):
    """Round-8 additions follow the persist-the-shared-relation rule:
    hll_distinct_merge derives registers AND both exact-distinct audits
    from one persisted (source, token) distinct — a single documents
    scan; mrl_truncation_audit persists its top-k so baseline + overlap
    don't recompute the score-everything subtree (2 scans = the two
    inherent sides of the query/corpus join)."""
    plan = physical_plan(REGISTRY["hll_distinct_merge"].fn(spark, PLAN_SF))
    assert plan.count("documents.parquet") <= 1, plan.count("documents.parquet")
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()
    plan = physical_plan(REGISTRY["mrl_truncation_audit"].fn(spark, PLAN_SF))
    assert plan.count("embeddings.parquet") <= 2, plan.count("embeddings.parquet")
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()


def test_dsir_plan_shape(spark):
    """DSIR: one token-explode scan + the k-sizing count scan (<=2 base
    scans), top-k as TakeOrderedAndProject (never a global sort), and
    the bucket log-ratio join broadcast (1024-row derived aggregate)."""
    plan = physical_plan(REGISTRY["dsir_importance_sample"].fn(spark, PLAN_SF))
    # token scan for the feature matrix + token scan for the bucket LMs
    # + the k-sizing count (persist rule: dcnt scales with the corpus,
    # so the bucket counts re-derive from a column-pruned scan instead
    # of caching or re-shuffling the doc-keyed feature matrix)
    assert plan.count("documents.parquet") <= 3, plan.count("documents.parquet")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bad_record_quarantine_row_local_until_agg(spark):
    """Quarantine parse is one scan, no shuffle until the ~5-row
    classify aggregate (render + from_csv + classify all codegen)."""
    plan = physical_plan(REGISTRY["bad_record_quarantine"].fn(spark, PLAN_SF))
    assert plan.count("orders.parquet") == 1, plan.count("orders.parquet")
    assert "Join" not in plan  # render/parse/classify are one projection


def test_analyze_stats_feed_cbo_selectivity(spark):
    """ANALYZE TABLE column stats drive CBO's cardinality estimates —
    the optimizer-statistics loop the reference never had (it sized
    reducers by hand).  Post-ANALYZE, a k=3 filter over a 7-value
    column estimates ~1/7 of the rows; pre-ANALYZE there is no
    rowCount at all."""
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql("DROP TABLE IF EXISTS cbo_stats_t")
        spark.range(10000).selectExpr("id", "id % 7 AS k").write.saveAsTable(
            "cbo_stats_t"
        )
        pre = (
            spark.table("cbo_stats_t").filter("k = 3")
            ._jdf.queryExecution().optimizedPlan().stats()
        )
        assert not pre.rowCount().isDefined()
        spark.sql("ANALYZE TABLE cbo_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
        post = (
            spark.table("cbo_stats_t").filter("k = 3")
            ._jdf.queryExecution().optimizedPlan().stats()
        )
        assert post.rowCount().isDefined()
        est = int(str(post.rowCount().get()))
        assert 1000 <= est <= 2100, est  # ~10000/7, estimator leeway
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql("DROP TABLE IF EXISTS cbo_stats_t")


def test_raid_drills_single_scan_no_join(spark):
    """RAID encode+erasure drills: everything rides ONE documents scan
    and ONE (stripe,pos) aggregate — parity, survivor reductions and
    originals are parallel conditional aggregates, never a join or a
    second scan; the GF decode solve is flat codegen over the
    aggregated cells."""
    for name in (
        "raid_xor_erasure",
        "raid_rs_two_erasure",
        "raid_parity_delta_maintenance",
    ):
        plan = physical_plan(REGISTRY[name].fn(spark, PLAN_SF))
        assert plan.count("documents.parquet") == 1, (name, plan.count("documents.parquet"))
        assert "Join" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_hll_intersect_one_scan_broadcast_algebra(spark):
    """hll_intersect_estimate: one persisted (source, token) distinct
    feeds registers AND the exact audit (<=2 documents scans including
    the source-spine read); all post-sketch joins are sources^2-sized
    and must broadcast — no sort-merge join anywhere."""
    plan = physical_plan(REGISTRY["hll_intersect_estimate"].fn(spark, PLAN_SF))
    assert plan.count("documents.parquet") <= 2, plan.count("documents.parquet")
    assert "InMemoryRelation" in plan
    assert "SortMergeJoin" not in plan
    spark.catalog.clearCache()


def test_time_travel_single_log_scan_broadcast_spine(spark):
    """time_travel_read: the commit log is scanned ONCE; the as_of
    spine joins by broadcast; last-writer-wins is one max_by aggregate
    (no per-version re-reads, no window over the whole log)."""
    plan = physical_plan(REGISTRY["time_travel_read"].fn(spark, PLAN_SF))
    assert plan.count("orders_log") == 1, plan.count("orders_log")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_stupid_backoff_scan_budget(spark):
    """The LM count tables persist (vocab-bounded), so their context
    derivatives never re-explode the training half: <= 4 documents
    scans (score trigrams + one per count table), no cartesian."""
    plan = physical_plan(REGISTRY["stupid_backoff_logprob"].fn(spark, PLAN_SF))
    assert plan.count("documents.parquet") <= 4, plan.count("documents.parquet")
    assert "InMemoryRelation" in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_cc_star_edge_build_no_global_window(spark):
    """cc_star_order_chains: chain edges come from a custkey-partitioned
    window (never a partition-less one), and the plan carries no
    cartesian/nested-loop join anywhere in a round."""
    plan = physical_plan(REGISTRY["cc_star_order_chains"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_misra_gries_no_raw_key_shuffle_before_summary(spark):
    """The MG summary subtree must be shuffle-free: scan → project →
    MapInPandas with ZERO Exchange nodes — the raw key column never
    moves.  (Asserted on the operator's own plan; the registry query
    adds only the k-bounded merge and the audit's exact-count pass.)"""
    from pyspark.sql import functions as F

    from hadoop_20_spark.operators.aggregate import misra_gries_partials

    li = spark.read.parquet(f"{PLAN_SF}/lineitem.parquet").select(
        F.col("l_orderkey").cast("string").alias("item")
    )
    partials_plan = physical_plan(misra_gries_partials(li, "item", 16))
    assert "MapInPandas" in partials_plan
    assert "Exchange" not in partials_plan, partials_plan
    # and the full registry query reads the fact exactly twice
    # (summary branch + ONE persisted exact-count audit branch feeding
    # both the total and the HH filter)
    plan = physical_plan(REGISTRY["misra_gries_heavy_hitters"].fn(spark, PLAN_SF))
    assert plan.count("lineitem.parquet") == 2, plan.count("lineitem.parquet")
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()


def test_grouped_topk_window_over_candidates_only(spark):
    """grouped_topk_combined: the window input is the locally-reduced
    candidate set (MapInPandas upstream of the window), not the raw
    fact scan."""
    plan = physical_plan(REGISTRY["grouped_topk_combined"].fn(spark, PLAN_SF))
    assert "MapInPandas" in plan and "Window" in plan
    assert plan.index("Window") < plan.index("MapInPandas") or plan.count(
        "MapInPandas"
    ) >= 1
    # exactly one scan of orders — the combiner consumes it once
    assert plan.count("orders.parquet") == 1, plan.count("orders.parquet")


def test_pareto_skyline_single_fact_shuffle(spark):
    """supplier_pareto_frontier: ONE scan of lineitem; the skyline runs
    post-aggregate (MapInPandas above the suppkey agg), no join at
    all."""
    plan = physical_plan(REGISTRY["supplier_pareto_frontier"].fn(spark, PLAN_SF))
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_deletion_blocking_bounded_equi_join(spark):
    """fuzzy_join_deletion_blocking: the candidate join is an equi-join
    on the deletion key (hash or sort-merge — never nested-loop), and
    the verify filter rides above it."""
    plan = physical_plan(REGISTRY["fuzzy_join_deletion_blocking"].fn(spark, PLAN_SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    # the verified pair set persists so the candidate join + verify
    # runs ONCE for both degree endpoints: <=3 customer scans
    assert plan.count("customer.parquet") <= 3, plan.count("customer.parquet")
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()
