"""Capture .explain("formatted") for every bench-backed registry query
into plans/r14/<bench>_<phase>.txt — optimization round 2's
before/after plan evidence (spark_optimization_guide.md §1).

Fixes the r13 plan-evidence gap for driver-paced queries (r13 verdict
"What's wrong #1"): queries like exact_median_refinement return a
driver-built LocalRelation, so their final explain() never shows the
refinement scans.  For those, this tool additionally hooks
``sort.ROUND_PLAN_HOOK`` and appends the EXACT executed per-round count
DataFrame's plan (where PushedFilters on the raw column is visible).

Usage: python tools/r14_plan_capture.py before|after [bench_names...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.operators import sort as sort_ops  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")

# bench entry -> registry query (mirrors bench.py BENCH_QUERIES; the
# special-cased writes b7/b25 and the streaming b13 have no batch plan
# to capture).
CAPTURE = {
    "b1_agg_scan": "q1_pricing_summary",
    "b2_grep": "grep",
    "b3_global_sort": "total_order_sort",
    "b4_star_join": "join_star",
    "b5_override_join": "join_override",
    "b6_secondary_sort": "secondary_sort",
    "b8_window_agg": "tumbling_window_agg",
    "b9a_minhash_dedup": "minhash_lsh_pairs",
    "b9b_embedding_topk": "embedding_topk",
    "b10a_winnowing": "winnowing_fps",
    "b10b_cdc_chunks": "cdc_chunks",
    "b10c_tfidf": "tfidf_top_terms",
    "b11_snowflake_join": "q8_market_share",
    "b12_semantic_dedup": "semantic_dedup",
    "b14_interval_sample": "interval_sample",
    "b15_cms_sketch": "cms_heavy_hitters",
    "b16_copurchase": "copurchase_pairs",
    "b17_paragraph_dedup": "paragraph_dedup",
    "b18_span_dedup": "dup_span_report",
    "b19_pq_retrieval": "pq_recall_audit",
    "b20_quality_gate": "constraint_suite",
    "b21_dsir_select": "dsir_importance_sample",
    "b22_exact_median": "exact_median_refinement",
    "b23_rs_erasure": "raid_rs_two_erasure",
    "b24_star_cc": "cc_star_order_chains",
    "b26_ivf_near_dups": "embedding_near_dups_ivf",
    "g2_small_job": "q6_forecast_revenue",
}

# queries whose final relation is driver-built: hook the per-round
# refinement scans so the committed dump shows the real plan evidence
ROUND_HOOKED = {"b22_exact_median"}


def _explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r14-plan-capture")
    for bench, qname in CAPTURE.items():
        if only and bench not in only and qname not in only:
            continue
        path = os.path.join(OUT, f"{bench}_{phase}.txt")
        round_plans: list[tuple[int, str]] = []
        if bench in ROUND_HOOKED:
            sort_ops.ROUND_PLAN_HOOK = lambda r, d: round_plans.append(
                (r, _explain_text(d))
            )
        try:
            df = REGISTRY[qname].fn(spark, SF_DIR)
            text = _explain_text(df)
        except Exception as e:  # capture the failure, keep going
            text = f"EXPLAIN FAILED: {e!r}\n"
        finally:
            sort_ops.ROUND_PLAN_HOOK = None
        with open(path, "w") as f:
            f.write(f"# {bench} = registry:{qname} @ {SF_DIR} ({phase})\n")
            f.write(text)
            for r, t in round_plans:
                f.write(
                    f"\n# --- refinement round {r}: the executed count "
                    "DataFrame (driver-paced; captured via "
                    "sort.ROUND_PLAN_HOOK) ---\n"
                )
                f.write(t)
        print(f"wrote {path} ({len(text)} chars, {len(round_plans)} rounds)")


if __name__ == "__main__":
    main()
