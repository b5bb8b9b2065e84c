"""Targeted TWO-decade probe at the generated sf10 fixture (~60M-row
lineitem, 500k docs, 200k embeddings, 10M events): the heaviest /
riskiest registry families, each checked the strongest way that is
feasible at this scale —

  * ORACLE entries re-run the full sf-gate semantics (Spark vs DuckDB,
    canonicalize, hash-compare) where the DuckDB side is tractable;
  * GUARD entries assert the designed fail-loud pre-flight raises (an
    entry that silently succeeds or OOMs is recorded FAIL) — at sf10
    this includes the round-12 SRP volume guard firing its first real
    decade (Σ n_a·n_b ≈ 3e11 >> the 1e10 cap);
  * VALIDATOR entries use the reference's own at-scale trust model
    (ex/terasort/TeraValidate.java, src/test/org/apache/hadoop/mapred/
    SortValidator.java): global-order across partition boundaries,
    row-count + checksum conservation through the shuffle, soundness
    recomputation on a sample — where the oracle would spill the box.

Resumable: names already recorded (status != FAIL) are skipped, so a
long probe survives interruption; FAIL entries re-run on resume.

Usage: python tools/sf10_probe.py [sf_dir] [out_json] [probe ...]
Defaults: /root/repo/fixtures/sf10, /root/repo/SCALE_sf10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.catalog import TABLES, load_table, table_path  # noqa: E402
from hadoop_20_spark.plans import (  # noqa: E402
    conservation_stats,
    validate_global_order,
)
from hadoop_20_spark.registry import REGISTRY  # noqa: E402
from tools.oracle_check import canonicalize, value_hash  # noqa: E402

# Registry entries whose DuckDB oracle is tractable at sf10 — the
# full gate semantics two decades above the driver's sf0.1.  Chosen to
# cover the riskiest machinery: rank/sampling (sampled total-order
# partitioner, A-Res reservoir), exact dedup + LSH near-dup on the
# planted pairs, sketch merge==rebuild, the new containment report's
# bounded-candidate claim, stream-join vs its batch twin, fusion, the
# quota rollup, and two TPC-H anchors.
ORACLE_PROBES = [
    "q1_pricing_summary",
    "q17_small_quantity",
    "status_rank_sample",
    "weighted_reservoir_sample",
    "exact_median_refinement",
    "dedup_exact",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "cms_sketch_merge",
    "hll_distinct_merge",
    "heavy_hitter_tokens",
    "dsir_importance_sample",
    "namespace_quota_audit",
    "streaming_stream_join",
    "rrf_hybrid_topk",
    # containment_report is VALIDATOR-tier at sf10 (below): its oracle
    # verifies candidates by joining per-doc hash postings — ~200
    # rows per candidate pair into a COUNT group-by, ~1.2e11 DuckDB
    # intermediate rows at this corpus (53 GB RES and still grinding
    # when killed) — the kcore_peel_audit precedent from sf1.  The
    # Spark side's array_intersect does the same verify at ~1 row per
    # pair.  Oracle-checked at sf0.001/0.01/0.1.
    "cc_star_order_chains",
    # round-12 additions, probed at their birth round's decade
    "weighted_reservoir_per_group",
    "speculative_straggler_audit",
    "embedding_covariance_topk",
]

# Entries whose pre-flight guards MUST raise at this corpus (measured
# candidate volumes past their caps) — the designed error is the pass.
GUARD_PROBES = {
    "jaccard_pairs": "Σ C(n,2) pair volume ~2e12 at 500k docs",
    "incremental_dedup": "cross-side candidate volume ~5.7e11",
    "embedding_near_dups": (
        "SRP candidate-join bound ~3e11 at 200k vectors (> the 1e10 "
        "cap): the round-12 occupancy guard's first real decade"
    ),
}


def _oracle_probe(spark, con, sf_dir: str, name: str) -> dict:
    q = REGISTRY[name]
    rec: dict = {"kind": "oracle"}
    t0 = time.time()
    sdf = q.fn(spark, sf_dir).toPandas()
    rec["spark_secs"] = round(time.time() - t0, 1)
    rec["rows"] = len(sdf)
    t0 = time.time()
    odf = con.execute(q.oracle).df()
    rec["oracle_secs"] = round(time.time() - t0, 1)
    s_c, o_c = canonicalize(sdf), canonicalize(odf)
    problems = []
    if len(s_c) != len(o_c):
        problems.append(f"rows {len(s_c)} vs {len(o_c)}")
    if list(s_c.columns) != list(o_c.columns):
        problems.append(f"cols {list(s_c.columns)} vs {list(o_c.columns)}")
    if not problems and value_hash(s_c) != value_hash(o_c):
        problems.append("value-hash mismatch")
    rec["status"] = "FAIL" if problems else "PASS"
    if problems:
        rec["err"] = "; ".join(problems)
    return rec


def _guard_probe(spark, sf_dir: str, name: str, why: str) -> dict:
    rec: dict = {"kind": "guard", "reason": why}
    t0 = time.time()
    try:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except ValueError as e:
        msg = str(e)
        if "volume" in msg and ("candidate" in msg or "pair" in msg):
            rec.update(
                status="RAISES-BY-DESIGN",
                guard_secs=round(time.time() - t0, 1),
                bound=msg.split("=")[1].split(" ")[1] if "=" in msg else None,
            )
        else:
            rec.update(status="FAIL", err=f"unexpected ValueError: {e}")
    else:
        rec.update(status="FAIL", err="guard did NOT raise at sf10")
    return rec


def _v_total_order_sort(spark, con, sf_dir: str) -> dict:
    """TeraValidate + SortValidator on a full-table total-order sort of
    the 60M-row lineitem: global order across partition boundaries,
    count + checksum conservation through the range-partition shuffle.
    (The registry entry's toPandas/oracle compare would ship 60M rows
    into pandas AND DuckDB — the validator checks the same contract
    entirely JVM-side.)"""
    li = load_table(spark, "lineitem", sf_dir)
    before = conservation_stats(li, "l_extendedprice")
    t0 = time.time()
    ordered = li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    ordered.write.format("noop").mode("overwrite").save()
    sort_secs = round(time.time() - t0, 1)
    t0 = time.time()
    order_ok = validate_global_order(
        ordered, "l_shipdate", "l_orderkey", "l_linenumber"
    )
    after = conservation_stats(ordered, "l_extendedprice")
    return {
        "kind": "validator",
        "rows": before[0],
        "sort_secs": sort_secs,
        "validate_secs": round(time.time() - t0, 1),
        "globally_ordered": bool(order_ok),
        "conserved": before == after,
        "status": "PASS" if (order_ok and before == after) else "FAIL",
    }


def _v_semantic_dedup(spark, con, sf_dir: str) -> dict:
    """The round-12 corpus-scaled-k claim, one decade past where the fix
    was measured: k = max(16, 200k // 128) = 1562 cells, wall expected
    ~linear vs sf1's 33 s.  The unrolled-CTE oracle at this k is DuckDB-
    infeasible (312M cosine evals per Lloyd iteration), so the check is
    a SOUNDNESS validator: every reported (vec_id, keeper_id, cosine)
    recomputed bit-for-bit in numpy on a 500-row sample, keeper_id <
    vec_id everywhere, threshold respected everywhere."""
    import pyarrow.parquet as pq

    t0 = time.time()
    out = REGISTRY["semantic_dedup"].fn(spark, sf_dir).toPandas()
    wall = round(time.time() - t0, 1)
    t = pq.read_table(table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    pos = {int(i): j for j, i in enumerate(ids)}
    sample = out.sample(n=min(500, len(out)), random_state=7)
    bad = 0
    for _, r in sample.iterrows():
        a, b = vecs[pos[int(r.vec_id)]], vecs[pos[int(r.keeper_id)]]
        cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
        if cos != round(float(r.cosine_sim), 4):
            bad += 1
    ok = (
        bad == 0
        and (out.keeper_id < out.vec_id).all()
        and (out.cosine_sim >= 0.45).all()
    )
    return {
        "kind": "validator",
        "rows": len(out),
        "spark_secs": wall,
        "n_centroids": max(16, len(ids) // 128),
        "sample_recompute_mismatches": bad,
        "status": "PASS" if ok else "FAIL",
    }


def _v_containment_report(spark, con, sf_dir: str) -> dict:
    """Soundness + planted-recall validator for the containment report
    (oracle infeasible at sf10 — see the ORACLE_PROBES note).  Every
    sampled reported row is recomputed in pure python from the parquet
    (3-gram shingle sets, hashed-set intersection over md5_long — the
    query's own contract); planted exact-duplicate docs (same text,
    higher id) must report a containment-1.0 container at rank 1."""
    import hashlib

    import pyarrow.parquet as pq

    t0 = time.time()
    out = REGISTRY["containment_report"].fn(spark, sf_dir).toPandas()
    wall = round(time.time() - t0, 1)
    t = pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    text = dict(zip(t["doc_id"].to_numpy(), t["text"].to_pylist()))

    def hset(did: int) -> set:
        toks = [w for w in text[did].split() if w]
        shs = {
            " ".join(toks[i : i + 3])
            for i in range(max(len(toks) - 2, 1))
            if toks[i : i + 3]
        }
        return {
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shs
        }

    sample = out.sample(n=min(300, len(out)), random_state=7)
    bad = 0
    for _, r in sample.iterrows():
        a, b = hset(int(r.doc_id)), hset(int(r.container_id))
        want = round(len(a & b) / len(a), 6)
        if want != round(float(r.containment), 6) or want < 0.8:
            bad += 1
    # planted recall: exact text duplicates (higher id) must surface a
    # 1.0 container at rank 1 (their rare shingles never hit the cap)
    by_text: dict[str, list] = {}
    for did, tx in text.items():
        by_text.setdefault(tx, []).append(int(did))
    dup_docs = {
        d for ids in by_text.values() if len(ids) > 1 for d in sorted(ids)[1:]
    }
    rank1 = out[(out["rank"] == 1) & (out["containment"] >= 0.999999)]
    found = dup_docs & set(rank1["doc_id"].astype(int))
    recall = len(found) / max(len(dup_docs), 1)
    ok = bad == 0 and recall >= 0.99 and (out["rank"] <= 3).all()
    return {
        "kind": "validator",
        "rows": len(out),
        "spark_secs": wall,
        "sample_recompute_mismatches": bad,
        "planted_dup_docs": len(dup_docs),
        "planted_recall": round(recall, 4),
        "status": "PASS" if ok else "FAIL",
    }


def _v_assignment_agreement(spark, con, sf_dir: str) -> dict:
    """Agreement audit for the big-k cell-assignment strategies against
    an INDEPENDENT numpy recomputation of the exact flat argmax
    (HALF-UP 4dp rounding, cent_id tie-break), at the first scale where
    the swap point engages (k = 200k//128 = 1562 >= 256).

    - The DEFAULT strategy (``gemm`` -- the same flat semantics at BLAS
      constants) must agree >= 0.999 and be deterministic: PASS/FAIL.
    - The OPT-IN ``two_level`` strategy's agreement is RECORDED for the
      caveat docs (round 13 measured 0.438 here -- random unit vectors
      are the coarse quantizer's worst case; that number is why
      two-level is not the default)."""
    from hadoop_20_spark.operators import similarity as sim

    t0 = time.time()
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    n = emb.count()
    k = sim.auto_n_centroids(n)
    cents_df = sim.kmeans_centroids(
        emb, k=k, iterations=3, train_sample_mod=sim.kmeans_train_mod(n)
    )
    cents_df = cents_df.coalesce(1).localCheckpoint()
    cents = cents_df.orderBy("cent_id").collect()
    c_ids = np.array([r.cent_id for r in cents])
    c_vecs = np.stack([np.array(r.c_vec, dtype=np.float64) for r in cents])
    c_norms = np.linalg.norm(c_vecs, axis=1)

    sample = emb.filter(F.col("vec_id") % 100 == 7)  # ~2k deterministic

    def assigned(strategy):
        return (
            sim.assign_cells(
                sample, cents_df, "_id", "_vec",
                n_centroids=k, strategy=strategy,
            )
            .select("_id", "cell")
            .toPandas()
            .set_index("_id")["cell"]
            .sort_index()
        )

    gemm = assigned("gemm")
    gemm_again = assigned("gemm")
    two = assigned("two_level")
    rows = sample.collect()
    g_agree = t_agree = 0
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        s = c_vecs @ v / (c_norms * np.linalg.norm(v))
        s = np.sign(s) * np.floor(np.abs(s) * 1e4 + 0.5) / 1e4  # HALF-UP
        true_cell = int(c_ids[np.flatnonzero(s == s.max()).min()])
        g_agree += int(gemm.loc[r.vec_id]) == true_cell
        t_agree += int(two.loc[r.vec_id]) == true_cell
    g_rate = g_agree / max(1, len(rows))
    det = bool((gemm == gemm_again).all()) and len(gemm) == len(rows)
    return {
        "kind": "validator",
        "n_centroids": k,
        "sample_n": len(rows),
        "gemm_agreement_vs_flat_argmax": round(g_rate, 4),
        "two_level_agreement_informational": round(
            t_agree / max(1, len(rows)), 4
        ),
        "deterministic": det,
        "secs": round(time.time() - t0, 1),
        "status": "PASS" if (g_rate >= 0.999 and det) else "FAIL",
    }


VALIDATOR_PROBES = {
    "total_order_sort_validate": _v_total_order_sort,
    "semantic_dedup_scale": _v_semantic_dedup,
    "containment_report_validate": _v_containment_report,
    "assignment_agreement": _v_assignment_agreement,
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/repo/fixtures/sf10"
    out_json = args[1] if len(args) > 1 else "/root/repo/SCALE_sf10.json"
    only = set(args[2:])

    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)

    spark = get_spark("sf10_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    def flush() -> None:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    plan: list[tuple[str, str]] = (
        [(n, "oracle") for n in ORACLE_PROBES]
        + [(n, "guard") for n in GUARD_PROBES]
        + [(n, "validator") for n in VALIDATOR_PROBES]
    )
    for name, kind in plan:
        if only and name not in only:
            continue
        if name in results and results[name].get("status") not in (None, "FAIL"):
            continue
        try:
            if kind == "oracle":
                rec = _oracle_probe(spark, con, sf_dir, name)
            elif kind == "guard":
                rec = _guard_probe(spark, sf_dir, name, GUARD_PROBES[name])
            else:
                rec = VALIDATOR_PROBES[name](spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            rec = {"kind": kind, "status": "FAIL", "err": str(e)[:500]}
        finally:
            spark.catalog.clearCache()
        results[name] = rec
        print(f"{rec.get('status')} {name}: {json.dumps({k: v for k, v in rec.items() if k != 'status'})[:200]}")
        flush()

    counts: dict[str, int] = {}
    for rec in results.values():
        counts[rec.get("status", "?")] = counts.get(rec.get("status", "?"), 0) + 1
    print("\n" + json.dumps(counts))
    return 1 if counts.get("FAIL") else 0


if __name__ == "__main__":
    raise SystemExit(main())
