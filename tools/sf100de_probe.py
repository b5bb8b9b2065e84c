"""Targeted THIRD-decade probe: documents x10 and embeddings x10 over
the sf10 fixture (5M docs / 2M 64-dim vectors) — ONLY the two tables
whose operator families carry super-linear risk (the r12 verdict's
task #5: "grow ONLY the embeddings and documents tables x10 ... and
probe those families with validators").  Regenerating a 600M-row
lineitem nobody probes would be pure disk burn; the relational/TPC-H
families were already validated two decades up and are linear or
guarded.

Same three check tiers as tools/sf10_probe.py (whose oracle/guard
probes and validators are imported and re-used verbatim):

  * ORACLE — full sf-gate semantics (Spark vs DuckDB, canonicalize,
    hash-compare) where DuckDB stays tractable at 5M docs;
  * GUARD — the designed pre-flight raise IS the pass (pair volumes
    here: Jaccard ~2e14, incremental cross ~6e13, SRP candidate bound
    ~3e13 — all far past their caps);
  * VALIDATOR — soundness recomputation + planted-structure recall
    where the oracle would spill the box (containment report,
    corpus-scaled-k semantic dedup at k = 2M//128 = 15625, the GEMM
    assignment-agreement audit at its largest k yet).

Reference trust model: ex/terasort/TeraValidate.java and
src/test/org/apache/hadoop/mapred/SortValidator.java (see SURVEY §0
caveat — symbol anchors from public knowledge).

Resumable exactly like the sf10 probe: names already recorded with a
non-FAIL status are skipped on re-run.

Usage: python tools/sf100de_probe.py [sf_dir] [out_json] [probe ...]
Defaults: /root/repo/fixtures/sf100de, /root/repo/SCALE_sf100de.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.catalog import table_path  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402
from tools.sf10_probe import (  # noqa: E402
    _guard_probe,
    _oracle_probe,
    _v_assignment_agreement,
    _v_containment_report,
    _v_semantic_dedup,
)


def _planted_boundary_pairs(sf_dir: str, n_emb: int) -> set[tuple[int, int]]:
    """Replay the generator's seeded RNG to enumerate the planted
    boundary-cosine pairs without storing them: every draw in the
    planting loop depends only on the PCG64 stream, so consuming the
    same draws in the same order reproduces the (a, b) id sequence
    exactly (the vector VALUES are not needed — only the RNG calls
    that advance state: the bulk standard_normal, then per accepted
    pair two ids, one uniform, one 64-dim normal)."""
    import numpy as np

    from tools.gen_fixture import _rng

    with open(os.path.join(sf_dir, "MANIFEST.json")) as f:
        mult = json.load(f)["scale_mult_vs_sf0.1"]
    r = _rng("embeddings")
    r.standard_normal((n_emb, 64))  # the corpus draw advances the state
    chosen: set[int] = set()
    pairs: set[tuple[int, int]] = set()
    while len(pairs) < 4 * mult:
        a, b = (int(x) for x in r.integers(0, n_emb, 2))
        if a == b or a in chosen or b in chosen:
            continue
        r.random()  # t_cos draw
        r.standard_normal(64)  # the orthogonal component draw
        pairs.add((min(a, b), max(a, b)))
        chosen.update((a, b))
    return pairs


def _v_ivf_near_dups(spark, con, sf_dir: str) -> dict:
    """The round-13 IVF pairs path AT ITS DESIGN POINT: 2M vectors,
    where the SRP twin's guard bound is ~3e13 (raises by design) and
    the unrolled-CTE oracle is infeasible (k = 2M//128 = 15625 Lloyd
    iterations in DuckDB).  Soundness: every sampled reported pair's
    cosine recomputed in numpy with the house HALF-UP 4dp rule, id_a <
    id_b and threshold respected everywhere, no duplicate pairs.
    Recall: measured against the generator's planted boundary pairs
    (cos ∈ [0.505, 0.535) — *at* the 0.5 threshold, the hardest
    qualifying pairs) and RECORDED; IVF recall at the boundary is
    approximate by design, so the number is the documentation, not a
    gate."""
    import numpy as np
    import pyarrow.parquet as pq

    t0 = time.time()
    out = REGISTRY["embedding_near_dups_ivf"].fn(spark, sf_dir).toPandas()
    wall = round(time.time() - t0, 1)
    t = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    pos = {int(i): j for j, i in enumerate(ids)}
    sample = out.sample(n=min(500, len(out)), random_state=7)
    bad = 0
    for _, row in sample.iterrows():
        a = vecs[pos[int(row.id_a)]]
        b = vecs[pos[int(row.id_b)]]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        c = np.sign(c) * np.floor(abs(c) * 1e4 + 0.5) / 1e4  # HALF-UP 4dp
        if c != round(float(row.cosine_sim), 4):
            bad += 1
    got = {
        (int(r2.id_a), int(r2.id_b)) for r2 in out.itertuples(index=False)
    }
    planted = _planted_boundary_pairs(sf_dir, len(ids))
    recall = len(got & planted) / max(len(planted), 1)
    ok = (
        bad == 0
        and (out.id_a < out.id_b).all()
        and (out.cosine_sim >= 0.5).all()
        and len(out) == len(out.drop_duplicates(["id_a", "id_b"]))
    )
    return {
        "kind": "validator",
        "rows": len(out),
        "spark_secs": wall,
        "sample_recompute_mismatches": bad,
        "planted_boundary_pairs": len(planted),
        "planted_recall_informational": round(recall, 4),
        "status": "PASS" if ok else "FAIL",
    }

# Only these two tables exist in the fixture; DuckDB views are created
# for exactly this set so a probe that accidentally touches another
# table fails loudly at bind time instead of reading stale data.
FIXTURE_TABLES = ["documents", "embeddings"]

# Cheapest first so a long probe banks results early; the two known
# super-linear tails (cms_sketch_merge x14.5/decade, containment
# report x15.2 sf1->sf10) run last.
ORACLE_PROBES = [
    "dedup_exact",
    "weighted_reservoir_per_group",
    "heavy_hitter_tokens",
    "minhash_lsh_pairs",
    "hll_distinct_merge",
    "embedding_covariance_topk",
    "rrf_hybrid_topk",
    "paragraph_dedup",
    "dsir_importance_sample",
    "dedup_clusters",
    "cms_sketch_merge",
]

GUARD_PROBES = {
    "jaccard_pairs": "Σ C(n,2) pair volume ~2e14 at 5M docs",
    "incremental_dedup": "cross-side candidate volume ~6e13",
    "embedding_near_dups": (
        "SRP candidate-join bound ~3e13 at 2M vectors — two decades "
        "past the 1e10 cap"
    ),
}

VALIDATOR_PROBES = {
    "assignment_agreement": _v_assignment_agreement,
    "ivf_near_dups_validate": _v_ivf_near_dups,
    "semantic_dedup_scale": _v_semantic_dedup,
    "containment_report_validate": _v_containment_report,
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else "/root/repo/fixtures/sf100de"
    )
    out_json = args[1] if len(args) > 1 else "/root/repo/SCALE_sf100de.json"
    only = set(args[2:])

    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)

    spark = get_spark("sf100de_probe")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
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
        t0 = time.time()
        try:
            if kind == "oracle":
                rec = _oracle_probe(spark, con, sf_dir, name)
            elif kind == "guard":
                rec = _guard_probe(spark, sf_dir, name, GUARD_PROBES[name])
            else:
                rec = VALIDATOR_PROBES[name](spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            rec = {
                "kind": kind,
                "status": "FAIL",
                "err": str(e)[:500],
                "secs": round(time.time() - t0, 1),
            }
        finally:
            spark.catalog.clearCache()
        results[name] = rec
        print(
            f"{rec.get('status')} {name}: "
            f"{json.dumps({k: v for k, v in rec.items() if k != 'status'})[:200]}",
            flush=True,
        )
        flush()

    counts: dict[str, int] = {}
    for rec in results.values():
        counts[rec.get("status", "?")] = counts.get(rec.get("status", "?"), 0) + 1
    print("\n" + json.dumps(counts))
    return 1 if counts.get("FAIL") else 0


if __name__ == "__main__":
    raise SystemExit(main())
