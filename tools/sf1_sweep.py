"""Full-registry correctness sweep at the generated sf1 fixture — the
scale-decade validation the reference earned its trust with
(ex/terasort/TeraValidate.java, src/test/org/apache/hadoop/mapred/
SortValidator.java): same gate semantics as tools/oracle_check.py
(Spark vs DuckDB, canonicalize, hash-compare), plus

  * per-query Spark and oracle wall seconds recorded to a JSON file
    (SCALE.md's sf1 table is generated from it),
  * a documented EXCLUDED_BY_DESIGN list for the entries whose OUTPUT
    is quadratic in duplicate-cluster size at this corpus — for those
    the sweep VERIFIES the designed fail-loud guard actually raises at
    sf1 (an entry that silently succeeds or OOMs is a FAIL either way),
  * resume: names already present in the JSON are skipped, so a long
    sweep survives interruption.

Usage: python tools/sf1_sweep.py [sf_dir] [out_json] [query ...]
Defaults: /root/repo/fixtures/sf1, /root/repo/SCALE_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.catalog import TABLES, table_path  # noqa: E402
from hadoop_20_spark.registry import REGISTRY  # noqa: E402
from tools.oracle_check import canonicalize, value_hash  # noqa: E402

# Entries whose OUTPUT (not an intermediate) is quadratic in
# duplicate-cluster size on this corpus (~92k pairs at 500 docs -> 8.9M
# at 5k -> ~1e9 at 50k).  At sf1 the pre-flight pair-volume guard
# (operators/dedup.py::_pair_volume_guard, sigma C(bucket,2) over the
# join-key histogram) must RAISE — the sweep asserts the designed error
# instead of running the blowup.  The DuckDB oracles for these are the
# same brute-force self-join and would be equally quadratic.
# Entries whose SPARK side is fine at sf1 but whose DuckDB ORACLE is
# infeasible on this box at this scale (measured, not assumed).  The
# sweep runs the Spark side and records rows + wall as SPARK-ONLY.
ORACLE_INFEASIBLE: dict[str, str] = {
    "kcore_peel_audit": (
        "oracle is an iterative recursive-CTE peel that materializes "
        "every round: its temp spill exceeded the box's 79 GB free disk "
        "at sf1 (Spark side: 7.7 s, 5 rows); oracle-checked at "
        "sf0.001/0.01/0.1"
    ),
}

EXCLUDED_BY_DESIGN: dict[str, str] = {
    "jaccard_pairs": "quadratic OUTPUT (exact pair list); guard must raise",
    "jaccard_pairs_pruned": "quadratic OUTPUT (exact pair list); guard must raise",
    "dedup_retention_curve": "consumes jaccard_pairs at t=0.25; guard must raise",
    "incremental_dedup": (
        "cross-side candidate volume 5.7e9 at sf1 (measured): "
        "_pair_volume_guard_cross must raise"
    ),
}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/repo/fixtures/sf1"
    out_json = args[1] if len(args) > 1 else "/root/repo/SCALE_sf1.json"
    names = [a for a in args[2:]] or list(REGISTRY)

    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)

    spark = get_spark("sf1_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    def flush() -> None:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    for name in names:
        if name in results and results[name].get("status") not in (None, "FAIL"):
            continue
        q = REGISTRY[name]
        rec: dict = {}
        results[name] = rec
        if name in EXCLUDED_BY_DESIGN:
            t0 = time.time()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except ValueError as e:
                if "candidate" in str(e) and "volume" in str(e):
                    rec.update(
                        status="RAISES-BY-DESIGN",
                        reason=EXCLUDED_BY_DESIGN[name],
                        guard_secs=round(time.time() - t0, 1),
                    )
                    print(f"RAISES-BY-DESIGN {name} ({rec['guard_secs']}s)")
                else:
                    rec.update(status="FAIL", err=f"unexpected ValueError: {e}")
                    print(f"FAIL {name}: unexpected ValueError: {e}")
            else:
                rec.update(
                    status="FAIL",
                    err="guard did NOT raise at sf1 — quadratic output ran",
                )
                print(f"FAIL {name}: guard did not raise")
            finally:
                spark.catalog.clearCache()
            flush()
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            rec.update(status="FAIL", err=f"spark error: {e}")
            print(f"FAIL {name}: spark error: {e}")
            spark.catalog.clearCache()
            flush()
            continue
        finally:
            spark.catalog.clearCache()
        rec["spark_secs"] = round(time.time() - t0, 1)
        rec["rows"] = len(sdf)
        if name in ORACLE_INFEASIBLE:
            rec["status"] = "SPARK-ONLY"
            rec["reason"] = ORACLE_INFEASIBLE[name]
            print(f"SPARK-ONLY {name}: {len(sdf)} rows ({rec['spark_secs']}s)")
            flush()
            continue
        if q.oracle is None:
            rec["status"] = "ROWS-ONLY"
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({rec['spark_secs']}s)")
            flush()
            continue
        t0 = time.time()
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            rec.update(status="FAIL", err=f"duckdb error: {e}")
            print(f"FAIL {name}: duckdb error: {e}")
            flush()
            continue
        rec["oracle_secs"] = round(time.time() - t0, 1)
        try:
            s_c, o_c = canonicalize(sdf), canonicalize(odf)
        except TypeError as e:
            rec.update(status="FAIL", err=str(e))
            print(f"FAIL {name}: {e}")
            flush()
            continue
        problems = []
        if len(s_c) != len(o_c):
            problems.append(f"rows {len(s_c)} vs {len(o_c)}")
        if list(s_c.columns) != list(o_c.columns):
            problems.append(f"cols {list(s_c.columns)} vs {list(o_c.columns)}")
        if not problems and value_hash(s_c) != value_hash(o_c):
            problems.append("value-hash mismatch")
        if problems:
            rec.update(status="FAIL", err="; ".join(problems))
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            rec["status"] = "PASS"
            print(
                f"PASS {name}: {len(s_c)} rows "
                f"(spark {rec['spark_secs']}s, oracle {rec['oracle_secs']}s)"
            )
        flush()

    counts: dict[str, int] = {}
    for rec in results.values():
        counts[rec.get("status", "?")] = counts.get(rec.get("status", "?"), 0) + 1
    print("\n" + json.dumps(counts))
    return 1 if counts.get("FAIL") else 0


if __name__ == "__main__":
    raise SystemExit(main())
