"""Render the SCALE.md sf1 table from tools/sf1_sweep.py's JSON.

Usage: python tools/sf1_table.py [SCALE_sf1.json]
Prints a markdown block (summary counts, the designed-raise list, the
top-N heaviest entries with Spark vs DuckDB walls) ready to paste into
SCALE.md's "sf1 sweep" section.
"""

from __future__ import annotations

import json
import sys

TOP_N = 24


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_sf1.json"
    with open(path) as f:
        results: dict[str, dict] = json.load(f)

    by_status: dict[str, list[str]] = {}
    for name, rec in results.items():
        by_status.setdefault(rec.get("status", "?"), []).append(name)

    n_pass = len(by_status.get("PASS", []))
    raises = sorted(by_status.get("RAISES-BY-DESIGN", []))
    fails = sorted(by_status.get("FAIL", []))
    rows_only = sorted(by_status.get("ROWS-ONLY", []))
    spark_only = sorted(by_status.get("SPARK-ONLY", []))

    spark_total = sum(r.get("spark_secs", 0) for r in results.values())
    oracle_total = sum(r.get("oracle_secs", 0) for r in results.values())

    print(
        f"Full-registry sweep at the generated sf1 fixture "
        f"(`tools/sf1_sweep.py fixtures/sf1`): **{n_pass} PASS / "
        f"{len(fails)} FAIL / {len(rows_only)} rows-only / "
        f"{len(raises)} RAISES-BY-DESIGN / {len(spark_only)} "
        f"SPARK-ONLY** (total Spark wall {spark_total:.0f} s, DuckDB "
        f"oracle {oracle_total:.0f} s)."
    )
    if fails:
        print(f"\nFAILING: {', '.join(fails)}")
    if rows_only:
        print(f"\nRows-only (no oracle by design): {', '.join(rows_only)}")
    if spark_only:
        print("\nSpark-only at this scale (oracle infeasible on this box; "
              "oracle-checked at sf0.001/0.01/0.1):")
        for name in spark_only:
            rec = results[name]
            print(f"- `{name}` — {rec.get('reason', '')} "
                  f"(Spark {rec.get('spark_secs', '?')} s, "
                  f"{rec.get('rows', '?')} rows)")
    if raises:
        print(
            "\nDesigned raises (quadratic-OUTPUT guards verified to fire "
            "at sf1 instead of OOMing):"
        )
        for name in raises:
            rec = results[name]
            print(f"- `{name}` — {rec.get('reason', '')} "
                  f"(guard fired in {rec.get('guard_secs', '?')} s)")

    heavy = sorted(
        (
            (name, rec)
            for name, rec in results.items()
            if rec.get("status") == "PASS"
        ),
        key=lambda t: -t[1].get("spark_secs", 0),
    )[:TOP_N]
    print(f"\nHeaviest {len(heavy)} entries (Spark wall, sf1 = 6M-row "
          "lineitem / 50k docs / 20k embeddings):\n")
    print("| query | spark s | oracle s | rows |")
    print("|---|---|---|---|")
    for name, rec in heavy:
        print(
            f"| {name} | {rec.get('spark_secs', '?')} "
            f"| {rec.get('oracle_secs', '?')} | {rec.get('rows', '?')} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
