"""TeraSort-at-scale validation: generate N rows (default 10M), global
total-order sort, then run the reference's two validator disciplines —
TeraValidate (global order across partition boundaries) and
SortValidator/RecordStatsChecker (row-count + checksum conservation
through the shuffle).

Usage: python tools/scale_check.py [n_rows]
Prints ONE JSON line. This is the scale twin of the unit-sized
validator tests in tests/test_sort.py; run it when you want evidence
that the sort/validator stack behaves beyond fixture sizes.

Reference analogs: ex/terasort/{TeraGen,TeraSort,TeraValidate}.java,
src/test/org/apache/hadoop/mapred/SortValidator.java.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_20_spark import get_spark  # noqa: E402
from hadoop_20_spark.plans import (  # noqa: E402
    conservation_stats,
    validate_global_order,
)
from hadoop_20_spark.sources import teragen  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale_check")
    t0 = time.time()
    data = teragen(spark, n_rows)
    before = conservation_stats(data, "id")
    gen_s = time.time() - t0

    # Time the sort itself with a noop write: an aggregation over an
    # orderBy would let Catalyst's EliminateSorts drop the sort, so the
    # checksum pass below is timed (and labeled) separately.
    t0 = time.time()
    ordered = data.orderBy("key")
    ordered.write.format("noop").mode("overwrite").save()
    sort_s = time.time() - t0

    t0 = time.time()
    after = conservation_stats(ordered, "id")
    checksum_s = time.time() - t0

    t0 = time.time()
    order_ok = validate_global_order(ordered, "key")
    validate_s = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "terasort_validate",
                "n_rows": n_rows,
                "gen_sec": round(gen_s, 2),
                "sort_sec": round(sort_s, 2),
                "checksum_sec": round(checksum_s, 2),
                "validate_sec": round(validate_s, 2),
                "globally_ordered": bool(order_ok),
                "conserved": before == after,
                "rows": before[0],
            }
        )
    )
    assert order_ok and before == after


if __name__ == "__main__":
    main()
