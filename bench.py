"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints a SHORT summary JSON line first (always parseable even if a log
capture truncates one end), then the full JSON line with the per-query
map as the LAST line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
The full record is also written to BENCH_LOCAL.json next to this file,
so the numbers survive any stdout truncation.

Materialization uses the JVM-only noop sink so we measure plan execution,
not Python-side row transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beis_orp_data_service_spark import declared  # noqa: E402
from beis_orp_data_service_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once so per-query numbers are steady
    materialize(declared.q_search_flagship(spark, sf_dir))

    total = 0.0
    for name, qd in declared.REGISTRY.items():
        t0 = time.time()
        materialize(qd.fn(spark, sf_dir))
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    record = {
        "metric": "declared_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    summary = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
    }
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    try:
        with open(local, "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    print(json.dumps(summary), flush=True)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
