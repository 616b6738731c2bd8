"""Plan hygiene audit over every declared query.

Flags physical plans that re-execute Python stages (duplicate
MapInPandas / ArrowEvalPython / FlatMapGroupsInPandas over the same
lineage) — the defect class fixed in round 3 for ingest_e2e, lsh_bands
and the IVF assignment (a doubled Arrow pass is a doubled full-table
scan at 100 TB). Exits non-zero when a query exceeds its allowance.

Usage: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from beis_orp_data_service_spark.session import get_spark  # noqa: E402

# Queries with a legitimate >1 Arrow-stage plan: one stage per JOIN SIDE
# (table assignment + query probe) is the minimum for the IVF family.
ALLOW_ARROW = {"ann_ivf_kmeans": 2, "ann_ivf_topk": 2, "ann_topk": 2, "ann_index_probe": 2}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    bad = []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e)[:100]}")
            bad.append(name)
            continue
        mp = plan.count("MapInPandas")
        aep = plan.count("ArrowEvalPython")
        fg = plan.count("FlatMapGroupsInPandas")
        if mp > 1 or fg > 1 or aep > ALLOW_ARROW.get(name, 1):
            print(f"DUP  {name}: MapInPandas={mp} ArrowEvalPython={aep} FlatMapGroups={fg}")
            bad.append(name)
    print("CLEAN" if not bad else f"{len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
