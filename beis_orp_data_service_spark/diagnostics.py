"""Task-level skew diagnostics: measure hot-key incidents with
per-partition metrics, not wall time.

``task_shuffle_skew`` runs one Spark action and reports the per-task
shuffle-read record distribution of the heaviest NEW shuffle stage —
the number that actually pages someone at 100 TB (one reducer task
dragging a degenerate band key while its 999 siblings finish). Wall
time hides this on a warm 32-core box; task metrics do not.

Metrics come from the Spark status REST API (``/api/v1``), which is
the stable public surface for task metrics — the monitoring endpoint
every Spark UI reads. It requires ``spark.ui.enabled=true`` on the
session (the probe script ``scripts/skew_probe.py`` builds its own);
there is no py4j callback-server dependency, so it works on any
driver.
"""

from __future__ import annotations

import json
import statistics
import urllib.request


def _get(url: str):
    with urllib.request.urlopen(url) as r:  # local status endpoint
        return json.load(r)


def _api(spark) -> str:
    sc = spark.sparkContext
    if not sc.uiWebUrl:
        raise RuntimeError(
            "task_shuffle_skew needs the status REST API: build the "
            "session with spark.ui.enabled=true"
        )
    return f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"


def _completed_stages(spark) -> dict[tuple[int, int], dict]:
    return {
        (s["stageId"], s["attemptId"]): s
        for s in _get(f"{_api(spark)}/stages?status=complete")
    }


def task_shuffle_skew(spark, action, max_tasks: int = 2000) -> dict:
    """Run ``action()`` (any Spark action) and return the per-task
    shuffle-read record skew of the heaviest new shuffle stage::

        {"stage_id", "n_tasks", "max_records", "median_records",
         "ratio", "total_records"}

    ``ratio`` = max/median over tasks that read any shuffle data —
    the planted-hot-key contract is ``ratio <= ~4`` after mitigation
    (AQE skew split, salting, or broadcast), vs ~10-30 unmitigated.
    Tasks reading zero shuffle records are excluded from the median so
    AQE's empty-partition coalescing cannot flatter the denominator.
    """
    before = set(_completed_stages(spark))
    action()
    stages = _completed_stages(spark)
    new = {k: v for k, v in stages.items() if k not in before}
    if not new:
        raise RuntimeError("action produced no completed stages")
    sid, att = max(new, key=lambda k: new[k].get("shuffleReadRecords", 0))
    if new[(sid, att)].get("shuffleReadRecords", 0) == 0:
        raise RuntimeError("no new stage read shuffle data")
    # page through the task list — a single capped fetch could drop the
    # hot reducer, silently understating the exact number this probe
    # exists to surface
    tasks: list[dict] = []
    while True:
        page = _get(
            f"{_api(spark)}/stages/{sid}/{att}/taskList"
            f"?offset={len(tasks)}&length={max_tasks}"
        )
        tasks.extend(page)
        if len(page) < max_tasks:
            break
    expected = new[(sid, att)].get("numCompleteTasks", 0)
    if len(tasks) < expected:
        raise RuntimeError(
            f"taskList truncated: fetched {len(tasks)} of {expected} "
            f"completed tasks for stage {sid}.{att}"
        )
    recs = [
        t["taskMetrics"]["shuffleReadMetrics"]["recordsRead"]
        for t in tasks
        if "taskMetrics" in t
    ]
    nonzero = [r for r in recs if r > 0]
    if not nonzero:
        raise RuntimeError(
            f"stage {sid}.{att} reports shuffleReadRecords > 0 but no "
            "fetched task carried shuffle-read metrics (metrics not yet "
            "flushed? re-run the action)"
        )
    med = statistics.median(nonzero)
    return {
        "stage_id": sid,
        "n_tasks": len(recs),
        "n_shuffle_tasks": len(nonzero),
        "max_records": max(nonzero),
        "median_records": med,
        "ratio": max(nonzero) / med if med else float("inf"),
        "total_records": sum(recs),
    }
