"""Mechanical bench-regression policy — per-query ratios on the COMMON
set, never totals.

A query REGRESSES iff

    new > RATIO * old + JITTER          (RATIO = 1.4, JITTER = 0.5 s)

The additive allowance IS the minimum-duration floor: sub-second
queries routinely show 1.4-1.9x swings that are pure host jitter (three
were flagged across two prior benchmark snapshots with provably zero
code change — ``git log -S`` empty), while the 0.5 s term is noise on
any query slow enough for a real regression to matter. A genuine 2x
slowdown of a multi-second query still trips the line: 10 s -> 21 s
fails 1.4*10+0.5. Queries only in one file are reported (new/removed)
but never flag.

Also reported, informationally: the common-set median ratio (the
round-over-round health number; ~1.0 ± 0.15 is the documented idle-host
band), totals, and improvements beyond the same band.

Self-adjudication (records produced by bench.py carrying ``spread`` /
``load_start``): a flag whose NEW-record rep MIN clears the policy line
(``min_new <= RATIO*old + JITTER``) is moved to ``auto_adjudicated`` —
the plan itself ran fast in at least one rep, so the median inflation is
in-run contention, not a regression. Flags that survive are annotated
with ``loaded_host`` when either record's start 1-min load exceeds
LOAD_LINE (the r11-r13 contamination signature), so a consumer can see
the evidence without a re-measure. Exit status counts only surviving
flags.

Usage:
    python scripts/bench_compare.py OLD.json NEW.json

Prints one line per flagged/adjudicated/improved query, then a summary
JSON line. Exit 1 iff any query flags after auto-adjudication.
Adjudicate a surviving flag by re-measuring the query alone on an idle
host: ``python bench.py <query> [...]`` (subset mode), then record the
subset output next to the flag.
"""

from __future__ import annotations

import json
import statistics
import sys

RATIO = 1.4
JITTER = 0.5
# 1-min load at bench start above this = loaded-host record (pinned from
# the r13 verdict; the bench host is otherwise idle when the suite runs)
LOAD_LINE = 1.5


def compare(
    old: dict[str, float],
    new: dict[str, float],
    old_rec: dict | None = None,
    new_rec: dict | None = None,
) -> dict:
    """Apply the policy to two {query: seconds} maps. When the full
    bench records are supplied, flags self-adjudicate from the
    rep-spread and loaded-host evidence bench.py embeds."""
    common = sorted(set(old) & set(new))
    # old[q] == 0 would give ratio=inf, which serializes as bare
    # Infinity (invalid JSON); null the ratio instead — the flag
    # decision below (new > RATIO*0 + JITTER) already covers zero-old.
    ratios = {q: (new[q] / old[q] if old[q] > 0 else None) for q in common}
    finite = [r for r in ratios.values() if r is not None]

    def _entry(q: str) -> dict:
        r = ratios[q]
        return {"old": old[q], "new": new[q], "ratio": round(r, 3) if r is not None else None}

    flagged = {
        q: _entry(q) for q in common if new[q] > RATIO * old[q] + JITTER
    }
    improved = {
        q: _entry(q) for q in common if old[q] > RATIO * new[q] + JITTER
    }

    # --- self-adjudication from record-embedded evidence ---
    def _start_load(rec: dict | None) -> float | None:
        ls = (rec or {}).get("load_start")
        return ls[0] if isinstance(ls, list) and ls else None

    loaded_host = {
        side: lv
        for side, lv in (("old", _start_load(old_rec)), ("new", _start_load(new_rec)))
        if lv is not None and lv > LOAD_LINE
    }
    new_spread = (new_rec or {}).get("spread") or {}
    auto_adjudicated: dict[str, dict] = {}
    for q in list(flagged):
        sp = new_spread.get(q)
        if sp and sp[0] <= RATIO * old[q] + JITTER:
            e = flagged.pop(q)
            e["new_rep_min"] = sp[0]
            e["basis"] = "new-record rep min clears the policy line (in-run contention)"
            auto_adjudicated[q] = e
    for q, e in flagged.items():
        if loaded_host:
            e["loaded_host"] = loaded_host  # contaminated-record evidence

    return {
        "n_common": len(common),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "median_ratio": round(statistics.median(finite), 3) if finite else None,
        "old_common_total": round(sum(old[q] for q in common), 1),
        "new_common_total": round(sum(new[q] for q in common), 1),
        "flagged": flagged,
        "auto_adjudicated": auto_adjudicated,
        "loaded_host": loaded_host or None,
        "improved": improved,
        "policy": (
            f"flag iff new > {RATIO}*old + {JITTER}s (common set only); "
            f"auto-adjudicate iff new rep min clears the line; "
            f"loaded-host iff start 1-min load > {LOAD_LINE}"
        ),
    }


def _record(path: str) -> dict:
    """Load a bench record, normalized so 'queries' holds the per-query
    map. Accepts the full record (BENCH_LOCAL.json) or the driver's
    wrapped summary (BENCH_rN.json: {'parsed': {...'slowest10'}}) — the
    latter only covers the 10 slowest queries, so it is a partial
    comparison and is marked as such on stderr; prefer the
    BENCH_LOCAL.json committed in each round's artifact snapshot
    (``git show <round-commit>:BENCH_LOCAL.json``)."""
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec:
        return rec
    inner = rec.get("parsed", rec)
    if isinstance(inner, dict) and "queries" in inner:
        return inner
    if isinstance(inner, dict) and "slowest10" in inner:
        print(
            f"note: {path} carries only slowest10 — partial comparison",
            file=sys.stderr,
        )
        return {**inner, "queries": inner["slowest10"]}
    raise SystemExit(f"{path}: no 'queries' map (not a bench record?)")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old_rec, new_rec = _record(sys.argv[1]), _record(sys.argv[2])
    result = compare(
        old_rec["queries"], new_rec["queries"], old_rec=old_rec, new_rec=new_rec
    )
    for q, d in sorted(result["flagged"].items()):
        loaded = " [loaded-host record]" if d.get("loaded_host") else ""
        print(f"FLAG {q}: {d['old']}s -> {d['new']}s ({d['ratio']}x){loaded}")
    for q, d in sorted(result["auto_adjudicated"].items()):
        print(
            f"adj  {q}: {d['old']}s -> {d['new']}s median, rep min "
            f"{d['new_rep_min']}s clears the line (in-run contention)"
        )
    for q, d in sorted(result["improved"].items()):
        print(f"ok   {q}: improved {d['old']}s -> {d['new']}s ({d['ratio']}x)")
    print(json.dumps(result))
    sys.exit(1 if result["flagged"] else 0)


if __name__ == "__main__":
    main()
