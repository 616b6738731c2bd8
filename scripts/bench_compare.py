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

Usage:
    python scripts/bench_compare.py OLD.json NEW.json

Prints one line per flagged/improved query, then a summary JSON line.
Exit 1 iff any query flags. Adjudicate a flag by re-measuring the query
alone on an idle host: ``python bench.py <query> [...]`` (subset mode),
then re-run this script with the re-measured number patched in or
simply record the subset output next to the flag.
"""

from __future__ import annotations

import json
import statistics
import sys

RATIO = 1.4
JITTER = 0.5


def compare(old: dict[str, float], new: dict[str, float]) -> dict:
    """Apply the policy to two {query: seconds} maps."""
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
    return {
        "n_common": len(common),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "median_ratio": round(statistics.median(finite), 3) if finite else None,
        "old_common_total": round(sum(old[q] for q in common), 1),
        "new_common_total": round(sum(new[q] for q in common), 1),
        "flagged": flagged,
        "improved": improved,
        "policy": f"flag iff new > {RATIO}*old + {JITTER}s (common set only)",
    }


def _queries(path: str) -> dict[str, float]:
    """Load a per-query map from a bench record. Accepts the full
    record (BENCH_LOCAL.json, 'queries' map) or the driver's wrapped
    summary (BENCH_rN.json: {'parsed': {...'slowest10'}}) — the latter
    only covers the 10 slowest queries, so it is a partial comparison
    and is marked as such on stderr; prefer the BENCH_LOCAL.json
    committed in each round's artifact snapshot (``git show
    <round-commit>:BENCH_LOCAL.json``)."""
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec:
        return rec["queries"]
    inner = rec.get("parsed", rec)
    if "queries" in inner:
        return inner["queries"]
    if "slowest10" in inner:
        print(
            f"note: {path} carries only slowest10 — partial comparison",
            file=sys.stderr,
        )
        return inner["slowest10"]
    raise SystemExit(f"{path}: no 'queries' map (not a bench record?)")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    result = compare(_queries(sys.argv[1]), _queries(sys.argv[2]))
    for q, d in sorted(result["flagged"].items()):
        print(f"FLAG {q}: {d['old']}s -> {d['new']}s ({d['ratio']}x)")
    for q, d in sorted(result["improved"].items()):
        print(f"ok   {q}: improved {d['old']}s -> {d['new']}s ({d['ratio']}x)")
    print(json.dumps(result))
    sys.exit(1 if result["flagged"] else 0)


if __name__ == "__main__":
    main()
