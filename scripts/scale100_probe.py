"""100× scaling tier for the wall-heaviest queries (r13 verdict #3).

The standard probe (``scaling_probe.py``) grades every registry query
at 10× inflation; a 100 TB claim for the SIMILARITY-JOIN family
deserves two decades of evidence, so this probe re-measures the ten
wall-heaviest queries — the r13 verdict's named list — at **100×**
inflation of sf0.01 (≈ sf1 volume: 50k documents / 50k embedding rows
/ 1M events — the same BIG size the 10× tier reaches from sf0.1, but
spanning two decades of growth from its base, which is what a scaling
claim needs: the ratio across 100× is the evidence, not the absolute
volume), using the same deterministic perturbed-replica inflation
(replicas are
NOT near-dups; see scaling_probe.py docstring), and writes/updates a
``## 100× tier`` section in SCALING.md. The regular probe's
regeneration preserves that section verbatim (``carried_sections``).

Grading: wall ratio ≤ 1.5 × 100 for data-scaling queries (same
n·log n slack rule as the 10× tier); sf-independent fixtures are
reported, not graded. The output-rows ratio rides next to the wall
ratio with the same attribution rule as the 10× table.

Usage: python scripts/scale100_probe.py [base_sf_dir] [reps]
Defaults: /root/testdata/sf0.01, 1 (run it ALONE on an idle host).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from beis_orp_data_service_spark import declared  # noqa: E402
from beis_orp_data_service_spark.session import get_spark  # noqa: E402
from scaling_probe import (  # noqa: E402
    GROWTH_CAUSES,
    SF_INDEPENDENT,
    inflate,
    materialize,
)

FACTOR = 100

# the r13 verdict's named heavy-10 (wall-heaviest at sf0.1)
HEAVY = [
    "decontaminate_fuzzy",
    "minhash_lsh_pairs",
    "emb_clusters_cells",
    "containment_join",
    "er_clusters",
    "pretrain_corpus",
    "jaccard_prefix_join",
    "ngram_diversity",
    "tokenizer_sweep",
    "stream_dedup_ttl_e2e",
]

SECTION = "100× tier (wall-heaviest queries)"


def replace_section(path: str, title: str, body: list[str]) -> None:
    """Insert-or-replace one '## title' section, leaving every other
    line of the file untouched."""
    lines: list[str] = []
    if os.path.exists(path):
        with open(path) as f:
            old = f.read().splitlines()
        skipping = False
        for line in old:
            if line.startswith("## "):
                skipping = line[3:].strip() == title
            if not skipping:
                lines.append(line)
    while lines and not lines[-1].strip():
        lines.pop()
    lines += ["", f"## {title}", ""] + body
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dst = f"/root/repo/.scale/x{FACTOR}"

    try:
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
    except OSError:
        load = "?"

    spark = get_spark("scale100-probe")
    inflate(spark, base, dst, FACTOR)

    materialize(declared.q_search_flagship(spark, base))
    materialize(declared.q_search_flagship(spark, dst))

    rows = []
    for name in HEAVY:
        fn = declared.REGISTRY[name].fn
        t, n = {}, {}
        for label, d in (("base", base), ("big", dst)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                materialize(fn(spark, d))
                best = min(best, time.time() - t0)
            t[label] = best
            n[label] = fn(spark, d).count()
        ratio = t["big"] / t["base"] if t["base"] > 0 else float("inf")
        rows_ratio = n["big"] / max(1, n["base"])
        rows.append((name, t["base"], t["big"], ratio, rows_ratio))
        print(
            f"{name}: {t['base']:.2f}s -> {t['big']:.2f}s  ratio "
            f"{ratio:.2f}  rows {n['base']} -> {n['big']} "
            f"({rows_ratio:.2f}x)"
        )

    n_bad = 0
    body = [
        f"The ten wall-heaviest queries re-probed at **{FACTOR}×** "
        f"inflation of `{base}` (≈ sf1 volume) — two decades of "
        "evidence for the similarity-join family specifically "
        f"(`scripts/scale100_probe.py`, best-of-{reps}, start 1-min "
        f"load {load}). Bar: ratio ≤ {1.5 * FACTOR:.0f} for "
        "data-scaling queries; the rows× column and attribution rule "
        "match the 10× table.",
        "",
        f"| query | base s | {FACTOR}× s | ratio | rows× | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for name, tb, tg, ratio, rows_ratio in rows:
        if name in SF_INDEPENDENT:
            verdict = "sf-independent fixture (not graded)"
        elif ratio <= 1.5 * FACTOR:
            verdict = "OK"
        else:
            verdict = "**OUTLIER** — diagnose plan"
            n_bad += 1
        if (
            ratio > 2
            and ratio > 2 * rows_ratio
            and name not in SF_INDEPENDENT
        ):
            cause = GROWTH_CAUSES.get(name)
            if cause:
                verdict += f" — wall>2×rows: {cause}"
            else:
                verdict += " — **UNATTRIBUTED engine-side growth**"
                n_bad += 1
        body.append(
            f"| {name} | {tb:.2f} | {tg:.2f} | {ratio:.2f} | "
            f"{rows_ratio:.2f} | {verdict} |"
        )

    replace_section("/root/repo/SCALING.md", SECTION, body)
    print(f"updated SCALING.md section '{SECTION}' ({n_bad} outliers)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
