"""Empirical scaling probe: measure, don't claim.

Every 100 TB statement in this repo was design + plan-shape until this
script: it times the slowest bench queries on the base fixture AND on a
``factor``× self-authored inflation of it, and reports the wall-clock
ratio per query. For a data-linear (or n·log n) operator the ratio must
stay ≤ ~1.5 × factor; anything above is a superlinearity the plan
audit can't see (degenerate hot band keys, accidental all-pairs growth,
driver pulls scaling with the corpus).

Inflation is deterministic replication with PERTURBED ids/text/vectors
(same schema). Replica k of a document translates a 9-letter alphabet
slice through permutation k (distinct permutation per replica, identity
for k=0), so replicas are NOT near-duplicates of their originals — the
dedup surfaces keep their candidate densities instead of exploding with
planted cross-replica duplicates (which would measure output growth,
not engine scaling). Embedding replicas get per-(dim, k) deterministic
±25% scaling, events get offset ids/users. Untouched tables are
symlinked.

Usage: python scripts/scaling_probe.py [base_sf_dir] [factor] [reps]
Defaults: /root/testdata/sf0.1, 10, 2 (best-of-reps per point).
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from beis_orp_data_service_spark import declared  # noqa: E402
from beis_orp_data_service_spark.catalog import (  # noqa: E402
    TABLES,
    load_table,
    table_path,
)
from beis_orp_data_service_spark.session import get_spark  # noqa: E402

STRIDE = 10**12  # replica id offset: keeps % predicates per-replica-stable
INFLATED = ("documents", "embeddings", "events", "part")

# Coverage is DERIVED, not hand-listed (a hand-extended include list
# missed late-round additions twice in a row before this).
# Every registry query that has no measured row in the COMMITTED
# SCALING.md is force-included this run; previously measured rows are
# carried forward into the regenerated table (marked 'carried'), so
# "absent from SCALING.md" always means "never probed". After the
# merge the script FAILS LOUDLY (exit 2) if any gradeable registry
# query still lacks a row.
#
# part is inflated (perturbed p_name per replica) so er_pairs/
# er_clusters see real data growth: replicas land in NEW name-prefix
# blocks, the way a growing catalogue grows name diversity — block
# sizes stay bounded while block count scales, which is exactly the
# property the refined (brand, type, name_pfx) key + max_block guard
# claims.


# All-pairs-over-a-bounded-sample kernel demos: their OUTPUT is
# factor²-quadratic by construction (the declared query is a sampled
# sub-square exercising the similarity kernel itself; the scale path
# for the same semantics is the banded/LSH/ANN family, probed above).
# Graded against 1.5·factor² — a ratio past even that means the kernel
# itself degraded, not just the pair count.
QUADRATIC_BY_DESIGN = {"cos_sim"}


# carried rows older than this many probe runs are rotated back into
# the fresh set, oldest first — a carried measurement is coverage, not
# a regression guarantee, so it must not fossilize forever
MAX_CARRY_AGE = 3
ROTATE_CAP = 15  # bound per-run re-probe cost

# Growth attribution (r13 verdict ask #6): the probe records each
# fresh row's OUTPUT-rows ratio next to its wall ratio, separating
# engine behavior from result growth mechanically. A row whose wall
# ratio exceeds 2× its rows ratio (and isn't just fixed-overhead
# noise, wall ratio > 2) carries a NAMED cause from this dict — or
# renders UNATTRIBUTED, which the probe reports loudly. Causes are
# claims about the ENGINE-side work that grows with input while the
# output doesn't; name them from the plan, don't guess.
GROWTH_CAUSES = {
    "jaccard_prefix_join": "prefix-bucket candidate pairs grow with "
    "corpus (verify step output-filtered; candidates are the work)",
    "pretrain_corpus": "full pipeline rescans the inflated corpus at "
    "each stage; output is the fixed token-budget selection",
    "nb_lang_score": "vocabulary × class score matrix grows with "
    "distinct tokens while the output stays per-class",
    "er_clusters": "pointer-doubling rounds touch every edge per "
    "round; cluster OUTPUT is block-bounded",
    "emb_clusters_cells": "per-cell Gram work grows with vectors per "
    "cell; cluster assignments output one row per vector",
    "decontaminate_fuzzy": "LSH bucket explode + verify grows with "
    "corpus featurization; matches output stays probe-bounded",
    "minhash_lsh_pairs": "OR-amplified bucket join candidates grow "
    "with corpus; emitted pairs are threshold-filtered",
    "ngram_diversity": "distinct n-gram state grows near-linearly "
    "with fresh text while the report is one row",
    "tokenizer_sweep": "trainer rounds rescan the grown distinct-word "
    "vocab; the report is 12 rows at any scale",
    "containment_join": "prefix-filter candidates grow with corpus; "
    "containment survivors are data-dependent",
    "stream_dedup_ttl_e2e": "fixture-built stream; state and batch "
    "count are sf-independent by design",
    "dup_clusters": "pointer-doubling rounds touch every candidate "
    "edge per round; cluster rows are dup-bounded",
    "canonical_docs": "same pointer-doubling lineage as dup_clusters "
    "feeding the per-cluster argmax",
    "decontaminate": "n-gram overlap screen scans the grown corpus; "
    "flagged output is probe-bounded",
    "dedup_savings": "cluster closure work grows with corpus; the "
    "savings report is one row",
    "wordpiece_encode": "encode pass scans the grown corpus; the "
    "longest-match trie work is per-token",
    "seq_pack": "packing scans all grown documents; emitted sequences "
    "grow with token mass, rows≈docs/pack_len",
    "psi_drift": "one full scan + reference min/max pass over the "
    "grown events table; the PSI report stays n_bins rows per group "
    "(sub-second wall both sizes — scan growth, not plan growth)",
    "ann_recall_report": "the exact ground-truth top-k arms "
    "brute-force the grown vector table and the kmeans/IVF/PQ arms "
    "re-fit and re-assign over 10x vectors; the recall report is 6 "
    "rows at any scale",
}


def parse_measured_rows(
    path: str,
) -> dict[str, tuple[float, float, float, "float | None", int]]:
    """Query name -> (base_s, big_s, ratio, rows_ratio, age), for every
    measured row of the committed SCALING.md main table (rows whose
    2nd..4th cells parse as floats). ``rows_ratio`` is the output-rows
    growth column (None for rows measured before it existed — rendered
    as '—' and re-measured on rotation). ``age`` counts probe runs
    since the row was last measured (0 = fresh this run; rows from
    files predating the age column read as 1). Used to derive the
    never-probed set, to carry prior measurements into the regenerated
    file (verdicts are RE-derived from the numbers under the current
    grading rules, so a grading change never fossilizes a stale
    verdict string), and to rotate over-age carried rows back into the
    fresh set."""
    rows: dict[str, tuple[float, float, float, float | None, int]] = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            cells = [c.strip() for c in line.rstrip("\n").split("|")]
            # new: '| name | b | g | r | rows | age | verdict |' -> 9
            # old: '| name | b | g | r | age | verdict |'        -> 8
            if len(cells) < 6 or cells[1] in ("query", "---", ""):
                continue
            try:
                vals = float(cells[2]), float(cells[3]), float(cells[4])
            except ValueError:
                continue
            # registry-scoped: the simhash-diagnosis table's scale rows
            # (| 1× | ... |) also parse as floats — only real query
            # names count as measured coverage
            if cells[1] not in declared.REGISTRY:
                continue
            rows_ratio: float | None = None
            age_cell = 5
            if len(cells) >= 9:  # has the rows× column
                age_cell = 6
                try:
                    rows_ratio = float(cells[5])
                except ValueError:
                    rows_ratio = None
            try:
                age = int(cells[age_cell])
            except (ValueError, IndexError):
                age = 1  # pre-age-column file: measured one run ago
            rows[cells[1]] = (*vals, rows_ratio, age)
    return rows


def carried_sections(path: str, regenerated: set[str]) -> list[str]:
    """Every '## ...' section of the old SCALING.md whose title this
    script does NOT regenerate (hand-written round notes, the
    deep_probe.py 30x appendix) — preserved verbatim so a probe re-run
    never silently drops analysis that lives only in the file."""
    if not os.path.exists(path):
        return []
    keep: list[str] = []
    keeping = False
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("## "):
                keeping = line[3:].strip() not in regenerated
            if keeping:
                keep.append(line)
    return keep
ALPHA = "aeiounrst"  # ~50% of English letter mass — permuting it drops
#                      char-5-shingle Jaccard vs the original below any
#                      dedup threshold in the registry

# Queries whose fixtures are self-built and bounded by design (the
# ingest/SCD family builds ~60-doc streams regardless of sf) — their
# ratio is expected ~1 and is reported as sf-independent, not graded.
SF_INDEPENDENT = {"stream_ingest_e2e", "scd_changes", "scd_time_travel",
                  "scd_vacuum_history", "lsh_index_compact_probe",
                  "ingest_e2e", "stream_tumbling", "stream_session"}


def _perm(k: int) -> str:
    chars = list(ALPHA)
    random.Random(k).shuffle(chars)
    return "".join(chars)


def inflate(spark, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sp = table_path(src, t)
        if not os.path.exists(sp):
            continue
        dp = table_path(dst, t)
        if t not in INFLATED:
            if not os.path.exists(dp):
                os.symlink(sp, dp)
            continue
        if os.path.islink(dp):
            os.unlink(dp)  # table newly promoted to INFLATED: rebuild
        if os.path.exists(dp):
            continue  # reuse a previously built fixture
        base = load_table(spark, src, t)
        parts = []
        for k in range(factor):
            if t == "documents":
                text = (
                    F.col("text") if k == 0
                    else F.translate(F.col("text"), ALPHA, _perm(k))
                )
                parts.append(
                    base.select(
                        (F.col("doc_id") + k * STRIDE).alias("doc_id"),
                        text.alias("text"),
                        "lang",
                        "source",
                        F.length(text).cast("bigint").alias("n_chars"),
                    )
                )
            elif t == "embeddings":
                vec = (
                    F.col("embedding") if k == 0
                    else F.transform(
                        "embedding",
                        lambda x, i: (
                            x
                            * (
                                1.0
                                + (
                                    F.pmod(
                                        F.xxhash64(i * 1000 + F.lit(k)),
                                        F.lit(200),
                                    ).cast("double")
                                    - 100.0
                                )
                                / 400.0
                            )
                        ).cast("float"),
                    )
                )
                parts.append(
                    base.select(
                        (F.col("vec_id") + k * STRIDE).alias("vec_id"),
                        vec.alias("embedding"),
                        "label",
                    )
                )
            elif t == "part":
                # perturbed names: replicas form NEW name-prefix
                # linkage blocks instead of piling into existing ones
                name = (
                    F.col("p_name") if k == 0
                    else F.translate(F.col("p_name"), ALPHA, _perm(k))
                )
                parts.append(
                    base.select(
                        (F.col("p_partkey") + k * STRIDE).alias("p_partkey"),
                        name.alias("p_name"),
                        "p_brand",
                        "p_type",
                        "p_size",
                        "p_retailprice",
                    )
                )
            else:  # events
                parts.append(
                    base.select(
                        (F.col("event_id") + k * STRIDE).alias("event_id"),
                        "ts",
                        (F.col("user_id") + k * 10_000_000).alias("user_id"),
                        "event_type",
                        "value",
                        "props",
                    )
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dp)
        print(f"inflated {t}: {factor}x -> {dp}")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def simhash_bucket_stats(spark, sf_dir: str) -> dict:
    """Band-bucket occupancy for the simhash_pairs query (round-6 ask
    #4): is its 10× wall-ratio pair-OUTPUT growth (linear, fine) or a
    degenerate band bucket (quadratic-in-bucket, needs Manku
    block-splitting)? Candidate pairs = Σ n·(n−1)/2 over (band_idx,
    band_val) buckets — the join's actual work."""
    from beis_orp_data_service_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    fp = dd.simhash_table(docs, "doc_id", "text", n_bits=48)
    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"(simhash DIV {1 << (12 * i)}) % 4096"
                        ).alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_val")
    occ = bands.groupBy("band_idx", "band_val").count()
    s = occ.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_bucket"),
        F.sum(F.expr("count * (count - 1) DIV 2")).alias("cand_pairs"),
    ).first()
    n_out = declared.REGISTRY["simhash_pairs"].fn(spark, sf_dir).count()
    return {
        "n_docs": docs.count(),
        "n_buckets": s.n_buckets,
        "max_bucket": s.max_bucket,
        "p99_bucket": s.p99_bucket,
        "cand_pairs": int(s.cand_pairs),
        "out_pairs": n_out,
    }


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # optional trailing query names (the check_oracle convention):
    # force those rows into the FRESH set this run. An optimization
    # round rewrites an operator's scale shape without making it slow
    # enough to auto-select — without a force list its carried
    # pre-rewrite row would keep answering for code that no longer
    # exists (it aged into rotation only 3 probes later).
    forced = sys.argv[4:]
    unknown = [q for q in forced if q not in declared.REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    dst = f"/root/repo/.scale/x{factor}"

    with open("/root/repo/BENCH_LOCAL.json") as f:
        bench = json.load(f)
    by_cost = [
        k for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])
    ]
    # slowest-10 regardless of kind (round-5 scope), plus the next-10
    # most expensive DATA-SCALING queries (round-6 ask #5: skip the
    # sf-independent fixtures when widening — their ratio ~1 is a
    # design property, not a measurement)
    slowest = by_cost[:10] + [
        k for k in by_cost[10:] if k not in SF_INDEPENDENT
    ][:10]
    slowest += [q for q in forced if q not in slowest]
    # registry-diff coverage: anything never
    # measured in the committed SCALING.md runs this round, no hand list
    prior_rows = parse_measured_rows("/root/repo/SCALING.md")
    never_probed = sorted(
        k
        for k in declared.REGISTRY
        if k not in prior_rows and k not in slowest
    )
    if never_probed:
        print(f"never-probed (force-included): {never_probed}")
    slowest += never_probed
    # staleness rotation: carried rows past MAX_CARRY_AGE re-measure,
    # oldest first (capped) — without this a regression in an already-
    # probed operator would hide behind its carried row forever
    stale = sorted(
        (
            k
            for k in prior_rows
            if k not in slowest and prior_rows[k][4] + 1 > MAX_CARRY_AGE
        ),
        key=lambda k: (-prior_rows[k][4], k),
    )[:ROTATE_CAP]
    if stale:
        print(f"over-age carried rows (re-probed): {stale}")
    slowest += stale

    spark = get_spark("scaling-probe")
    inflate(spark, base, dst, factor)

    # warm once per size so footer/JVM costs don't land on query 1
    materialize(declared.q_search_flagship(spark, base))
    materialize(declared.q_search_flagship(spark, dst))

    rows = []
    for name in slowest:
        fn = declared.REGISTRY[name].fn
        t = {}
        n = {}
        for label, d in (("base", base), ("big", dst)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                materialize(fn(spark, d))
                best = min(best, time.time() - t0)
            t[label] = best
            # growth attribution: OUTPUT rows at each size, so wall
            # growth separates mechanically into engine work vs result
            # growth (one extra execution per size; probe is offline)
            n[label] = fn(spark, d).count()
        ratio = t["big"] / t["base"] if t["base"] > 0 else float("inf")
        rows_ratio = n["big"] / max(1, n["base"])
        rows.append((name, t["base"], t["big"], ratio, rows_ratio))
        print(
            f"{name}: {t['base']:.2f}s -> {t['big']:.2f}s  ratio "
            f"{ratio:.2f}  rows {n['base']} -> {n['big']} "
            f"({rows_ratio:.2f}x)"
        )

    lines = [
        "# SCALING — empirical wall-ratio probe",
        "",
        f"Base `{base}` vs self-authored **{factor}×** inflation "
        f"(`scripts/scaling_probe.py`, best-of-{reps} per point, "
        "`local[32]`). Inflation = deterministic replication with "
        "perturbed ids/text/vectors (replicas are NOT near-dups of "
        "their originals — see the script docstring), so ratios "
        "measure ENGINE scaling, not output growth.",
        "",
        f"Pass bar: ratio ≤ {1.5 * factor:.0f} (≈1.5× the data-growth "
        "factor, n·log n slack) for every query whose input actually "
        "inflates; self-built bounded fixtures are reported but not "
        "graded (their work is sf-independent by design).",
        "",
        "Rows measured in an earlier probe run carry forward verbatim "
        "(`age` = probe runs since measured; 0 = fresh this run) so "
        "this table always covers the FULL registry — 'no row' can "
        "only ever mean 'never probed', which the script itself fails "
        f"on (exit 2). Carried rows older than {MAX_CARRY_AGE} runs "
        f"rotate back into the fresh set ({ROTATE_CAP}/run, oldest "
        "first), so no measurement fossilizes.",
        "",
        "The `rows×` column is the OUTPUT-rows growth at the same "
        "inflation — the mechanical separation of engine behavior "
        "from result growth. A fresh row whose wall ratio is > 2 and "
        "> 2× its rows ratio must carry a named engine-side cause "
        "(GROWTH_CAUSES in the script); an UNATTRIBUTED such row "
        "counts as an outlier. '—' = measured before this column "
        "existed (re-measured on rotation).",
        "",
        "| query | base s | {f}× s | ratio | rows× | age | verdict |".format(
            f=factor
        ),
        "|---|---|---|---|---|---|---|",
    ]
    n_bad = 0

    def grade(name: str, ratio: float) -> tuple[str, bool]:
        if name in SF_INDEPENDENT:
            return "sf-independent fixture (not graded)", False
        if name in QUADRATIC_BY_DESIGN:
            if ratio <= 1.5 * factor * factor:
                return (
                    "OK (pair-quadratic by design: sampled all-pairs "
                    f"kernel demo, graded vs 1.5·{factor}²)"
                ), False
            return "**OUTLIER** — kernel itself degraded", True
        if ratio <= 1.5 * factor:
            return "OK", False
        return "**OUTLIER** — diagnose plan", True

    fresh_names = set()
    for name, tb, tg, ratio, rows_ratio in rows:
        fresh_names.add(name)
        verdict, bad = grade(name, ratio)
        # growth attribution: engine-side wall growth beyond output
        # growth needs a name (fixed-overhead rows, wall ratio ≤ 2,
        # are exempt — at probe scale they measure JVM floor, not
        # engine scaling)
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
        n_bad += bad
        lines.append(
            f"| {name} | {tb:.2f} | {tg:.2f} | {ratio:.2f} | "
            f"{rows_ratio:.2f} | 0 | {verdict} |"
        )
    for name in sorted(prior_rows):
        if name not in fresh_names:
            tb, tg, ratio, rows_ratio, age = prior_rows[name]
            verdict, bad = grade(name, ratio)
            n_bad += bad
            # carried rows keep their attribution requirement: the
            # measured rows ratio travels with them
            if (
                rows_ratio is not None
                and ratio > 2
                and ratio > 2 * rows_ratio
                and name not in SF_INDEPENDENT
            ):
                cause = GROWTH_CAUSES.get(name)
                if cause:
                    verdict += f" — wall>2×rows: {cause}"
                else:
                    verdict += " — **UNATTRIBUTED engine-side growth**"
                    n_bad += 1
            rr = f"{rows_ratio:.2f}" if rows_ratio is not None else "—"
            lines.append(
                f"| {name} | {tb:.2f} | {tg:.2f} | {ratio:.2f} | "
                f"{rr} | {age + 1} | {verdict} (carried) |"
            )
    # ---- simhash_pairs diagnosis (round-6 ask #4) ----
    sh_base = simhash_bucket_stats(spark, base)
    sh_big = simhash_bucket_stats(spark, dst)
    cand_ratio = sh_big["cand_pairs"] / max(1, sh_base["cand_pairs"])
    out_ratio = sh_big["out_pairs"] / max(1, sh_base["out_pairs"])
    bucket_ratio = sh_big["max_bucket"] / max(1, sh_base["max_bucket"])
    degenerate = bucket_ratio > 3 * factor  # superlinear occupancy
    lines += [
        "",
        "## simhash_pairs: bucket-occupancy diagnosis",
        "",
        "Its wall ratio tracks CANDIDATE-PAIR growth (the band join's "
        "Σ n·(n−1)/2 over (band_idx, band_val) buckets), so the "
        "question is whether that growth is pair-output-linear or a "
        "degenerate bucket going quadratic:",
        "",
        "| scale | docs | buckets | max bucket | p99 bucket | "
        "candidate pairs | output pairs |",
        "|---|---|---|---|---|---|---|",
        f"| 1× | {sh_base['n_docs']} | {sh_base['n_buckets']} | "
        f"{sh_base['max_bucket']} | {sh_base['p99_bucket']} | "
        f"{sh_base['cand_pairs']} | {sh_base['out_pairs']} |",
        f"| {factor}× | {sh_big['n_docs']} | {sh_big['n_buckets']} | "
        f"{sh_big['max_bucket']} | {sh_big['p99_bucket']} | "
        f"{sh_big['cand_pairs']} | {sh_big['out_pairs']} |",
        "",
        f"Candidate pairs grew {cand_ratio:.1f}×, output pairs "
        f"{out_ratio:.1f}×, max bucket {bucket_ratio:.1f}×. "
        + (
            "**Max-bucket occupancy is growing superlinearly — a "
            "degenerate 12-bit band value; apply the Manku block-split "
            "refinement or widen bands.**"
            if degenerate
            else "Bucket occupancy grows ~linearly with replication "
            "(the 12-bit band values stay spread); the wall-ratio is "
            "candidate/output-pair growth, i.e. the workload itself — "
            "not bucket degeneracy. No block-split refinement needed; "
            "at production scale the planted-hot-key probe "
            "(`scripts/skew_probe.py`) covers the degenerate-key "
            "incident this diagnosis rules out here."
        ),
        "",
        "## Planted-hot-key skew probe",
        "",
        "`scripts/skew_probe.py` (committed `SKEW_PROBE.json`, "
        "asserted by `tests/test_skew_probe.py`) manufactures the "
        "degenerate-band-key incident directly: one boilerplate text "
        "on 30% of 20k docs, probed through the lsh band join. "
        "Per-task shuffle-read records, max/median: naive join ~8.3× "
        "(the incident), AQE skew split ~2.6× over ≥5 tasks, "
        "replicated-salt join ~1.7×, broadcast 1.0 (no shuffle); "
        "groupBy(band_key).count() stays ~1.3× even naive — map-side "
        "partial aggregation already bounds decomposable aggs, and "
        "`skew.salted_aggregate` is result-identical where planned "
        "salting is still wanted.",
        "",
        f"Outliers: {n_bad}.",
        "",
        "Probe fixture lives under `.scale/` (git-ignored); rebuild by "
        "deleting it. Timings are machine-dependent — compare ratios, "
        "not absolute seconds.",
    ]
    # hand-written / appended sections (round notes, deep_probe 30x
    # appendix) survive the regeneration verbatim
    extra = carried_sections(
        "/root/repo/SCALING.md",
        regenerated={
            "simhash_pairs: bucket-occupancy diagnosis",
            "Planted-hot-key skew probe",
        },
    )
    if extra:
        lines += [""] + extra
    # the loud coverage gate: every registry query
    # must have a row — fresh or carried — in the file we just wrote
    covered = fresh_names | set(prior_rows)
    uncovered = sorted(k for k in declared.REGISTRY if k not in covered)
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    if uncovered:
        print(f"COVERAGE GAP — registry queries with no row: {uncovered}")
        print(f"wrote SCALING.md ({n_bad} outliers, {len(uncovered)} uncovered)")
        return 2
    print(f"wrote SCALING.md ({n_bad} outliers, full registry coverage)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
