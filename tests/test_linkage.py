"""Record linkage (operators/linkage.py): blocking semantics, field
similarities, threshold behavior, the degenerate-block guard, and
end-to-end entity clustering."""

from __future__ import annotations

import pytest

from beis_orp_data_service_spark.operators import corpus as corpus_ops
from beis_orp_data_service_spark.operators import linkage as lk

FIELDS = [("name", "edit", 0.5), ("kind", "exact", 0.3), ("size", "numeric", 0.2)]


def _frame(spark):
    # Two near-identical widgets (one-char typo) in block (A, tool),
    # one identical-name record in a DIFFERENT block, one unrelated.
    rows = [
        (1, "A", "tool", "red widget", "tool", 10),
        (2, "A", "tool", "red widgey", "tool", 10),  # 1-edit typo of 1
        (3, "B", "tool", "red widget", "tool", 10),  # same name, other block
        (4, "A", "tool", "blue gear", "tool", 99),
    ]
    return spark.createDataFrame(
        rows, "id bigint, brand string, cat string, name string, kind string, size int"
    )


def test_blocking_limits_pairs(spark):
    df = _frame(spark)
    got = {
        (r.a_id, r.b_id)
        for r in lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.9).collect()
    }
    # (1,3) identical records but different brand blocks: never compared.
    assert got == {(1, 2)}


def test_scores_and_threshold_monotone(spark):
    df = _frame(spark)
    lo = lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.0).collect()
    hi = {
        (r.a_id, r.b_id)
        for r in lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.9).collect()
    }
    by_pair = {(r.a_id, r.b_id): r.score_q for r in lo}
    # typo pair: edit sim 9/10, exact kind, exact size
    assert by_pair[(1, 2)] == round((0.5 * 0.9 + 0.3 + 0.2) * lk.SCALE)
    assert hi <= set(by_pair)
    assert all(by_pair[p] >= round(0.9 * lk.SCALE) for p in hi)


def test_exact_and_numeric_kinds(spark):
    df = spark.createDataFrame(
        [(1, "x", "a", 10), (2, "x", "b", 5)], "id bigint, blk string, k string, v int"
    )
    rows = lk.linkage_pairs(
        df, "id", ["blk"], [("k", "exact", 1.0)], 0.0
    ).collect()
    assert rows[0].score_q == 0  # differing exact field
    rows = lk.linkage_pairs(
        df, "id", ["blk"], [("v", "numeric", 1.0)], 0.0
    ).collect()
    assert rows[0].score_q == round(0.5 * lk.SCALE)  # 1 - |10-5|/10


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError, match="unknown field kind"):
        lk.linkage_pairs(
            _frame(spark), "id", ["brand"], [("name", "soundex", 1.0)], 0.5
        ).collect()


def test_max_block_guard(spark):
    df = _frame(spark)  # block A holds 3 rows
    with pytest.raises(ValueError, match="max_block"):
        lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.5, max_block=2)
    # at the boundary it runs
    assert (
        lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.5, max_block=3).count()
        >= 1
    )


def test_entity_clusters_transitive(spark):
    # a~b and b~c but a!~c directly (2 edits apart): transitive closure
    # still puts all three in one entity.
    rows = [
        (1, "A", "red widget"),
        (2, "A", "red widgey"),  # 1 edit from 1
        (3, "A", "rad widgey"),  # 1 edit from 2, 2 edits from 1
        (9, "A", "blue gear"),
    ]
    df = spark.createDataFrame(rows, "id bigint, blk string, name string")
    pairs = lk.linkage_pairs(df, "id", ["blk"], [("name", "edit", 1.0)], 0.9)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got
    labels = corpus_ops.dup_clusters(pairs, df.select("id"), id_col="id")
    by_id = {r.id: r.cluster_id for r in labels.collect()}
    assert by_id[1] == by_id[2] == by_id[3] == 1
    assert by_id[9] == 9


class TestSaltedRemediation:
    """The skew remediation for a degenerate block
    must produce EXACTLY the pair set of the plain blocked join."""

    def test_salted_equals_plain_pair_set(self, spark):
        # 60 rows across 3 blocks incl. one HOT block (40 rows of one
        # brand with near-identical names): enough within-block pairs
        # that a salting mistake (lost cell, double-counted cell) shows
        rows = []
        for i in range(40):  # hot block: one brand, 1-char name drift
            rows.append((i, "HOT", "tool", f"widget mk{i % 4}", "tool", 10))
        for i in range(40, 50):
            rows.append((i, "B", "tool", f"gear v{i}", "tool", i))
        for i in range(50, 60):
            rows.append((i, "C", "gadget", "thing", "gadget", 5))
        df = spark.createDataFrame(
            rows,
            "id bigint, brand string, cat string, name string, kind string, size int",
        ).repartition(7)
        plain = {
            (r.a_id, r.b_id, r.score_q)
            for r in lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.5).collect()
        }
        for n_salt in (1, 3, 8):
            salted = {
                (r.a_id, r.b_id, r.score_q)
                for r in lk.linkage_pairs_salted(
                    df, "id", ["brand"], FIELDS, 0.5, n_salt=n_salt
                ).collect()
            }
            assert salted == plain, f"n_salt={n_salt}"
        assert len(plain) > 100  # the hot block actually generated work

    def test_guard_raises_then_salted_handles(self, spark):
        """The incident flow: max_block raises on the hot block; the
        salted variant runs the same data without the guard tripping a
        single-reducer cell (pair set identical to plain-unguarded)."""
        rows = [(i, "HOT", "t", "same name", "t", 1) for i in range(30)]
        rows += [(100 + i, "OK", "t", f"n{i}", "t", i) for i in range(5)]
        df = spark.createDataFrame(
            rows,
            "id bigint, brand string, cat string, name string, kind string, size int",
        )
        with pytest.raises(ValueError, match="max_block"):
            lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.5, max_block=10)
        plain = {
            tuple(r)
            for r in lk.linkage_pairs(df, "id", ["brand"], FIELDS, 0.5).collect()
        }
        salted = {
            tuple(r)
            for r in lk.linkage_pairs_salted(
                df, "id", ["brand"], FIELDS, 0.5, n_salt=4
            ).collect()
        }
        assert salted == plain
        assert len(plain) == 30 * 29 // 2 + len(
            {t for t in plain if t[0] >= 100}
        )
