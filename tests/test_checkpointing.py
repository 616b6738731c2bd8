"""stage_checkpoint strategies: the iterative
operators expose checkpoint="local"|"reliable"|"persist"; results must
be identical across strategies (the strategy changes fault tolerance,
never semantics), and SPARK_GRAFT_AUDIT=1 must record pre-checkpoint
plan fragments (ask #1's full-lineage audit hook)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark import checkpointing as ck
from beis_orp_data_service_spark.operators import corpus as corpus_ops
from beis_orp_data_service_spark.operators import dedup as dd
from beis_orp_data_service_spark.operators import graph as g


@pytest.fixture()
def edges(spark):
    # chain 0-1-2-3-4 + triangle 10-11-12 + clique {20,21,22,23}
    rows = (
        [(i, i + 1) for i in range(4)]
        + [(10, 11), (11, 12), (10, 12)]
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    )
    return spark.createDataFrame(rows, "a bigint, b bigint")


def _directed(edges):
    return edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))


def test_kcore_equal_across_strategies(spark, edges):
    """k-core: local / reliable / persist-free paths agree exactly.
    (persist is excluded by design here: kcore's 3-refs-per-round shape
    needs a lineage-TRUNCATING boundary — documented in the docstring.)"""
    base = sorted(map(tuple, g.kcore(edges, k=2, rounds=3).collect()))
    rel = sorted(
        map(tuple, g.kcore(edges, k=2, rounds=3, checkpoint="reliable").collect())
    )
    assert base == rel
    assert base  # the clique + triangle survive k=2


def test_reachability_and_shortest_paths_equal_across_strategies(spark, edges):
    src = spark.createDataFrame([(0,)], "node bigint")
    de = _directed(edges)
    for fn, kw in ((g.reachability, {}), (g.shortest_paths, {})):
        e = de if fn is g.reachability else de.withColumn("w", F.lit(2))
        base = sorted(map(tuple, fn(e, src, max_hops=3).collect()))
        rel = sorted(
            map(tuple, fn(e, src, max_hops=3, checkpoint="reliable").collect())
        )
        per = sorted(
            map(tuple, fn(e, src, max_hops=3, checkpoint="persist").collect())
        )
        assert base == rel == per
        assert base


def test_dup_clusters_and_bpe_equal_across_strategies(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a_id bigint, b_id bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id bigint")
    base = sorted(map(tuple, corpus_ops.dup_clusters(pairs, nodes).collect()))
    rel = sorted(
        map(
            tuple,
            corpus_ops.dup_clusters(pairs, nodes, checkpoint="reliable").collect(),
        )
    )
    assert base == rel

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id bigint, text string",
    )
    b1 = sorted(map(tuple, corpus_ops.bpe_learn_merges(docs, n_merges=4).collect()))
    b2 = sorted(
        map(
            tuple,
            corpus_ops.bpe_learn_merges(
                docs, n_merges=4, checkpoint="reliable"
            ).collect(),
        )
    )
    assert b1 == b2 and len(b1) == 4


def test_containment_join_equal_across_strategies(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "completely different words here nothing shared at all"),
        ],
        "doc_id bigint, text string",
    )
    base = sorted(
        map(tuple, dd.containment_prefix_join(docs, "doc_id", "text").collect())
    )
    rel = sorted(
        map(
            tuple,
            dd.containment_prefix_join(
                docs, "doc_id", "text", checkpoint="reliable"
            ).collect(),
        )
    )
    assert base == rel
    assert any(a == 1 and b == 2 for a, b, _ in base)  # doc1 ⊂ doc2


def test_unknown_strategy_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown checkpoint strategy"):
        ck.stage_checkpoint(df, strategy="bogus")


def test_audit_mode_records_pre_checkpoint_fragments(spark, monkeypatch):
    """SPARK_GRAFT_AUDIT=1: every stage boundary appends its
    pre-checkpoint physical plan, so audit_plans.py can assert kernel
    counts over the FULL lineage (the round-5 blind spot)."""
    monkeypatch.setenv("SPARK_GRAFT_AUDIT", "1")
    ck.drain_audit_fragments()
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a bigint, b bigint")
    # driver_threshold=0 forces the DISTRIBUTED peel: the audit-fragment
    # contract is about the distributed lineage (the driver-local path
    # runs no stage boundaries to record).
    g.kcore(edges, k=1, rounds=2, driver_threshold=0).collect()
    frags = ck.drain_audit_fragments()
    labels = [l for l, _ in frags]
    assert "kcore:init" in labels and labels.count("kcore:round") == 2
    # fragments carry real plan text the audit can grep
    assert all(p and "Exchange" in p or "Scan" in p or "LocalTableScan" in p
               for _, p in frags)
    assert ck.drain_audit_fragments() == []  # drained
