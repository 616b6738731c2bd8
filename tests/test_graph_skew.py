"""Graph-as-DataFrames ops on domain fixtures (FIXTURES.md shapes) and
skew helpers; bucketed co-located join plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import graph as g
from beis_orp_data_service_spark.operators import skew


@pytest.fixture(scope="module")
def graph(spark):
    docs = spark.createDataFrame(
        [("d1", "Water quality"), ("d2", "Fishing rules"), ("d3", "Air rules")],
        "node_id string, title string",
    )
    legs = spark.createDataFrame(
        [("ukpga/2000/1", "Water Act"), ("ukpga/2001/2", "Fisheries Act")],
        "href string, leg_title string",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "publication", "d1", "hse", "ukpga/2000/1"),
            ("e2", "publication", "d2", "ea", "ukpga/2001/2"),
            ("e3", "publication", "d3", "ea", "ukpga/2001/2"),
        ],
        "edge_id string, rel_type string, issued string, issuedBy string, issuedFor string",
    )
    return docs, legs, edges


def test_traverse_both_directions(spark, graph):
    docs, legs, edges = graph
    # doc → legislation
    out = g.traverse(docs, edges, F.broadcast(legs).alias("l"), "node_id", "issued", "issuedFor", "href")
    got = {(r.node_id, r.leg_title) for r in out.collect()}
    assert got == {("d1", "Water Act"), ("d2", "Fisheries Act"), ("d3", "Fisheries Act")}
    # legislation → docs (reverse roles)
    back = g.traverse(legs, edges, docs, "href", "issuedFor", "issued", "node_id")
    assert back.count() == 3


def test_related_grouped_cap(spark, graph):
    _, _, edges = graph
    out = {r.issuedFor: (r.related, r.n_related)
           for r in g.related_grouped(edges, "issuedFor", "issued", cap=1).collect()}
    assert out["ukpga/2001/2"] == (["d2"], 2)  # capped at 1 of 2, sorted


def test_unpivot_pivot_roundtrip(spark):
    df = spark.createDataFrame([(1, "en", 5), (2, None, 7)], "id bigint, lang string, n bigint")
    eav = g.unpivot_eav(df, "id", ["lang", "n"])
    # null attrs dropped in EAV form (TypeDB has no null attributes)
    assert eav.filter("id = 2 AND attr = 'lang'").count() == 0
    wide = g.eav_pivot(eav, "id", ["lang", "n"])
    got = {r.id: (r.lang, r.n) for r in wide.collect()}
    assert got == {1: ("en", "5"), 2: (None, "7")}


def test_salted_aggregate_equals_direct(spark):
    df = spark.createDataFrame(
        [(k, i, float(i)) for k in ["hot"] * 50 + ["cold"] for i in range(3)],
        "key string, id bigint, v double",
    )
    direct = {
        r.key: (r.n, r.s)
        for r in df.groupBy("key").agg(F.count("v").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        r.key: (r.n, r.s)
        for r in skew.salted_aggregate(
            df, ["key"], {"n": ("count", "v"), "s": ("sum", "v")}, F.col("id"), 4
        ).collect()
    }
    assert salted == direct


def test_replicated_salt_join_equals_plain(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 100)], "k bigint, rid bigint"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k bigint, name string")
    plain = fact.join(dim, "k").groupBy("k", "name").count().collect()
    salted = (
        skew.replicated_salt_join(fact, dim, "k", F.col("rid"), 4)
        .groupBy("k", "name").count().collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # co-located join: two tables bucketed on the join key → the join
    # plan has no Exchange at all (the 100 TB co-location story).
    # Auto-broadcast is disabled so the plan shows the bucket-aligned
    # sort-merge join a big-big join would use.
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    from beis_orp_data_service_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(8, "o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestReachability:
    def test_min_hops_and_cycle_termination(self, spark):
        from pyspark.sql import functions as F
        from beis_orp_data_service_spark.operators import graph as g

        # 0->1->2->3 chain, a shortcut 0->2, and a cycle 3->1
        edges = spark.createDataFrame(
            [("0", "1"), ("1", "2"), ("2", "3"), ("0", "2"), ("3", "1")],
            "src string, dst string",
        )
        sources = spark.createDataFrame([("0",)], "node string")
        out = {r.node: r.hops for r in g.reachability(edges, sources, max_hops=10).collect()}
        # shortcut wins: node 2 is 1 hop, not 2; cycle doesn't loop
        assert out == {"0": 0, "1": 1, "2": 1, "3": 2}

    def test_max_hops_bounds_frontier(self, spark):
        from beis_orp_data_service_spark.operators import graph as g

        edges = spark.createDataFrame(
            [(str(i), str(i + 1)) for i in range(6)], "src string, dst string"
        )
        sources = spark.createDataFrame([("0",)], "node string")
        out = {r.node: r.hops for r in g.reachability(edges, sources, max_hops=2).collect()}
        assert out == {"0": 0, "1": 1, "2": 2}

    def test_multiple_sources_union(self, spark):
        from beis_orp_data_service_spark.operators import graph as g

        edges = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("x", "y")], "src string, dst string"
        )
        sources = spark.createDataFrame([("a",), ("b",)], "node string")
        out = {r.node: r.hops for r in g.reachability(edges, sources).collect()}
        assert out == {"a": 0, "b": 0, "x": 1, "y": 2}


def test_pagerank_integer_exact_known_values(spark):
    """Chain a->b->c, 3 iterations: hand-computed scaled-integer ranks
    (dangling c's mass deterministically dropped)."""
    from beis_orp_data_service_spark.operators import graph as g

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    got = {r.node: r.pr_micro for r in g.pagerank(edges, nodes, iterations=3).collect()}
    # it1: b=150000+850000=1000000, c=1000000, a=150000
    # it2: b=150000+850*150000//1000=277500, c=1000000
    # it3: b=277500, c=150000+850*277500//1000=385875
    assert got == {"a": 150_000, "b": 277_500, "c": 385_875}


def test_pagerank_sink_accumulates_most_mass(spark):
    # star into one hub: the hub must outrank every spoke
    from beis_orp_data_service_spark.operators import graph as g

    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(10)], "src string, dst string"
    )
    nodes = spark.createDataFrame(
        [(f"s{i}",) for i in range(10)] + [("hub",)], "node string"
    )
    got = {r.node: r.pr_micro for r in g.pagerank(edges, nodes, iterations=2).collect()}
    assert all(got["hub"] > got[f"s{i}"] for i in range(10))


def test_pagerank_init_seeding_continues_iteration(spark):
    # running 1 iteration twice (seeding the second from the first's
    # output) must equal 2 straight iterations — the recurrence is
    # Markovian, which is what makes external convergence loops valid
    from beis_orp_data_service_spark.operators import graph as g

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    two = {r.node: r.pr_micro for r in g.pagerank(edges, nodes, iterations=2).collect()}
    one = g.pagerank(edges, nodes, iterations=1)
    resumed = {
        r.node: r.pr_micro
        for r in g.pagerank(edges, nodes, iterations=1, init=one).collect()
    }
    assert resumed == two


def test_personalized_pagerank_mass_stays_near_sources(spark):
    """PPR from {a}: nodes reachable from a get rank; an isolated
    component gets exactly zero (no teleport mass lands there)."""
    from beis_orp_data_service_spark.operators import graph as g

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in "abcxy"], "node string"
    )
    sources = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.pr_micro
        for r in g.pagerank(edges, nodes, iterations=3, sources=sources).collect()
    }
    assert got["a"] == 150_000          # teleport mass only at the source
    assert got["b"] > 0 and got["c"] > 0
    assert got["x"] == 0 and got["y"] == 0  # unreachable component: zero
    assert got["b"] > got["c"]          # closer to the source ranks higher


class TestTriangles:
    def _tri(self, spark, pairs):
        from beis_orp_data_service_spark.operators.graph import triangle_counts

        edges = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in pairs], "a bigint, b bigint"
        ).distinct()
        return {
            r.node: r.n_triangles for r in triangle_counts(edges).collect()
        }

    def test_single_triangle(self, spark):
        assert self._tri(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}

    def test_k4_every_node_in_three(self, spark):
        # K4 has 4 triangles; each node participates in C(3,2)=3
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_path_has_no_triangles(self, spark):
        assert self._tri(spark, [(1, 2), (2, 3), (3, 4)]) == {}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools

        # deterministic pseudo-random graph (no RNG: hash arithmetic)
        nodes = list(range(30))
        pairs = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if (a * 48271 + b * 11) % 7 < 2
        ]
        adj = {n: set() for n in nodes}
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for n in (a, b, c):
                    want[n] = want.get(n, 0) + 1
        assert self._tri(spark, pairs) == want

    def test_sequential_edges_linear_and_normalized(self, spark):
        from beis_orp_data_service_spark.operators.graph import sequential_edges

        events = spark.createDataFrame(
            [(i, "t", [5, 9, 5, 7, 9][i]) for i in range(5)],
            "event_id bigint, event_type string, user_id bigint",
        )
        got = {
            (r.a, r.b)
            for r in sequential_edges(
                events, "event_type", ["event_id"], "user_id"
            ).collect()
        }
        # consecutive actors: (5,9),(9,5),(5,7),(7,9) -> normalized distinct
        assert got == {(5, 9), (5, 7), (7, 9)}

    def test_no_cartesian_in_plan(self, spark):
        from beis_orp_data_service_spark.operators.graph import (
            sequential_edges,
            triangle_counts,
        )
        from beis_orp_data_service_spark.catalog import load_table
        from tests.conftest import SF_SMOKE

        events = load_table(spark, SF_SMOKE, "events")
        edges = sequential_edges(events, "event_type", ["event_id"], "user_id")
        plan = (
            # driver_threshold=0 pins the DISTRIBUTED wedge-join plan —
            # the adaptive driver path is a LocalTableScan and would
            # pass vacuously
            triangle_counts(edges, driver_threshold=0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_driver_path_matches_distributed(self, spark):
        """r14 adaptive twin: the driver-local orientation+wedge scan
        must emit EXACTLY the distributed plan's rows."""
        import itertools

        from beis_orp_data_service_spark.operators.graph import triangle_counts

        pairs = [
            (a, b)
            for a, b in itertools.combinations(range(30), 2)
            if (a * 48271 + b * 11) % 7 < 2
        ]
        edges = spark.createDataFrame(pairs, "a bigint, b bigint").distinct()
        drv = sorted(map(tuple, triangle_counts(edges).collect()))
        dist = sorted(
            map(tuple, triangle_counts(edges, driver_threshold=0).collect())
        )
        assert drv == dist


class TestLabelPropagation:
    def _lp(self, spark, pairs, iters=3):
        from beis_orp_data_service_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in pairs], "a bigint, b bigint"
        ).distinct()
        nodes = spark.createDataFrame(
            [(n,) for n in {x for p in pairs for x in p}], "node bigint"
        )
        return {
            r.node: r.label
            for r in label_propagation(edges, nodes, iterations=iters).collect()
        }

    def _py_lp(self, pairs, iters=3):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        labels = {n: n for n in adj}
        for _ in range(iters):
            nxt = {}
            for n in adj:
                cnt = {}
                for m in adj[n]:
                    cnt[labels[m]] = cnt.get(labels[m], 0) + 1
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[n] = best[0]
            labels = nxt
        return labels

    def test_two_cliques_with_bridge(self, spark):
        import itertools

        c1 = list(itertools.combinations([1, 2, 3, 4], 2))
        c2 = list(itertools.combinations([10, 11, 12, 13], 2))
        pairs = c1 + c2 + [(4, 10)]
        got = self._lp(spark, pairs)
        # each clique converges to its minimum id
        assert all(got[n] == 1 for n in (1, 2, 3))
        assert all(got[n] == 10 for n in (11, 12, 13))

    def test_matches_pure_python_sync_rounds(self, spark):
        pairs = [
            (a, b)
            for a in range(25)
            for b in range(a + 1, 25)
            if (a * 31 + b * 7) % 5 == 0
        ]
        for iters in (1, 2, 3):
            assert self._lp(spark, pairs, iters) == self._py_lp(pairs, iters)

    def test_isolated_node_keeps_own_label(self, spark):
        from beis_orp_data_service_spark.operators.graph import label_propagation

        edges = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
        nodes = spark.createDataFrame([(1,), (2,), (99,)], "node bigint")
        got = {
            r.node: r.label
            for r in label_propagation(edges, nodes, iterations=2).collect()
        }
        assert got[99] == 99

    def test_driver_path_matches_distributed(self, spark):
        """r14 adaptive twin: the driver-local LPA (default threshold)
        must emit EXACTLY the distributed loop's rows
        (driver_threshold=0 forces the old path) — same graph, every
        iteration count, isolated node included."""
        from beis_orp_data_service_spark.operators.graph import label_propagation

        pairs = [
            (a, b)
            for a in range(30)
            for b in range(a + 1, 30)
            if (a * 13 + b * 17) % 7 == 0
        ]
        edges = spark.createDataFrame(pairs, "a bigint, b bigint").distinct()
        nodes = spark.createDataFrame(
            [(n,) for n in {x for p in pairs for x in p} | {999}],
            "node bigint",
        )
        for iters in (1, 2, 3):
            drv = label_propagation(edges, nodes, iterations=iters)
            dist = label_propagation(
                edges, nodes, iterations=iters, driver_threshold=0
            )
            assert sorted(map(tuple, drv.collect())) == sorted(
                map(tuple, dist.collect())
            )
            assert [f.dataType for f in drv.schema.fields] == [
                f.dataType for f in dist.schema.fields
            ]


class TestKCore:
    def test_clique_survives_chain_dies(self, spark):
        from beis_orp_data_service_spark.operators import graph as g

        # K4 clique (each deg 3) + a chain hanging off it
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 5), (5, 6), (6, 7)]
        df = spark.createDataFrame(edges, "a long, b long")
        out = {r["node"]: r["degree"] for r in g.kcore(df, k=3, rounds=6).collect()}
        assert set(out) == {1, 2, 3, 4}
        assert all(d == 3 for d in out.values())

    def test_extra_rounds_are_noops_after_convergence(self, spark):
        from beis_orp_data_service_spark.operators import graph as g

        edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
        df = spark.createDataFrame(edges, "a long, b long")
        a = sorted(map(tuple, g.kcore(df, k=2, rounds=3).collect()))
        b = sorted(map(tuple, g.kcore(df, k=2, rounds=8).collect()))
        assert a == b
        assert {n for n, _ in a} == {1, 2, 3}  # triangle is the 2-core

    def test_deep_peel_needs_rounds(self, spark):
        from beis_orp_data_service_spark.operators import graph as g

        # path graph: 1-core is everything, 2-core empty but only after
        # peeling inward from both ends (depth ~ n/2)
        edges = [(i, i + 1) for i in range(1, 9)]
        df = spark.createDataFrame(edges, "a long, b long")
        assert g.kcore(df, k=2, rounds=6).collect() == []
        partial = g.kcore(df, k=2, rounds=1).collect()
        assert len(partial) > 0  # one round hasn't finished peeling

    def test_bad_params(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import graph as g

        df = spark.createDataFrame([(1, 2)], "a long, b long")
        with pytest.raises(ValueError, match="k must"):
            g.kcore(df, k=0)
        with pytest.raises(ValueError, match="rounds"):
            g.kcore(df, k=2, rounds=0)

    def test_driver_path_matches_distributed(self, spark):
        """r14 adaptive twin: driver-local peel (default threshold)
        must emit EXACTLY the distributed loop's rows
        (driver_threshold=0) — clique+chain and deep-peel path shapes,
        several (k, rounds) points including the empty-core case."""
        from beis_orp_data_service_spark.operators import graph as g

        shapes = [
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7)],
            [(i, i + 1) for i in range(1, 9)],
        ]
        for pairs in shapes:
            df = spark.createDataFrame(pairs, "a long, b long")
            for k, rounds in ((2, 1), (2, 6), (3, 4)):
                drv = sorted(
                    map(tuple, g.kcore(df, k=k, rounds=rounds).collect())
                )
                dist = sorted(
                    map(
                        tuple,
                        g.kcore(
                            df, k=k, rounds=rounds, driver_threshold=0
                        ).collect(),
                    )
                )
                assert drv == dist
