"""The scalable exact-rank / distributed-ntile helper (VERDICT r8 #2):
the two-pass replacement for the unpartitioned-window class must equal
the window spelling bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import ranks


class TestExactGlobalRanks:
    def test_matches_global_row_number(self, spark):
        df = spark.createDataFrame(
            [((i * 7919) % 500, i) for i in range(1000)], "v long, id long"
        ).repartition(16)
        got, n = ranks.exact_global_ranks(
            df, [F.col("v").desc(), F.col("id")], n_parts=7
        )
        assert n == 1000
        want = df.withColumn(
            "_grank",
            F.row_number()
            .over(Window.orderBy(F.col("v").desc(), F.col("id")))
            .cast("bigint"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_partition_count_invariant(self, spark):
        df = spark.createDataFrame(
            [((i * 31) % 97, i) for i in range(300)], "v long, id long"
        )
        a, _ = ranks.exact_global_ranks(df, [F.col("v"), F.col("id")], n_parts=3)
        b, _ = ranks.exact_global_ranks(df, [F.col("v"), F.col("id")], n_parts=11)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_fewer_rows_than_partitions(self, spark):
        df = spark.createDataFrame([(3, 1), (1, 2), (2, 3)], "v long, id long")
        got, n = ranks.exact_global_ranks(df, [F.col("v"), F.col("id")], n_parts=8)
        assert n == 3
        assert {(r.v, r._grank) for r in got.collect()} == {
            (1, 1), (2, 2), (3, 3),
        }


class TestNtileFromRank:
    def test_matches_sql_ntile_all_shapes(self, spark):
        # N x n grid covering rem==0, rem>0, N<n, N==n
        for n_rows, n_tiles in [(10, 5), (11, 5), (13, 4), (3, 7), (5, 5), (1, 3)]:
            df = spark.createDataFrame(
                [(i,) for i in range(1, n_rows + 1)], "r long"
            )
            got = {
                row.r: row.t
                for row in df.select(
                    "r",
                    ranks.ntile_from_rank(F.col("r"), n_rows, n_tiles).alias("t"),
                ).collect()
            }
            want = {
                row.r: row.t
                for row in df.select(
                    "r",
                    F.ntile(n_tiles)
                    .over(Window.orderBy("r"))
                    .cast("bigint")
                    .alias("t"),
                ).collect()
            }
            assert got == want, f"N={n_rows} n={n_tiles}"


class TestPrefixSums:
    def test_matches_window_running_sum(self, spark):
        df = spark.createDataFrame(
            [((i * 53) % 211, i % 3, (i % 5) + 1) for i in range(400)],
            "v long, a long, b long",
        ).repartition(8)
        # total order: v is not unique here, so dedupe to a grid first
        grid = df.groupBy("v").agg(
            F.sum("a").alias("a"), F.sum("b").alias("b")
        )
        got = sorted(
            map(
                tuple,
                ranks.prefix_sums(grid, [F.col("v")], ["a", "b"], n_parts=5)
                .select("v", "a_cum", "b_cum")
                .collect(),
            )
        )
        w = (
            Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = sorted(
            map(
                tuple,
                grid.select(
                    "v",
                    F.sum("a").over(w).cast("bigint").alias("a_cum"),
                    F.sum("b").over(w).cast("bigint").alias("b_cum"),
                ).collect(),
            )
        )
        assert got == want

    def test_ks_and_mw_two_pass_equal_window(self, spark):
        """The wired consumers: ks_statistic / mannwhitney_u
        method='two_pass' must equal the window spelling exactly."""
        from beis_orp_data_service_spark.operators import analytics as an

        df = spark.createDataFrame(
            [("a" if i % 3 else "b", (i * 17) % 40) for i in range(500)],
            "grp string, v long",
        ).repartition(8)
        for fn in (an.ks_statistic, an.mannwhitney_u):
            a = fn(df, "grp", "v", "v", "a", "b", method="window").collect()
            b = fn(df, "grp", "v", "v", "a", "b", method="two_pass").collect()
            assert list(map(tuple, a)) == list(map(tuple, b))


class TestDistributedNtile:
    def test_matches_window_ntile(self, spark):
        df = spark.createDataFrame(
            [((i * 137) % 61, i) for i in range(523)], "v long, id long"
        ).repartition(9)
        got = sorted(
            map(
                tuple,
                ranks.distributed_ntile(
                    df, [F.col("v").desc(), F.col("id")], 5, "tile", n_parts=6
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                df.select(
                    "v",
                    "id",
                    F.ntile(5)
                    .over(Window.orderBy(F.col("v").desc(), F.col("id")))
                    .cast("bigint")
                    .alias("tile"),
                ).collect(),
            )
        )
        assert got == want

    def test_no_unpartitioned_window_in_plan(self, spark):
        """The whole point: the plan must contain no Window with an
        empty partition spec (every Window here is keyed by the range
        partition id)."""
        df = spark.createDataFrame([(i, i) for i in range(100)], "v long, id long")
        out = ranks.distributed_ntile(df, [F.col("v"), F.col("id")], 5, "t")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Spark prints unpartitioned windows as 'Window [...], [order...]'
        # with no partition list; partitioned ones carry the partition
        # spec after the ordering. Cheap + robust proxy: the single-
        # partition exchange that an empty spec forces must be absent.
        assert "SinglePartition" not in plan
