"""Supervised training (operators/learn.py): logistic-regression GD.

Round-7 verdict ask #1 — the module shipped dead in the round-7
snapshot; these tests plus the `logreg_train` declared query (oracle =
logreg_oracle_sql's unrolled CTE chain, hash-grade at sf0.01) wire it
live. Key property under test: the whole trajectory is bit-reproducible
on any partitioning because per-row gradient terms are nano-quantized
BEFORE the sum.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import learn


def _feats(spark, n=200):
    # deterministic, learnable-ish synthetic set: y correlates with x1
    return spark.range(n).select(
        F.lit(1.0).alias("f0"),
        ((F.col("id") % 13).cast("double") / 13.0).alias("f1"),
        ((F.col("id") % 7).cast("double") / 7.0).alias("f2"),
        ((F.col("id") % 13) >= 6).cast("int").alias("y"),
    )


class TestLogregFit:
    def test_trajectory_partitioning_invariant(self, spark):
        """repartition(1) vs repartition(16) -> IDENTICAL nano-quantized
        weights after every iteration (the sums are over pre-quantized
        BIGINT terms, so aggregation order cannot move them)."""
        base = _feats(spark)
        w1 = learn.logreg_fit(
            base.repartition(1), ["f0", "f1", "f2"], "y", iters=4
        )
        w16 = learn.logreg_fit(
            base.repartition(16), ["f0", "f1", "f2"], "y", iters=4
        )
        assert [round(w * learn.SCALE) for w in w1] == [
            round(w * learn.SCALE) for w in w16
        ]
        # and bit-identical floats, not merely nano-equal: every update
        # consumed the same exact integer gradient sums
        assert w1 == w16

    def test_empty_input_raises(self, spark):
        with pytest.raises(ValueError, match="empty input"):
            learn.logreg_fit(
                _feats(spark).filter(F.lit(False)), ["f0", "f1"], "y"
            )

    def test_gd_reduces_loss_and_report_confusion_is_consistent(self, spark):
        """Zero weights predict 1 for everything (z = 0 -> margin >= 0);
        after a few GD steps the in-sample confusion must beat that
        all-positive baseline's error count, and tp+fp+fn+tn == n."""
        feats = _feats(spark).cache()
        n = feats.count()
        pos = feats.agg(F.sum("y")).collect()[0][0]
        base = learn.logreg_report(feats, ["f0", "f1", "f2"], "y", [0.0] * 3)
        b = base.collect()[0]
        assert (b["tp"], b["fp"], b["fn"], b["tn"]) == (pos, n - pos, 0, 0)
        w = learn.logreg_fit(feats, ["f0", "f1", "f2"], "y", iters=25, lr=4.0)
        r = learn.logreg_report(feats, ["f0", "f1", "f2"], "y", w).collect()[0]
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["fp"] + r["fn"] < b["fp"] + b["fn"]

    def test_oracle_twin_matches_spark_trajectory(self, spark):
        """logreg_oracle_sql's unrolled CTE chain reproduces fit+report
        exactly (weights to the nano, confusion counts to the integer)
        on an independent engine — DuckDB over the same rows."""
        feats = _feats(spark, n=150).cache()
        cols = ["f0", "f1", "f2"]
        w = learn.logreg_fit(feats, cols, "y", iters=3, lr=1.0)
        got = learn.logreg_report(feats, cols, "y", w).collect()[0].asDict()
        pdf = feats.toPandas()
        con = duckdb.connect()
        con.register("feats_src", pdf)
        sql = learn.logreg_oracle_sql(
            "feats AS (SELECT * FROM feats_src)", cols, "y", iters=3, lr=1.0
        )
        exp = con.execute(sql).fetch_df().iloc[0].to_dict()
        for k in ["n", "tp", "fp", "fn", "tn", "w0_nano", "w1_nano", "w2_nano"]:
            assert int(got[k]) == int(exp[k]), k


class TestNaiveBayes:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )

    def test_hand_computed_prediction(self, spark):
        """Train on ids 1,2 (mod-5 holdout keeps id 0 out):
        A: "cat cat dog" (n_A=3), B: "dog dog" (n_B=2), V=2.
        Test "cat": A = ln(1/2)+ln(3/5), B = ln(1/2)+ln(1/4) -> A."""
        import math

        docs = self._docs(
            spark,
            [(0, "cat", "A"), (1, "cat cat dog", "A"), (2, "dog dog", "B")],
        )
        rows = learn.nb_train_score(docs).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id, r.true_label, r.pred_label) == (0, "A", "A")
        expect = round(math.log(0.5) * learn.SCALE) + round(
            math.log(3 / 5) * learn.SCALE
        )
        assert r.score_q == expect

    def test_oov_only_doc_is_dropped_and_tie_breaks_to_larger_label(
        self, spark
    ):
        docs = self._docs(
            spark,
            [
                (0, "t", "A"),      # held out: "t" scores tie A/B
                (5, "zzz", "A"),    # held out: fully OOV -> no row
                (1, "t", "A"),
                (2, "t", "B"),
            ],
        )
        rows = {r.doc_id: r for r in learn.nb_train_score(docs).collect()}
        assert set(rows) == {0}  # OOV-only doc 5 produces no scores
        assert rows[0].pred_label == "B"  # exact tie -> larger label

    def test_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.catalog import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(
            map(tuple, learn.nb_train_score(docs.repartition(1)).collect())
        )
        b = sorted(
            map(tuple, learn.nb_train_score(docs.repartition(16)).collect())
        )
        assert a == b


class TestChi2Tokens:
    def test_hand_computed_and_margin_filter(self, spark):
        """6 docs: 'hot' in all 3 pos, no neg -> χ² = 6·(3·3)²/(3·3·3·3)
        = 6; 'the' in all 6 docs -> degenerate margin, filtered."""
        docs = spark.createDataFrame(
            [
                (1, "hot the", 1), (2, "hot the", 1), (3, "hot the", 1),
                (4, "cold the", 0), (5, "cold the", 0), (6, "wet the", 0),
            ],
            "doc_id long, text string, y int",
        )
        out = {
            r.token: (r.n_pos_docs, r.n_neg_docs, r.chi2_q)
            for r in learn.chi2_tokens(
                docs, F.col("y") == 1, min_df=1, k=10
            ).collect()
        }
        assert "the" not in out  # in all docs: margin filter
        assert out["hot"] == (3, 0, 6 * learn.CHI2_SCALE)
        # cold: a=0 b=2 c=3 d=1 -> 6·(0·1−2·3)²/(2·4·3·3) = 216/72 = 3
        assert out["cold"] == (0, 2, 3 * learn.CHI2_SCALE)

    def test_order_is_total(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b", 1), (2, "a b", 1), (3, "c", 0), (4, "c", 0)],
            "doc_id long, text string, y int",
        )
        rows = learn.chi2_tokens(
            docs, F.col("y") == 1, min_df=1, k=10
        ).collect()
        # a, b, c all score χ² = 4·(2·2)²/(2·2·2·2) = 4 exactly:
        # three-way tie, order falls back to token asc
        assert [(r.token, r.chi2_q) for r in rows] == [
            ("a", 4 * learn.CHI2_SCALE),
            ("b", 4 * learn.CHI2_SCALE),
            ("c", 4 * learn.CHI2_SCALE),
        ]


class TestGroupSplit:
    def test_no_user_straddles_splits(self, spark):
        """The leakage property behind the group_split declared query:
        split is a pure function of the GROUP key, so a user with many
        events can never land in two splits."""
        from beis_orp_data_service_spark.operators import corpus

        ev = spark.range(2000).select(
            (F.col("id") % 97).alias("user_id"),
            F.col("id").alias("event_id"),
        )
        s = corpus.dataset_split(ev, "user_id", {"train": 800, "test": 200})
        leaked = (
            s.groupBy("user_id")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert leaked == 0
        # and both splits are non-degenerate on 97 users
        sizes = dict(
            (r.split, r.n)
            for r in s.groupBy("split").agg(
                F.countDistinct("user_id").alias("n")
            ).collect()
        )
        assert set(sizes) == {"train", "test"}
        assert sizes["train"] > 0 and sizes["test"] > 0


class TestLogregCv:
    def test_folds_disjoint_and_out_of_sample(self, spark):
        """Five folds cover all rows exactly once (Σ n == N); each
        fold's report row carries its own weights; and the report is
        OUT-OF-SAMPLE — recomputing the confusion by hand from the
        held-out slice with the fold's reported nano weights matches."""
        from beis_orp_data_service_spark.operators import corpus

        feats = (
            _feats(spark, n=250)
            .withColumn(
                "fold",
                corpus.md5_int60(F.col("f1").cast("string")) % 3,
            )
        ).cache()
        out = {
            r.fold: r
            for r in learn.logreg_cv(
                feats, ["f0", "f1", "f2"], "y", folds=3, iters=2
            ).collect()
        }
        assert set(out) == {0, 1, 2}
        assert sum(r.n for r in out.values()) == feats.count()
        for i, r in out.items():
            w = [r.w0_nano / learn.SCALE, r.w1_nano / learn.SCALE,
                 r.w2_nano / learn.SCALE]
            hand = learn.logreg_report(
                feats.where(F.col("fold") == i), ["f0", "f1", "f2"], "y", w
            ).collect()[0]
            # nano-rounded weights reproduce the same integer confusion
            assert (hand.tp, hand.fp, hand.fn, hand.tn) == (
                r.tp, r.fp, r.fn, r.tn
            )
            assert r.tp + r.fp + r.fn + r.tn == r.n
