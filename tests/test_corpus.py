"""Unit tests for operators/corpus.py — duplicate clustering,
quality/repetition signals, PII redaction, packing, sampling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import corpus


def _pairs(spark, *ab):
    return spark.createDataFrame([Row(a_id=a, b_id=b) for a, b in ab])


def _nodes(spark, *ids):
    return spark.createDataFrame([Row(doc_id=i) for i in ids])


class TestDupClusters:
    def test_chain_and_singleton(self, spark):
        # 1-2-3 chained, 4-5 paired, 6 isolated
        out = corpus.dup_clusters(
            _pairs(spark, (1, 2), (2, 3), (4, 5)), _nodes(spark, 1, 2, 3, 4, 5, 6)
        )
        got = {r.doc_id: r.cluster_id for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}

    def test_long_chain_converges(self, spark):
        # path graph of 12 nodes — needs multi-round propagation
        n = 12
        out = corpus.dup_clusters(
            _pairs(spark, *[(i, i + 1) for i in range(1, n)]),
            _nodes(spark, *range(1, n + 1)),
            max_iter=20,
        )
        got = {r.doc_id: r.cluster_id for r in out.collect()}
        assert got == {i: 1 for i in range(1, n + 1)}

    def test_pair_order_irrelevant(self, spark):
        # reversed pair ids give the same clustering
        out = corpus.dup_clusters(
            _pairs(spark, (9, 2), (2, 7)), _nodes(spark, 2, 7, 9)
        )
        got = {r.doc_id: r.cluster_id for r in out.collect()}
        assert got == {2: 2, 7: 2, 9: 2}

    def test_label_sum_convergence_round_count(self, spark, monkeypatch):
        """The r14 sum-based convergence check must stop after the SAME
        number of rounds as the old join+count spelling: an
        already-converged graph (no cross-node edges) exits after round
        1, a 5-node path needs exactly 2 doubling rounds (chain length
        halves per round: 4 -> converged in 2, detected on round 3)."""
        rounds = {"n": 0}
        orig = corpus.stage_checkpoint

        def counting(df, **kw):
            if kw.get("label") == "dup_clusters:round":
                rounds["n"] += 1
            return orig(df, **kw)

        monkeypatch.setattr(corpus, "stage_checkpoint", counting)

        rounds["n"] = 0
        out = corpus.dup_clusters(
            _pairs(spark, (1, 1)), _nodes(spark, 1, 2, 3), max_iter=10,
            driver_closure_threshold=0,
        )
        assert {r.doc_id: r.cluster_id for r in out.collect()} == {
            1: 1, 2: 2, 3: 3,
        }
        assert rounds["n"] == 1  # converged input: one round, then stop

        rounds["n"] = 0
        out = corpus.dup_clusters(
            _pairs(spark, (1, 2), (2, 3), (3, 4), (4, 5)),
            _nodes(spark, 1, 2, 3, 4, 5),
            max_iter=10,
            driver_closure_threshold=0,
        )
        assert {r.doc_id: r.cluster_id for r in out.collect()} == {
            i: 1 for i in range(1, 6)
        }
        assert rounds["n"] == 3  # 2 working rounds + the no-change round

    def test_driver_closure_matches_distributed(self, spark):
        """The adaptive driver-local union-find path must emit the SAME
        (node, cluster_id) set as the distributed propagation loop —
        chains, merged stars, isolated singletons, and an
        above-threshold fallback exercising the loop."""
        cases = [
            [(1, 2), (2, 3), (4, 5)],
            [(9, 2), (2, 7), (10, 11), (11, 2)],
            [(i, i + 1) for i in range(1, 12)],
            [],
        ]
        node_ids = list(range(1, 13))
        for pairs in cases:
            pdf = (
                _pairs(spark, *pairs)
                if pairs
                else spark.createDataFrame([], "a_id long, b_id long")
            )
            ndf = _nodes(spark, *node_ids)
            via_driver = {
                (r.doc_id, r.cluster_id)
                for r in corpus.dup_clusters(pdf, ndf).collect()
            }
            via_loop = {
                (r.doc_id, r.cluster_id)
                for r in corpus.dup_clusters(
                    pdf, ndf, driver_closure_threshold=0
                ).collect()
            }
            assert via_driver == via_loop, pairs
            assert {n for n, _ in via_driver} == set(node_ids)


class TestGopherQuality:
    def test_exact_signals(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="the cat sat on the mat")]  # 6 words, 2 'the'
        )
        row = corpus.gopher_quality(df).collect()[0]
        assert row.n_words == 6
        # chars: 3+3+3+2+3+3 = 17 -> 17*100 div 6 = 283
        assert row.mean_wlen_c == 283
        assert row.stop_pm == 2 * 1000 // 6  # 'the' twice (('a' absent))
        assert row.maxword_pm == 2 * 1000 // 6
        assert row.distinct_pm == 5 * 1000 // 6
        assert row.gopher_pass == 0  # too short / mean wlen below bound

    def test_pass_verdict(self, spark):
        text = " ".join(["alpha beta gamma the delta"] * 10)  # 50 words
        df = spark.createDataFrame([Row(doc_id=1, text=text)])
        row = corpus.gopher_quality(df).collect()[0]
        assert row.n_words == 50 and row.gopher_pass == 1


class TestRepetitionStats:
    def test_degenerate_repeat(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a a a b")])
        row = corpus.repetition_stats(df).collect()[0]
        # bigrams: 'a a' x2, 'a b' -> 2*1000//3; trigrams: 'a a a','a a b' -> 500
        assert row.top2_pm == 666 and row.top3_pm == 500

    def test_short_docs_zero(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="solo"), Row(doc_id=2, text="two words")]
        )
        got = {r.doc_id: (r.top2_pm, r.top3_pm) for r in
               corpus.repetition_stats(df).collect()}
        assert got[1] == (0, 0)
        assert got[2] == (1000, 0)  # one bigram, no trigram


class TestPiiRedact:
    def test_redacts_and_counts(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1,
                 text="mail bob@ex.org and alice@corp.io call 555-0100 ip 10.1.2.3")]
        )
        row = corpus.pii_redact(df).collect()[0]
        assert row.n_emails == 2 and row.n_phones == 1 and row.n_ips == 1
        assert "@" not in row.redacted and "555-" not in row.redacted
        assert "<EMAIL>" in row.redacted and "<PHONE>" in row.redacted
        assert "<IP>" in row.redacted

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="no secrets here")])
        row = corpus.pii_redact(df).collect()[0]
        assert row.redacted == "no secrets here"
        assert (row.n_emails, row.n_phones, row.n_ips) == (0, 0, 0)


class TestSeqPack:
    def test_invariants(self, spark):
        rows = [Row(doc_id=i, source=f"s{i % 2}", text=" ".join(["w"] * (20 + i)))
                for i in range(1, 21)]
        out = corpus.seq_pack(spark.createDataFrame(rows), budget=64).collect()
        assert all(0 <= r.offset_in_bin < 64 for r in out)
        # bins contiguous from 0 within each shard
        for src in {"s0", "s1"}:
            bins = sorted({r.bin_id for r in out if r.source == src})
            assert bins == list(range(len(bins))) and bins[0] == 0
        # layout reproducible regardless of input partitioning
        out2 = corpus.seq_pack(
            spark.createDataFrame(rows).repartition(7), budget=64
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    def test_first_doc_offset_zero(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, source="s", text="a b c")])
        row = corpus.seq_pack(df, budget=10).collect()[0]
        assert (row.bin_id, row.offset_in_bin, row.n_tokens) == (0, 0, 3)


class TestSampling:
    def test_stratified_deterministic_and_exact(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(1000)]
        )
        rates = {"en": 500, "de": 100}
        a = corpus.stratified_sample(df, rates).collect()
        b = corpus.stratified_sample(df.repartition(13), rates).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
        # exact per-row rule
        for r in a:
            h = (r.doc_id * corpus.SAMPLE_A + corpus.SAMPLE_B) % corpus.SAMPLE_P
            assert h % 1000 < rates[r.lang]

    def test_mixture_plan_counts(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, source=f"s{i % 4}") for i in range(400)]
        )
        out = {r.source: r for r in
               corpus.mixture_sample_plan(df, target_per_source=50).collect()}
        assert set(out) == {"s0", "s1", "s2", "s3"}
        for r in out.values():
            assert r.n_docs == 100 and r.frac_pm == 500
            assert 0 <= r.n_sampled <= 100


class TestGroupQuantiles:
    def test_exact_known_values(self, spark):
        rows = [Row(doc_id=i, lang="en", n_chars=i * 10) for i in range(1, 101)]
        out = corpus.group_quantiles(
            spark.createDataFrame(rows), "lang", "n_chars", "doc_id"
        ).collect()[0]
        # n=100: rank ceil(q*n/100) = q -> value q*10
        assert (out.n_rows, out.p50, out.p90, out.p99) == (100, 500, 900, 990)

    def test_small_group_and_ties(self, spark):
        rows = [Row(doc_id=i, lang="de", n_chars=7) for i in range(3)]
        out = corpus.group_quantiles(
            spark.createDataFrame(rows), "lang", "n_chars", "doc_id"
        ).collect()[0]
        assert (out.p50, out.p90, out.p99) == (7, 7, 7) and out.n_rows == 3


class TestRepeatedPassages:
    def test_planted_shared_passage(self, spark):
        # docs 1 and 2 share an 8-token verbatim passage at different
        # offsets; doc 3 is disjoint text — one span per sharing doc,
        # none for doc 3
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text=f"one two {shared} three four"),
                Row(doc_id=2, text=f"{shared} five six seven eight nine"),
                Row(doc_id=3, text="ten eleven twelve thirteen fourteen "
                                   "fifteen sixteen seventeen eighteen"),
            ]
        )
        out = {
            r.doc_id: r
            for r in corpus.repeated_passages(df, k=4, min_docs=2).collect()
        }
        assert set(out) == {1, 2}
        # doc 1: shared tokens occupy positions 2..9 -> windows 2..6
        assert (out[1].span_start, out[1].span_end) == (2, 9)
        assert out[1].n_windows == 5 and out[1].span_tokens == 8
        # doc 2: positions 0..7 -> windows 0..4
        assert (out[2].span_start, out[2].span_end) == (0, 7)
        assert out[2].n_windows == 5 and out[2].span_tokens == 8

    def test_two_disjoint_spans_per_doc(self, spark):
        a = "red orange yellow green"
        b = "cyan blue indigo violet"
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text=f"{a} spacer1 spacer2 spacer3 {b}"),
                Row(doc_id=2, text=f"{a} other words entirely {b}"),
            ]
        )
        out = corpus.repeated_passages(df, k=4, min_docs=2)
        spans = sorted(
            (r.doc_id, r.span_start, r.span_end) for r in out.collect()
        )
        # both docs: exact-match windows only at the two planted spans
        assert spans == [(1, 0, 3), (1, 7, 10), (2, 0, 3), (2, 7, 10)]

    def test_short_docs_no_windows(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="one two three"), Row(doc_id=2, text="one two three")]
        )
        # k=4 > doc length -> no windows at all
        assert corpus.repeated_passages(df, k=4, min_docs=2).count() == 0
        # but k=3 flags the identical docs end-to-end
        out = corpus.repeated_passages(df, k=3, min_docs=2).collect()
        assert {(r.doc_id, r.span_start, r.span_end) for r in out} == {
            (1, 0, 2),
            (2, 0, 2),
        }


class TestDecontaminate:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                # shares the 5-gram "a b c d e" with the benchmark
                Row(doc_id=1, text="x y a b c d e z w"),
                # clean
                Row(doc_id=2, text="p q r s t u v w x"),
                # too short for any 5-gram
                Row(doc_id=3, text="a b c"),
            ]
        )

    def test_flags_overlap_only(self, spark):
        bench = spark.createDataFrame([Row(doc_id=9, text="k a b c d e m")])
        out = {
            r.doc_id: r
            for r in corpus.decontaminate(self._docs(spark), bench, n=5).collect()
        }
        assert set(out) == {1, 2, 3}
        assert (out[1].contaminated, out[2].contaminated, out[3].contaminated) == (
            1,
            0,
            0,
        )
        # doc 1: grams "a b c d e" and... windows starting at a(2),b(3),
        # c(4),d(5) -> only "a b c d e" is in bench's gram set
        assert out[1].n_hits == 1 and out[1].n_grams == 5
        assert out[3].n_grams == 0 and out[3].n_hits == 0

    def test_min_hits_threshold(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e f")]  # grams: abcde, bcdef
        )
        bench = spark.createDataFrame([Row(doc_id=9, text="a b c d e f")])
        one = corpus.decontaminate(docs, bench, n=5, min_hits=3).collect()[0]
        assert one.n_hits == 2 and one.contaminated == 0

    def test_repeated_gram_counts_once(self, spark):
        # the doc repeats the contaminated gram; distinct-gram counting
        # reports 1 hit, not 2
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e a b c d e")]
        )
        bench = spark.createDataFrame([Row(doc_id=9, text="a b c d e")])
        one = corpus.decontaminate(docs, bench, n=5).collect()[0]
        assert one.n_hits == 1 and one.contaminated == 1


class TestExportShards:
    def test_layout_invariants(self, spark):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
        out = corpus.export_shards(df, n_shards=8).collect()
        assert len(out) == 200
        by_shard = {}
        for r in out:
            assert 0 <= r.shard_id < 8
            exp = ((r.doc_id * corpus.SAMPLE_A + corpus.SAMPLE_B)
                   % corpus.SAMPLE_P) % 8
            assert r.shard_id == exp
            by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
        # positions within each shard are exactly 0..len-1
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))

    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(100)])
        a = {(r.doc_id, r.shard_id, r.shard_pos)
             for r in corpus.export_shards(df, n_shards=4).collect()}
        b = {(r.doc_id, r.shard_id, r.shard_pos)
             for r in corpus.export_shards(df.repartition(13), n_shards=4).collect()}
        assert a == b

    def test_within_shard_order_not_id_order(self, spark):
        # the second-hash mix must scramble within-shard order; with 400
        # ids it would be astronomically unlikely to equal id order
        df = spark.createDataFrame([Row(doc_id=i) for i in range(400)])
        rows = [r for r in corpus.export_shards(df, n_shards=2).collect()
                if r.shard_id == 0]
        by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.shard_pos)]
        assert by_pos != sorted(by_pos)


class TestChunkDedup:
    def test_first_occurrence_survives(self, spark):
        # width=2 chunks; "x y" appears in docs 1 (pos 0) and 2 (pos 1):
        # only doc 1's copy survives.
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="x y a b"),
                Row(doc_id=2, text="c d x y"),
            ]
        )
        got = {
            r.doc_id: r
            for r in corpus.chunk_dedup(df, width=2).collect()
        }
        assert got[1].n_chunks == 2 and got[1].n_kept == 2
        assert got[1].text_kept == "x y a b"
        assert got[2].n_chunks == 2 and got[2].n_kept == 1
        assert got[2].text_kept == "c d"

    def test_within_doc_repeat_keeps_first(self, spark):
        df = spark.createDataFrame([Row(doc_id=7, text="p q p q")])
        row = corpus.chunk_dedup(df, width=2).collect()[0]
        assert row.n_chunks == 2 and row.n_kept == 1
        assert row.text_kept == "p q"

    def test_all_duplicated_doc_yields_empty(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="m n"), Row(doc_id=2, text="m n")]
        )
        got = {r.doc_id: r for r in corpus.chunk_dedup(df, width=2).collect()}
        assert got[2].n_kept == 0 and got[2].text_kept == ""


class TestDsirWeights:
    def test_target_like_doc_scores_higher(self, spark):
        # target domain speaks "alpha beta"; doc 1 matches it, doc 2
        # doesn't — doc 1's log-likelihood-ratio weight must be higher.
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="alpha beta alpha beta"),
                Row(doc_id=2, text="gamma delta gamma delta"),
                Row(doc_id=3, text="alpha beta gamma"),
            ]
        )
        target = df.filter(F.col("doc_id") == 3)
        got = {r.doc_id: r for r in corpus.dsir_weights(df, target).collect()}
        assert got[1].weight > got[2].weight
        # micro-int contract: weight is exactly weight_micro / 1e6
        for r in got.values():
            assert abs(r.weight - r.weight_micro / 1e6) < 1e-12

    def test_gram_counts(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a")]
        )
        out = corpus.dsir_weights(df, df.filter(F.col("doc_id") == 1)).collect()
        got = {r.doc_id: r.n_grams for r in out}
        # doc 2 has no bigram -> absent; doc 1 has 2
        assert got == {1: 2}


class TestBloom:
    def test_no_false_negatives_and_low_fpr(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        rows = [(i, f"document number {i} payload") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        inserted = df.filter(F.col("doc_id") % 2 == 0)
        flt = co.bloom_filter_words(inserted, "text", m_bits=1 << 16, k=4)
        got = {
            r.doc_id: r.maybe_present
            for r in co.bloom_probe(df, flt, "doc_id", "text", m_bits=1 << 16, k=4).collect()
        }
        assert len(got) == 400
        # Bloom guarantee: every inserted key probes present
        assert all(got[i] == 1 for i in range(0, 400, 2))
        # non-inserted keys: false positives at the design rate only
        # (n*k/m = 800/65536 per bit -> FPR ~ (0.012)^4, essentially 0)
        fps = sum(got[i] for i in range(1, 400, 2))
        assert fps <= 4, f"false-positive rate too high: {fps}/200"

    def test_filter_is_bounded_rows(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame(
            [(i, f"k{i}") for i in range(1000)], "doc_id long, text string"
        )
        flt = co.bloom_filter_words(df, "text", m_bits=1 << 10, k=8)
        n = flt.count()
        assert n <= (1 << 10) // 32  # never more rows than filter words
        # every word index in range, every bits value a set int64
        for r in flt.collect():
            assert 0 <= r.word < (1 << 10) // 32
            assert r.bits != 0


class TestCanonicalDocs:
    def test_picks_highest_quality_tie_lower_id(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
            "doc_id long, cluster_id long",
        )
        quality = spark.createDataFrame(
            # cluster 1: doc 2 wins on quality; cluster 9: tie -> doc 9
            [(1, 10), (2, 90), (3, 90 - 1), (7, 5), (9, 40), (10, 40)],
            "doc_id long, q long",
        )
        out = {r.doc_id: r for r in co.canonical_docs(clusters, quality).collect()}
        assert len(out) == 6
        assert [out[i].is_canonical for i in (1, 2, 3)] == [0, 1, 0]
        assert out[7].is_canonical == 1 and out[7].cluster_size == 1
        assert out[9].is_canonical == 1 and out[10].is_canonical == 0
        assert all(out[i].cluster_size == 3 for i in (1, 2, 3))

    def test_every_cluster_has_exactly_one_canonical(self, spark):
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import corpus as co
        from beis_orp_data_service_spark.operators import dedup as dd
        from beis_orp_data_service_spark.operators import textstats as ts
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents").filter(
            F.col("doc_id") % 10 == 0
        )
        simt = dd.simhash16_table(docs, "doc_id", "text").localCheckpoint()
        clusters = co.dup_clusters(
            co.simhash_band_pairs(simt), simt.select("doc_id")
        )
        quality = docs.select(
            "doc_id", ts.quality_scores("text")["alpha_milli"].alias("q")
        )
        out = co.canonical_docs(clusters, quality).toPandas()
        per = out.groupby("cluster_id").is_canonical.sum()
        assert (per == 1).all()
        sizes = out.groupby("cluster_id").size()
        assert (out.groupby("cluster_id").cluster_size.first() == sizes).all()

    def test_merge_equals_build_on_union(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        a = spark.createDataFrame(
            [(i, f"k{i}") for i in range(100)], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(i, f"k{i}") for i in range(100, 180)], "doc_id long, text string"
        )
        m, k = 1 << 14, 4
        merged = {
            (r.word, r.bits)
            for r in co.bloom_merge(
                co.bloom_filter_words(a, "text", m, k),
                co.bloom_filter_words(b, "text", m, k),
            ).collect()
        }
        direct = {
            (r.word, r.bits)
            for r in co.bloom_filter_words(a.unionByName(b), "text", m, k).collect()
        }
        assert merged == direct


def test_bpe_pair_counts_known_values(spark):
    """'abab ab cd' twice: pairs weighted by word frequency over the
    distinct-word table, not per occurrence."""
    from beis_orp_data_service_spark.operators import corpus as co

    df = spark.createDataFrame(
        [(1, "abab ab cd"), (2, "abab ab cd")], "doc_id long, text string"
    )
    got = {(r.a, r.b): r.pair_count for r in co.bpe_pair_counts(df).collect()}
    # abab (freq 2): ab, ba, ab -> ab:4, ba:2 ; ab (freq 2): ab:2 ; cd (freq 2): cd:2
    assert got == {("a", "b"): 6, ("b", "a"): 2, ("c", "d"): 2}


class TestBpeLearnMerges:
    @staticmethod
    def _reference_bpe(texts, n_merges):
        """Pure-Python BPE reference (Sennrich et al.): same tie-break
        (max count, then lexicographically smallest pair)."""
        from collections import Counter

        vocab = Counter()
        for t in texts:
            for w in t.split():
                if w:
                    vocab[tuple(w)] += 1
        merges = []
        for rank in range(1, n_merges + 1):
            pairs = Counter()
            for syms, freq in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += freq
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), cnt = best
            merges.append((rank, a, b, cnt))
            new_vocab = Counter()
            for syms, freq in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_vocab[tuple(res)] += freq
            vocab = new_vocab
        return merges

    def test_oracle_sql_matches_reference_implementation(self):
        """Close the triangle: the unrolled-CTE DuckDB oracle must
        reproduce the pure-Python reference trainer on a corpus with
        overlap traps (aaa runs) and tie-break pressure — no Spark
        involved, so an oracle bug can't hide behind a matching
        engine bug."""
        import duckdb

        texts = [
            "aaa aaab baaa",
            "low low low lower lowest",
            "ab ab ba ba",  # (a,b) vs (b,a) tie pressure
            "  padded   with \t whitespace \n runs  ",
        ]
        expect = self._reference_bpe(texts, 4)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
        )
        from beis_orp_data_service_spark.operators import corpus as co

        got = con.sql(co.bpe_merges_oracle_sql(4)).fetchall()
        assert sorted(got) == sorted(expect)
        # encode oracle: per-word token counts off the final state must
        # equal applying the learned merges greedily in rank order
        enc = {
            r[0]: (r[1], r[2])
            for r in con.sql(co.bpe_encode_oracle_sql(4)).fetchall()
        }
        merges = [(a, b) for _, a, b, _ in expect]
        for doc_id, t in enumerate(texts):
            total = 0
            for w in t.split():
                seq = list(w)
                for a, b in merges:
                    res, i = [], 0
                    while i < len(seq):
                        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(seq[i])
                            i += 1
                    seq = res
                total += len(seq)
            assert enc[doc_id] == (total, len(t))

    def test_oracle_degenerate_corpus_fewer_merges_than_requested(self):
        """Corpus 'ab ab ab' admits ONE merge; asking the oracle for 4
        must not zero out the encode side: empty merge rounds carry
        the symbol state forward (trainer-break parity), so the final
        state still encodes every word and n_tokens is the true 3, not
        a false 0."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        expect = self._reference_bpe(["ab ab ab"], 4)
        assert expect == [(1, "a", "b", 3)]  # the break fires at rank 2
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, 'ab ab ab')")
        assert con.sql(co.bpe_merges_oracle_sql(4)).fetchall() == expect
        # the word 'ab' is one merged token, three occurrences → 3
        assert con.sql(co.bpe_encode_oracle_sql(4)).fetchall() == [(0, 3, 8)]

    def test_matches_reference_implementation(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        texts = [
            "low low low low low",
            "lower lower newest newest newest",
            "newest newest newest widest widest",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r.merge_rank, r.a, r.b, r.pair_count)
            for r in co.bpe_learn_merges(df, n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        want = self._reference_bpe(texts, 6)
        assert got == want
        # the classic outcome: 'es'/'est'-style merges appear
        assert any(a + b == "es" or a + b == "est" for _, a, b, _ in got)

    def test_shared_word_freq_base_identical_across_trainers(self, spark):
        """The word_freq fast-path contract: feeding a precomputed
        word_freq_table to each trainer (the tokenizer_compare shape —
        one corpus scan instead of three) must give bit-identical
        artifacts to the self-derived path, for all three families plus
        the induced WordPiece vocab."""
        from beis_orp_data_service_spark.operators import corpus as co

        texts = [
            "low low low lower lowest",
            "newest newest widest \t padded  runs",
            "aaa aaab baaa",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        wf = co.word_freq_table(df)
        assert co.bpe_learn_merges(df, n_merges=4, word_freq=wf).collect() \
            == co.bpe_learn_merges(df, n_merges=4).collect()
        assert sorted(
            co.unigram_scores(df, word_freq=wf).collect()
        ) == sorted(co.unigram_scores(df).collect())
        wp_shared = co.wordpiece_learn_merges(df, n_merges=4, word_freq=wf)
        wp_own = co.wordpiece_learn_merges(df, n_merges=4)
        assert wp_shared.collect() == wp_own.collect()
        assert co.wordpiece_vocab(df, wp_shared, word_freq=wf) \
            == co.wordpiece_vocab(df, wp_own)

    def test_sweep_totals_equal_unfused_single_cell_paths(self, spark):
        """The fused sweep kernel (one Arrow pass over distinct words,
        Σ freq·tokens(w)) must equal the per-doc sums of the single-cell
        encoders for every (family, budget) cell — including a budget
        LARGER than the corpus admits merges for (the final-state
        pass-through branch)."""
        from beis_orp_data_service_spark.operators import corpus as co

        texts = [
            "low low lower lowest",
            "ab ab ba  newest newest",
            "aaa baaa",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        budgets = (1, 2, 12)  # 12 > admissible merges on this corpus
        wf = co.word_freq_table(df)
        bpe_m = co.bpe_learn_merges(df, n_merges=max(budgets), word_freq=wf)
        ranked = [(r.a, r.b) for r in bpe_m.orderBy("merge_rank").collect()]
        bpeb_m = co.bpe_bytes_learn_merges(
            df, n_merges=max(budgets), word_freq=wf
        )
        ranked_bytes = [
            (r.a, r.b) for r in bpeb_m.orderBy("merge_rank").collect()
        ]
        seed = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(df, word_freq=wf).collect()
        }
        em = co.unigram_em_round(df, seed, word_freq=wf)
        alpha = wf.select(
            F.explode(F.split("w", "")).alias("piece")
        ).distinct()
        uni_scores = {
            b: {
                r["piece"]: r["score_micro"]
                for r in co.unigram_prune_rescore(em, alpha, b).collect()
            }
            for b in budgets
        }
        wp_m = co.wordpiece_learn_merges(df, n_merges=max(budgets),
                                         word_freq=wf)
        wp_vocabs = {
            b: co.wordpiece_vocab(
                df, wp_m.filter(F.col("merge_rank") <= b), word_freq=wf
            )
            for b in budgets
        }
        fused = {
            (r["tokenizer"], r["budget"]): r["total_tokens"]
            for r in co.tokenizer_sweep_totals(
                wf, ranked, wp_vocabs, uni_scores, budgets,
                bpe_bytes_merges=ranked_bytes,
            ).collect()
        }
        assert set(fused) == {
            (t, b)
            for t in ("bpe", "bpe_bytes", "unigram", "wordpiece")
            for b in budgets
        }
        for b in budgets:
            bpe = co.bpe_tokenize(df, ranked[:b]).agg(
                F.sum("n_tokens")
            ).first()[0]
            assert fused[("bpe", b)] == bpe, ("bpe", b)
            bpeb = co.bpe_bytes_tokenize(df, ranked_bytes[:b]).agg(
                F.sum("n_tokens")
            ).first()[0]
            assert fused[("bpe_bytes", b)] == bpeb, ("bpe_bytes", b)
            uni = co.unigram_segment(df, uni_scores[b]).agg(
                F.sum("n_pieces")
            ).first()[0]
            assert fused[("unigram", b)] == uni, ("unigram", b)
            wp = co.wordpiece_tokenize(df, wp_vocabs[b]).agg(
                F.sum("n_tokens")
            ).first()[0]
            assert fused[("wordpiece", b)] == wp, ("wordpiece", b)

    def test_unigram_train_one_round_equals_em_plus_prune(self, spark):
        """unigram_train(n_rounds=1, prune_to=k) must equal the exposed
        decomposition seed → em_round → prune_rescore — the contract the
        sweep's shared-EM shortcut rests on."""
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame(
            [(0, "the cat sat on the mat"), (1, "the cat ran")],
            "doc_id long, text string",
        )
        wf = co.word_freq_table(df)
        seed = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(df, word_freq=wf).collect()
        }
        em = co.unigram_em_round(df, seed, word_freq=wf)
        alpha = wf.select(
            F.explode(F.split("w", "")).alias("piece")
        ).distinct()
        via_parts = sorted(
            map(tuple, co.unigram_prune_rescore(em, alpha, 3).collect())
        )
        via_train = sorted(
            map(tuple, co.unigram_train(df, n_rounds=1, prune_to=3).collect())
        )
        assert via_parts == via_train

    def test_stops_when_no_pairs_remain(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
        out = co.bpe_learn_merges(df, n_merges=10).collect()
        # one merge fuses 'a','b'; afterwards every word is one symbol
        assert len(out) == 1
        assert (out[0].a, out[0].b) == ("a", "b")

    def test_tokenize_applies_merges_in_rank_order(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame(
            [(1, "abab ab"), (2, "cd")], "doc_id long, text string"
        )
        # merge 1: (a,b)->ab ; merge 2: (ab,ab)->abab
        out = {
            r.doc_id: (r.n_tokens, r.n_chars)
            for r in co.bpe_tokenize(
                df, [("a", "b"), ("ab", "ab")]
            ).collect()
        }
        # "abab" -> [ab, ab] -> [abab] = 1 token; "ab" -> [ab] = 1
        assert out[1] == (2, 7)
        # "cd" untouched by merges -> [c, d] = 2 tokens
        assert out[2] == (2, 2)

    def test_learned_merges_compress_corpus(self, spark):
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import corpus as co
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents").limit(100)
        learned = [
            (r.a, r.b)
            for r in co.bpe_learn_merges(docs, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        assert len(learned) == 4
        before = co.bpe_tokenize(docs, []).agg(F.sum("n_tokens")).collect()[0][0]
        after = co.bpe_tokenize(docs, learned).agg(F.sum("n_tokens")).collect()[0][0]
        assert after < before  # each merge strictly reduces token count

    def test_declared_bpe_encode_compression_floor(self, spark):
        """The declared bpe_encode entry must produce a real
        compression: 0 < sum(n_tokens) < sum(non-space chars) — a
        broken encode (no merges applied, or everything collapsed)
        fails one side or the other. (Now hash-grade: the unrolled-CTE
        oracle checks values too; this floor stays as the semantic
        guard the hash can't express.)"""
        from beis_orp_data_service_spark import declared
        from beis_orp_data_service_spark.catalog import load_table
        from tests.conftest import SF_SMOKE

        qd = declared.REGISTRY["bpe_encode"]
        assert qd.sql is not None  # hash-grade contract
        agg = (
            qd.fn(spark, SF_SMOKE)
            .agg(F.sum("n_tokens").alias("t"), F.sum("n_chars").alias("c"))
            .first()
        )
        docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 200")
        nonspace = docs.agg(
            F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("n")
        ).first()["n"]
        assert 0 < agg.t < nonspace <= agg.c


class TestBpeBytes:
    """Byte-level BPE (GPT-2/tiktoken family): the merge loop over the
    word's UTF-8 bytes spelled as uppercase hex pairs."""

    # café/naïve force multi-byte UTF-8; aaa runs force overlap traps
    TEXTS = [
        "the café costs three euros",
        "café naïve café the the",
        "Ø the naïve cost aaa aaab",
        "aa bb aa the café",
    ]

    @staticmethod
    def _reference_bpe_bytes(texts, n_merges):
        """Pure-Python byte-level reference: hex-pair symbols, same
        greedy loop and (count DESC, a, b) tie-break."""
        from collections import Counter

        vocab = Counter()
        for t in texts:
            for w in t.split():
                if w:
                    vocab[tuple("%02X" % x for x in w.encode("utf-8"))] += 1
        merges = []
        for rank in range(1, n_merges + 1):
            pairs = Counter()
            for syms, freq in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += freq
            if not pairs:
                break
            (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((rank, a, b, cnt))
            nxt = Counter()
            for syms, freq in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                nxt[tuple(res)] += freq
            vocab = nxt
        return merges

    def _df(self, spark):
        return spark.createDataFrame(
            list(enumerate(self.TEXTS)), "doc_id long, text string"
        )

    def test_matches_reference_and_oracle(self, spark):
        """Triangle: Spark trainer == pure-Python reference == DuckDB
        unrolled-CTE oracle, on a corpus where merges genuinely cross
        the byte boundary inside multi-byte characters."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        expect = self._reference_bpe_bytes(self.TEXTS, 4)
        got = [
            tuple(r)
            for r in co.bpe_bytes_learn_merges(self._df(spark), n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == expect
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            list(enumerate(self.TEXTS)),
        )
        oracle = sorted(con.sql(co.bpe_bytes_merges_oracle_sql(4)).fetchall())
        assert oracle == sorted(expect)

    def test_driver_path_equals_distributed(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = self._df(spark)
        fast = [
            tuple(r)
            for r in co.bpe_bytes_learn_merges(df, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        slow = [
            tuple(r)
            for r in co.bpe_bytes_learn_merges(
                df, n_merges=4, driver_train_threshold=0
            )
            .orderBy("merge_rank")
            .collect()
        ]
        assert fast == slow and len(fast) == 4

    def test_tokenize_byte_denominator_and_fallback(self, spark):
        """n_bytes > n_chars exactly on multi-byte docs, and the empty
        merge list still encodes EVERYTHING (byte fallback: one token
        per byte, no unknown branch exists)."""
        from beis_orp_data_service_spark.operators import corpus as co

        df = self._df(spark)
        enc = {
            r["doc_id"]: r
            for r in co.bpe_bytes_tokenize(df, []).collect()
        }
        for i, t in enumerate(self.TEXTS):
            raw = sum(len(w.encode("utf-8")) for w in t.split())
            assert enc[i]["n_tokens"] == raw  # one token per byte
            assert enc[i]["n_bytes"] == len(t.encode("utf-8"))
            if len(t.encode("utf-8")) > len(t):
                assert enc[i]["n_bytes"] > len(t)

    def test_ascii_totals_equal_char_bpe(self, spark):
        """On a pure-ASCII corpus the hex-of-byte alphabet is order-
        isomorphic to the char alphabet, so the greedy trainers pick
        isomorphic merges and per-budget token totals are EQUAL — the
        invariant the 4-family tokenizer_sweep relies on; the families
        diverge only when multi-byte text appears."""
        from beis_orp_data_service_spark.operators import corpus as co

        texts = ["low low low lower lowest", "newest newest widest ab ba"]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        mc = [
            (r.a, r.b)
            for r in co.bpe_learn_merges(df, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        mb = [
            (r.a, r.b)
            for r in co.bpe_bytes_learn_merges(df, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        # merge lists are hex-images of each other
        assert [
            (a.encode().hex().upper(), b.encode().hex().upper())
            for a, b in mc
        ] == mb
        tc = co.bpe_tokenize(df, mc).agg(F.sum("n_tokens")).first()[0]
        tb = co.bpe_bytes_tokenize(df, mb).agg(F.sum("n_tokens")).first()[0]
        assert tc == tb

    def test_declared_twin_corpus_diverges_from_char_family(self, spark):
        """The declared bpe_bytes corpus (é-twins) must genuinely
        exercise the byte-level path: at least one learned merge is a
        PARTIAL multi-byte sequence (odd hex length or a non-ASCII
        byte), and n_bytes > n_chars on every twin row."""
        from beis_orp_data_service_spark import declared
        from tests.conftest import SF_SMOKE

        merges = declared.REGISTRY["bpe_bytes_merges"].fn(
            spark, SF_SMOKE
        ).collect()
        assert len(merges) == 4
        multi = [
            r
            for r in merges
            if any(int(h, 16) >= 0x80 for h in (r.a[:2], r.b[:2]))
        ]
        assert multi, "no merge touched a multi-byte UTF-8 sequence"
        enc = declared.REGISTRY["bpe_bytes_encode"].fn(spark, SF_SMOKE)
        twins = enc.filter(F.col("doc_id") >= 40_000_000).collect()
        assert twins
        assert all(r.n_tokens > 0 for r in twins)
        # twin text is ≤120 CHARS; n_bytes exceeds that exactly when
        # the letter→accent translation fired, which it must on any
        # text-bearing doc
        assert any(r.n_bytes > 120 for r in twins)


class TestBpeBytesPretok:
    """GPT-2 pre-tokenizer (lookahead-free) + byte-BPE over pieces."""

    SAMPLES = [
        "Hello world",
        "don't stop, can't you've it's we'll I'm they'd",
        "  double  spaces   here",
        "café costs 3.50 euros!!",
        "mixed123abc 456 ...---",
        "tab\there\nnewline end ",
        "'quoted' 'start",
    ]

    def test_engine_regex_parity_and_coverage(self, spark):
        """Java (Spark) and RE2 (DuckDB) must produce IDENTICAL piece
        lists for the pattern — the whole hash-grade story rests on
        it — and pieces must re-concatenate to the input exactly
        (total coverage, nothing dropped or doubled)."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        con = duckdb.connect()
        duck = {
            s: con.execute(
                "select regexp_extract_all(?, ?)", [s, co.GPT2_PRETOK_RE]
            ).fetchone()[0]
            for s in self.SAMPLES
        }
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.SAMPLES)],
            "i long, s string",
        )
        for r in df.select(
            "s", co.gpt2_pieces("s").alias("p")
        ).collect():
            assert list(r.p) == duck[r.s], r.s
            assert "".join(r.p) == r.s, r.s
        # pinned behaviors: contraction split, leading-space attach,
        # run-fold divergence from reference GPT-2 (documented)
        assert duck["Hello world"] == ["Hello", " world"]
        assert duck["don't stop, can't you've it's we'll I'm they'd"][:4] == [
            "don", "'t", " stop", ",",
        ]
        assert duck["  double  spaces   here"] == [
            "  ", "double", "  ", "spaces", "   ", "here",
        ]

    def test_trainer_learns_space_prefixed_merges(self, spark):
        """The point of pre-tokenization: space+letter pieces (Ġword)
        dominate running text, so '20'+letter merges must appear in
        the artifact — whitespace-split training can never learn
        them (its alphabet has no 0x20)."""
        from beis_orp_data_service_spark.operators import corpus as co

        texts = ["the cat the cat the cat sat", "the cat sat on the mat"]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        pf = co.piece_freq_table(df)
        m = [
            tuple(r)
            for r in co.bpe_bytes_learn_merges(
                df, word_freq=pf, n_merges=6
            ).orderBy("merge_rank").collect()
        ]
        assert any(
            a.startswith("20") or b.startswith("20") for _, a, b, _ in m
        ), m
        # and the whitespace-split trainer's alphabet never sees 0x20
        m_ws = [
            tuple(r)
            for r in co.bpe_bytes_learn_merges(df, n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        assert all(
            "20" not in (a, b) and not a.startswith("20")
            for _, a, b, _ in m_ws
        )

    def test_pretok_encode_matches_kernel_recount(self, spark):
        """The vocab-sized encode (distinct-piece kernel + join-back)
        must equal a direct per-doc recount with the same merges and
        the same piece split."""
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame(
            list(enumerate(self.SAMPLES)), "doc_id long, text string"
        )
        pf = co.piece_freq_table(df)
        merges = [
            (r.a, r.b)
            for r in co.bpe_bytes_learn_merges(df, word_freq=pf, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        got = {
            r.doc_id: (r.n_tokens, r.n_bytes)
            for r in co.bpe_bytes_pretok_encode(df, merges).collect()
        }

        def count_piece(w):
            seq = ["%02X" % x for x in w.encode("utf-8")]
            for a, b in merges:
                res, i = [], 0
                while i < len(seq):
                    if (
                        i + 1 < len(seq)
                        and seq[i] == a
                        and seq[i + 1] == b
                    ):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(seq[i])
                        i += 1
                seq = res
            return len(seq)

        import duckdb

        con = duckdb.connect()
        for i, s in enumerate(self.SAMPLES):
            pieces = con.execute(
                "select regexp_extract_all(?, ?)", [s, co.GPT2_PRETOK_RE]
            ).fetchone()[0]
            want = sum(count_piece(w) for w in pieces if w)
            assert got[i] == (want, len(s.encode("utf-8"))), (i, s)


class TestHllSketch:
    def test_estimate_within_standard_error(self, spark):
        """p=10 → relative error ≈ 1.04/√1024 ≈ 3.3%; assert within 3σ
        on a 20k-distinct synthetic set."""
        from beis_orp_data_service_spark.operators import corpus as co

        n = 20_000
        df = spark.range(n).selectExpr("CAST(id AS STRING) AS v")
        regs = co.hll_registers(df, "v", p=10)
        est = co.hll_estimate(regs, p=10)
        assert abs(est - n) / n < 0.10

    def test_small_range_linear_counting(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.range(100).selectExpr("CAST(id AS STRING) AS v")
        est = co.hll_estimate(co.hll_registers(df, "v", p=10), p=10)
        assert abs(est - 100) / 100 < 0.15

    def test_estimate_df_matches_driver_estimate(self, spark):
        """The in-plan hll_estimate_df must agree with the driver-side
        hll_estimate: EXACTLY on the linear-counting branch (integer
        zeros both sides) and to float tolerance on the raw branch
        (driver sums 2^-rho in arbitrary float order; the in-plan form
        sums scaled integers exactly, so tiny rounding differences are
        expected and bounded)."""
        from beis_orp_data_service_spark.operators import corpus as co

        for n in (100, 20_000):  # linear-counting branch, raw branch
            df = spark.range(n).selectExpr("CAST(id AS STRING) AS v")
            regs = co.hll_registers(df, "v", p=10)
            want = co.hll_estimate(regs, p=10)
            row = co.hll_estimate_df(regs, p=10).first()
            assert abs(row.est - want) <= 1e-9 * max(1.0, want)
            # s_total integer invariants: present buckets + zeros
            m, rho_max = 1 << 10, 51
            assert row.n_present == regs.count()
            assert row.s_total <= m * (1 << rho_max)

    def test_estimate_df_empty_input(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.range(0).selectExpr("CAST(id AS STRING) AS v")
        row = co.hll_estimate_df(co.hll_registers(df, "v", p=10), p=10).first()
        # all-zero registers -> linear counting with zeros = m -> ln(1) = 0
        assert row.est == 0.0 and row.n_present == 0

    def test_merge_equals_union_sketch_exactly(self, spark):
        """Mergeable-state property: merge(R(A), R(B)) == R(A ∪ B)
        register-for-register (not approximately)."""
        from beis_orp_data_service_spark.operators import corpus as co

        a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS v")
        b = spark.range(2000, 6000).selectExpr("CAST(id AS STRING) AS v")
        merged = {
            (r.bucket, r.max_rho)
            for r in co.hll_merge(
                co.hll_registers(a, "v"), co.hll_registers(b, "v")
            ).collect()
        }
        direct = {
            (r.bucket, r.max_rho)
            for r in co.hll_registers(a.unionByName(b), "v").collect()
        }
        assert merged == direct

    def test_duplicates_do_not_move_registers(self, spark):
        # cardinality sketch: multiplicity is invisible
        from beis_orp_data_service_spark.operators import corpus as co

        once = spark.range(500).selectExpr("CAST(id AS STRING) AS v")
        thrice = once.unionByName(once).unionByName(once)
        r1 = {(r.bucket, r.max_rho) for r in co.hll_registers(once, "v").collect()}
        r3 = {(r.bucket, r.max_rho) for r in co.hll_registers(thrice, "v").collect()}
        assert r1 == r3

    def test_p_validation(self, spark):
        import pytest as _pytest

        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.range(1).selectExpr("CAST(id AS STRING) AS v")
        with _pytest.raises(ValueError):
            co.hll_registers(df, "v", p=3)

    def test_estimate_rejects_p_mismatch(self, spark):
        import pytest as _pytest

        from beis_orp_data_service_spark.operators import corpus as co

        regs = co.hll_registers(
            spark.range(5000).selectExpr("CAST(id AS STRING) AS v"), "v", p=12
        )
        with _pytest.raises(ValueError):
            co.hll_estimate(regs, p=10)  # buckets beyond 2^10 -> typed error

    def test_nulls_excluded_from_registers(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
        regs = co.hll_registers(df, "v").collect()
        assert all(r.bucket is not None and r.max_rho is not None for r in regs)


class TestRagChunks:
    def _chunks(self, spark, text, width, stride):
        from beis_orp_data_service_spark.operators.corpus import rag_chunks

        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        return sorted(
            (r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in rag_chunks(df, "doc_id", "text", width, stride).collect()
        )

    def test_exact_windows_and_overlap(self, spark):
        text = "a b c d e f g h"
        got = self._chunks(spark, text, width=4, stride=2)
        assert got == [
            (0, "a b c d", 4),
            (1, "c d e f", 4),
            (2, "e f g h", 4),
            (3, "g h", 2),
        ]

    def test_short_doc_single_chunk(self, spark):
        assert self._chunks(spark, "x y", width=64, stride=48) == [(0, "x y", 2)]

    def test_empty_doc_dropped(self, spark):
        from beis_orp_data_service_spark.operators.corpus import rag_chunks

        df = spark.createDataFrame(
            [(1, "   "), (2, "ok")], "doc_id bigint, text string"
        )
        rows = rag_chunks(df, "doc_id", "text", 8, 8).collect()
        assert [r.doc_id for r in rows] == [2]

    def test_reconstruction_no_token_lost(self, spark):
        # stride == width (no overlap): concatenating chunks restores the
        # lowercased token stream exactly
        text = "The quick Brown fox JUMPS over the lazy dog near the bank"
        got = self._chunks(spark, text, width=3, stride=3)
        rebuilt = " ".join(t for _, t, _ in got)
        assert rebuilt == text.lower()

    def test_bad_params_rejected(self, spark):
        import pytest
        from beis_orp_data_service_spark.operators.corpus import rag_chunks

        df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            rag_chunks(df, "doc_id", "text", width=0)
        with pytest.raises(ValueError):
            rag_chunks(df, "doc_id", "text", width=4, stride=0)

    def test_map_only_plan(self, spark):
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators.corpus import rag_chunks
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        plan = (
            rag_chunks(docs, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero shuffles: map-only chunking


class TestCountMin:
    def _words(self, spark, rows):
        return spark.createDataFrame([(w,) for w in rows], "w string")

    def test_never_underestimates_and_exact_when_roomy(self, spark):
        from beis_orp_data_service_spark.operators.corpus import (
            cms_probe,
            cms_sketch,
        )

        words = ["a"] * 5 + ["b"] * 3 + ["c"]
        df = self._words(spark, words)
        sk = cms_sketch(df, "w", w=1024, d=4)
        keys = self._words(spark, ["a", "b", "c", "absent"])
        got = {r.w: r.cms_est for r in cms_probe(sk, keys, "w", 1024, 4).collect()}
        # roomy sketch (3 keys, 4096 cells): estimates are exact
        assert got == {"a": 5, "b": 3, "c": 1, "absent": 0}

    def test_collisions_only_overestimate(self, spark):
        from beis_orp_data_service_spark.operators.corpus import (
            cms_probe,
            cms_sketch,
        )

        words = [f"w{i}" for i in range(40) for _ in range(i % 3 + 1)]
        df = self._words(spark, words)
        sk = cms_sketch(df, "w", w=8, d=2)  # 16 cells, 40 keys: collisions
        from collections import Counter

        exact = Counter(words)
        keys = self._words(spark, sorted(exact))
        got = {r.w: r.cms_est for r in cms_probe(sk, keys, "w", 8, 2).collect()}
        assert all(got[k] >= exact[k] for k in exact)
        assert any(got[k] > exact[k] for k in exact)  # cramped: some collide

    def test_sketch_bounded_and_mergeable(self, spark):
        from beis_orp_data_service_spark.operators.corpus import (
            cms_merge,
            cms_sketch,
        )

        a = self._words(spark, ["x", "y", "x"])
        b = self._words(spark, ["y", "z"])
        both = self._words(spark, ["x", "y", "x", "y", "z"])
        merged = cms_merge(
            cms_sketch(a, "w", w=32, d=2), cms_sketch(b, "w", w=32, d=2)
        )
        direct = cms_sketch(both, "w", w=32, d=2)
        assert merged.count() <= 2 * 32
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_bad_params_rejected(self, spark):
        import pytest
        from beis_orp_data_service_spark.operators.corpus import cms_sketch

        with pytest.raises(ValueError):
            cms_sketch(self._words(spark, ["x"]), "w", w=0, d=1)


class TestPrioritySample:
    def _py_twin(self, rows, k):
        import hashlib

        def u(i):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            return h + 1

        pri = sorted(
            ((w * float(1 << 60) / u(i), i, w) for i, w in rows if w > 0),
            key=lambda t: (-t[0], t[1]),
        )
        top = pri[: k + 1]
        tau = top[-1][0] if len(top) > k else None
        out = []
        for r, (p, i, w) in enumerate(top[:k], 1):
            est = max(float(w), tau) if tau is not None else float(w)
            out.append((i, w, r, round(est * 1_000_000)))
        return out

    def test_matches_pure_python_twin(self, spark):
        from beis_orp_data_service_spark.operators.corpus import priority_sample

        rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        got = [
            (r.doc_id, r.w, r.pri_rank, r.est_w_micro)
            for r in priority_sample(df, "doc_id", "w", 10)
            .orderBy("pri_rank")
            .collect()
        ]
        assert got == self._py_twin(rows, 10)

    def test_k_covers_population_returns_exact_weights(self, spark):
        from beis_orp_data_service_spark.operators.corpus import priority_sample

        rows = [(1, 10), (2, 20), (3, 30)]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        got = priority_sample(df, "doc_id", "w", 50).collect()
        assert len(got) == 3
        assert all(r.est_w_micro == r.w * 1_000_000 for r in got)

    def test_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.operators.corpus import priority_sample

        rows = [(i, i % 50 + 1) for i in range(500)]
        a = spark.createDataFrame(rows, "doc_id bigint, w bigint").repartition(1)
        b = spark.createDataFrame(rows, "doc_id bigint, w bigint").repartition(16)
        ra = sorted(map(tuple, priority_sample(a, "doc_id", "w", 20).collect()))
        rb = sorted(map(tuple, priority_sample(b, "doc_id", "w", 20).collect()))
        assert ra == rb

    def test_heavy_rows_preferred(self, spark):
        from beis_orp_data_service_spark.operators.corpus import priority_sample

        # one row with 1000x the weight of 99 others: it must be sampled
        rows = [(0, 100000)] + [(i, 100) for i in range(1, 100)]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        ids = {r.doc_id for r in priority_sample(df, "doc_id", "w", 5).collect()}
        assert 0 in ids

    def test_topk_plan_no_global_sort(self, spark):
        from beis_orp_data_service_spark.operators.corpus import priority_sample

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(100)], "doc_id bigint, w bigint"
        )
        plan = (
            priority_sample(df, "doc_id", "w", 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestTokenKL:
    def _py_kl(self, rows):
        import math
        from collections import Counter

        gw, cw, ng = Counter(), Counter(), Counter()
        for g, t in rows:
            for w in t.lower().split():
                gw[(g, w)] += 1
                cw[w] += 1
                ng[g] += 1
        n = sum(ng.values())
        out = {}
        for g in ng:
            s = sum(
                c * round(math.log((c * n) / (ng[g] * cw[w])) * 1e6)
                for (gg, w), c in gw.items()
                if gg == g
            )
            out[g] = (ng[g], math.floor(s / ng[g]))
        return out

    def test_matches_pure_python(self, spark):
        from beis_orp_data_service_spark.operators.corpus import token_kl

        rows = [
            ("en", "alpha beta gamma alpha"),
            ("en", "beta beta delta"),
            ("fr", "gamma gamma gamma epsilon"),
            ("fr", "alpha epsilon"),
        ]
        docs = spark.createDataFrame(rows, "lang string, text string")
        got = {
            r.lang: (r.n_tokens, r.kl_micro)
            for r in token_kl(docs, "text", "lang").collect()
        }
        assert got == self._py_kl(rows)

    def test_identical_slices_have_zero_kl(self, spark):
        from beis_orp_data_service_spark.operators.corpus import token_kl

        rows = [("a", "x y z"), ("b", "x y z")]
        docs = spark.createDataFrame(rows, "lang string, text string")
        got = {r.lang: r.kl_micro for r in token_kl(docs, "text", "lang").collect()}
        assert got == {"a": 0, "b": 0}

    def test_disjoint_vocab_maximal_divergence(self, spark):
        from beis_orp_data_service_spark.operators.corpus import token_kl

        # two equal-size slices with disjoint vocab: each word's ratio is
        # (c_gw * N)/(N_g * c_w) = 2, so KL = ln(2) exactly
        import math

        rows = [("a", "p q r s"), ("b", "t u v w")]
        docs = spark.createDataFrame(rows, "lang string, text string")
        got = {r.lang: r.kl_micro for r in token_kl(docs, "text", "lang").collect()}
        ln2 = round(math.log(2) * 1e6)
        assert got == {"a": ln2, "b": ln2}


# ------------------------------------------------- priority_sample_by_group


def test_priority_sample_by_group_exact_k_each(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators.corpus import (
        priority_sample,
        priority_sample_by_group,
    )
    from tests.conftest import SF_SMOKE

    docs_sf001 = load_table(spark, SF_SMOKE, "documents")
    out = priority_sample_by_group(docs_sf001, "doc_id", "n_chars", "source", 3)
    rows = out.collect()
    import collections

    per = collections.Counter(r["source"] for r in rows)
    sizes = {
        r["source"]: r["n"]
        for r in docs_sf001.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for src, n in sizes.items():
        assert per[src] == min(3, n), src
    # within one group the sample must equal the global sampler run on
    # that group alone (same priorities, same tau rule)
    src0 = rows[0]["source"]
    solo = priority_sample(
        docs_sf001.filter(F.col("source") == src0), "doc_id", "n_chars", 3
    ).collect()
    got = {(r["doc_id"], r["pri_rank"], r["est_w_micro"]) for r in rows if r["source"] == src0}
    want = {(r["doc_id"], r["pri_rank"], r["est_w_micro"]) for r in solo}
    assert got == want


def test_priority_sample_by_group_partitioning_invariant(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators.corpus import priority_sample_by_group
    from tests.conftest import SF_SMOKE

    docs_sf001 = load_table(spark, SF_SMOKE, "documents")
    a = priority_sample_by_group(docs_sf001, "doc_id", "n_chars", "source", 4)
    b = priority_sample_by_group(
        docs_sf001.repartition(13), "doc_id", "n_chars", "source", 4
    )
    key = lambda r: (r["source"], r["pri_rank"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------- hll_registers_by_group


def test_hll_by_group_rows_bounded_and_match_solo(spark):
    from beis_orp_data_service_spark.operators.corpus import (
        hll_registers,
        hll_registers_by_group,
    )

    df = spark.createDataFrame(
        [("a", f"w{i % 50}") for i in range(500)]
        + [("b", f"x{i}") for i in range(200)],
        "grp string, w string",
    )
    out = hll_registers_by_group(df, "grp", "w", p=6)
    rows = out.collect()
    assert len(rows) <= 2 * 64  # |groups| * 2^p bound
    # each group's registers equal the global sketch run on that slice
    for grp in ("a", "b"):
        solo = {
            (r["bucket"], r["max_rho"])
            for r in hll_registers(
                df.filter(F.col("grp") == grp).select("w"), "w", p=6
            ).collect()
        }
        got = {(r["bucket"], r["max_rho"]) for r in rows if r["grp"] == grp}
        assert got == solo, grp


def test_hll_by_group_estimate_per_slice(spark):
    from beis_orp_data_service_spark.operators.corpus import (
        hll_estimate,
        hll_registers_by_group,
    )

    df = spark.createDataFrame(
        [("a", f"w{i}") for i in range(300)] + [("b", "only")],
        "grp string, w string",
    )
    regs = hll_registers_by_group(df, "grp", "w", p=10)
    est_a = hll_estimate(regs.filter("grp = 'a'").drop("grp"), p=10)
    est_b = hll_estimate(regs.filter("grp = 'b'").drop("grp"), p=10)
    assert abs(est_a - 300) / 300 < 0.15
    assert round(est_b) == 1


def test_equi_depth_bins_balanced_and_ordered(spark):
    from beis_orp_data_service_spark.operators.corpus import equi_depth_bins

    rows = [("g", i, float(100 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    out = equi_depth_bins(df, "grp", "v", "id", 4).collect()
    import collections

    sizes = collections.Counter(r["bin"] for r in out)
    # SQL-standard fill: 10 rows over 4 bins -> 3,3,2,2
    assert sorted(sizes.values(), reverse=True) == [3, 3, 2, 2]
    # bin is monotone in value
    by_v = sorted(out, key=lambda r: (r["v"], r["id"]))
    bins = [r["bin"] for r in by_v]
    assert bins == sorted(bins)


class TestHeavyHitters:
    """Two-pass Misra-Gries frequent items: pruning is invisible
    (output == naive exact groupBy) and the candidate set is bounded."""

    def _skewed(self, spark):
        # 5000-token tail vocabulary + 3 planted heavy tokens: only the
        # planted ones cross freq*k > N for k=10
        rows = []
        doc = 0
        for h, reps in (("alpha", 4000), ("beta", 3000), ("gamma", 2500)):
            for i in range(reps // 50):
                rows.append((doc, " ".join([h] * 50)))
                doc += 1
        for i in range(5000):
            rows.append((doc, f"tail{i} tail{(i * 7) % 5000}"))
            doc += 1
        return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    def test_matches_exact_groupby_on_skewed(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        docs = self._skewed(spark)
        got = {
            (r["token"], r["freq"])
            for r in corpus_ops.heavy_hitters(docs, k=10, counters=32).collect()
        }
        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
        ).filter(F.col("t") != "")
        n = toks.count()
        exact = {
            (r["t"], r["c"])
            for r in toks.groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect()
            if r["c"] * 10 > n
        }
        assert got == exact
        assert {t for t, _ in got} == {"alpha", "beta", "gamma"}

    def test_candidate_pass_bounded_below_vocab(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        docs = self._skewed(spark)
        toks = docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        ).filter(F.col("token") != "")
        vocab = toks.distinct().count()
        assert vocab > 5000
        # replicate the internal candidate pass at counters=32: per
        # partition <= 32 rows, so the whole candidate set stays far
        # below the vocabulary the naive plan would shuffle
        import pandas as pd

        def _mg(it, c=32):
            counts = {}
            for pdf in it:
                if len(pdf) == 0:
                    continue
                for t, n in pdf["token"].value_counts().items():
                    counts[t] = counts.get(t, 0) + int(n)
                if len(counts) > c:
                    cut = sorted(counts.values(), reverse=True)[c]
                    counts = {t: n - cut for t, n in counts.items() if n > cut}
            yield pd.DataFrame({"token": list(counts)})

        n_parts = toks.rdd.getNumPartitions()
        cands = toks.mapInPandas(_mg, "token string").count()
        assert cands <= 32 * n_parts < vocab

    def test_bad_params_raise(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        docs = self._skewed(spark)
        with pytest.raises(ValueError, match="k must be"):
            corpus_ops.heavy_hitters(docs, k=1)
        with pytest.raises(ValueError, match="counters"):
            corpus_ops.heavy_hitters(docs, k=10, counters=5)


class TestQuantileSketch:
    def test_merge_equals_build(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame(
            [(i, (i * 37) % 1000) for i in range(2000)], "id long, v long"
        )
        whole = corpus_ops.quantile_sketch(df, "v", "id", k=64).collect()
        a = corpus_ops.quantile_sketch(df.filter(F.col("id") < 900), "v", "id", k=64)
        b = corpus_ops.quantile_sketch(df.filter(F.col("id") >= 900), "v", "id", k=64)
        merged = corpus_ops.merge_quantile_sketches(a, b, k=64).collect()
        assert sorted(map(tuple, whole)) == sorted(map(tuple, merged))
        assert len(whole) == 64

    def test_estimates_within_kmv_error(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        # uniform 0..9999 over 10k rows: exact pq = q*100-ish; a k=256
        # sample has rank stddev ~ sqrt(q%(100-q%)/k) -> tolerate 5 sigma
        df = spark.createDataFrame(
            [(i, (i * 7919) % 10_000) for i in range(10_000)], "id long, v long"
        )
        sk = corpus_ops.quantile_sketch(df, "v", "id", k=256)
        row = corpus_ops.sketch_quantiles(sk, qs=(50, 90, 99)).collect()[0]
        assert row["n_sample"] == 256
        for q, exact in ((50, 5000), (90, 9000), (99, 9900)):
            sigma = (q / 100 * (1 - q / 100) / 256) ** 0.5 * 10_000
            assert abs(row[f"p{q}"] - exact) <= 5 * sigma + 100, (
                q, row[f"p{q}"], exact
            )

    def test_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame(
            [(i, i % 113) for i in range(3000)], "id long, v long"
        )
        s1 = corpus_ops.quantile_sketch(df.repartition(3), "v", "id", k=32).collect()
        s2 = corpus_ops.quantile_sketch(df.repartition(17), "v", "id", k=32).collect()
        assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))

    def test_bad_k(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1, 1)], "id long, v long")
        with pytest.raises(ValueError, match="k must be"):
            corpus_ops.quantile_sketch(df, "v", "id", k=0)


class TestDatasetSplit:
    def test_ratios_and_determinism(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(i,) for i in range(10_000)], "id long")
        out = corpus_ops.dataset_split(df, "id", {"train": 800, "val": 100, "test": 100})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] - 8000) < 300
        assert abs(counts["val"] - 1000) < 150
        # same row -> same split on a grown corpus
        small = {
            r["id"]: r["split"]
            for r in corpus_ops.dataset_split(
                df.filter("id < 100"), "id", {"train": 800, "val": 100, "test": 100}
            ).collect()
        }
        big = {
            r["id"]: r["split"]
            for r in out.filter("id < 100").collect()
        }
        assert small == big

    def test_bad_ratios(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="sum to 1000"):
            corpus_ops.dataset_split(df, "id", {"a": 500, "b": 499})


class TestGroupCapSample:
    def test_cap_enforced_and_deterministic(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(g * 1000 + i, f"g{g}") for g in range(3) for i in range((g + 1) * 30)]
        df = spark.createDataFrame(rows, "id long, grp string")
        out = corpus_ops.group_cap_sample(df, "grp", "id", cap=25)
        sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        assert sizes == {"g0": 25, "g1": 25, "g2": 25}
        a = sorted(r["id"] for r in out.collect())
        b = sorted(
            r["id"]
            for r in corpus_ops.group_cap_sample(df.repartition(13), "grp", "id", cap=25).collect()
        )
        assert a == b

    def test_small_groups_untouched(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1, "g"), (2, "g")], "id long, grp string")
        out = corpus_ops.group_cap_sample(df, "grp", "id", cap=10).collect()
        assert {r["id"] for r in out} == {1, 2}
        assert sorted(r["keep_rank"] for r in out) == [1, 2]


class TestTemperatureMixture:
    def test_rebalances_toward_small_sources(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        # 9000-row giant + 1000-row minor source; alpha=0.5 boosts the
        # minor source's share well above its natural 10%
        rows = [(i, "big") for i in range(9000)] + [
            (i, "small") for i in range(9000, 10_000)
        ]
        df = spark.createDataFrame(rows, "id long, src string")
        out = corpus_ops.temperature_mixture(df, "src", "id", target_rows=2000)
        sizes = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        # smoothed shares: sqrt(9000):sqrt(1000) = 3:1 -> small gets ~25%
        # of the 2000 target vs its natural 10%
        assert sizes["small"] > 0.18 * (sizes["small"] + sizes["big"])
        total = sizes["small"] + sizes["big"]
        assert abs(total - 2000) < 300

    def test_alpha_100_keeps_natural_shares(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(i, "a") for i in range(8000)] + [(i, "b") for i in range(8000, 10_000)]
        df = spark.createDataFrame(rows, "id long, src string")
        out = corpus_ops.temperature_mixture(df, "src", "id", target_rows=1000, alpha_pct=100)
        sizes = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        share_a = sizes["a"] / (sizes["a"] + sizes["b"])
        assert abs(share_a - 0.8) < 0.08

    def test_small_source_capped_at_full(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(i, "big") for i in range(5000)] + [(5000, "tiny")]
        df = spark.createDataFrame(rows, "id long, src string")
        out = corpus_ops.temperature_mixture(df, "src", "id", target_rows=4000)
        # rate caps at 1000 pm — the tiny source can at most fully appear
        assert out.filter("src = 'tiny'").count() <= 1

    def test_bad_params(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1, "a")], "id long, src string")
        with pytest.raises(ValueError, match="alpha_pct"):
            corpus_ops.temperature_mixture(df, "src", "id", 10, alpha_pct=75)
        with pytest.raises(ValueError, match="target_rows"):
            corpus_ops.temperature_mixture(df, "src", "id", 0)


class TestWdsShards:
    def test_tar_roundtrip_and_length_arithmetic(self, spark):
        import io
        import tarfile

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(i, f"document body {i} " * (i % 7 + 1)) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = corpus_ops.wds_tar_shards(df, "doc_id", "text", n_shards=4).collect()
        assert sum(r["n_members"] for r in out) == 50
        texts = dict(rows)
        for r in out:
            assert r["tar_len"] == len(r["tar_bytes"])
            # length arithmetic: per-member 512 header + padded payload,
            # + 1024 end marker, padded to the 10240 record
            with tarfile.open(fileobj=io.BytesIO(bytes(r["tar_bytes"]))) as tf:
                members = tf.getmembers()
                assert len(members) == r["n_members"]
                blocks = sum(512 + ((m.size + 511) // 512) * 512 for m in members)
                assert r["tar_len"] == ((blocks + 1024 + 10239) // 10240) * 10240
                # members ordered by id; content round-trips exactly
                names = [m.name for m in members]
                assert names == sorted(names, key=lambda n: int(n[:-4]))
                for m in members:
                    got = tf.extractfile(m).read().decode("utf-8")
                    assert got == texts[int(m.name[:-4])]
                    assert m.mtime == 0 and m.uid == 0 and m.mode == 0o644

    def test_bytes_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(i, f"text {i}") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {
            r["shard_id"]: bytes(r["tar_bytes"])
            for r in corpus_ops.wds_tar_shards(
                df.repartition(3), "doc_id", "text", n_shards=4
            ).collect()
        }
        b = {
            r["shard_id"]: bytes(r["tar_bytes"])
            for r in corpus_ops.wds_tar_shards(
                df.repartition(17), "doc_id", "text", n_shards=4
            ).collect()
        }
        assert a == b  # bit-identical shards under any layout

    def test_bad_shards(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_shards"):
            corpus_ops.wds_tar_shards(df, "doc_id", "text", n_shards=0)


class TestQuantileSketchGrouped:
    def test_per_group_k_and_merge_property(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        rows = [(i, f"g{i % 3}", i % 500) for i in range(3000)]
        df = spark.createDataFrame(rows, "id long, grp string, v long")
        sk = corpus_ops.quantile_sketch_grouped(df, "grp", "v", "id", k=32)
        sizes = {r["grp"]: r["n"] for r in sk.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        assert sizes == {"g0": 32, "g1": 32, "g2": 32}
        # per-group rows equal the solo sketch run on that group alone
        solo = corpus_ops.quantile_sketch(
            df.filter("grp = 'g1'").select("id", "v"), "v", "id", k=32
        ).collect()
        grp1 = sk.filter("grp = 'g1'").select("id", "value", "hkey").collect()
        assert sorted(map(tuple, solo)) == sorted(map(tuple, grp1))

    def test_bad_k(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([(1, "g", 1)], "id long, grp string, v long")
        with pytest.raises(ValueError, match="k must be"):
            corpus_ops.quantile_sketch_grouped(df, "grp", "v", "id", k=0)


class TestThetaSketch:
    def _sets(self, spark, n_a, n_b, overlap):
        a = spark.createDataFrame(
            [(f"u{i}",) for i in range(n_a)], "v string"
        )
        b = spark.createDataFrame(
            [(f"u{i}",) for i in range(n_a - overlap, n_a - overlap + n_b)],
            "v string",
        )
        return a, b

    def test_unsaturated_is_exact(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        a, b = self._sets(spark, 30, 25, 10)
        row = corpus_ops.theta_set_ops(
            corpus_ops.theta_sketch(a, "v", k=64),
            corpus_ops.theta_sketch(b, "v", k=64),
            k=64,
        ).collect()[0]
        assert row["theta_long"] == corpus_ops.THETA_ONE
        assert row["n_union"] == 45
        assert row["n_intersect"] == 10
        assert row["n_a_only"] == 20
        assert row["est_union"] == 45.0
        assert row["est_intersect"] == 10.0
        assert row["est_a_only"] == 20.0

    def test_saturated_within_error(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        n_a = n_b = 4000
        overlap = 1500
        a, b = self._sets(spark, n_a, n_b, overlap)
        k = 256
        row = corpus_ops.theta_set_ops(
            corpus_ops.theta_sketch(a, "v", k=k),
            corpus_ops.theta_sketch(b, "v", k=k),
            k=k,
        ).collect()[0]
        union = n_a + n_b - overlap
        assert row["theta_long"] < corpus_ops.THETA_ONE
        # KMV relative error ~ 1/sqrt(k); allow 5 sigma
        tol = 5 / (k ** 0.5)
        assert abs(row["est_union"] - union) <= tol * union
        assert abs(row["est_intersect"] - overlap) <= tol * union, (
            row["est_intersect"], overlap
        )

    def test_mergeable_bottom_k(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame(
            [(f"x{i}",) for i in range(3000)], "v string"
        )
        import pyspark.sql.functions as F

        whole = corpus_ops.theta_sketch(df, "v", k=128).collect()
        lo = corpus_ops.theta_sketch(
            df.where(F.col("v") < "x5"), "v", k=128
        )
        hi = corpus_ops.theta_sketch(
            df.where(F.col("v") >= "x5"), "v", k=128
        )
        merged = (
            lo.unionByName(hi).distinct().orderBy("hkey").limit(128).collect()
        )
        assert sorted(r["hkey"] for r in whole) == sorted(
            r["hkey"] for r in merged
        )

    def test_partitioning_invariant(self, spark):
        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame(
            [(f"x{i}",) for i in range(2000)], "v string"
        )
        s1 = corpus_ops.theta_sketch(df.repartition(3), "v", k=64).collect()
        s2 = corpus_ops.theta_sketch(df.repartition(13), "v", k=64).collect()
        assert sorted(r["hkey"] for r in s1) == sorted(r["hkey"] for r in s2)

    def test_bad_k(self, spark):
        import pytest

        from beis_orp_data_service_spark.operators import corpus as corpus_ops

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="k must be"):
            corpus_ops.theta_sketch(df, "v", k=1)


class TestWordDropout:
    def test_boundary_rates_and_order(self, spark):
        from beis_orp_data_service_spark.operators import corpus

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        keep_all = corpus.word_dropout(docs, drop_pm=0).collect()[0]
        assert keep_all.text_aug == "alpha beta gamma delta"  # order kept
        assert (keep_all.n_kept, keep_all.n_dropped) == (4, 0)
        drop_all = corpus.word_dropout(docs, drop_pm=1000).collect()[0]
        assert drop_all.text_aug == ""
        assert (drop_all.n_kept, drop_all.n_dropped) == (0, 4)

    def test_nasty_whitespace_matches_duckdb_twin(self, spark):
        """Leading tab/newline used to give Spark a leading empty token
        from the raw split (trim strips spaces only), shifting every
        position and flipping md5 keep/drop vs the oracle's filtered
        list. Both engines now regex-strip all \\s before
        splitting."""
        import duckdb
        import pandas as pd

        from beis_orp_data_service_spark.operators import corpus

        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "\talpha beta gamma delta epsilon",
                    "\n\nzeta eta\ttheta  iota\n",
                    "  kappa lambda mu ",
                    "plain words here",
                ],
            }
        )
        got = sorted(
            map(
                tuple,
                corpus.word_dropout(
                    spark.createDataFrame(pdf), drop_pm=500
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.register("documents", pdf)
        want = sorted(
            map(
                tuple,
                con.execute(
                    corpus.word_dropout_oracle_sql("documents", 500)
                ).fetchall(),
            )
        )
        assert got == want
        # every doc contributes a group (empty tokens filtered, not docs)
        assert [r[0] for r in got] == [1, 2, 3, 4]

    def test_deterministic_and_partition_invariant(self, spark):
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import corpus

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(
            map(tuple, corpus.word_dropout(docs.repartition(1), 100).collect())
        )
        b = sorted(
            map(tuple, corpus.word_dropout(docs.repartition(16), 100).collect())
        )
        assert a == b
        # the realized drop rate tracks the 10% per-mille target
        kept = sum(r[2] for r in a)
        dropped = sum(r[3] for r in a)
        rate = dropped / (kept + dropped)
        assert 0.05 < rate < 0.15


class TestDoremiReweight:
    def test_hard_domain_upweighted_and_normalized(self, spark):
        """Domain 'rare' uses tokens appearing nowhere else (high
        surprisal under the corpus distribution); 'common' repeats one
        corpus-dominant token. The EG step must weight rare > common,
        weights must sum to ~1e9 (floor remainder < n_domains), and
        eta=0 must return uniform weights."""
        from beis_orp_data_service_spark.operators import corpus

        docs = spark.createDataFrame(
            [
                (1, "the the the the the the the the", "common"),
                (2, "the the the the the the the the", "common"),
                (3, "zyx wvu tsr qpo", "rare"),
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r.domain: r.weight_nano
            for r in corpus.doremi_reweight(docs, eta=1.0).collect()
        }
        assert got["rare"] > got["common"]
        assert 1_000_000_000 - 2 <= sum(got.values()) <= 1_000_000_000
        flat = {
            r.domain: r.weight_nano
            for r in corpus.doremi_reweight(docs, eta=0.0).collect()
        }
        assert flat["rare"] == flat["common"] == 500_000_000

    def test_partition_invariant(self, spark):
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import corpus

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(map(tuple, corpus.doremi_reweight(docs.repartition(1)).collect()))
        b = sorted(map(tuple, corpus.doremi_reweight(docs.repartition(16)).collect()))
        assert a == b


class TestDedupSavings:
    def test_hand_built_clusters(self, spark):
        """Clusters {1,2,3} (canonical 1) and {10} (singleton): the
        size-3 bucket saves the two non-canonical members' chars, the
        singleton bucket saves 0."""
        from beis_orp_data_service_spark.operators import corpus

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10)],
            "doc_id long, cluster_id long",
        )
        docs = spark.createDataFrame(
            [(1, 100), (2, 40), (3, 60), (10, 7)],
            "doc_id long, n_chars long",
        )
        got = {
            r.cluster_size: (r.n_clusters, r.n_docs, r.chars_total, r.chars_saved)
            for r in corpus.dedup_savings(clusters, docs).collect()
        }
        assert got == {3: (1, 3, 200, 100), 1: (1, 1, 7, 0)}


class TestBpeFertility:
    def test_hand_computed(self, spark):
        """'don't stop' = 2 whitespace words, 4 BPE pieces (don + 't +
        _stop ... plus leading-word handling) — fertility 2000 per
        mille; empty-text lang yields NULL ratios (// 0 parity)."""
        from beis_orp_data_service_spark.operators import textstats as ts

        docs = spark.createDataFrame(
            [(1, "don't stop", "en"), (2, "", "zz")],
            "doc_id long, text string, lang string",
        )
        got = {r.lang: r for r in ts.bpe_fertility_by_lang(docs).collect()}
        en = got["en"]
        assert (en.ws_tokens, en.n_chars) == (2, 10)
        assert en.fertility_milli == en.bpe_tokens * 1000 // en.ws_tokens
        zz = got["zz"]
        assert (zz.ws_tokens, zz.bpe_tokens) == (0, 0)
        assert zz.fertility_milli is None and zz.chars_per_bpe_milli is None


class TestHllEstimateByGroup:
    def test_matches_per_group_global_estimate(self, spark):
        """Grouped estimates must equal running hll_estimate_df on each
        group's own slice (same registers, same arithmetic)."""
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.range(30_000).selectExpr(
            "CAST(id % 3 AS STRING) AS grp",
            # group 0: 10k distinct; group 1: 500 distinct (linear-
            # counting branch); group 2: 10k distinct, different values
            "CASE WHEN id % 3 = 1 THEN CAST(id % 1500 AS STRING) "
            "ELSE CAST(id AS STRING) END AS v",
        )
        regs = co.hll_registers_by_group(df, "grp", "v", p=10)
        got = {
            r.grp: (r.est, r.n_present, r.s_total)
            for r in co.hll_estimate_by_group(regs, "grp", p=10).collect()
        }
        for g in ("0", "1", "2"):
            slice_regs = regs.where(F.col("grp") == g).select(
                "bucket", "max_rho"
            )
            want = co.hll_estimate_df(slice_regs, p=10).first()
            assert got[g] == (want.est, want.n_present, want.s_total), g

    def test_ngram_diversity_approx_tracks_exact(self, spark):
        """p=12 → ~1.6% standard error; the approx distinct count must
        land within 10% of the exact per-group count on real docs."""
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import textstats as ts
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        exact = {
            r.source: r.n_distinct
            for r in ts.ngram_diversity(docs).collect()
        }
        approx = {
            r.source: (r.n_ngrams, r.n_distinct_est)
            for r in ts.ngram_diversity_approx(docs).collect()
        }
        assert set(exact) == set(approx)
        for src, n_exact in exact.items():
            n_ngrams, est = approx[src]
            assert abs(est - n_exact) / max(1, n_exact) < 0.10, (
                src, n_exact, est,
            )

    def test_exploded_token_ngrams_matches_array_form(self, spark):
        """The codegen exploded spelling (slice×n + arrays_zip +
        concat_ws) must produce the SAME (group, gram) multiset as
        exploding token_ngrams_expr's array — real docs plus the edge
        cases the array form's guards encode (short/empty/null text,
        interior whitespace runs)."""
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import textstats as ts
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        edge = spark.createDataFrame(
            [
                (1, "x", "a b c d"),
                (2, "x", "a b"),
                (3, "x", ""),
                (4, "x", None),
                (5, "x", "  lots   of   space  "),
                (6, "x", "one"),
            ],
            "doc_id long, source string, text string",
        )
        for d in (docs, edge):
            old = sorted(
                tuple(r)
                for r in d.select(
                    F.col("source").alias("grp"),
                    F.explode(ts.token_ngrams_expr("text", 3)).alias("gram"),
                ).collect()
            )
            new = sorted(
                tuple(r)
                for r in ts.exploded_token_ngrams(
                    d, "source", "text", 3
                ).collect()
            )
            assert old == new

    def test_ngram_diversity_approx_fused_matches_two_pass(self, spark):
        """The r14 single-pass spelling (registers aggregate carries the
        exact per-bucket occurrence count; the estimate stage sums it
        back) must be BIT-EQUAL to the old two-pass join spelling —
        exact n_ngrams, double-identical estimate, same floor ratio."""
        from beis_orp_data_service_spark.catalog import load_table
        from beis_orp_data_service_spark.operators import corpus as co
        from beis_orp_data_service_spark.operators import textstats as ts
        from beis_orp_data_service_spark.operators.textstats import (
            token_ngrams_expr,
        )
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        g = docs.select(
            F.col("source").alias("grp"),
            F.explode(token_ngrams_expr("text", 3)).alias("gram"),
        )
        tot = g.groupBy("grp").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams")
        )
        est = co.hll_estimate_by_group(
            co.hll_registers_by_group(g, "grp", "gram", p=12), "grp", p=12
        ).select("grp", F.col("est").alias("n_distinct_est"))
        two_pass = {
            (r.grp, r.n_ngrams, r.n_distinct_est)
            for r in tot.join(est, "grp").collect()
        }
        fused = {
            (r.source, r.n_ngrams, r.n_distinct_est)
            for r in ts.ngram_diversity_approx(docs).collect()
        }
        assert fused == two_pass and len(fused) > 0


class TestPretrainCorpusCapstone:
    def test_invariants_on_smoke_fixture(self, spark):
        """The one-plan corpus assembler: no tail docs survive, every
        kept row fits the per-language budget, and a planted exact
        duplicate is consolidated to its canonical id upstream."""
        from beis_orp_data_service_spark.declared import (
            _PRETRAIN_BUDGET,
            REGISTRY,
        )
        from tests.conftest import SF_SMOKE

        out = REGISTRY["pretrain_corpus"].fn(spark, SF_SMOKE).toPandas()
        assert len(out) > 0
        assert set(out.bucket_label.unique()) <= {"head", "middle"}
        assert (out.tok_cum <= _PRETRAIN_BUDGET).all()
        assert (out.groupby("lang").tok_cum.max() <= _PRETRAIN_BUDGET).all()
        # budget actually binds for at least one language (kept tokens
        # near the cap), i.e. the selection is not vacuously everything
        assert out.groupby("lang").tok_cum.max().max() > _PRETRAIN_BUDGET / 2


class TestUnigramTokenizer:
    def test_viterbi_tiebreak_prefers_fewer_pieces(self, spark):
        """'aab' under {a:-100, b:-200, ab:-150, aab:-250}: 'a'+'ab'
        and 'aab' tie at -250; the (score DESC, n_pieces ASC) rule must
        pick the single piece — this pins the kernel's tuple-max
        against the oracle's struct list_max semantics."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [(1, "aab"), (2, "ba ba"), (3, "")],
            "doc_id long, text string",
        )
        scores = {"a": -100, "b": -200, "ab": -150, "aab": -250}
        out = {
            r["doc_id"]: (r["n_pieces"], r["score_micro_sum"])
            for r in co.unigram_segment(docs, scores).collect()
        }
        assert out[1] == (1, -250)
        # 'ba' not in vocab: b+a = -300 per word, two words
        assert out[2] == (4, -600)
        assert out[3] == (0, 0)  # empty text -> zero pieces

    def test_oracle_sql_matches_python_reference(self):
        """Triangle: the DuckDB vocab+Viterbi oracle vs an independent
        pure-Python reimplementation (own substring counting, own
        math.log scoring, own DP) on a corpus with tie and overlap
        pressure."""
        import math

        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        texts = ["abab abab aab", "ba ab aaab", "x yz zyx"]
        L, P = 4, 10  # small top_p forces the singles-union path

        # reference: vocab
        from collections import Counter

        wf = Counter()
        for t in texts:
            for w in t.split():
                if w:
                    wf[w] += 1
        pc = Counter()
        for w, f in wf.items():
            for i in range(len(w)):
                for l in range(1, min(L, len(w) - i) + 1):
                    pc[w[i : i + l]] += f
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:P]
        vocab = dict(top)
        for p, c in pc.items():
            if len(p) == 1:
                vocab[p] = c
        total = sum(vocab.values())

        def half_up(v):
            return int(math.floor(v + 0.5)) if v >= 0 else -int(
                math.floor(-v + 0.5)
            )

        sc = {p: half_up(math.log(c / total) * 1e6) for p, c in vocab.items()}

        def viterbi(w):
            best = [(0, 0)]
            for i in range(1, len(w) + 1):
                cands = []
                for l in range(1, min(L, i) + 1):
                    s = sc.get(w[i - l : i])
                    if s is not None:
                        ps, pn = best[i - l]
                        cands.append((ps + s, -(pn + 1)))
                b = max(cands)
                best.append((b[0], -b[1]))
            return best[-1]

        expect = {}
        for d, t in enumerate(texts):
            np_ = s_ = 0
            for w in t.split():
                sco, n = viterbi(w)
                np_ += n
                s_ += sco
            expect[d] = (np_, s_)

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
        )
        got_sc = dict(
            con.sql(co.unigram_scores_oracle_sql(L, P)).fetchall()
        )
        assert got_sc == sc
        got = {
            r[0]: (r[1], r[2])
            for r in con.sql(co.unigram_segment_oracle_sql(L, P)).fetchall()
        }
        assert got == expect

    def test_frequent_piece_compresses(self, spark):
        """A corpus dominated by 'abab' must segment those words into
        fewer pieces than characters (the tokenizer actually learned
        something), while never emitting fewer than ceil(len/L)."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [(i, "abab abab abab") for i in range(6)] + [(99, "q r s")],
            "doc_id long, text string",
        )
        scores = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(docs, top_p=20).collect()
        }
        assert "abab" in scores
        out = {
            r["doc_id"]: r["n_pieces"]
            for r in co.unigram_segment(docs, scores).collect()
        }
        assert out[0] == 3  # three 'abab' words, one piece each
        assert out[99] == 3  # singles

    def test_em_round_piece_mass_equals_segment_totals(self, spark):
        """Conservation: the EM recount's Σcnt must equal the sum of
        n_pieces over all document occurrences — both count every
        word-occurrence's Viterbi piece slots exactly once."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [(1, "abab abab aab"), (2, "ba ab aaab"), (3, "x yz zyx")],
            "doc_id long, text string",
        )
        scores = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(docs, top_p=10).collect()
        }
        seg_total = (
            co.unigram_segment(docs, scores)
            .agg(F.sum("n_pieces"))
            .first()[0]
        )
        em = co.unigram_em_round(docs, scores).collect()
        assert sum(r["cnt"] for r in em) == seg_total
        # every counted piece was scoreable under the input model
        assert all(r["piece"] in scores for r in em)

    def test_backtrace_full_tie_prefers_smaller_piece_len(self, spark):
        """'abc' under {a,b,c:-1, ab,bc:-2}: 'ab'+'c' and 'a'+'bc' tie
        on BOTH score (-3) and n_pieces (2); the third tie key
        (smaller last-piece length) must pick 'ab'+'c' — in the kernel
        AND in the recursive-CTE oracle."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        scores = {"a": -1, "b": -1, "c": -1, "ab": -2, "bc": -2}
        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        em = {
            r["piece"]: r["cnt"]
            for r in co.unigram_em_round(docs, scores).collect()
        }
        assert em == {"ab": 1, "c": 1}
        # oracle side: same corpus, vocab built from the corpus itself
        # is different — so replay the DP/backtrace via the kernel's
        # table instead and assert the chosen path directly
        tab = co._viterbi_table("abc", scores, 4)
        assert (tab[3][0], tab[3][1], tab[3][2]) == (-3, 2, 1)  # last='c'

    def test_em_oracle_full_tie_duckdb_matches_kernel(self, spark):
        """Execute the EM oracle's 'ml' tie key IN DuckDB under genuine
        full-tie pressure: corpus ['abc'] with max_piece_len=2 derives
        a vocab {a,b,c,ab,bc} with IDENTICAL counts, so at pos 3 the
        candidates 'ab'+'c' and 'a'+'bc' tie on both summed score and
        piece count and only the third key decides which piece the
        backtrace records. The oracle's used-piece counts must equal
        the kernel's — a struct-ordering or sign error in the 'ml'
        branch flips the answer to {a, bc}."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        scores = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(docs, max_piece_len=2).collect()
        }
        # the tie is real: all five derived pieces score identically
        assert len(set(scores.values())) == 1 and len(scores) == 5
        kernel = sorted(
            (r["piece"], r["cnt"], r["score_micro"])
            for r in co.unigram_em_round(
                docs, scores, max_piece_len=2
            ).collect()
        )
        assert [p for p, _, _ in kernel] == ["ab", "c"]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (1, 'abc')")
        oracle = sorted(
            con.sql(co.unigram_em_round_oracle_sql(2, 2000)).fetchall()
        )
        assert oracle == kernel

    def test_unsegmentable_word_raises_named_error(self):
        """A score table missing a character of the word being
        segmented (scores trained on a different doc subset) must fail
        with a ValueError naming the word and the missing character,
        not an opaque max()-of-empty crash inside the Arrow worker."""
        import pytest

        from beis_orp_data_service_spark.operators import corpus as co

        with pytest.raises(ValueError, match=r"'qxj'.*'x'"):
            co._viterbi_table("qxj", {"q": -1, "j": -1}, 4)
        # full coverage of the word's characters → no error
        tab = co._viterbi_table("qj", {"q": -1, "j": -1}, 4)
        assert tab[-1][1] == 2

    def test_train_fixed_point_and_alphabet_floor(self, spark):
        """On a corpus whose best segmentation is already stable
        ('abab' words segment as one piece), a second training round
        must reproduce the first round's model exactly (hard-EM fixed
        point), and the unused singles a/b must re-enter via the
        alphabet floor at cnt=1 — never drop out (coverage guarantee:
        the next round's Viterbi can always segment every word)."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [(i, "abab abab") for i in range(3)], "doc_id long, text string"
        )
        r1 = sorted(
            (r["piece"], r["cnt"], r["score_micro"])
            for r in co.unigram_train(docs, n_rounds=1, prune_to=5).collect()
        )
        r2 = sorted(
            (r["piece"], r["cnt"], r["score_micro"])
            for r in co.unigram_train(docs, n_rounds=2, prune_to=5).collect()
        )
        assert r1 == r2  # fixed point
        by_piece = {p: c for p, c, _ in r1}
        assert by_piece["abab"] == 6  # 2 words x 3 docs, one piece each
        assert by_piece["a"] == 1 and by_piece["b"] == 1  # floor rows

    def test_train_prune_bound_and_coverage(self, spark):
        """Model size is parameter-bounded (<= prune_to multi-char
        pieces) and every corpus character stays segmentable."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [
                (0, "abab abab abab cdcd cdcd"),
                (1, "ab cd abcd abab"),
                (2, "xyz xyz wxyz"),
            ],
            "doc_id long, text string",
        )
        rows = co.unigram_train(docs, n_rounds=2, prune_to=2).collect()
        multi = [r["piece"] for r in rows if len(r["piece"]) >= 2]
        assert len(multi) <= 2
        chars = {c for _, t in docs.collect() for c in t.replace(" ", "")}
        model_chars = {r["piece"] for r in rows if len(r["piece"]) == 1}
        assert chars <= model_chars
        # final model segments the corpus without the coverage guard
        scores = {r["piece"]: r["score_micro"] for r in rows}
        seg = co.unigram_segment(docs, scores).collect()
        assert all(r["n_pieces"] > 0 for r in seg)

    def test_train_segment_total_improves_over_seed(self, spark):
        """Training must help: the corpus total Viterbi score under the
        round-2 model is at least the score under the seed model on
        this corpus (pinned regression property — hard-EM with pruning
        is not monotone in general, but it is here, and a refactor that
        breaks the E/M wiring shows up as a drop)."""
        from beis_orp_data_service_spark.operators import corpus as co

        docs = spark.createDataFrame(
            [
                (0, "abab abab abab cdcd cdcd"),
                (1, "ab cd abcd abab abab"),
                (2, "abab cdcd abcd"),
            ],
            "doc_id long, text string",
        )
        seed = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_scores(docs).collect()
        }
        trained = {
            r["piece"]: r["score_micro"]
            for r in co.unigram_train(docs, n_rounds=2, prune_to=50).collect()
        }
        tot_seed = (
            co.unigram_segment(docs, seed).agg(F.sum("score_micro_sum"))
        ).first()[0]
        tot_trained = (
            co.unigram_segment(docs, trained).agg(F.sum("score_micro_sum"))
        ).first()[0]
        assert tot_trained >= tot_seed

    def test_train_oracle_parity_duckdb(self, spark):
        """Spark trainer == the 2-round unrolled-CTE oracle, bit-exact,
        on a corpus where pruning bites and the floor fires."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        texts = [
            (0, "abab abab abab cdcd cdcd"),
            (1, "ab cd abcd abab"),
            (2, "xyz xyz wxyz"),
            (3, "q r s abab"),
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = sorted(
            (r["piece"], r["cnt"], r["score_micro"])
            for r in co.unigram_train(docs, n_rounds=2, prune_to=3).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
        exp = sorted(
            con.sql(co.unigram_train_oracle_sql(2, prune_to=3)).fetchall()
        )
        assert got == exp


class TestWordPiece:
    """WordPiece (Schuster & Nakajima 2012 / BERT): likelihood-scored
    merges + greedy longest-match encode — triangle-tested against a
    pure-Python reference trainer/matcher, and Spark↔DuckDB parity."""

    @staticmethod
    def _reference_wp(texts, n_merges):
        """Pure-Python WordPiece trainer: symbols with ## continuation
        prefixes; each round picks argmax of pair/(cnt_a*cnt_b) ranked
        through the exact integer key (pair*10^18)//(ca*cb), ties
        (a, b) ascending — the engine's documented quantization."""
        from collections import Counter

        words = Counter()
        for t in texts:
            for w in t.split():
                words[w] += 1
        vocab = Counter()
        for w, f in words.items():
            syms = tuple(
                [w[0]] + ["##" + c for c in w[1:]]
            )
            vocab[syms] += f
        merges = []
        for rank in range(1, n_merges + 1):
            pairs, syms_cnt = Counter(), Counter()
            for syms, freq in vocab.items():
                for s in syms:
                    syms_cnt[s] += freq
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += freq
            if not pairs:
                break
            best = min(
                pairs.items(),
                key=lambda kv: (
                    -(kv[1] * 10**18
                      // (syms_cnt[kv[0][0]] * syms_cnt[kv[0][1]])),
                    kv[0],
                ),
            )
            (a, b), cnt = best
            key = cnt * 10**18 // (syms_cnt[a] * syms_cnt[b])
            merges.append((rank, a, b, cnt, key))
            merged = a + b[2:]
            new_vocab = Counter()
            for syms, freq in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_vocab[tuple(res)] += freq
            vocab = new_vocab
        return merges

    TEXTS = [
        "hugging huggable hugs hugging",
        "the bug hugs the rug",
        "unhuggable things",
        "zz qq",
        "  padded \t runs  ",
    ]

    def test_trainer_matches_reference_spark_and_duckdb(self, spark):
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        expect = self._reference_wp(self.TEXTS, 5)
        df = spark.createDataFrame(
            list(enumerate(self.TEXTS)), "doc_id long, text string"
        )
        got = sorted(
            tuple(r)
            for r in co.wordpiece_learn_merges(df, n_merges=5).collect()
        )
        assert got == sorted(expect)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            list(enumerate(self.TEXTS)),
        )
        assert sorted(
            con.sql(co.wordpiece_merges_oracle_sql(5)).fetchall()
        ) == sorted(expect)

    def test_likelihood_beats_raw_frequency(self, spark):
        """The defining WordPiece property: a rare-but-exclusive pair
        outscores a frequent-but-promiscuous one. 'zz' appears once
        (score 1.0: its symbols appear nowhere else); 'hu' appears in
        four words but h and ##u are common — BPE would merge the
        frequent pair first, WordPiece must pick the exclusive one."""
        from beis_orp_data_service_spark.operators import corpus as co

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string",
        )
        first = co.wordpiece_learn_merges(df, n_merges=1).collect()[0]
        assert (first["a"], first["b"]) in {("q", "##q"), ("z", "##z")}
        assert first["score_q"] == 10**18  # pair == both symbol counts

    def test_greedy_longest_match_and_unk(self, spark):
        from beis_orp_data_service_spark.operators import corpus as co

        vocab = ["hug", "##ging", "##g", "##in", "h", "##u", "b"]
        df = spark.createDataFrame(
            [(0, "hugging"), (1, "bhug"), (2, "xyz hug")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["n_tokens"], r["n_unk_words"])
            for r in co.wordpiece_tokenize(df, vocab).collect()
        }
        # hugging -> hug ##ging (longest-first, NOT hug ##g ##in ##g)
        assert out[0] == (2, 0)
        # bhug -> b + ##... no '##h' in vocab -> whole word UNK (1 tok)
        assert out[1] == (1, 1)
        # xyz unknown (1) + hug (1)
        assert out[2] == (2, 1)

    def test_degenerate_corpus_carries_state_forward(self):
        """'ab ab' admits ONE merge; asking the oracle for 4 must keep
        the encode side on the true final state (the BPE carry-forward
        rule applies to the WordPiece chain too)."""
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (0, 'ab ab')")
        # pair=2, cnt_a=2, cnt_b=2 -> key = 2*10^18 // 4
        assert con.sql(co.wordpiece_merges_oracle_sql(4)).fetchall() == [
            (1, "a", "##b", 2, 5 * 10**17)
        ]
        assert con.sql(co.wordpiece_encode_oracle_sql(4)).fetchall() == [
            (0, 2, 0, 5)
        ]

    def test_encode_parity_with_out_of_alphabet_twins(self, spark):
        import duckdb

        from beis_orp_data_service_spark.operators import corpus as co

        texts = list(enumerate(self.TEXTS))
        df = spark.createDataFrame(texts, "doc_id long, text string")
        m = co.wordpiece_learn_merges(df, n_merges=3)
        vocab = co.wordpiece_vocab(df, m)
        enc_df = df.unionByName(
            spark.createDataFrame(
                [(99, "Øbug hugs")], "doc_id long, text string"
            )
        )
        got = sorted(
            tuple(r) for r in co.wordpiece_tokenize(enc_df, vocab).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
        enc_sql = (
            "SELECT doc_id, text FROM documents UNION ALL "
            "SELECT 99, 'Øbug hugs' AS text"
        )
        exp = sorted(
            con.sql(
                co.wordpiece_encode_oracle_sql(3, enc_sql=enc_sql)
            ).fetchall()
        )
        assert got == exp
        unk = {r[0]: r[2] for r in got}
        assert unk[99] == 1  # the out-of-alphabet word really is UNK

    def test_tokenizer_compare_capstone_sanity(self, spark):
        """The four-family comparison emits one row per tokenizer with
        totals strictly between 0 and the corpus char count (every
        family compresses characters, none inflates past chars), and
        chars_per_token_milli >= 1000 (a token is at least a char)."""
        from beis_orp_data_service_spark import declared

        out = {
            r["tokenizer"]: (r["total_tokens"], r["chars_per_token_milli"])
            for r in declared.REGISTRY["tokenizer_compare"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert set(out) == {"bpe", "bpe_bytes", "unigram", "wordpiece"}
        chars = (
            declared._t(spark, "/root/testdata/sf0.001", "documents")
            .filter(F.col("doc_id") < 200)
            .agg(F.sum(F.length("text")))
            .first()[0]
        )
        for name, (tot, cpt) in out.items():
            assert 0 < tot <= chars, name
            assert cpt >= 1000, name


class TestAdaptiveTrainerExecution:
    """driver_train_threshold — the broadcast-join decision applied to
    iterative training: a model base that fits the driver trains
    driver-local, and the artifact must be IDENTICAL to the distributed
    per-round path's (same counts, same integer likelihood keys, same
    tie-breaks) on corpora with overlap traps and tie pressure."""

    TEXTS = [
        "aaa aaab baaa aaa",
        "low low low lower lowest newest newest",
        "ab ab ba ba",
        "hugs hug hugger hugging",
        "  padded   with \t whitespace \n runs  ",
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            list(enumerate(self.TEXTS)), "doc_id long, text string"
        )

    def test_bpe_driver_path_equals_distributed(self, spark):
        from beis_orp_data_service_spark.operators import corpus as c

        df = self._df(spark)
        fast = [
            tuple(r)
            for r in c.bpe_learn_merges(df, n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        slow = [
            tuple(r)
            for r in c.bpe_learn_merges(
                df, n_merges=6, driver_train_threshold=0
            )
            .orderBy("merge_rank")
            .collect()
        ]
        assert fast == slow
        assert len(fast) == 6

    def test_wordpiece_driver_path_equals_distributed(self, spark):
        from beis_orp_data_service_spark.operators import corpus as c

        df = self._df(spark)
        fast = [
            tuple(r)
            for r in c.wordpiece_learn_merges(df, n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        slow = [
            tuple(r)
            for r in c.wordpiece_learn_merges(
                df, n_merges=6, driver_train_threshold=0
            )
            .orderBy("merge_rank")
            .collect()
        ]
        assert fast == slow
        assert len(fast) == 6
        # score_q present and positive on every merge row
        assert all(row[4] > 0 for row in fast)

    def test_empty_corpus_yields_empty_artifact_on_both_paths(self, spark):
        from beis_orp_data_service_spark.operators import corpus as c

        df = spark.createDataFrame([], "doc_id long, text string")
        assert c.bpe_learn_merges(df, n_merges=2).count() == 0
        assert (
            c.bpe_learn_merges(df, n_merges=2, driver_train_threshold=0)
            .count()
            == 0
        )
        assert c.wordpiece_learn_merges(df, n_merges=2).count() == 0
