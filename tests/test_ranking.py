from __future__ import annotations

import math

import pytest

from beis_orp_data_service_spark.operators import ranking as rk

from tests.conftest import SF_SMOKE


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    """Pure-Python BM25 twin (float math, Lucene idf) for ranking-order
    ground truth."""
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in terms:
        df_t = sum(1 for v in toks.values() if term in v)
        if df_t == 0:
            continue
        idf = round(math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5)) * 1e6) / 1e6
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return sorted(scores, key=lambda i: (-scores[i], i))


CORPUS = {
    1: "red fox jumps over the lazy dog",
    2: "red red red herring",
    3: "the quick brown fox",
    4: "dog dog dog dog dog dog dog dog dog dog",
    5: "a completely unrelated document about spark",
}


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "doc_id bigint, text string"
    )


def test_bm25_matches_pure_python_ranking(spark):
    got = rk.bm25_topk(_df(spark), "doc_id", "text", ["red", "dog"], k=5)
    ids = [r.doc_id for r in got.collect()]
    assert ids == _py_bm25(CORPUS, ["red", "dog"])


def test_bm25_tf_saturation_beats_raw_counts(spark):
    # term-frequency saturation: doc 1 matches BOTH terms once; doc 4 is
    # ten repetitions of 'dog'. Raw tf-sum would rank doc 4 (10) over
    # doc 1 (2); BM25's saturated tf plus length norm must not.
    got = rk.bm25_topk(_df(spark), "doc_id", "text", ["red", "dog"], k=5)
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[1].score > rows[4].score
    assert rows[1].n_terms_hit == 2 and rows[4].n_terms_hit == 1


def test_bm25_int_and_float_modes_agree_on_order(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    terms = ["spark", "window", "merge", "vector"]
    ids_int = [
        r.doc_id
        for r in rk.bm25_topk(docs, "doc_id", "text", terms, k=15).collect()
    ]
    ids_float = [
        r.doc_id
        for r in rk.bm25_topk(
            docs, "doc_id", "text", terms, k=15, score_mode="float"
        ).collect()
    ]
    assert ids_int == ids_float


def test_bm25_empty_query_rejected(spark):
    with pytest.raises(ValueError):
        rk.bm25_topk(_df(spark), "doc_id", "text", [])
    with pytest.raises(ValueError):
        rk.bm25_topk(_df(spark), "doc_id", "text", ["x"], score_mode="exact")


def test_bm25_plan_topk_and_broadcast(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = (
        rk.bm25_topk(docs, "doc_id", "text", ["spark", "merge"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k finish, broadcast stats/dfreq, and no cartesian anywhere.
    assert "TakeOrderedAndProject" in plan
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_min_df_prunes_hapax(spark):
    out = rk.tfidf_vectors(_df(spark), "doc_id", "text", min_df=2).collect()
    terms = {r.term for r in out}
    # 'herring' and 'spark' are hapax in this corpus -> pruned
    assert "herring" not in terms and "spark" not in terms
    assert {"red", "dog", "fox", "the"} <= terms
    # idf weighting: tf * idf_micro consistency for a known cell
    by = {(r.doc_id, r.term): r for r in out}
    cell = by[(2, "red")]
    assert cell.tf == 3
    idf_red = round(math.log(len(CORPUS) / 2) * 1e6)
    assert cell.tfidf_micro == 3 * idf_red


# -------------------------------------------------------------- rerank_topk


def test_rerank_candidates_bound_and_subset(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators import ranking as rk
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    terms = ["the", "policy"]
    out = rk.rerank_topk(docs, "doc_id", "text", terms, k=5, n_candidates=20)
    rows = out.collect()
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # reranked ids must come from the BM25 candidate set — the model
    # stage never sees (or surfaces) anything outside it
    cand_ids = {
        r["doc_id"]
        for r in rk.bm25_topk(docs, "doc_id", "text", terms, k=20).collect()
    }
    assert {r["doc_id"] for r in rows} <= cand_ids


def test_rerank_custom_scorer_contract(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators import ranking as rk
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")

    def reverse_length_scorer(texts):
        return [len(t or "") for t in texts]  # longest doc wins

    out = rk.rerank_topk(
        docs, "doc_id", "text", ["the"], k=3, n_candidates=10,
        scorer=reverse_length_scorer,
    ).collect()
    scores = [r["ce_score_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rerank_fake_scorer_coverage_dominates_frequency(spark):
    from beis_orp_data_service_spark.operators import ranking as rk

    df = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha alpha"),      # 1 term, tf 5
            (2, "alpha beta"),                          # 2 terms, tf 2
        ],
        "doc_id bigint, text string",
    )
    out = rk.rerank_topk(df, "doc_id", "text", ["alpha", "beta"], k=2, n_candidates=2)
    rows = out.collect()
    assert rows[0]["doc_id"] == 2 and rows[0]["rank"] == 1


# -------------------------------------------------------- top_terms_by_group


def test_top_terms_distinctive_term_ranks_first(spark):
    from beis_orp_data_service_spark.operators import ranking as rk

    # "zebra" appears only in group g1; "the" is everywhere — c-TF-IDF
    # must rank the distinctive term above the ubiquitous one
    df = spark.createDataFrame(
        [
            ("g1", "the zebra zebra runs"),
            ("g1", "the zebra sleeps"),
            ("g2", "the cat sits"),
            ("g2", "the cat purrs the"),
        ],
        "grp string, text string",
    )
    out = rk.top_terms_by_group(df, "grp", "text", k=2).collect()
    top = {r["grp"]: [] for r in out}
    for r in sorted(out, key=lambda r: (r["grp"], r["rank"])):
        top[r["grp"]].append(r["term"])
    assert top["g1"][0] == "zebra"
    assert top["g2"][0] == "cat"


def test_top_terms_deterministic_tiebreak(spark):
    from beis_orp_data_service_spark.operators import ranking as rk

    # two terms with identical counts everywhere: alphabetical wins
    df = spark.createDataFrame(
        [("g", "aaa bbb"), ("g", "aaa bbb")], "grp string, text string"
    )
    out = sorted(
        rk.top_terms_by_group(df, "grp", "text", k=2).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["term"] for r in out] == ["aaa", "bbb"]
