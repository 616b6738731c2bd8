from __future__ import annotations

import math

from beis_orp_data_service_spark.operators import lm


def _py_lm(train, score):
    """Pure-Python add-one bigram LM twin."""
    def toks(t):
        return [w for w in t.lower().split() if w]

    c2, c1, vocab = {}, {}, set()
    for t in train:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in score.items():
        ws = toks(t)
        if len(ws) < 2:
            continue
        lps = [
            round(
                math.log(
                    (c2.get((a, b), 0) + 1) / (c1.get(a, 0) + v)
                )
                * 1e6
            )
            for a, b in zip(ws, ws[1:])
        ]
        s = sum(lps)
        out[i] = (len(lps), s, math.floor(s / len(lps)))
    return out


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
SCORE = {
    1: "the cat sat on the mat",      # in-distribution
    2: "mat the on sat dog the",      # seen words, unseen bigrams
    3: "quantum flux capacitor oscillation",  # fully OOV
    4: "word",                        # < 2 tokens: dropped
}


def test_lm_matches_pure_python(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in SCORE.items()], "doc_id bigint, text string"
    )
    train = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TRAIN)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.logp_sum_micro, r.avg_logp_micro)
        for r in lm.lm_score(docs, train, "doc_id", "text").collect()
    }
    assert got == _py_lm(TRAIN, SCORE)


def test_codegen_bigrams_match_hof_spelling(spark):
    """r14: _doc_bigrams' slice+arrays_zip spelling (codegen) must emit
    EXACTLY the rows of the previous lc_tokens + transform(sequence)
    HOF spelling on real text and every edge case — empty / blank /
    null text, one token, interior whitespace runs, \\x0B/\\f
    separators, leading+trailing whitespace."""
    from pyspark.sql import functions as F

    from beis_orp_data_service_spark.functions.text import lc_tokens

    rows = [
        (1, "The cat  sat\t on\nthe mat "),
        (2, ""),
        (3, "   \t \n "),
        (4, None),
        (5, "single"),
        (6, "a\x0bb\fc d"),
        (7, "  leading and trailing  "),
        (8, "UPPER lower MiXeD"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    toks = docs.select(
        F.col("doc_id"), lc_tokens("text").alias("_toks")
    ).where(F.size("_toks") >= 2)
    pairs = F.expr(
        "transform(sequence(0, size(_toks) - 2),"
        " i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
    )
    old = (
        toks.select("doc_id", F.explode(pairs).alias("_p"))
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    new = lm._doc_bigrams(docs, "doc_id", "text")
    key = lambda r: (r.doc_id, r.w1, r.w2)  # noqa: E731
    assert sorted(new.collect(), key=key) == sorted(old.collect(), key=key)


def test_in_distribution_scores_higher(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in SCORE.items()], "doc_id bigint, text string"
    )
    train = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TRAIN)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.avg_logp_micro
        for r in lm.lm_score(docs, train, "doc_id", "text").collect()
    }
    # the training sentence beats both out-of-distribution docs. (No
    # ordering asserted between 2 and 3: under add-one smoothing an
    # unseen continuation of a FREQUENT context, 1/(c1+V), is rightly
    # less probable than a fully-OOV context's 1/V.)
    assert got[1] > got[2] and got[1] > got[3]
    assert 4 not in got


def test_probabilities_normalize(spark):
    # add-one model: sum over vocab of P(w2|w1) + mass for unseen w2
    # must equal 1 for any seen context: (c1 + V)/(c1 + V)
    train = spark.createDataFrame(
        [(1, t) for t in TRAIN], "doc_id bigint, text string"
    )
    c2, c1, vocab = lm.bigram_lm_counts(train, "doc_id", "text")
    v = vocab.collect()[0].v
    rows_c1 = {r.w1: r.c1 for r in c1.collect()}
    by_ctx = {}
    for r in c2.collect():
        by_ctx.setdefault(r.w1, []).append(r.c2)
    for w1, counts in by_ctx.items():
        seen_mass = sum(c + 1 for c in counts)
        unseen_mass = v - len(counts)  # each unseen w2 gets 1/(c1+V)
        assert seen_mass + unseen_mass == rows_c1[w1] + v


class TestCcnetBuckets:
    def test_per_lang_terciles_and_labels(self, spark):
        """9 docs in one lang with LM scores forced into a known order
        (doc text quality degrades with id): terciles must split 3/3/3
        in score order with head = best avg logp. A second lang with 3
        docs gets its own independent split."""
        from beis_orp_data_service_spark.operators import lm as lm_ops

        common = "the cat sat on the mat and the dog sat on the rug"
        rows = []
        for i in range(9):
            # progressively replace common bigrams with unseen tokens
            noise = " ".join(f"zx{i}q{j}" for j in range(i))
            rows.append((i, f"{common} {noise}".strip(), "en"))
        for i in range(9, 12):
            rows.append((i, common + " un deux trois" * (i - 8), "fr"))
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        train = docs.where(F.col("doc_id") % 2 == 0)
        out = {
            r.doc_id: (r.lang, r.avg_logp_micro, r.bucket, r.bucket_label)
            for r in lm_ops.ccnet_buckets(docs, train).collect()
        }
        assert len(out) == 12
        # tercile assignment must follow the (avg_logp DESC, id) order
        en_order = sorted(range(9), key=lambda i: (-out[i][1], i))
        want = {doc: 1 + pos // 3 for pos, doc in enumerate(en_order)}
        assert {i: out[i][2] for i in range(9)} == want
        labels = {1: "head", 2: "middle", 3: "tail"}
        assert all(out[i][3] == labels[out[i][2]] for i in range(9))
        # the pure-reference doc scores best of its language
        assert out[0][2] == 1
        # fr has its own independent tercile split
        assert sorted(out[i][2] for i in (9, 10, 11)) == [1, 2, 3]

    def test_sub_bigram_docs_excluded(self, spark):
        from beis_orp_data_service_spark.operators import lm as lm_ops

        docs = spark.createDataFrame(
            [(1, "two tokens here", "en"), (2, "single", "en"), (3, "", "en")],
            "doc_id long, text string, lang string",
        )
        got = {r.doc_id for r in lm_ops.ccnet_buckets(docs, docs).collect()}
        assert got == {1}  # no bigram -> no perplexity -> excluded
