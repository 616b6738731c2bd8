"""Property tests for text ops (SURVEY §5.3): clean_text idempotence,
hash_id determinism/case-insensitivity, year_span extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.functions.text import (
    clean_text,
    hash_id,
    sentence_chunks,
    scan_window,
    year_spans,
)


@pytest.fixture(scope="module")
def strings(spark):
    rows = [
        ("s1", "Hello   World\n\nnew  line\t tab"),
        ("s2", "dots......  and   more....dots"),
        ("s3", "a standalone a letter a here"),
        ("s4", "already clean text"),
        ("s5", "The Act of 1998 and the 2006 Regulations, not 1066 or 21000"),
        ("s6", ""),
    ]
    return spark.createDataFrame(rows, "id string, s string")


def test_clean_text_idempotent(strings):
    once = strings.select("id", clean_text("s").alias("c1"))
    twice = once.select("id", clean_text("c1").alias("c2"), "c1")
    bad = twice.filter(F.col("c1") != F.col("c2")).count()
    assert bad == 0


def test_clean_text_normalizes(strings):
    got = {r.id: r.c for r in strings.select("id", clean_text("s").alias("c")).collect()}
    # case is PRESERVED (the reference chain never lowercases)
    assert got["s1"] == "Hello World new line tab"
    # doubled-punct pairs are removed left-to-right (remove_excess_punctuation)
    assert got["s2"] == "dots and moredots"
    assert got["s4"] == "already clean text"
    # digit-spacing repair wraps numbers, then the ' .' sweep re-joins
    assert got["s5"] == "The Act of 1998 and the 2006 Regulations, not 1066 or 21000"


def _reference_chain(text: str) -> str:
    """The literal reference normalization (pdf_to_orpml.py:20-57) as an
    in-test oracle, lookaheads and all."""
    import re
    import string

    text = str(text).replace("\n", " ")
    text = text.replace(" .", ". ")
    text = re.sub(r"(\d+(\.\d+)?)", r" \1 .", text)
    text = re.sub(r"\s+", " ", text)
    text = text.replace(" .", "")
    for p in string.punctuation:
        text = text.replace(p + p, "")
    text = re.sub(r"[\000-\010]|[\013-\014]|[\016-\037]", " ", text)
    text = re.sub(r"([a-z](?=[A-Z])|[A-Z](?=[A-Z][a-z]))", r"\1 ", text)
    text = text.strip()
    text = text.replace("\t", " ")
    text = text.replace("_x000c_", "")
    text = text.encode("ascii", "ignore").decode("utf-8")
    text = re.sub(r"\s+", " ", text)
    text = re.sub(r"<.*?>", "", text)
    text = re.sub(r"\.{4,}", ".", text)
    return text


def test_clean_text_matches_reference_chain(spark):
    """Byte-parity with the reference chain on representative prose
    (the engine's two deviations — ' .' re-sweep and final trim — only
    fire on pathological punctuation adjacencies, asserted separately)."""
    fixtures = [
        "The  Merged WordsProblem appears inPDFExtractions often",
        "Section 12.5 applies from 1998 onwards; see page 3",
        "Tabs\tand\nnewlines   and form\x0cfeeds_x000c_ here",
        "naïve café résumé — unicode folds away",
        "<p>tags stripped</p> but math a<b stays",
        "dotted....lines......everywhere....",
        "CamelCase and ALLCAPS and aWordWithInnerCaps",
        "price is 3.14159 pounds and 2,500 units",
        "", "   ", "single",
    ]
    df = spark.createDataFrame([(s,) for s in fixtures], "s string")
    got = [r.c for r in df.select(clean_text("s").alias("c")).collect()]
    for s, g in zip(fixtures, got):
        want = _reference_chain(s)
        # deviations: engine additionally trims + re-sweeps ' .'
        want = want.replace(" .", "").strip()
        assert g == want, f"{s!r}: {g!r} != {want!r}"


def test_hash_id_deterministic_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [("Fish-Agency", "GD"), ("fishagency", "gd"), ("other", "GD")],
        "a string, b string",
    )
    out = [r.h for r in df.select(hash_id("a", "b").alias("h")).collect()]
    assert out[0] == out[1]  # alnum-strip + lowercase → same key
    assert out[0] != out[2]
    assert len(out[0]) == 32 and all(c in "0123456789abcdef" for c in out[0])


def test_year_spans(strings):
    got = {
        r.id: r.y
        for r in strings.select("id", year_spans("s").alias("y")).collect()
    }
    assert sorted(got["s5"]) == ["1998", "2006"]  # 1066/21000 rejected
    assert got["s1"] == []


def test_sentence_chunks_cover_all_tokens(spark):
    df = spark.createDataFrame([("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11",)], "s string")
    chunks = df.select(sentence_chunks("s", width=4).alias("c")).first().c
    assert chunks == ["w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10 w11"]


def test_title_window_max_np_equals_expr(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators import enrichment as enr

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "meta_title",
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 11, 5)),
    )
    a = {r.doc_id: (r.best_score, r.best_window_idx)
         for r in enr.title_window_max(
             docs, "text", "meta_title", "doc_id").collect()}
    b = {r.doc_id: (r.best_score, r.best_window_idx)
         for r in enr.title_window_max_np(
             docs, "text", "meta_title", "doc_id").collect()}
    assert a == b


def test_title_window_max_finds_planted_title(spark):
    from beis_orp_data_service_spark.operators import enrichment as enr

    # the metadata title appears verbatim at token offset 3 → that
    # window must score a full match, earliest-max tiebreak
    text = "x1 x2 x3 my proper title x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14"
    df = spark.createDataFrame(
        [(1, text, "my proper title")], "doc_id long, text string, t string"
    )
    r = enr.title_window_max(df, "text", "t", "doc_id").first()
    assert (r.best_score, r.best_window_idx) == (3, 4)
    r2 = enr.title_window_max_np(df, "text", "t", "doc_id").first()
    assert (r2.best_score, r2.best_window_idx) == (3, 4)


def test_percentage_shortener_stops_at_first_period(spark):
    from beis_orp_data_service_spark.operators import enrichment as enr

    # 100 chars -> k=10 words kept, then the remainder up to its first
    # period (reference get_title.py:10-21)
    words = " ".join(f"w{i:02d}" for i in range(20))  # 99 chars, 20 words
    text = words + "x. tail after period"
    df = spark.createDataFrame([(text,)], "text string")
    out = df.select(enr.percentage_shortener("text").alias("s")).first().s
    assert out.endswith("w19x") and "tail" not in out


def test_sentences_period_split_and_fallback(spark):
    from beis_orp_data_service_spark.functions.text import sentences

    df = spark.createDataFrame(
        [("First one. Second one here. Tail",), ("no periods at all here",)],
        "s string",
    )
    got = [r.c for r in df.select(sentences("s", fallback_width=2).alias("c")).collect()]
    assert got[0] == ["First one", "Second one here", "Tail"]
    assert got[1] == ["no periods", "at all", "here"]  # chunk fallback
    strict = df.select(sentences("s", fallback_width=None).alias("c")).collect()
    assert strict[1].c == ["no periods at all here"]  # one sentence


def test_phrase_match_first_sentence_period_prose(spark):
    from beis_orp_data_service_spark.operators import enrichment as enr

    # prose fixture: the Data Act 2001 match in sentence 2 must be
    # suppressed because sentence 1 already matched (early stop);
    # doc 2's only match is in its second sentence and survives
    docs = spark.createDataFrame(
        [
            (1, "Intro under the Water Act 1999 applies. The Data Act 2001 too."),
            (2, "Nothing relevant here. See the Data Act 2001 for details."),
        ],
        "doc_id long, text string",
    )
    needles = spark.createDataFrame(
        [("Water Act 1999",), ("Data Act 2001",)], "needle string"
    )
    got = {
        (r.doc_id, r.sent_idx, r.needle)
        for r in enr.phrase_match_first_sentence(
            docs, "doc_id", "text", needles, sentencizer="period"
        ).collect()
    }
    assert got == {(1, 0, "Water Act 1999"), (2, 1, "Data Act 2001")}


def test_keyword_candidates_match_countvectorizer(spark):
    """The relational N5 candidates are exactly Spark ML CountVectorizer
    term frequencies over the same preprocessed tokens."""
    from pyspark.ml.feature import CountVectorizer

    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators import enrichment as enr

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    got = {
        (r.doc_id, r.keyword): r.n_mentions
        for r in enr.keyword_candidates(docs, "doc_id", "text", top_n=5).collect()
    }

    cleaned = F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z]", " "))
    toks = F.filter(
        F.split(F.trim(cleaned), r"\s+"),
        lambda x: (F.length(x) > 1) & ~x.isin(*enr.KEYWORD_STOPWORDS),
    )
    cv = CountVectorizer(inputCol="toks", outputCol="vec", minDF=1.0)
    prepped = docs.select("doc_id", toks.alias("toks"))
    model = cv.fit(prepped)
    vocab = model.vocabulary
    for row in model.transform(prepped).select("doc_id", "vec").collect():
        counts = {vocab[int(i)]: int(v) for i, v in zip(row.vec.indices, row.vec.values)}
        for (doc_id, kw), n in got.items():
            if doc_id == row.doc_id:
                assert counts.get(kw) == n, (doc_id, kw)


def test_fingerprint_np_equals_expr(spark):
    from beis_orp_data_service_spark.catalog import load_table
    from beis_orp_data_service_spark.operators import textstats as ts

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r.doc_id: r.fp
         for r in docs.select("doc_id", ts.fingerprint("text").alias("fp")).collect()}
    b = {r.doc_id: r.fp
         for r in ts.fingerprint_np_table(docs, "doc_id", "text").collect()}
    assert a == b
    # empty text → 0 in both forms
    e = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert ts.fingerprint_np_table(e, "doc_id", "text").first().fp == 0
    assert e.select(ts.fingerprint("text").alias("fp")).first().fp == 0


def test_scan_window_min_and_fraction(spark):
    df = spark.createDataFrame([("x" * 10_000,), ("y" * 50_000,)], "s string")
    out = df.select(F.length(scan_window("s", 2000, 0.1)).alias("n")).collect()
    assert [r.n for r in out] == [2000, 5000]  # max(2000, 10%·len)


def test_bpe_token_count_known_values_and_duckdb_dialect(spark):
    """BPE-ish pre-tokenization: known token counts, and the same
    pattern literal must tokenize identically in DuckDB (the oracle
    dialect-compat claim — Java regex ∩ RE2 subset)."""
    import duckdb

    from beis_orp_data_service_spark.operators import textstats as ts

    rows = [
        (1, "Hello world"),        # [Hello][ world]
        (2, "it's 2024, ok?"),     # [it]['s][ 2024][,][ ok][?]
        (3, ""),                   # no tokens
        (4, "  spaced   out  "),   # [  ][spaced][   ][out][  ]
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", ts.bpe_token_count("text").alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 6, 3: 0, 4: 5}

    pat = ts.BPE_PATTERN.replace("'", "''")
    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.sql(
            f"SELECT len(regexp_extract_all('{text.replace(chr(39), chr(39)*2)}', '{pat}')) AS n"
        ).fetchone()[0]
        assert got[doc_id] == want, f"dialect mismatch on doc {doc_id}"


# ------------------------------------------------------------ extract_entities


def test_extract_entities_planted_matches(spark):
    from beis_orp_data_service_spark.operators.textstats import extract_entities

    df = spark.createDataFrame(
        [
            (
                1,
                "see https://gov.uk/guidance and http://data.gov.uk/x "
                "filed 2024-03-01, again 2024-03-01 and 2023-12-31, "
                "fined £120.50 then $40, refs 7 and 3.14",
            ),
            (2, "no entities here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in extract_entities(df).collect()}
    r = out[1]
    assert r["n_urls"] == 2
    assert r["n_dates"] == 3          # duplicate date counted per match
    assert r["n_amounts"] == 2
    assert r["n_numbers"] >= 2
    assert r["urls"] == ["http://data.gov.uk/x", "https://gov.uk/guidance"]
    assert r["dates"] == ["2023-12-31", "2024-03-01"]  # sorted distinct
    r2 = out[2]
    assert r2["n_urls"] == 0 and r2["urls"] == []


def test_readability_golden(spark):
    from beis_orp_data_service_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "doc_id bigint, text string"
    )
    r = ts.readability(df).collect()[0]
    assert r.n_words == 6
    assert r.n_sentences == 2       # '.' and '!' runs
    assert r.n_syllables == 6       # one vowel group per word here
    assert r.wps_milli == 3000 and r.spw_milli == 1000
    assert r.flesch_milli == 206835 - 3045 - 84600


def test_readability_floors(spark):
    from beis_orp_data_service_spark.operators import textstats as ts

    # no sentence punctuation -> sentences floored at 1; consonant-only
    # words -> syllables floored at n_words
    df = spark.createDataFrame([(1, "tsk tsk brr")], "doc_id bigint, text string")
    r = ts.readability(df).collect()[0]
    assert r.n_sentences == 1
    assert r.n_words == 3 and r.n_syllables == 3


URL_CASES = [
    # (raw, canonical)
    ("https://www.Example.com/docs/item1/", "https://example.com/docs/item1"),
    ("https://example.com/docs/item1", "https://example.com/docs/item1"),
    (
        "https://example.com:443/docs/item1?utm_source=feed",
        "https://example.com/docs/item1",
    ),
    (
        "https://example.com//docs//item1#frag",
        "https://example.com/docs/item1",
    ),
    (
        "https://EXAMPLE.com./docs/item1?b=2&a=1",
        "https://example.com/docs/item1?a=1&b=2",
    ),
    (
        "https://user:pw@example.com/docs/item1?a=1&utm_campaign=x&b=2",
        "https://example.com/docs/item1?a=1&b=2",
    ),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com", "https://example.com/"),
    (
        "https://example.com/?utm_source=a&utm_medium=b&gclid=z",
        "https://example.com/",
    ),
    (
        "https://example.com/a?fbclid=123&z=9&gclid=4&a=1",
        "https://example.com/a?a=1&z=9",
    ),
]


class TestCanonicalUrl:
    def test_cases(self, spark):
        import pyspark.sql.functions as F

        from beis_orp_data_service_spark.functions.urlnorm import canonical_url

        df = spark.createDataFrame(URL_CASES, "raw string, want string")
        got = df.select("raw", "want", canonical_url("raw").alias("got")).collect()
        for r in got:
            assert r["got"] == r["want"], (r["raw"], r["got"], r["want"])

    def test_idempotent(self, spark):
        from beis_orp_data_service_spark.functions.urlnorm import canonical_url

        df = spark.createDataFrame(URL_CASES, "raw string, want string")
        got = df.select(
            canonical_url("raw").alias("once"),
        ).select(canonical_url("once").alias("twice"), "once").collect()
        for r in got:
            assert r["twice"] == r["once"]

    def test_duckdb_twin(self, spark):
        import duckdb

        from beis_orp_data_service_spark.functions.urlnorm import (
            canonical_url,
            canonical_url_sql,
        )

        df = spark.createDataFrame(URL_CASES, "raw string, want string")
        got = {
            r["raw"]: r["got"]
            for r in df.select(
                "raw", canonical_url("raw").alias("got")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("SET threads=2")
        expr = canonical_url_sql("raw")
        for raw, _ in URL_CASES:
            duck = con.execute(
                f"SELECT {expr} AS c FROM (SELECT ? AS raw)", [raw]
            ).fetchone()[0]
            assert duck == got[raw], (raw, duck, got[raw])


class TestTokenPmi:
    def test_hand_computed_pmi(self, spark):
        """5 docs "a b" + 5 docs "c": pair (a,b) in 5 of N=10 docs,
        df_a=df_b=5 -> PMI = ln(10·5/(5·5)) = ln 2, nano-quantized."""
        import math

        from beis_orp_data_service_spark.operators import textstats as ts

        docs = spark.createDataFrame(
            [(i, "a b" if i < 5 else "c") for i in range(10)],
            "doc_id long, text string",
        )
        rows = [
            (r.token_a, r.token_b, r.n_pair_docs, r.pmi_q)
            for r in ts.token_pmi(docs, min_pair_docs=5, k=10).collect()
        ]
        assert rows == [
            ("a", "b", 5, round(math.log(2) * ts.PMI_SCALE))
        ]

    def test_per_doc_cap_bounds_pairs(self, spark):
        """A 100-token doc capped at 10 tokens/doc contributes
        C(10,2)=45 pairs, not C(100,2) — and the cap is the
        alphabetically-first slice, deterministically."""
        from beis_orp_data_service_spark.operators import textstats as ts

        text = " ".join(f"t{i:03d}" for i in range(100))
        docs = spark.createDataFrame(
            [(i, text) for i in range(5)], "doc_id long, text string"
        )
        rows = ts.token_pmi(
            docs, min_pair_docs=5, k=1000, max_tokens_per_doc=10
        ).collect()
        assert len(rows) == 45
        toks = {r.token_a for r in rows} | {r.token_b for r in rows}
        assert toks == {f"t{i:03d}" for i in range(10)}


class TestCharEntropy:
    def test_hand_computed(self, spark):
        import math

        from beis_orp_data_service_spark.operators import textstats as ts

        docs = spark.createDataFrame(
            [(1, "aabb"), (2, "aaaa"), (3, "")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_chars_exact, r.entropy_q)
            for r in ts.char_entropy(docs).collect()
        }
        half = round(0.5 * math.log(2) * ts.ENTROPY_SCALE)
        assert got == {
            1: (4, 2 * half),  # two chars at p=.5: H = ln 2
            2: (4, 0),         # single-char doc: zero entropy
        }                      # empty doc: no histogram, no row


class TestOovRate:
    def test_hand_computed_rates(self, spark):
        """Vocab from train ids 1,2 = {a,b,c}; test doc 0 (en) 'a x y'
        -> 2/3 OOV = 666 milli (floored); test doc 5 (fr) 'c c' -> 0."""
        from beis_orp_data_service_spark.operators import textstats as ts

        docs = spark.createDataFrame(
            [
                (0, "a x y", "en"),
                (5, "c c", "fr"),
                (1, "a b", "en"),
                (2, "c", "fr"),
            ],
            "doc_id long, text string, lang string",
        )
        got = {
            r.lang: (r.n_tokens, r.n_oov, r.oov_milli)
            for r in ts.oov_rate_by_lang(docs).collect()
        }
        assert got == {"en": (3, 2, 666), "fr": (2, 0, 0)}


class TestNgramDiversity:
    def test_hand_computed(self, spark):
        """'a b a b a' has trigrams [a b a, b a b, a b a] -> 3 total,
        2 distinct -> 666 per mille; a 2-token doc contributes none."""
        from beis_orp_data_service_spark.operators import textstats as ts

        docs = spark.createDataFrame(
            [(1, "a b a b a", "s1"), (2, "a b", "s1"), (3, "x y z", "s2")],
            "doc_id long, text string, source string",
        )
        got = {
            r.source: (r.n_ngrams, r.n_distinct, r.distinct_milli)
            for r in ts.ngram_diversity(docs).collect()
        }
        assert got == {"s1": (3, 2, 666), "s2": (1, 1, 1000)}


class TestUnicodeEngineBoundary:
    """Pins the documented Spark-vs-DuckDB Unicode boundary
    (functions/text.py header note): the oracles' hash parity holds
    because corpus text avoids special-casing codepoints and combining
    marks — these tests fail loudly if EITHER engine moves, so the
    assumption gets re-audited instead of silently rotting."""

    def test_agreement_classes(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        texts = ["ascii", "café", "中文 tokens", "emoji \U0001F600 here"]
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = {
            r.t: (r.l, r.lo, r.m)
            for r in df.select(
                "t",
                F.length("t").alias("l"),
                F.lower("t").alias("lo"),
                F.md5("t").alias("m"),
            ).collect()
        }
        for t in texts:
            want = duckdb.sql(
                "SELECT length(?), lower(?), md5(?)", params=[t, t, t]
            ).fetchone()
            assert got[t] == want, t

    def test_special_casing_divergence_is_where_documented(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        spark_lower = (
            spark.createDataFrame([("İstanbul",)], "t string")
            .select(F.lower("t").alias("lo"))
            .first()
            .lo
        )
        duck_lower = duckdb.sql(
            "SELECT lower(?)", params=["İstanbul"]
        ).fetchone()[0]
        # Java applies the full special-casing rule (İ -> i + U+0307);
        # utf8proc folds to a bare i. If either side changes, the
        # documented boundary in functions/text.py must be re-audited.
        assert spark_lower == "i̇stanbul"
        assert duck_lower == "istanbul"
        assert spark_lower != duck_lower

    def test_grapheme_reverse_divergence_is_where_documented(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        s = "Å ring"  # decomposed Å: A + combining ring
        spark_rev = (
            spark.createDataFrame([(s,)], "t string")
            .select(F.reverse("t").alias("r"))
            .first()
            .r
        )
        duck_rev = duckdb.sql("SELECT reverse(?)", params=[s]).fetchone()[0]
        # Java reverses codepoints (splits the combining pair); DuckDB
        # reverses grapheme clusters (keeps it attached)
        assert spark_rev != duck_rev
        assert duck_rev == "gnir Å"
