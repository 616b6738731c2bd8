"""Title/keyword preprocess chain (reference
title_generation/preprocess/preprocess_functions.py:12-66): equality
against an in-test transcription of the reference's pure-Python
functions, plus Spark↔DuckDB oracle parity for the declared-query
machinery."""

import string

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import preprocess as pp
from beis_orp_data_service_spark.operators.corpus import (
    _viterbi_split,
    word_scores,
)


# --- the reference functions, transcribed (preprocess_functions.py) ---


def ref_removing_regulator_names(text, names):
    for reg in ["Logo of the " + n for n in names] + list(names):
        text = text.replace(reg, "")
    return text


def ref_is_malformed(text):
    short = 0
    for char in text.strip().split(" ")[:5]:
        if len(char) == 1:
            short += 1
    return short == 5


def ref_remove_excess_punctuation(text):
    text = text.replace(" .", "")
    for punc in string.punctuation:
        text = text.replace(punc + punc, "")
    return text


def ref_preprocess(text, names, splitter):
    """preprocess_functions.py:56-66 with the wordninja call injected
    (the engine substitutes a corpus-trained dictionary DP — same
    algorithm family, documented deviation)."""
    text = ref_removing_regulator_names(text, names)
    if ref_is_malformed(text):
        text = " ".join(splitter(text.replace(" ", "")))
    text = ref_remove_excess_punctuation(text)
    return text


FIXTURES = [
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "Logo of the Environment Agency safety report on water quality",
    "Health and Safety Executive annual report the quick lazy dog",
    "Environment Agency (EA) and Environment Agency overlap order check",
    "t h e q u i c k brownfox and more stuff",  # malformed
    "a b c d",  # four tokens only -> NOT malformed
    "a  b c d e double-space token has len 0",  # '' token breaks the run
    "x y z w v despacedtail the quick",  # malformed
    "double  space .. test!! the quick brown",
    "",
    "   \t leading whitespace a b c d e",  # strip() before split
]


class TestReferenceEquality:
    def test_full_chain_matches_reference_on_fixtures(self, spark):
        """End-to-end: title_preprocess == the reference chain with the
        engine's DP as the injected splitter, on every fixture doc —
        covering strip order, the 5-token detector (incl. strip()
        edge-whitespace and len-0 double-space tokens), and the
        punctuation sweep."""
        df = spark.createDataFrame(
            list(enumerate(FIXTURES)), "doc_id long, text string"
        )
        out = {
            r["doc_id"]: (r["was_resplit"], r["title_input"])
            for r in pp.title_preprocess(
                df, top_p=1000, max_word_len=8
            ).collect()
        }
        # rebuild the same dictionary the operator trained (non-
        # malformed docs after the strip), then replay the reference
        stripped = [
            ref_removing_regulator_names(t, pp.REGULATOR_NAMES)
            for t in FIXTURES
        ]
        well_formed = spark.createDataFrame(
            [(t,) for t in stripped if not ref_is_malformed(t)], "t string"
        )
        scores = {
            r["word"]: r["score_micro"]
            for r in word_scores(
                well_formed, "t", top_p=1000, max_word_len=8
            ).collect()
        }

        def splitter(w):
            return _viterbi_split(w, scores, 8, -(10**9)) if w else [""]

        for i, t in enumerate(FIXTURES):
            expect = ref_preprocess(t, pp.REGULATOR_NAMES, splitter)
            assert out[i][1] == expect, f"doc {i}: {out[i][1]!r} != {expect!r}"
            assert out[i][0] == ref_is_malformed(stripped[i])

    def test_strip_is_ordered_logo_variants_first(self, spark):
        """'Logo of the Environment Agency' must vanish whole — a bare-
        name-first order would leave a dangling 'Logo of the '."""
        df = spark.createDataFrame(
            [(0, "Logo of the Environment Agency report")],
            "doc_id long, text string",
        )
        got = df.select(
            pp.strip_regulator_names("text").alias("t")
        ).first()["t"]
        assert got == " report"
        assert got == ref_removing_regulator_names(
            "Logo of the Environment Agency report", pp.REGULATOR_NAMES
        )

    def test_strip_arrow_twin_matches_expression(self, spark):
        """r14: the Arrow strip kernel (the engine path inside
        title_preprocess) must emit EXACTLY the expression fold's
        output — real fixtures plus seam / empty / null / repeated-name
        / logo-variant edge cases — and evaluate its UDF ONCE in the
        plan even though a second projection derives from it."""
        from pyspark.sql import functions as F

        cases = list(FIXTURES) + [
            "",
            None,
            "Logo of the Environment Agency report",
            "OfgemOfgem doubled seam",
            "prefix Environment Agency suffix Environment Agency",
            "no names at all",
        ]
        df = spark.createDataFrame(
            list(enumerate(cases)), "doc_id long, text string"
        )
        expr = df.select(
            "doc_id", pp.strip_regulator_names("text").alias("t")
        )
        arrow = df.select(
            "doc_id", pp.strip_regulator_names_arrow("text").alias("t")
        )
        assert sorted(map(tuple, arrow.collect())) == sorted(
            map(tuple, expr.collect())
        )
        # one ArrowEvalPython even with a dependent derived column
        dependent = df.select(
            "doc_id",
            pp.strip_regulator_names_arrow("text").alias("_t"),
        ).withColumn("_mal", pp.malformed_singles(F.col("_t")))
        plan = dependent._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1

    def test_detector_matches_reference_rowwise(self, spark):
        # includes Unicode-whitespace edges (nbsp / NEL / file-sep
        # controls / LINE SEPARATOR / ideographic space) — Python
        # str.strip() removes all of these, so the detector must too
        cases = FIXTURES + [
            "- - - - - dashes",
            ". . a b c d e",
            "\xa0a b c d e rest",
            "\x85\x1c\x1fa b c d e rest",
            "\u2028a b c d e rest",
            "　 a b c d e tail",
            "\xa0 a b c d e",  # nbsp + space: strip eats both
        ]
        df = spark.createDataFrame(
            list(enumerate(cases)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["m"]
            for r in df.select(
                "doc_id", pp.malformed_singles("text").alias("m")
            ).collect()
        }
        for i, t in enumerate(cases):
            assert got[i] == ref_is_malformed(t), t

    def test_remove_excess_punct_matches_reference(self, spark):
        from beis_orp_data_service_spark.functions.text import (
            remove_excess_punct,
        )

        cases = ["a .. b!! c?? d", " .start", "no punct", "--__··", ""]
        df = spark.createDataFrame(
            list(enumerate(cases)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["t"]
            for r in df.select(
                "doc_id", remove_excess_punct("text").alias("t")
            ).collect()
        }
        for i, t in enumerate(cases):
            assert got[i] == ref_remove_excess_punctuation(t), t


class TestOracleParity:
    def test_duckdb_oracle_matches_spark_bitexact(self, spark):
        import duckdb

        rows = list(enumerate(FIXTURES))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["was_resplit"], r["title_input"])
            for r in pp.title_preprocess(
                df, top_p=1000, max_word_len=8
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE inp0 (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO inp0 VALUES (?, ?)", rows)
        exp = sorted(
            con.sql(
                pp.title_preprocess_oracle_sql(
                    "SELECT doc_id, text FROM inp0",
                    top_p=1000,
                    max_word_len=8,
                )
            ).fetchall()
        )
        assert got == exp

    def test_null_text_is_empty_not_crash(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["title_input"]
            for r in pp.title_preprocess(df, top_p=10).collect()
        }
        assert out[0] == ""


class TestWordScores:
    def test_top_p_bound_and_length_filter(self, spark):
        df = spark.createDataFrame(
            [(0, "aa aa aa bb bb cc verylongword12 d")],
            "doc_id long, text string",
        )
        rows = word_scores(df, top_p=2, max_word_len=6).collect()
        words = {r["word"] for r in rows}
        assert len(rows) == 2
        # top-2 by (freq DESC, word ASC); the 13-char word is excluded
        # BEFORE the cut, not ranked then dropped
        assert words == {"aa", "bb"}

    def test_resplit_prefers_known_words_over_singles(self, spark):
        scores = {"quick": -100, "brown": -100, "q": -500, "u": -500}
        assert _viterbi_split("quickbrown", scores, 8, -(10**9)) == [
            "quick",
            "brown",
        ]
        # unknown chars fall back to UNK singles, never crash
        assert _viterbi_split("zz", {}, 8, -(10**9)) == ["z", "z"]
        with pytest.raises(ValueError):
            _viterbi_split("zz", {}, 8, None)


# --- keyword-extraction preprocess (keyword_extraction.py:64-67) ---


def ref_kw_preprocess(text, splitter):
    """The reference's keyword preprocess with the wordninja call
    injected: three literal strips, then split the text into
    [a-zA-Z0-9']+ chunks (wordninja's tokenization — punctuation
    drops), DP-split each chunk, rejoin with single spaces."""
    import re

    for n in pp.KW_REGULATOR_SUBS:
        text = re.sub(re.escape(n), "", text)
    out = []
    for chunk in re.findall(r"[a-zA-Z0-9']+", text):
        out.extend(splitter(chunk))
    return " ".join(out)


class TestKwPreprocess:
    def test_matches_reference_with_injected_splitter(self, spark):
        texts = [
            (0, "the quick brown fox jumps over the lazy dog the quick"),
            (1, "Health and Safety Executive thequickbrown fox report!!"),
            (2, "Ofgem and Environmental Agency report, thequick dog."),
            (3, ""),
            (4, "don't split apostrophes: the dog's fox"),
            (5, "quickbrownfox jumps lazy"),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: r["kw_input"]
            for r in pp.kw_preprocess(
                df, top_p=1000, max_word_len=10
            ).collect()
        }
        # rebuild the same chunk dictionary the operator trained
        import re

        from collections import Counter

        freqs = Counter()
        stripped = []
        for _, t in texts:
            for n in pp.KW_REGULATOR_SUBS:
                t = t.replace(n, "")
            stripped.append(t)
            for chunk in re.findall(r"[a-zA-Z0-9']+", t):
                if 1 <= len(chunk) <= 10:
                    freqs[chunk] += 1
        total = sum(freqs.values())
        import math

        from decimal import ROUND_HALF_UP, Decimal

        scores = {
            w: int(
                Decimal(math.log(f / total) * 1e6).quantize(
                    0, ROUND_HALF_UP
                )
            )
            for w, f in freqs.items()
        }

        def splitter(w):
            return _viterbi_split(w, scores, 10, -(10**9))

        for (i, t), _ in zip(texts, stripped):
            assert got[i] == ref_kw_preprocess(t, splitter), (i, got[i])

    def test_glued_compound_splits_back(self, spark):
        df = spark.createDataFrame(
            [
                (0, "alpha bravo charlie alpha bravo"),
                (1, "alphabravocharlie delta"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["kw_input"]
            for r in pp.kw_preprocess(df, top_p=100, max_word_len=8).collect()
        }
        assert out[1].startswith("alpha bravo charlie")

    def test_oracle_parity_duckdb(self, spark):
        import duckdb

        texts = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "Health and Safety Executive thequickbrown fox!!"),
            (2, "quickbrownfox and the dog's day"),
            (3, ""),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["kw_input"])
            for r in pp.kw_preprocess(
                df, top_p=1000, max_word_len=10
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE inp0 (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO inp0 VALUES (?, ?)", texts)
        exp = sorted(
            con.sql(
                pp.kw_preprocess_oracle_sql(
                    "SELECT doc_id, text FROM inp0",
                    top_p=1000,
                    max_word_len=10,
                )
            ).fetchall()
        )
        assert got == exp


# --- bundled-dictionary resplit (wordninja 2.0.0 exact parity) ---


class RefWordninja:
    """Independent transcription of wordninja 2.0.0's LanguageModel
    (the library the reference pins in requirements.txt) with FLOAT
    Zipf costs built from a word list in rank order — including the
    float-infinity unknown cost (9e999), the lowercased lookup, the
    min-tuple tie to the shortest piece, and the backtrack's
    's/digit-digit re-attach. Validates that the engine's frozen
    integer costs and (is_inf, cost, len) packed DP reproduce the
    float algorithm token-for-token."""

    def __init__(self, words):
        import math

        self.cost = {
            w: math.log((i + 1) * math.log(len(words)))
            for i, w in enumerate(words)
        }
        self.maxword = max(len(w) for w in words)

    def split(self, s):
        import re

        return [
            t
            for chunk in re.split("[^a-zA-Z0-9']+", s)
            for t in self._split(chunk)
        ]

    def _split(self, s):
        def best_match(i):
            candidates = enumerate(
                reversed(cost[max(0, i - self.maxword): i])
            )
            return min(
                (c + self.cost.get(s[i - k - 1: i].lower(), 9e999), k + 1)
                for k, c in candidates
            )

        cost = [0]
        for i in range(1, len(s) + 1):
            c, k = best_match(i)
            cost.append(c)
        out = []
        i = len(s)
        while i > 0:
            c, k = best_match(i)
            assert c == cost[i]
            new_token = True
            if not s[i - k: i] == "'":
                if len(out) > 0:
                    if out[-1] == "'s" or (
                        s[i - 1].isdigit() and out[-1][0].isdigit()
                    ):
                        out[-1] = s[i - k: i] + out[-1]
                        new_token = False
            if new_token:
                out.append(s[i - k: i])
            i -= k
        return list(reversed(out))


def _bundled_words():
    import csv

    with open(pp._WORDFREQ_PATH, newline="") as f:
        return [r["word"] for r in csv.DictReader(f)]


OUT_OF_CORPUS = [
    "healthandsafetyexecutiveguidance",
    "thequickbrownfoxjumpsoverthelazydog",
    "consultation2021response",
    "theregulator'sduties",
    "annualreport2023followup",
    "riskassessmentandcompliance",
    "HSEGuidance2021",
    "dogs'",
    "don'tstopbelieving",
    "covid19response",
    "xqzjv",
    "a1b2c3",
    "it'sworkplacesafety",
    "floodriskmanagementplan",
    "'",
    "''s",
]


class TestBundledDictionary:
    def test_split_matches_wordninja_float_port(self):
        port = RefWordninja(_bundled_words())
        for s in OUT_OF_CORPUS + [
            "punct,separated;chunks/drop", "tabs\tand\nnewlines stay out",
            "", "mixed CASE And 100% d1g1t5",
        ]:
            assert pp.wordninja_split(s) == port.split(s), s

    def test_title_chain_bundled_matches_reference(self, spark):
        """Full chain with dictionary='bundled' == the reference
        preprocess with the float wordninja port injected, on docs
        whose glued tails are OUT-OF-CORPUS vocabulary (the case the
        corpus-trained dictionary cannot reproduce)."""
        port = RefWordninja(_bundled_words())
        texts = [
            "h e a l t h andsafetyexecutiveguidance 2 0 2 1",
            "r e g u l a t o r ' s dutiesandresponsibilities!!",
            "t h e q u ickbrownfoxjumpsoverthelazydog",
            "Logo of the Environment Agency annual floodriskreport",
            "normal well formed title stays put",
            "",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = {
            r["doc_id"]: (r["was_resplit"], r["title_input"])
            for r in pp.title_preprocess(
                df, dictionary="bundled"
            ).collect()
        }
        for i, t in enumerate(texts):
            expect = ref_preprocess(t, pp.REGULATOR_NAMES, port.split)
            assert out[i][1] == expect, (i, out[i][1], expect)

    def test_kw_chain_bundled_matches_reference(self, spark):
        port = RefWordninja(_bundled_words())
        texts = [
            "Health and Safety Executive annualreport2023 guidance",
            "Ofgem energy pricecap consultation2021response",
            "Environmental Agency waterquality, riskassessment!",
            "the regulator's duties don'tstopbelieving dogs'",
            "",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["kw_input"]
            for r in pp.kw_preprocess(df, dictionary="bundled").collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == ref_kw_preprocess(t, port._split), (i, got[i])

    def test_resource_integrity(self):
        """The frozen CSV is exactly the generator's contract: ranks
        contiguous from 1, unique lowercase chunk-alphabet words,
        cost_micro = round_half_up(ln(rank·ln(N))·1e6), full
        single-letter+digit coverage, and "'s" for the re-attach."""
        import csv
        import math
        import re
        from decimal import ROUND_HALF_UP, Decimal

        with open(pp._WORDFREQ_PATH, newline="") as f:
            rows = list(csv.DictReader(f))
        n = len(rows)
        words = [r["word"] for r in rows]
        assert len(set(words)) == n
        assert [int(r["rank"]) for r in rows] == list(range(1, n + 1))
        for r in rows:
            w = r["word"]
            assert re.fullmatch("[a-z0-9']+", w), w
            c = math.log(int(r["rank"]) * math.log(n)) * 1e6
            assert int(r["cost_micro"]) == int(
                Decimal(c).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
            ), w
        singles = {w for w in words if len(w) == 1}
        assert set("abcdefghijklmnopqrstuvwxyz0123456789") <= singles
        assert "'s" in words
        costs, mw = pp.bundled_word_costs()
        assert mw == max(len(w) for w in words)
        assert len(costs) == n

    def test_infinity_tie_breaks_to_singles(self):
        """Float-inf parity: once any position is only reachable
        through an unknown piece, EVERY candidate beyond it compares
        equal (inf) and the shortest piece wins — known words after
        the break do NOT resume until a fully-finite candidate exists.
        Integer sum-of-unknowns semantics would give ['ab','z','ab']
        here; wordninja gives singles."""
        costs = {"ab": 1000, "a": 2000, "b": 2000}
        assert pp._wn_chunk_tokens("abzab", costs, 2) == [
            "ab", "z", "a", "b",
        ]
        port = RefWordninja(["ab", "a", "b"])
        assert pp.wordninja_split("abzab", costs, 2) == port.split("abzab")
        # maxword omitted with custom costs: derived from the dict
        # (max key length), matching wordninja's self._maxword
        assert pp.wordninja_split("abzab", costs) == port.split("abzab")
        assert pp.wordninja_split("x", {}) == ["x"]

    def test_reattach_rules(self):
        # digit runs resplit by the DP re-merge into one token
        assert pp.wordninja_split("20210405") == ["20210405"]
        # possessive re-attaches; lone apostrophe is its own token
        # (wordninja 2.0.0 emits it: the "'" guard only skips the
        # MERGE, the append still runs)
        assert pp.wordninja_split("theregulator'sduty") == [
            "the", "regulator's", "duty",
        ]
        assert pp.wordninja_split("dogs'")[-1] == "'"

    def test_unknown_dictionary_mode_raises(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pp.title_preprocess(df, dictionary="nope")
        with pytest.raises(ValueError):
            pp.kw_preprocess(df, dictionary="nope")
        with pytest.raises(ValueError):
            pp.title_preprocess_oracle_sql("SELECT 1", dictionary="nope")
        with pytest.raises(ValueError):
            pp.kw_preprocess_oracle_sql("SELECT 1", dictionary="nope")
