"""Text-analysis operators for large-scale training-data pipelines —
language-ID heuristics, quality scoring, token counting, document
fingerprinting (engine extension beyond the reference surface;
complements the model-backed langdetect N8 in operators/models.py).

Every operator is integer/string-exact Catalyst expressions — no UDFs —
so they run inside whole-stage codegen and are oracle-checkable. The one
exception is the fingerprint's Arrow hot-path twin (pandas UDF), kept
equality-tested against the expression spec.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

FP_PRIME = 1_000_000_007  # fingerprint modulus: keeps acc*31+255 in int64


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count — empties dropped, ALL ``\\s`` stripped at
    the edges (``trim`` strips spaces only: a leading tab/newline used
    to add a phantom empty token — the whitespace-edge divergence
    class the perturbed-oracle sweep exists to catch). Empty/whitespace-only
    text counts 0. Codegen-only spelling (no higher-order filter): a
    regex-stripped string split on ``\\s+`` can only contain an empty
    token when the whole string is empty."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    stripped = F.regexp_replace(c, r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", "")
    return (
        F.when(stripped == "", F.lit(0))
        .otherwise(F.size(F.split(stripped, r"[ \t\n\x0B\f\r]+")))
        .cast("bigint")
    )


def token_count_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_count` — keep in sync."""
    s = f"regexp_replace({expr}, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g')"
    return (
        f"CASE WHEN {s} = '' THEN 0 "
        f"ELSE len(string_split_regex({s}, '[ \\t\\n\\x0B\\f\\r]+')) END"
    )


# BPE-ish pre-tokenization pattern — the GPT-2 regex family
# (contraction suffix | space-prefixed letter run | space-prefixed digit
# run | space-prefixed punctuation run | whitespace run), restricted to
# the Java-regex ∩ RE2 dialect subset (no lookarounds, no \p classes) so
# Spark and the DuckDB oracle tokenize identically.
BPE_PATTERN = r"'[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\x0B\f\ra-zA-Z0-9]+|[ \t\n\x0B\f\r]+"


def bpe_token_count(text_col: Column | str) -> Column:
    """Token count under BPE-ish pre-tokenization (``BPE_PATTERN``) —
    the training-pipeline token budget estimator, vs the whitespace
    count of :func:`token_count`. Pure regexp expression: one
    ``regexp_extract_all`` inside codegen, no UDF."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)).cast("bigint")


def occurrence_count(text_col: Column | str, needle: str) -> Column:
    """Occurrences of ``needle`` via length difference — pure string
    arithmetic, identical in any engine."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def lang_id_heuristic(
    text_col: Column | str,
    stopwords: tuple[str, ...] = (" the ", " a ", " of ", " and "),
    threshold_milli: int = 20,
) -> Column:
    """n-gram/stopword language-ID heuristic: predict 'en' when English
    function words make up > threshold per-mille of tokens.

    Scaled-integer ratio: (hits·1000) DIV n_tokens — exact in int64.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    hits = None
    for w in stopwords:
        h = occurrence_count(padded, w)
        hits = h if hits is None else hits + h
    tc = token_count(c)
    # zero tokens → NULL ratio → 'other' (ANSI division guard; the
    # DuckDB twin's integer `// 0` is NULL, so both engines agree)
    ratio_milli = (
        F.when(tc > 0, (hits * 1000) / tc).otherwise(F.lit(None))
    ).cast("bigint")
    return F.when(ratio_milli >= threshold_milli, F.lit("en")).otherwise(F.lit("other"))


def quality_scores(text_col: Column | str) -> dict[str, Column]:
    """Quality-signal battery (length / punctuation / alpha ratios),
    scaled-integer per-mille so every engine agrees exactly:
      alpha_milli     — alphabetic chars ÷ length
      space_milli     — whitespace ÷ length
      avg_token_chars_milli — 1000·(non-space chars) ÷ tokens
      is_too_short    — length < 100 chars
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    length = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    n_space = F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit("")))
    toks = token_count(c)

    # empty text / zero tokens → NULL score (the DuckDB twin's integer
    # `// 0` is NULL; Spark's ANSI `/` would error instead — guard)
    def _ratio(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(None)).cast("bigint")

    return {
        "alpha_milli": _ratio(n_alpha * 1000, length),
        "space_milli": _ratio(n_space * 1000, length),
        "avg_token_chars_milli": _ratio((length - n_space) * 1000, toks),
        "is_too_short": length < 100,
    }


def fingerprint(text_col: Column | str) -> Column:
    """Rolling polynomial fingerprint of the whole document:
    fold (acc·31 + ascii(ch)) mod 1e9+7. Order-sensitive (unlike a
    bag-of-words hash) → detects reordering; arithmetic-exact in any
    engine. For content-defined chunk fingerprints at scale, apply to
    ``substring`` windows."""
    col = text_col if isinstance(text_col, str) else None
    assert col is not None, "fingerprint requires a column name (SQL expr)"
    return F.expr(
        f"aggregate(sequence(1, length({col})), CAST(0 AS BIGINT),"
        f" (acc, i) -> (acc*31 + ascii(substr({col}, i, 1))) % {FP_PRIME})"
    )


def fingerprint_np_table(df, id_col: str, text_col: str):
    """Hot-path twin of :func:`fingerprint` — the rolling hash unrolled
    to a polynomial dot product inside an Arrow-batched pandas UDF:
    fp = Σ ascii(c_i)·31^(n−i) mod p, with the power table built
    incrementally per batch. Identical int64 results (equality-tested);
    ~1.8× the interpreted per-character ``aggregate`` HOF at sf0.1.
    Bounded arithmetic: each term < p·255, so a 10⁸-char document still
    sums within int64."""
    @F.pandas_udf("bigint")
    def _fp(texts: pd.Series) -> pd.Series:
        powers = np.array([1], dtype=np.int64)  # 31^0 .. grown on demand

        def grow(n: int) -> np.ndarray:
            nonlocal powers
            if len(powers) < n:
                old = len(powers)
                grown = np.empty(n, dtype=np.int64)
                grown[:old] = powers
                for i in range(old, n):
                    grown[i] = (grown[i - 1] * 31) % FP_PRIME
                powers = grown
            return powers

        out = []
        for t in texts:
            # per-CHARACTER codepoints (utf-32-le = one uint32 per
            # char), matching Spark's ascii(substr(c,i,1)) and DuckDB's
            # ascii(text[i:i]) exactly — a utf-8 byte view diverged on
            # non-ASCII chars ('£' hashed as two bytes 194,163 instead
            # of codepoint 163; caught by the perturbed-oracle sweep)
            b = np.frombuffer(
                (t or "").encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(b)
            if n == 0:
                out.append(0)
                continue
            p = grow(n)[:n][::-1]
            out.append(int((b.astype(np.int64) * p % FP_PRIME).sum() % FP_PRIME))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), _fp(F.col(text_col)).alias("fp"))


# RE2 ∩ Java regex subset (the pii_redact posture: no lookarounds, no
# backrefs — both engines compile these identically)
URL_RE = r"https?://[a-z0-9.-]+(?:/[a-zA-Z0-9._%/+-]*)?"
ISO_DATE_RE = r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b"
MONEY_RE = r"[$£€][0-9]+(?:\.[0-9]{2})?"
NUMBER_RE = r"\b[0-9]+(?:\.[0-9]+)?\b"


def extract_entities(df, id_col: str = "doc_id", text_col: str = "text"):
    """Structured-signal extraction — the typed-column pull every
    curation pipeline runs before filtering/joining (URLs for
    crawl-graph joins, dates for recency gates, amounts for PII-ish
    review): per document the match COUNTS plus the sorted-distinct
    URL and date lists (sorted: match order is positional and
    hash-safe, but downstream joins want canonical arrays).

    Pure regexp projections — codegen, zero shuffles at any scale; the
    patterns live in the RE2∩Java subset so the DuckDB twin compiles
    the same automata (pii_redact's posture). Returns (id, n_urls,
    n_dates, n_amounts, n_numbers, urls, dates)."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(URL_RE)).cast("bigint").alias("n_urls"),
        F.regexp_count(c, F.lit(ISO_DATE_RE)).cast("bigint").alias("n_dates"),
        F.regexp_count(c, F.lit(MONEY_RE)).cast("bigint").alias("n_amounts"),
        F.regexp_count(c, F.lit(NUMBER_RE)).cast("bigint").alias("n_numbers"),
        F.array_sort(
            F.array_distinct(F.regexp_extract_all(c, F.lit(URL_RE), 0))
        ).alias("urls"),
        F.array_sort(
            F.array_distinct(F.regexp_extract_all(c, F.lit(ISO_DATE_RE), 0))
        ).alias("dates"),
    )


def extract_entities_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin — same patterns, same sort-distinct canonical
    arrays."""
    return f"""
    SELECT {id_col},
           CAST(len(regexp_extract_all({text_col}, '{URL_RE}')) AS BIGINT)
             AS n_urls,
           CAST(len(regexp_extract_all({text_col}, '{ISO_DATE_RE}')) AS BIGINT)
             AS n_dates,
           CAST(len(regexp_extract_all({text_col}, '{MONEY_RE}')) AS BIGINT)
             AS n_amounts,
           CAST(len(regexp_extract_all({text_col}, '{NUMBER_RE}')) AS BIGINT)
             AS n_numbers,
           list_sort(list_distinct(regexp_extract_all({text_col}, '{URL_RE}')))
             AS urls,
           list_sort(list_distinct(regexp_extract_all({text_col}, '{ISO_DATE_RE}')))
             AS dates
    FROM {table}
    """


def readability_components(text_col: Column | str) -> list[Column]:
    """Flesch reading-ease components (Flesch 1948; the standard
    document-quality readability gate in training-data pipelines) as
    pure codegen expressions — integer-exact so the score is
    hash-oracle-checkable:

    - ``n_words``: whitespace tokens (the :func:`token_count` spec);
    - ``n_sentences``: maximal ``[.!?]+`` runs, floored at 1;
    - ``n_syllables``: maximal vowel-group runs ``[aeiouy]+`` of the
      lowercased text, floored at n_words (every word has >= 1
      syllable — the cheap engine-portable stand-in for dictionary
      syllabification);
    - ``wps_milli`` / ``spw_milli``: words-per-sentence and
      syllables-per-word in exact per-mille (integer DIV);
    - ``flesch_centi``: 100 * (206.835 - 1.015*wps - 84.6*spw) from
      the per-mille components with truncating integer division —
      bit-identical on any engine with floor division.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_words = token_count(c)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), 0)
        ).cast("bigint"),
        n_words,
    )
    return [n_words, n_sent, n_syll]


def readability(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Flesch reading-ease report: (id, n_words,
    n_sentences, n_syllables, wps_milli, spw_milli, flesch_milli).
    ``flesch_milli = 206835 - (1015*wps_milli) DIV 1000 -
    (84600*spw_milli) DIV 1000`` — every division is an integer DIV
    over NON-NEGATIVE operands, where Spark's truncation and DuckDB's
    floor agree, so the score hashes identically cross-engine. One
    codegen projection, no shuffle, no UDF."""
    n_words, n_sent, n_syll = readability_components(text_col)
    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr("(n_words * 1000) DIV n_sentences").alias("wps_milli"),
        # empty doc (0 words) → NULL, matching the oracle's `// 0`
        F.expr(
            "CASE WHEN n_words > 0"
            " THEN (n_syllables * 1000) DIV n_words END"
        ).alias("spw_milli"),
    ).withColumn(
        "flesch_milli",
        F.expr(
            "206835 - (1015 * wps_milli) DIV 1000 - (84600 * spw_milli) DIV 1000"
        ),
    )


def readability_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`readability` — same regex runs, same
    floors, same integer floor-divisions."""
    tc = token_count_sql(text_col)
    return f"""
    WITH comp AS (
      SELECT {id_col},
             CAST(({tc}) AS BIGINT) AS n_words,
             GREATEST(CAST(len(regexp_extract_all({text_col}, '[.!?]+'))
                           AS BIGINT), 1) AS n_sentences,
             GREATEST(CAST(len(regexp_extract_all(lower({text_col}),
                                                  '[aeiouy]+')) AS BIGINT),
                      CAST(({tc}) AS BIGINT)) AS n_syllables
      FROM {table}
    ), ratios AS (
      SELECT {id_col}, n_words, n_sentences, n_syllables,
             (n_words * 1000) // n_sentences AS wps_milli,
             (n_syllables * 1000) // n_words AS spw_milli
      FROM comp
    )
    SELECT {id_col}, n_words, n_sentences, n_syllables, wps_milli, spw_milli,
           206835 - (1015 * wps_milli) // 1000 - (84600 * spw_milli) // 1000
             AS flesch_milli
    FROM ratios
    """


PMI_SCALE = 1_000_000_000  # nano quantization of PMI values


def token_pmi(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_docs: int = 5,
    k: int = 50,
    max_tokens_per_doc: int = 64,
):
    """Collocation mining: the top-``k`` token pairs by pointwise
    mutual information over document co-occurrence —
    ``PMI(x,y) = ln(N·c_xy / (c_x·c_y))`` with doc-frequency counts.
    The classic phrase/topic-signal extractor (Church & Hanks 1990)
    over a corpus, as two shuffles: distinct presence, then a per-doc
    self-join (quadratic only WITHIN a doc, bounded by
    ``max_tokens_per_doc`` — the first ``m`` tokens alphabetically, a
    deterministic cap so a pathological doc can't go quadratic), then
    pair counts + two vocabulary-sized frequency joins.

    Output ``(token_a, token_b, n_pair_docs, pmi_q)`` with
    ``token_a < token_b``, ordered (pmi desc, token_a, token_b) — a
    total order. Counts are exact BIGINTs; the single ln is computed
    on the same integer ratio by both engines and nano-quantized
    (the repo-wide 1-ulp cross-engine assumption).
    """
    tok = F.explode(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")
    ).alias("token")
    pres = (
        docs.select(F.col(id_col), tok)
        .where(F.col("token") != "")
        .distinct()
    )
    # Window scale: partition key is the doc id; rows per task = one
    # document's distinct tokens (bounded by doc length).
    w = Window.partitionBy(id_col).orderBy(F.col("token").asc())
    pres = (
        pres.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_tokens_per_doc)
        .drop("_rn")
    )
    # r14 (guide §1.2): four consumers (N count, token df, both pair
    # sides) re-ran the explode + distinct + cap-window pipeline —
    # materialize the capped presence table once.
    from beis_orp_data_service_spark.checkpointing import stage_checkpoint

    pres = stage_checkpoint(pres, label="token_pmi:presence")
    n = pres.select(id_col).distinct().count()
    df = pres.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    a = pres.select(F.col(id_col), F.col("token").alias("token_a"))
    b = pres.select(F.col(id_col), F.col("token").alias("token_b"))
    pairs = (
        a.join(b, id_col)
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair_docs"))
        .where(F.col("n_pair_docs") >= min_pair_docs)
    )
    return (
        pairs.join(df.select(F.col("token").alias("token_a"),
                             F.col("_df").alias("_dfa")), "token_a")
        .join(df.select(F.col("token").alias("token_b"),
                        F.col("_df").alias("_dfb")), "token_b")
        .select(
            "token_a",
            "token_b",
            "n_pair_docs",
            F.round(
                F.log(
                    (F.lit(n) * F.col("n_pair_docs")).cast("double")
                    / (F.col("_dfa") * F.col("_dfb")).cast("double")
                )
                * PMI_SCALE
            )
            .cast("bigint")
            .alias("pmi_q"),
        )
        .orderBy(F.col("pmi_q").desc(), F.col("token_a"), F.col("token_b"))
        .limit(k)
    )


def token_pmi_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_docs: int = 5,
    k: int = 50,
    max_tokens_per_doc: int = 64,
) -> str:
    """DuckDB twin of :func:`token_pmi` — same distinct presence, same
    alphabetical per-doc cap, same exact-integer ratio into ln."""
    tok_list = (
        f"list_filter(string_split_regex(trim(lower({text_col})),"
        " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )
    return f"""
    WITH pres0 AS (
      SELECT DISTINCT {id_col}, unnest({tok_list}) AS token FROM {table}
    ), pres AS (
      SELECT {id_col}, token FROM pres0
      QUALIFY row_number() OVER (PARTITION BY {id_col} ORDER BY token ASC)
              <= {max_tokens_per_doc}
    ), n AS (
      SELECT COUNT(DISTINCT {id_col}) AS n FROM pres
    ), df AS (
      SELECT token, COUNT(*) AS df FROM pres GROUP BY token
    ), pairs AS (
      SELECT a.token AS token_a, b.token AS token_b,
             CAST(COUNT(*) AS BIGINT) AS n_pair_docs
      FROM pres a JOIN pres b
        ON a.{id_col} = b.{id_col} AND a.token < b.token
      GROUP BY a.token, b.token
      HAVING COUNT(*) >= {min_pair_docs}
    )
    SELECT token_a, token_b, n_pair_docs,
           CAST(round(ln(CAST((SELECT n FROM n) * n_pair_docs AS DOUBLE)
                         / CAST(da.df * db.df AS DOUBLE))
                      * {PMI_SCALE}) AS BIGINT) AS pmi_q
    FROM pairs
    JOIN df da ON da.token = pairs.token_a
    JOIN df db ON db.token = pairs.token_b
    ORDER BY pmi_q DESC, token_a, token_b
    LIMIT {k}
    """


ENTROPY_SCALE = 1_000_000_000  # nano quantization of per-char entropy terms


def char_entropy(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Character-unigram Shannon entropy per document — the classic
    cheap quality/gibberish signal (low entropy = boilerplate or
    repeated filler, the Gopher-rules companion statistic): over the
    doc's character histogram, ``H = Σ −(c/L)·ln(c/L)``.

    Exactness: counts and lengths are exact BIGINTs; each character's
    term is nano-quantized BEFORE the per-doc sum (order-insensitive;
    the ln shares the repo-wide 1-ulp assumption). Plan: explode chars
    → one (doc, char) count aggregation → one per-doc sum — two
    shuffles on doc_id, codegen end to end. Empty docs yield no rows
    (no characters).
    """
    ch = F.explode(F.split(F.col(text_col), "")).alias("ch")
    counts = (
        docs.select(F.col(id_col), F.length(F.col(text_col)).alias("_len"), ch)
        .where(F.col("ch") != "")
        .groupBy(id_col, "_len", "ch")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    p = F.col("_c").cast("double") / F.col("_len").cast("double")
    term_q = F.round(-(p * F.log(p)) * ENTROPY_SCALE).cast("bigint")
    return (
        counts.select(F.col(id_col), F.col("_len"), term_q.alias("_t"))
        .groupBy(id_col, "_len")
        .agg(F.sum("_t").cast("bigint").alias("entropy_q"))
        .select(
            F.col(id_col),
            F.col("_len").cast("bigint").alias("n_chars_exact"),
            "entropy_q",
        )
    )


def char_entropy_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`char_entropy` — same histogram, same
    double p, same nano quantization before the per-doc sum."""
    return f"""
    WITH chars AS (
      SELECT {id_col}, length({text_col}) AS len,
             unnest(string_split({text_col}, '')) AS ch
      FROM {table}
    ), counts AS (
      SELECT {id_col}, len, ch, COUNT(*) AS c
      FROM chars WHERE ch <> '' GROUP BY {id_col}, len, ch
    )
    SELECT {id_col},
           CAST(len AS BIGINT) AS n_chars_exact,
           CAST(SUM(CAST(round(
             -((CAST(c AS DOUBLE) / CAST(len AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(len AS DOUBLE)))
             * {ENTROPY_SCALE}) AS BIGINT)) AS BIGINT) AS entropy_q
    FROM counts
    GROUP BY {id_col}, len
    """


def oov_rate_by_lang(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    holdout_mod: int = 5,
):
    """Vocabulary-coverage QA: build the token vocabulary from the
    train slice (``id % holdout_mod != 0``), then measure the
    out-of-vocabulary OCCURRENCE rate of the held-out slice per
    language — the tokenizer/corpus drift check run before committing
    a vocab (a lang whose OOV spikes is under-represented in train).

    Exact integers end to end: per-lang token occurrences, OOV
    occurrences (left join against the vocab, null = OOV), and the
    per-mille rate as ``(n_oov·1000) DIV n_tokens``. Plan: one distinct
    vocab aggregation + one token join (vocabulary-sized build side) +
    one per-lang aggregation.
    """
    tok = F.explode(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")
    ).alias("token")
    is_test = F.col(id_col) % holdout_mod == 0
    vocab = (
        docs.where(~is_test)
        .select(tok)
        .where(F.col("token") != "")
        .distinct()
        .withColumn("_known", F.lit(1))
    )
    te = (
        docs.where(is_test)
        .select(F.col(lang_col).alias("lang"), tok)
        .where(F.col("token") != "")
    )
    return (
        te.join(vocab, "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_known").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_milli",
            ((F.col("n_oov") * 1000) / F.col("n_tokens")).cast("bigint"),
        )
    )


def oov_rate_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    holdout_mod: int = 5,
) -> str:
    """DuckDB twin of :func:`oov_rate_by_lang`."""
    tok_list = (
        f"list_filter(string_split_regex(trim(lower({text_col})),"
        " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )
    return f"""
    WITH vocab AS (
      SELECT DISTINCT unnest({tok_list}) AS token
      FROM {table} WHERE {id_col} % {holdout_mod} <> 0
    ), te AS (
      SELECT {lang_col} AS lang, unnest({tok_list}) AS token
      FROM {table} WHERE {id_col} % {holdout_mod} = 0
    ), agg AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov
      FROM te LEFT JOIN vocab v USING (token)
      GROUP BY lang
    )
    SELECT lang, n_tokens, n_oov,
           CAST(floor((n_oov * 1000) / CAST(n_tokens AS DOUBLE))
                AS BIGINT) AS oov_milli
    FROM agg
    """


def bpe_fertility_by_lang(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
):
    """Tokenizer-budget report per language: BPE-ish tokens per
    whitespace word (fertility) and characters per BPE token — the
    numbers that decide how a fixed token budget splits across
    languages (high-fertility languages eat the budget faster) and
    whether a tokenizer underserves a script. Exact integers: grouped
    sums of the two codegen token counts + char length, per-mille
    ratios with zero-guards (NULL where a language has no words,
    matching DuckDB's integer ``// 0``).

    Returns (lang, n_docs, ws_tokens, bpe_tokens, n_chars,
    fertility_milli, chars_per_bpe_milli).
    """
    from pyspark.sql import functions as F

    agg = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("ws_tokens"),
        F.sum(bpe_token_count(text_col)).cast("bigint").alias("bpe_tokens"),
        F.sum(F.length(text_col)).cast("bigint").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "n_chars",
        F.when(
            F.col("ws_tokens") > 0,
            F.expr("(bpe_tokens * 1000) DIV ws_tokens"),
        ).alias("fertility_milli"),
        F.when(
            F.col("bpe_tokens") > 0,
            F.expr("(n_chars * 1000) DIV bpe_tokens"),
        ).alias("chars_per_bpe_milli"),
    )


def bpe_fertility_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`bpe_fertility_by_lang` — same token-count
    spellings, same per-mille floor divisions (`// 0` is NULL)."""
    tc = token_count_sql(text_col)
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
    WITH agg AS (
      SELECT {lang_col} AS lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({tc}) AS BIGINT) AS ws_tokens,
             CAST(sum(len(regexp_extract_all({text_col}, '{pat}')))
                  AS BIGINT) AS bpe_tokens,
             CAST(sum(length({text_col})) AS BIGINT) AS n_chars
      FROM {table} GROUP BY {lang_col}
    )
    SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars,
           (bpe_tokens * 1000) // nullif(ws_tokens, 0) AS fertility_milli,
           (n_chars * 1000) // nullif(bpe_tokens, 0) AS chars_per_bpe_milli
    FROM agg
    """


def token_ngrams_expr(text_col: str, n: int):
    """array<string> of in-document token ``n``-grams (space-joined
    windows of stripped lowercased whitespace tokens; docs shorter
    than ``n`` tokens yield an empty array — no partial windows).
    Shared by the exact and HLL spellings of ngram diversity so the
    gram universe is identical by construction."""
    from pyspark.sql import functions as F

    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+"
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exploded_token_ngrams(docs, group_col: str, text_col: str, n: int):
    """(grp, gram) rows — the EXPLODED twin of
    :func:`token_ngrams_expr` (same stripped-lowered whitespace
    tokens, same space-joined windows, no partial grams, same per-doc
    order), spelled with codegen-only primitives: ``slice`` ×n +
    ``arrays_zip`` + ``explode`` + ``concat_ws``. The array form's
    ``transform()`` lambda (slice+concat per window) is INTERPRETED
    per element and measured ~12× slower at corpus scale (r14, guide
    §1.2 — this repo's documented HOF footgun); docs shorter than
    ``n`` tokens produce zero-length slices, so they contribute no
    rows exactly like the array form's empty-array guard."""
    from pyspark.sql import functions as F

    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+"
    )
    win = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, j + 1, win).alias(f"t{j}") for j in range(n)]
    )
    return docs.select(
        F.col(group_col).alias("grp"), F.explode(z).alias("_z")
    ).select(
        "grp",
        F.concat_ws(" ", *[F.col(f"_z.t{j}") for j in range(n)]).alias("gram"),
    )


def ngram_diversity(
    docs,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
):
    """Distinct-n diversity (the Self-BLEU/distinct-n family, Zhu et
    al. 2018): per group, the share of DISTINCT token n-grams among all
    n-gram occurrences — the mode-collapse monitor for synthetic /
    model-generated slices of a corpus (a source whose distinct-3 ratio
    sinks is repeating itself). Exact integers: one explode of in-doc
    token n-grams (docs shorter than ``n`` tokens contribute none — no
    partial windows), one grouped count + count-distinct, per-mille
    floor ratio. Shuffle carries (group, gram) partials only.

    Returns (group, n_ngrams, n_distinct, distinct_milli).
    """
    from pyspark.sql import functions as F

    g = exploded_token_ngrams(docs, group_col, text_col, n)
    return (
        g.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.countDistinct("gram").cast("bigint").alias("n_distinct"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_ngrams",
            "n_distinct",
            F.expr("(n_distinct * 1000) DIV n_ngrams").alias("distinct_milli"),
        )
    )


def ngram_diversity_oracle_sql(
    table: str = "documents",
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`ngram_diversity` — same stripped-lowered
    token windows, no partial grams, same per-mille floor."""
    return f"""
    WITH t AS (
      SELECT {group_col} AS grp,
             string_split_regex(regexp_replace(lower({text_col}),
                                '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+') AS toks
      FROM {table}
    ), g AS (
      SELECT grp,
             unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                     for i in range(1, len(toks) - {n - 1} + 1)]) AS gram
      FROM t WHERE len(toks) >= {n}
    )
    SELECT grp AS {group_col},
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
           (count(DISTINCT gram) * 1000) // count(*) AS distinct_milli
    FROM g GROUP BY grp
    """


def ngram_diversity_approx(
    docs,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    p: int = 12,
):
    """HLL spelling of :func:`ngram_diversity` —
    the 100 TB dashboard path. The exact form's per-(group, gram)
    countDistinct shuffles the full gram UNIVERSE (trigram types grow
    ~linearly with a web corpus); this one shuffles at most
    |groups|·2^p register rows (one map-side-combined max per (group,
    bucket)) and estimates distinct grams per group with the md5-keyed
    HLL (:func:`~beis_orp_data_service_spark.operators.corpus.
    hll_registers_by_group`), so the whole monitor is
    mergeable-bounded-state regardless of corpus size. n_ngrams stays
    exact (a decomposable count).

    Hash-grade: registers are integer (engine-portable md5), s_total
    is an exact int64, and the estimate is one IEEE division (the
    linear-counting small-range branch carries the repo's documented
    1-ulp ln() assumption but is unreachable for corpus-scale gram
    counts). Returns (group, n_ngrams, n_distinct_est double,
    distinct_milli_est bigint).
    """
    from pyspark.sql import functions as F

    from beis_orp_data_service_spark.operators.corpus import (
        hll_estimate_by_group,
        hll_registers_by_group,
    )

    g = exploded_token_ngrams(docs, group_col, text_col, n)
    # ONE pass over the exploded grams (r14, guide §1.2/§2.3): the
    # registers aggregate also counts each bucket's exact occurrences
    # (both map-side-combined), and the per-group estimate sums them
    # back to the exact n_ngrams — the old spelling exploded the corpus
    # TWICE (once for the total, once for the registers) and paid a
    # join to glue the halves. Grams are never null (concat_ws over
    # token windows), so the register count IS the occurrence total.
    est = hll_estimate_by_group(
        hll_registers_by_group(g, "grp", "gram", p=p, count_col="n_ngrams"),
        "grp", p=p, sum_cols=("n_ngrams",),
    ).select("grp", "n_ngrams", F.col("est").alias("n_distinct_est"))
    return est.select(
        F.col("grp").alias(group_col),
        "n_ngrams",
        "n_distinct_est",
        F.floor(F.col("n_distinct_est") * 1000 / F.col("n_ngrams"))
        .cast("bigint")
        .alias("distinct_milli_est"),
    )


def ngram_diversity_approx_oracle_sql(
    table: str = "documents",
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    p: int = 12,
) -> str:
    """DuckDB twin of :func:`ngram_diversity_approx` — identical gram
    construction, identical md5-HLL registers and estimate."""
    from beis_orp_data_service_spark.operators.corpus import (
        hll_estimate_by_group_oracle_sql,
    )

    est = hll_estimate_by_group_oracle_sql("gv", "grp", p, "")
    return f"""
    WITH t AS (
      SELECT {group_col} AS grp,
             string_split_regex(regexp_replace(lower({text_col}),
                                '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+') AS toks
      FROM {table}
    ), g AS (
      SELECT grp,
             unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                     for i in range(1, len(toks) - {n - 1} + 1)]) AS gram
      FROM t WHERE len(toks) >= {n}
    ), gv AS (
      SELECT grp, gram AS v FROM g
    ), tot AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_ngrams FROM g GROUP BY grp
    ), e AS (
      SELECT * FROM {est} AS sub
    )
    SELECT tot.grp AS {group_col}, tot.n_ngrams,
           e.est AS n_distinct_est,
           CAST(floor(e.est * 1000 / tot.n_ngrams) AS BIGINT)
             AS distinct_milli_est
    FROM tot JOIN e ON tot.grp = e.grp
    """
