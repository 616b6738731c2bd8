"""Enrichment operators — the SQL-expressible core of the reference's
"data science" lambdas (SURVEY.md §2.3), declared so Catalyst keeps them
inside whole-stage codegen.

Model-backed halves (T5 title gen, KeyBERT, BART summarisation) live in
``operators/models.py`` as pandas UDFs with deterministic fakes; this
module holds everything that needs no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beis_orp_data_service_spark.functions.text import (
    sentence_chunks,
    sentences,
    tokens,
)


# ---------------------------------------------------------------------------
# N1/N3 — title selection
# ---------------------------------------------------------------------------


def title_rule(text_col: Column | str, n_chars_col: Column | str,
               long_words: int = 40, short_chars: int = 150) -> Column:
    """N1 — the title-selection heuristic (title_generation.py:49-94):
    over-long metadata title → generate; short → keep; else score."""
    n_words = F.size(tokens(text_col))
    nc = F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col
    return (
        F.when(n_words > long_words, F.lit("generate"))
        .when(nc < short_chars, F.lit("keep-short"))
        .otherwise(F.lit("score"))
    )


def percentage_shortener(
    text_col: str, n_chars_col: str | None = None, percentage: float = 0.1
) -> Column:
    """Reference percentage_shortener (get_title.py:10-21), expression
    form: take the first ``int(len(text)·percentage)`` *words* (the
    reference indexes the word list with a character count — kept
    verbatim, deviation-free), then append the remainder of the text up
    to its first period. Pure projection."""
    text = F.col(text_col)
    n_chars = F.col(n_chars_col) if n_chars_col else F.length(text)
    words = F.split(text, " ")
    k = F.least((n_chars * percentage).cast("int"), F.size(words))
    shortened = F.concat_ws(" ", F.slice(words, 1, k))
    remainder = F.substring(text, F.length(shortened) + 1, F.lit(2**31 - 1))
    first_sent = F.substring_index(remainder, ".", 1)
    return F.concat(shortened, first_sent)


def title_window_max(
    df: DataFrame,
    text_col: str,
    title_col: str,
    id_col: str,
    padding: int = 0,
    max_candidates: int = 1000,
) -> DataFrame:
    """N3 — metadata-title-in-text scoring
    (title_generation/search_metadata_title/get_title.py:10-87): shorten
    the text (``percentage_shortener``, 10%), slide a window of the
    *metadata title's* token length (+``padding``,
    rolling_padded_sentence get_title.py:33) over the shortened token
    stream, score each window against the title, keep the max (earliest
    window wins ties — the reference iterates in order and keeps the
    first max). Candidate windows are capped at ``max_candidates``
    (get_title.py:41-46). Scoring substitutes deterministic token
    overlap for the reference's spacy embedding cosine (documented
    model-free twin); a document with no candidate windows scores 0
    with window 0 (get_title.py:68-71).

    Everything is array-valued per row — no explode, no shuffle: the
    whole operator is a projection, embarrassingly parallel at 100 TB.
    """
    st = F.split(F.regexp_replace(percentage_shortener(text_col), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")
    title_toks = tokens(title_col)
    wlen = F.size(title_toks) + F.lit(padding)
    n_windows = F.least(F.size(st) - wlen + 1, F.lit(max_candidates))
    # greatest(..., 1): sequence(1, 0) would count DOWN ([1, 0]); the
    # no-window case is masked out by `has_windows` below instead
    scores = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: F.size(
            F.filter(
                F.slice(st, i, wlen), lambda x: F.array_contains(title_toks, x)
            )
        ),
    )
    # length guard: split(trim('')) is [''] (size 1), not [] — an empty
    # text must score (0, 0) like the numpy twin's empty token list
    has_windows = (n_windows >= 1) & (
        F.length(F.trim(F.col(text_col))) > 0
    )
    best_score = F.when(has_windows, F.array_max(scores)).otherwise(F.lit(0))
    best_idx = F.when(
        has_windows, F.array_position(scores, F.array_max(scores))
    ).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        best_score.cast("int").alias("best_score"),
        best_idx.cast("bigint").alias("best_window_idx"),
    )


def title_window_max_np(
    df: DataFrame,
    text_col: str,
    title_col: str,
    id_col: str,
    padding: int = 0,
    max_candidates: int = 1000,
) -> DataFrame:
    """N3 hot path — same semantics as ``title_window_max`` (incl. the
    percentage_shortener preamble) but the window scoring is a numpy
    sliding-sum inside an Arrow-batched pandas UDF: membership via
    np.isin, window scores via cumsum difference, first-argmax tiebreak
    via np.argmax. Identical integer results (tests assert equality
    with the expression form)."""
    from pyspark.sql import types as T

    out_type = T.StructType(
        [
            T.StructField("best_score", T.IntegerType()),
            T.StructField("best_window_idx", T.LongType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _score(texts: pd.Series, titles: pd.Series) -> pd.DataFrame:
        scores, idxs = [], []
        for t, title in zip(texts, titles):
            t = t or ""
            k = min(int(len(t) * 0.1), len(t.split(" ")))
            shortened = " ".join(t.split(" ")[:k])
            short_text = shortened + t[len(shortened):].split(".")[0]
            toks = np.array(short_text.strip().split())
            # split(trim(x), '\s+') yields [''] for empty x in both the
            # expression form and DuckDB — mirror that here so an empty
            # title means wlen 1 / zero matches, not wlen 0
            title_toks = np.array((title or "").strip().split() or [""])
            wlen = len(title_toks) + padding
            n = min(len(toks) - wlen + 1, max_candidates)
            if n < 1:
                scores.append(0)
                idxs.append(0)
                continue
            member = np.isin(toks, title_toks).astype(np.int64)
            c = np.concatenate([[0], np.cumsum(member)])
            win = (c[wlen:] - c[:-wlen])[:n]  # sliding sums
            scores.append(int(win.max()))
            idxs.append(int(win.argmax()) + 1)  # first max, 1-based
        return pd.DataFrame({"best_score": scores, "best_window_idx": idxs})

    return df.select(
        F.col(id_col), _score(F.col(text_col), F.col(title_col)).alias("r")
    ).select(
        id_col,
        F.col("r.best_score").alias("best_score"),
        F.col("r.best_window_idx").alias("best_window_idx"),
    )


# ---------------------------------------------------------------------------
# N6 — keyword dedupe-max + top-k
# ---------------------------------------------------------------------------


def keyword_dedupe_max(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 10
) -> DataFrame:
    """N6 — keyword dedupe-max (keyword_extraction.py:95-101): group
    keyword candidates by lemma, keep max score, take top-k.

    Engine scoring: term frequency within the document (the reference's
    KeyBERT score arrives from the model UDF; frequency keeps the
    relational half oracle-checkable). Deterministic top-k: ties broken
    by keyword ascending.
    """
    words = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("keyword")
    )
    scored = words.groupBy(id_col, "keyword").agg(F.count("*").alias("score"))
    # Window scale: partition key is the doc id; rows per task = one
    # document's distinct keywords (bounded by doc length).
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("keyword"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "keyword", "score", "rank")
    )


# Reference stopword extras (keyword_extraction.py:38-39) on top of a
# compact English core — one deterministic list shared with the oracle.
KEYWORD_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "have", "in", "is", "it", "its", "of", "on", "or", "that",
    "the", "this", "to", "was", "were", "will", "with",
    "use", "uses", "used", "www", "gov", "uk", "guidance", "pubns",
    "page",
)


def keyword_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 15,
    stopwords: tuple[str, ...] = KEYWORD_STOPWORDS,
) -> DataFrame:
    """N5, relational half — the CountVectorizer preprocessing +
    term-count candidates of keyword extraction
    (keyword_extraction.py:27-57,60-78): strip non-alpha to spaces,
    lowercase, tokenize, drop stopwords and single-character tokens,
    count terms per document, keep the ``top_n`` by count (ties broken
    keyword-ascending for determinism). The KeyBERT embedding re-rank
    on top of these candidates is the model half (operators/models.py);
    this relational half is what runs at corpus scale and is
    oracle-checkable.

    The same candidate counts are what Spark ML's ``CountVectorizer``
    produces as a term-frequency vector — tested for equality — but the
    relational form keeps the lazy per-doc top-n inside Catalyst (one
    shuffle on (doc, term), window over ≤ vocab-per-doc rows).
    """
    cleaned = F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", " "))
    words = df.select(
        F.col(id_col), F.explode(F.split(F.regexp_replace(cleaned, r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")).alias("keyword")
    ).filter((F.length("keyword") > 1) & ~F.col("keyword").isin(*stopwords))
    counts = words.groupBy(id_col, "keyword").agg(
        F.count("*").alias("n_mentions")
    )
    # Window scale: partition key is the doc id; rows per task = one
    # document's distinct candidate words (bounded by doc length).
    w = Window.partitionBy(id_col).orderBy(F.desc("n_mentions"), F.asc("keyword"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "keyword", "n_mentions", "rank")
    )


# ---------------------------------------------------------------------------
# N9 — date extraction: nearest-to-metadata selection
# ---------------------------------------------------------------------------


def nearest_date(
    df: DataFrame,
    key_col: str,
    date_col: str,
    reference_date: str,
    margin_days: int = 92,
) -> DataFrame:
    """N9 — pick the candidate date closest to the metadata date if
    within ±margin, else keep the metadata date
    (date_generation.py:77-100; margin = 3 months).

    min over (abs-diff, date) structs gives a deterministic argmin
    without a shuffle-heavy window.
    """
    ref = F.lit(reference_date).cast("timestamp")
    diff = F.abs(F.unix_timestamp(F.col(date_col)) - F.unix_timestamp(ref))
    best = df.groupBy(key_col).agg(
        F.min(F.struct(diff.alias("d"), F.col(date_col).alias("ts"))).alias("b")
    )
    chosen = F.when(
        F.col("b.d") <= margin_days * 86400, F.col("b.ts")
    ).otherwise(ref)
    return best.select(F.col(key_col), chosen.alias("chosen_date"))


# ---------------------------------------------------------------------------
# N11/N12 — legislative-origin candidate pruning + phrase match
# ---------------------------------------------------------------------------


def candidate_prune(dim: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """N11 — prune the legislation dimension to rows whose key (year)
    was detected in the text (legislative_origin_extraction.py:56-83).
    A semi-join: with the dimension partitioned by year this is dynamic
    partition pruning; the DynamoDB GSI pagination loop disappears.
    """
    return dim.join(keys, on, "left_semi")


def phrase_match_first_sentence(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    needles: DataFrame,
    needle_col: str = "needle",
    sentence_width: int = 8,
    sentencizer: str = "period",
) -> DataFrame:
    """N12 — legislation phrase match with first-sentence early stop
    (legislative_origin_extraction.py:86-127): segment into sentences,
    match candidate phrases per sentence, keep only matches from the
    FIRST sentence that has any.

    ``sentencizer="period"`` (default) splits on ``.`` exactly like the
    reference's custom_sentencizer (legislative_origin_extraction.py:
    18-27), falling back to fixed ``sentence_width``-token chunks for a
    document with no periods at all; ``sentencizer="chunks"`` forces the
    fixed-width segmentation.

    The reference short-circuits a Python loop; set-wise the same result
    is "rank sentences, keep matches at min(rank)" — fully parallel, no
    early-exit control flow needed (SURVEY §4). Needles are broadcast.
    """
    if sentencizer == "period":
        seg = sentences(text_col, fallback_width=sentence_width)
    elif sentencizer == "chunks":
        seg = sentence_chunks(text_col, sentence_width)
    else:
        raise ValueError(f"unknown sentencizer: {sentencizer!r}")
    sent = docs.select(
        F.col(id_col),
        F.posexplode(seg).alias("sent_idx", "sentence"),
    )
    padded = F.concat(F.lit(" "), F.col("sentence"), F.lit(" "))
    matches = sent.join(
        F.broadcast(needles),
        padded.contains(F.concat(F.lit(" "), F.col(needle_col), F.lit(" "))),
    )
    # Window scale: partition key is the doc id; rows per task = one
    # document's needle matches (bounded).
    w = Window.partitionBy(id_col)
    return (
        matches.withColumn("_first", F.min("sent_idx").over(w))
        .filter(F.col("sent_idx") == F.col("_first"))
        .select(id_col, F.col("sent_idx").cast("bigint").alias("sent_idx"), needle_col)
    )


# ---------------------------------------------------------------------------
# N14 — document-type identification: priority-rank resolution
# ---------------------------------------------------------------------------


def dti_rank(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rulebook: DataFrame,
    phrase_col: str = "phrase",
    priority_col: str = "priority",
    label_col: str = "label",
) -> DataFrame:
    """N14 — rule-based document-type identification
    (glue rule_based_dti.py:12-67): match rulebook phrases against the
    scan window, resolve to the label of the highest-priority hit.
    Deterministic tie-break: label ascending at equal priority.
    """
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    hits = docs.join(
        F.broadcast(rulebook),
        padded.contains(F.concat(F.lit(" "), F.col(phrase_col), F.lit(" "))),
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col(priority_col).alias("p"),
                    F.col(label_col).alias("l"),
                )
            ).alias("b")
        )
        .select(
            id_col,
            F.col("b.p").alias("dti_priority"),
            F.col("b.l").alias("document_type"),
        )
    )


# ---------------------------------------------------------------------------
# N14 (web half) — document-type from prefetched gov.uk API / hse HTML
# ---------------------------------------------------------------------------

GOVUK_PREFIX = "https://www.gov.uk/"
HSE_PREFIX = "https://www.hse.gov.uk/"

# gov.uk content API response subset the rules consume
# (rule_based_dti.py:40-46: js['document_type'] + parent document_types)
_GOVUK_API_SCHEMA = (
    "struct<document_type: string,"
    " links: struct<parent: array<struct<document_type: string>>>>"
)


def dti_web_rank(
    docs: DataFrame,
    id_col: str,
    url_col: str,
    api_json_col: str,
    html_col: str,
    mapping: DataFrame,
    parent_url_col: str | None = None,
    parent_api_json_col: str | None = None,
    parent_html_col: str | None = None,
    doc_type_col: str = "document_type",
    orp_col: str = "orp_dt",
    order_col: str = "map_idx",
) -> DataFrame:
    """N14 web half — document-type from PREFETCHED web responses, as
    pure column logic (rule_based_dti.py:36-58 ``dti_web``; the live
    ``requests.get`` is the only part left out of engine scope):

    - hse urls: candidate types are the ``<body class="...">`` classes
      of the fetched page (``html_col``);
    - gov.uk urls: ``document_type`` of the content-API response plus
      the parent chain's document_types (``api_json_col``, parsed with
      the native ``from_json`` — no Python);
    - other urls with a ``parent_url``: one recursion level on the
      parent's prefetched columns (``dti_web(parent_url, None)`` —
      the reference's recursion cannot go deeper than one because it
      passes ``None`` as the new parent);
    - resolution: first row of the mapping table (by ``order_col``,
      the CSV row order — ``df[df.document_type.isin(...)].orp_dt
      .iloc[0]``) whose ``document_type`` is among the candidates,
      else 'NA'.

    ``mapping`` is broadcast (a few-hundred-row dimension); only hit
    rows shuffle for the min-index aggregation.
    """
    url = F.col(url_col)
    own_known = url.startswith(GOVUK_PREFIX) | url.startswith(HSE_PREFIX)
    p_url = F.col(parent_url_col) if parent_url_col else F.lit(None).cast("string")
    p_api = (
        F.col(parent_api_json_col)
        if parent_api_json_col
        else F.lit(None).cast("string")
    )
    p_html = (
        F.col(parent_html_col) if parent_html_col else F.lit(None).cast("string")
    )

    url_eff = F.when(own_known, url).otherwise(p_url)
    api_eff = F.when(own_known, F.col(api_json_col)).otherwise(p_api)
    html_eff = F.when(own_known, F.col(html_col)).otherwise(p_html)

    parsed = F.from_json(api_eff, _GOVUK_API_SCHEMA)
    gov_types = F.filter(
        F.concat(
            F.array(parsed["document_type"]),
            F.coalesce(
                F.transform(
                    parsed["links"]["parent"], lambda x: x["document_type"]
                ),
                F.array().cast("array<string>"),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    body_class = F.regexp_extract(html_eff, r'<body[^>]*class="([^"]*)"', 1)
    hse_types = F.split(body_class, r"[ \t\n\x0B\f\r]+")
    possible = (
        F.when(url_eff.startswith(HSE_PREFIX), hse_types)
        .when(url_eff.startswith(GOVUK_PREFIX), gov_types)
        .otherwise(F.array().cast("array<string>"))
    )

    cands = docs.select(F.col(id_col), possible.alias("_possible"))
    hits = (
        cands.join(
            F.broadcast(mapping),
            F.array_contains(F.col("_possible"), F.col(doc_type_col)),
        )
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(F.col(order_col).alias("i"), F.col(orp_col).alias("o"))
            ).alias("b")
        )
        .select(id_col, F.col("b.o").alias("web_document_type"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("web_document_type", F.lit("NA")).alias("web_document_type"),
    )


def dti_resolve(
    web: DataFrame,
    text_ranked: DataFrame,
    id_col: str,
    web_col: str = "web_document_type",
    text_label_col: str = "document_type",
) -> DataFrame:
    """N14 composition — ``dti()`` (rule_based_dti.py:61-66): web rules
    first, text rules only when the web half said 'NA'."""
    t = text_ranked.select(F.col(id_col), F.col(text_label_col).alias("_tl"))
    return web.join(t, id_col, "left").select(
        id_col,
        F.col(web_col),
        F.coalesce(
            F.when(F.col(web_col) != "NA", F.col(web_col)),
            F.col("_tl"),
            F.lit("NA"),
        ).alias("document_type"),
    )


# ---------------------------------------------------------------------------
# N15/N16/N17 — topic paths, regulator id, deepest topic
# ---------------------------------------------------------------------------


def topic_path_prefixes(path_col: Column | str, sep: str = "/") -> Column:
    """N15 — expand a topic path into all its prefixes
    (glue_bulk_enrichment.ipynb cell 4 get_topic_path):
    'a/b/c' → ['a', 'a/b', 'a/b/c']."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    parts = F.split(c, sep)
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(sep, F.slice(parts, 1, i)),
    )


def regulator_id(uri_col: Column | str, special_marker: str, special_id: str) -> Column:
    """N16 — regulator-id derivation (notebook cell 4 get_reg_id):
    special-cased domains, else derived from the URI path segment."""
    c = F.col(uri_col) if isinstance(uri_col, str) else uri_col
    return F.when(c.contains(special_marker), F.lit(special_id)).otherwise(
        F.split(c, "/").getItem(0)
    )


def deepest_topic(topics_col: Column | str, sep: str = "/") -> Column:
    """Q17 — deepest path in a topic array (search_functions.py:79-81):
    max by path depth, value as tiebreak."""
    c = F.col(topics_col) if isinstance(topics_col, str) else topics_col
    return F.array_max(
        F.transform(
            c,
            lambda x: F.struct(F.size(F.split(x, sep)).alias("d"), x.alias("v")),
        )
    )["v"]
