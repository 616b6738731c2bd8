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

from beis_orp_data_service_spark.functions.text import tokens, sentence_chunks


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


def title_window_max(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_len: int = 5,
    max_candidates: int = 1000,
) -> DataFrame:
    """N3 — metadata-title-in-text scoring
    (title_generation/search_metadata_title/get_title.py:10-87): slide a
    title-length window over the token stream, score each window against
    the title, keep the max (earliest window wins ties — the reference
    iterates in order and keeps the first max).

    The title here is the document's leading ``window_len`` tokens (the
    reference compares against the uploaded metadata title; the engine
    takes the title as just another column). Candidate windows are
    capped at ``max_candidates`` (get_title.py:41-46).

    Everything is array-valued per row — no explode, no shuffle: the
    whole operator is a projection, embarrassingly parallel at 100 TB.
    """
    t = tokens(text_col)
    title = F.slice(t, 1, window_len)
    n_windows = F.least(
        F.size(t) - F.lit(window_len - 1), F.lit(max_candidates)
    )
    scores = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.size(
            F.filter(
                F.slice(t, i, window_len), lambda x: F.array_contains(title, x)
            )
        ),
    )
    best_score = F.array_max(scores)
    best_idx = F.array_position(scores, best_score)
    return df.filter(F.size(t) >= window_len * 2).select(
        F.col(id_col),
        best_score.alias("best_score"),
        best_idx.cast("bigint").alias("best_window_idx"),
    )


def title_window_max_np(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_len: int = 5,
    max_candidates: int = 1000,
) -> DataFrame:
    """N3 hot path — same semantics as ``title_window_max`` but the
    window scoring is a numpy sliding-sum inside an Arrow-batched
    pandas UDF: membership via np.isin, window scores via cumsum
    difference, first-argmax tiebreak via np.argmax. Identical integer
    results (tests assert equality with the expression form)."""
    from pyspark.sql import types as T

    out_type = T.StructType(
        [
            T.StructField("best_score", T.IntegerType()),
            T.StructField("best_window_idx", T.LongType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _score(texts: pd.Series) -> pd.DataFrame:
        scores, idxs = [], []
        for t in texts:
            toks = np.array((t or "").strip().split())
            title = toks[:window_len]
            member = np.isin(toks, title).astype(np.int64)
            c = np.concatenate([[0], np.cumsum(member)])
            win = c[window_len:] - c[:-window_len]  # sliding sums
            n = min(len(win), max_candidates)
            win = win[:n]
            best = int(win.max())
            scores.append(best)
            idxs.append(int(win.argmax()) + 1)  # first max, 1-based
        return pd.DataFrame({"best_score": scores, "best_window_idx": idxs})

    t = tokens(text_col)
    return (
        df.filter(F.size(t) >= window_len * 2)
        .select(F.col(id_col), _score(F.col(text_col)).alias("r"))
        .select(id_col, F.col("r.best_score").alias("best_score"),
                F.col("r.best_window_idx").alias("best_window_idx"))
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
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("keyword"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "keyword", "score", "rank")
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
) -> DataFrame:
    """N12 — legislation phrase match with first-sentence early stop
    (legislative_origin_extraction.py:86-127): segment into sentences,
    match candidate phrases per sentence, keep only matches from the
    FIRST sentence that has any.

    The reference short-circuits a Python loop; set-wise the same result
    is "rank sentences, keep matches at min(rank)" — fully parallel, no
    early-exit control flow needed (SURVEY §4). Needles are broadcast.
    """
    sent = docs.select(
        F.col(id_col),
        F.posexplode(sentence_chunks(text_col, sentence_width)).alias(
            "sent_idx", "sentence"
        ),
    )
    padded = F.concat(F.lit(" "), F.col("sentence"), F.lit(" "))
    matches = sent.join(
        F.broadcast(needles),
        padded.contains(F.concat(F.lit(" "), F.col(needle_col), F.lit(" "))),
    )
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
