"""Distributed n-gram language-model scoring — the CCNet-style
perplexity quality filter (Wenzek et al. 2020 train a KenLM and keep
low-perplexity documents; Brown et al. 2020 / GPT-3 use the same shape
with a linear classifier). Engine extension: the reference has no
model-based quality scoring; an LLM training-data pipeline filters on
it constantly.

This is a REAL trained model, not a stub: add-one-smoothed bigram
maximum likelihood estimated from a training slice of the corpus
itself, entirely as DataFrame aggregations — no driver-side state, no
Python loops. A KenLM binary would interpolate higher orders with
Kneser-Ney; the bigram+add-one variant keeps every quantity a ratio of
integer counts, which is what makes a HASH-grade oracle possible
(per-bigram log-probabilities quantize to micro integers BEFORE the
per-document sum, so the sum is order-free integer addition — the same
determinism move as dsir_weights, and the same documented cross-engine
ln() 1-ulp assumption, corpus.py:dsir_weights).

Scale notes (100 TB):
- Training is two map-side-combined groupBys over the exploded bigram
  stream (bigram counts, then context counts as a second aggregate of
  the first — the second input is |bigram types|, not |tokens|).
- Scoring joins the document bigram stream to the count tables on
  (w1, w2) and (w1): plain hash-partitioned equi-joins — at web scale
  the bigram-type table is itself huge (billions of types), so a
  shuffle join IS the right plan; Spark/AQE will broadcast instead
  whenever a small corpus makes the counts tiny.
- The vocabulary size V is a single-row aggregate, broadcast via a
  1-row crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beis_orp_data_service_spark.functions.text import LC_TOKEN_SPLIT


def _lc_token_array(text_col: str):
    """Codegen twin of :func:`lc_tokens`: strip outer whitespace, then
    split on runs — no interior empties can survive a runs-split, so
    the result equals lc_tokens' filtered array for every non-empty
    text, and empty/blank text leaves one ``""`` element that callers
    drop (zero-length zip windows in :func:`_doc_bigrams`; an explicit
    ``w != ''`` filter in the vocab aggregate). lc_tokens' ``F.filter``
    lambda is a
    higher-order function Spark evaluates INTERPRETED per element
    (the repo's documented ~12× HOF footgun, r14 guide §4.1);
    this spelling stays inside WholeStageCodegen."""
    return F.split(
        F.regexp_replace(
            F.lower(F.col(text_col)),
            r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$",
            "",
        ),
        LC_TOKEN_SPLIT,
    )


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — consecutive lowercased whitespace tokens; docs
    with < 2 tokens contribute nothing (the zip window is empty).
    Map-only, all codegen: the previous ``transform(sequence(...))``
    struct builder was an interpreted HOF lambda — the dominant
    per-row cost of every lm_score consumer (equality-tested against
    this spelling in tests/test_lm.py)."""
    toks = _lc_token_array(text_col)
    win = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    z = F.arrays_zip(
        F.slice(toks, 1, win).alias("w1"), F.slice(toks, 2, win).alias("w2")
    )
    return df.select(F.col(id_col), F.explode(z).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def bigram_lm_counts(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: returns (bigram_counts(w1, w2, c2),
    context_counts(w1, c1), vocab(v) single row). c1 is derived from
    the bigram table (sum of c2 per w1), so context mass and bigram
    mass agree exactly and every P(w2|w1) = (c2+1)/(c1+V) is a proper
    distribution over the V-word vocabulary."""
    bg = _doc_bigrams(df, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        df.select(F.explode(_lc_token_array(text_col)).alias("w"))
        .where(F.col("w") != "")  # blank text leaves one "" element
        .agg(F.countDistinct("w").alias("v"))
    )
    return c2, c1, vocab


def lm_score(
    docs: DataFrame,
    train: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score every document of ``docs`` under the bigram LM trained on
    ``train``: per-bigram logp_micro = round(ln((c2+1)/(c1+V))·1e6)
    (unseen bigram -> c2=0; unseen context -> c1=0, i.e. P=1/V —
    add-one smoothing handles both without special cases), then
    order-free integer sums per document.

    Returns (id, n_bigrams, logp_sum_micro, avg_logp_micro) — filter
    on avg_logp_micro (low = far from the training distribution; the
    CCNet keep/discard knob).
    """
    c2, c1, vocab = bigram_lm_counts(train, id_col, text_col)
    bg = _doc_bigrams(docs, id_col, text_col)
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast(
                        "double"
                    )
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("_logp_micro"),
        )
    )
    # NOTE: avg uses floor(double division), NOT integer DIV — Spark's
    # DIV truncates toward zero while DuckDB's // floors, and these sums
    # are negative; floor-of-IEEE-quotient is identical in both engines
    # (sums stay far inside 2^53).
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_logp_micro").alias("logp_sum_micro"),
        F.floor(
            F.sum("_logp_micro").cast("double") / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("avg_logp_micro"),
    )


def lm_score_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    train_pred: str,
) -> str:
    """DuckDB twin: train on ``{table} WHERE train_pred``, score all
    rows. Same add-one arithmetic; ln() carries the documented 1-ulp
    cross-engine assumption (see dsir_weights)."""
    toks = (
        f"SELECT {id_col}, list_filter(string_split_regex(lower({text_col}),"
        f" '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '') AS _toks FROM {table}"
    )
    # DuckDB list indexing is 1-based: bigram i covers _toks[i-1], _toks[i].
    bigrams = (
        "SELECT {id}, _toks[i - 1] AS w1, _toks[i] AS w2 FROM ("
        "SELECT {id}, _toks, unnest(range(2, len(_toks) + 1)) AS i "
        "FROM toks {where})"
    )
    return f"""
    WITH toks AS ({toks}
    ), train_bg AS (
      {bigrams.format(id=id_col, where=f"WHERE {train_pred}")}
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM train_bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1
    ), vocab AS (
      SELECT count(DISTINCT w) AS v FROM (
        SELECT unnest(_toks) AS w FROM toks WHERE {train_pred})
    ), all_bg AS (
      {bigrams.format(id=id_col, where="")}
    ), scored AS (
      SELECT b.{id_col},
             CAST(round(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
                           / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE))
                        * 1000000) AS BIGINT) AS _logp_micro
      FROM all_bg b
      LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      LEFT JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN vocab v
    )
    SELECT {id_col}, count(*) AS n_bigrams,
           CAST(sum(_logp_micro) AS BIGINT) AS logp_sum_micro,
           CAST(floor(CAST(sum(_logp_micro) AS DOUBLE) / count(*)) AS BIGINT)
             AS avg_logp_micro
    FROM scored GROUP BY {id_col}
    """


def ccnet_buckets(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    method: str = "two_pass",
    n_parts: int = 32,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2019, arXiv:1911.00359 §4.3): score every document under a
    reference LM (:func:`lm_score`), then split EACH LANGUAGE into
    equal-depth terciles by score — ``head`` (closest to the reference
    distribution), ``middle``, ``tail``; CCNet trains on head+middle
    and drops or reviews the tail. The standard corpus-quality
    partitioner run before sampling a training mix.

    Deterministic total order (avg_logp DESC, id) so the bucket
    ASSIGNMENT is hash-grade, not just the bucket sizes. Docs with no
    bigram (fewer than 2 tokens) have no perplexity and are excluded,
    matching :func:`lm_score`.

    Scale note — ``method`` (the rfm_scores pattern):

    - ``"ntile"``: ``ntile(3) OVER (PARTITION BY lang ...)`` — one
      language's ENTIRE corpus slice is one window task. Exact and a
      hair cheaper while every language fits an executor; at 100 TB
      English is ~half the data, so the dominant language becomes a
      single-reducer bottleneck. Opt in for bounded-group inputs.
    - ``"two_pass"`` (default): routes through
      :func:`~beis_orp_data_service_spark.operators.ranks.grouped_ntile`
      (range-partition on (lang, score, id) → per-(lang, partition)
      offsets → per-cell ``row_number`` → the same NTILE fill rule) —
      IDENTICAL output (equality-tested in tests/test_ranks.py,
      dominant-language fixture included), max task state ~N/
      ``n_parts`` rows no matter how skewed the language mix is.

    Returns (id, lang, avg_logp_micro, bucket, bucket_label) with
    bucket 1..3 and label head/middle/tail.
    """
    if method not in ("ntile", "two_pass"):
        raise ValueError(f"ccnet_buckets: unknown method {method!r}")
    scored = lm_score(docs, train, id_col, text_col)
    labeled = scored.join(docs.select(id_col, lang_col), id_col)
    if method == "two_pass":
        from beis_orp_data_service_spark.operators.ranks import grouped_ntile

        bucketed = grouped_ntile(
            labeled.select(id_col, lang_col, "avg_logp_micro"),
            [lang_col],
            [F.col("avg_logp_micro").desc(), F.col(id_col)],
            3,
            "bucket",
            n_parts=n_parts,
            label="ccnet",
        )
        bucket = F.col("bucket")
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(lang_col).orderBy(
            F.col("avg_logp_micro").desc(), F.col(id_col)
        )
        bucket = F.ntile(3).over(w).cast("bigint")
        bucketed = labeled
    return bucketed.select(
        id_col,
        lang_col,
        "avg_logp_micro",
        bucket.alias("bucket"),
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            bucket.cast("int"),
        ).alias("bucket_label"),
    )


def ccnet_buckets_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    train_pred: str = "doc_id % 2 = 0",
) -> str:
    """DuckDB twin of :func:`ccnet_buckets` — wraps
    :func:`lm_score_oracle_sql` and applies the same per-language
    tercile with the same total order."""
    lm_sql = lm_score_oracle_sql(table, id_col, text_col, train_pred)
    return f"""
    WITH lm_out AS ({lm_sql}),
    j AS (
      SELECT l.{id_col}, d.{lang_col}, l.avg_logp_micro
      FROM lm_out l JOIN {table} d USING ({id_col})
    ), b AS (
      SELECT {id_col}, {lang_col}, avg_logp_micro,
             CAST(ntile(3) OVER (PARTITION BY {lang_col}
                                 ORDER BY avg_logp_micro DESC, {id_col})
                  AS BIGINT) AS bucket
      FROM j
    )
    SELECT {id_col}, {lang_col}, avg_logp_micro, bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket_label
    FROM b
    """
