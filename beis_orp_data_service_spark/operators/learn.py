"""Distributed supervised training: logistic regression by full-batch
gradient descent, hash-grade reproducible.

A training-data pipeline trains small quality/language classifiers over
the corpus itself (the fastText-quality-filter pattern: score every
document, keep the confident slice). The reference has no training
loop; this is the extension-suite capability that closes that class —
BPE merge learning (corpus.bpe_learn_merges) is unsupervised vocabulary
training, this is supervised model training with the same engine
discipline:

- **One aggregate per iteration.** The gradient of full-batch logistic
  loss is a SUM over rows of ``(sigmoid(w·x) − y) · x_j`` — a map-side-
  combined groupBy().agg() per pass; the k gradient values (k =
  feature count, tiny) are the ONLY driver pull per iteration.
- **Exact integer sums.** Each row's gradient contribution is quantized
  to nano units (``round(g · 1e9)`` BIGINT) BEFORE the sum, so the
  aggregate is order-insensitive and the whole trajectory —
  w₀ → w₁ → … — is bit-reproducible on any partitioning, and
  re-computable by the DuckDB oracle as an unrolled CTE chain (the
  per-row ``exp`` carries the same 1-ulp cross-engine assumption as
  dsir_weights' ln, which has held at every sf).
- **Lineage stays flat.** The loop is a driver-side ``for`` over a
  cached feature table; each iteration's plan is scan → project →
  one aggregate, independent of iteration count.

At 100 TB: the feature table is scanned ``iters`` times (cache it or
persist a projected copy); everything else is O(k) on the driver. For
millions of features this becomes L-BFGS-on-executors territory — this
operator targets the dozens-of-features quality-score regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # nano quantization of per-row gradient terms


def logreg_fit(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch GD on logistic loss; returns the final weights.

    ``feats`` must already hold numeric feature columns (include an
    explicit constant column for the bias) and a 0/1 ``label_col``.
    Weights start at 0; each iteration computes the exact nano-
    quantized gradient sum G_j and steps ``w_j -= lr * (G_j/1e9)/n``.
    The caller should persist/cache ``feats`` — it is scanned once per
    iteration.
    """
    k = len(feature_cols)
    n = feats.count()
    if n == 0:
        raise ValueError("logreg_fit: empty input")
    w = [0.0] * k
    for _ in range(iters):
        z = F.lit(0.0)
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col(label_col)
        row = feats.agg(
            *[
                F.sum(F.round(err * F.col(c) * SCALE).cast("bigint")).alias(
                    f"g{j}"
                )
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        w = [
            w[j] - lr * (row[f"g{j}"] / SCALE) / n for j in range(k)
        ]
    return w


def logreg_report(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
) -> DataFrame:
    """One-row training report for fitted weights: quantized weights,
    row count, and the in-sample confusion counts at the 0.5 threshold
    (= sign of the margin) — everything integer, hash-comparable."""
    z = F.lit(0.0)
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j]) * F.col(c)
    pred = (z >= 0).cast("int")
    y = F.col(label_col).cast("int")
    agg = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(pred * y).cast("bigint").alias("tp"),
        F.sum(pred * (1 - y)).cast("bigint").alias("fp"),
        F.sum((1 - pred) * y).cast("bigint").alias("fn"),
        F.sum((1 - pred) * (1 - y)).cast("bigint").alias("tn"),
    )
    for j in range(len(feature_cols)):
        agg = agg.withColumn(
            f"w{j}_nano",
            F.lit(int(round(weights[j] * SCALE))).cast("bigint"),
        )
    return agg


def logreg_oracle_sql(
    feats_cte: str,
    feature_exprs: list[str],
    label_expr: str,
    iters: int = 3,
    lr: float = 1.0,
    report_from: str = "feats",
    lead_select: str = "",
) -> str:
    """DuckDB twin: the whole GD trajectory unrolled as CTEs.

    ``feats_cte`` must be a CTE body defining ``feats`` (the TRAIN
    rows) with columns matching ``feature_exprs``/``label_expr`` (plain
    column names); it may define additional CTEs before it.
    ``report_from`` names the relation the final confusion report runs
    over (defaults to the training rows; cross-validation points it at
    the held-out fold). ``lead_select`` is spliced verbatim before the
    report columns (e.g. a fold-id literal). Reproduces iteration for
    iteration what :func:`logreg_fit` + :func:`logreg_report` compute,
    including the nano quantization of per-row terms and the float
    weight-update arithmetic.
    """
    k = len(feature_exprs)
    ctes = [feats_cte]
    w_terms = ["0.0"] * k  # SQL expressions for current weights
    for it in range(iters):
        z = " + ".join(f"({w_terms[j]}) * {feature_exprs[j]}" for j in range(k))
        grads = ", ".join(
            f"SUM(CAST(round((1.0/(1.0+exp(-(0.0 + {z}))) - ({label_expr}))"
            f" * {feature_exprs[j]} * {SCALE}) AS BIGINT)) AS g{j}"
            for j in range(k)
        )
        prev_cross = f" CROSS JOIN w{it - 1}" if it > 0 else ""
        ctes.append(
            f"it{it} AS (SELECT {grads}, COUNT(*) AS n FROM feats{prev_cross})"
        )
        new_w = ", ".join(
            f"({w_terms[j]}) - {float(lr)} * (g{j} / {float(SCALE)})"
            f" / it{it}.n AS w{j}"
            for j in range(k)
        )
        ctes.append(f"w{it} AS (SELECT {new_w} FROM it{it}{prev_cross})")
        w_terms = [f"w{it}.w{j}" for j in range(k)]
    z = " + ".join(f"({w_terms[j]}) * {feature_exprs[j]}" for j in range(k))
    w_out = ", ".join(
        f"CAST(round(({w_terms[j]}) * {SCALE}) AS BIGINT) AS w{j}_nano"
        for j in range(k)
    )
    last = f"w{iters - 1}"
    return f"""
    WITH {", ".join(ctes)}
    SELECT {lead_select}
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN (0.0 + {z}) >= 0 AND ({label_expr}) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN (0.0 + {z}) >= 0 AND ({label_expr}) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN (0.0 + {z}) < 0 AND ({label_expr}) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN (0.0 + {z}) < 0 AND ({label_expr}) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           {w_out}
    FROM {report_from} CROSS JOIN {last}
    GROUP BY {", ".join(w_terms)}
    """


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the second classic corpus classifier shape
# (fastText-style quality/language filters are logreg over dense
# features; NB is the sparse token-count sibling). Training is TWO
# grouped aggregations (per-class token counts, class totals), scoring
# is one join + one grouped aggregation — no iteration, no driver loop.
# ---------------------------------------------------------------------------


def nb_train_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    holdout_mod: int = 5,
) -> DataFrame:
    """Train multinomial NB (add-one smoothing) on docs where
    ``id % holdout_mod != 0``, score the held-out rest; returns one row
    per held-out doc: (id, true label, predicted label, score_nano of
    the winning class).

    Hash-grade discipline: every per-occurrence log term
    ``ln((count(t,c)+1) / (N_c + V))`` is nano-quantized to BIGINT
    BEFORE the per-document sum, so aggregation order can't move the
    score; the argmax is ``max(struct(score, label))`` — ties break to
    the lexicographically larger label, deterministically. Tokens
    unseen in training (OOV) are dropped for ALL classes symmetrically
    (the inner join against the vocab×class matrix), the standard
    multinomial-NB treatment.

    Scale: the vocab×class log-prob matrix is |V|·|C| rows — bounded by
    vocabulary, not corpus; the scoring join shuffles on token and the
    final aggregate on (doc, class). Same whitespace tokenization as
    heavy_hitters (trim → lower → split \\s+ → drop empties).
    """
    # explode-then-filter, not F.filter(lambda): higher-order functions
    # run interpreted (measured footgun in this repo) while the post-
    # explode predicate stays in whole-stage codegen
    tok = F.explode(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")
    ).alias("token")
    is_test = F.col(id_col) % holdout_mod == 0
    train = docs.where(~is_test)
    test = docs.where(is_test)

    tr_tok = train.select(F.col(label_col).alias("_y"), tok).where(
        F.col("token") != ""
    )
    ctc = tr_tok.groupBy("_y", "token").agg(
        F.count(F.lit(1)).alias("_ctc")
    )
    class_tot = ctc.groupBy("_y").agg(F.sum("_ctc").alias("_nc"))
    vocab = ctc.select("token").distinct()
    v = vocab.count()  # scalar: vocab size for the smoothing denominator
    d_tot = train.count()
    priors = train.groupBy(F.col(label_col).alias("_y")).agg(
        F.round(
            F.log(F.count(F.lit(1)) / F.lit(float(d_tot))) * SCALE
        )
        .cast("bigint")
        .alias("_prior_q")
    )
    # full |V|x|C| matrix: a token seen only in class A must still
    # contribute its smoothing term ln(1/(N_B + V)) to class B
    matrix = (
        vocab.crossJoin(class_tot)
        .join(ctc, ["token", "_y"], "left")
        .select(
            "token",
            "_y",
            F.round(
                F.log(
                    (F.coalesce(F.col("_ctc"), F.lit(0)) + F.lit(1))
                    / (F.col("_nc") + F.lit(v)).cast("double")
                )
                * SCALE
            )
            .cast("bigint")
            .alias("_logp_q"),
        )
    )
    te_tok = test.select(
        F.col(id_col), F.col(label_col).alias("_true"), tok
    ).where(F.col("token") != "")
    scored = (
        te_tok.join(matrix, "token")  # OOV tokens drop for all classes
        .groupBy(id_col, "_true", "_y")
        .agg(F.sum("_logp_q").alias("_s"))
        .join(priors, "_y")
        .select(
            id_col,
            "_true",
            "_y",
            (F.col("_s") + F.col("_prior_q")).alias("_score_q"),
        )
    )
    return (
        scored.groupBy(id_col, "_true")
        .agg(F.max(F.struct("_score_q", "_y")).alias("_m"))
        .select(
            F.col(id_col),
            F.col("_true").alias("true_label"),
            F.col("_m._y").alias("pred_label"),
            F.col("_m._score_q").alias("score_q"),
        )
    )


def nb_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    holdout_mod: int = 5,
) -> str:
    """DuckDB twin of :func:`nb_train_score`, CTE for CTE — same
    tokenization, same add-one smoothing, same nano quantization of
    each log term before the sum, same (score, label) argmax."""
    tok_list = (
        f"list_filter(string_split_regex(trim(lower({text_col})),"
        " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )
    return f"""
    WITH tr AS (
      SELECT * FROM {table} WHERE {id_col} % {holdout_mod} <> 0
    ), te AS (
      SELECT * FROM {table} WHERE {id_col} % {holdout_mod} = 0
    ), tr_tok AS (
      SELECT {label_col} AS y, unnest({tok_list}) AS token FROM tr
    ), ctc AS (
      SELECT y, token, COUNT(*) AS c FROM tr_tok GROUP BY y, token
    ), class_tot AS (
      SELECT y, SUM(c) AS nc FROM ctc GROUP BY y
    ), vocab AS (
      SELECT DISTINCT token FROM ctc
    ), v AS (
      SELECT COUNT(*) AS v FROM vocab
    ), d AS (
      SELECT COUNT(*) AS d FROM tr
    ), priors AS (
      SELECT {label_col} AS y,
             CAST(round(ln(COUNT(*) / (SELECT CAST(d AS DOUBLE) FROM d))
                        * {SCALE}) AS BIGINT) AS prior_q
      FROM tr GROUP BY {label_col}
    ), matrix AS (
      SELECT vocab.token, class_tot.y,
             CAST(round(ln((COALESCE(ctc.c, 0) + 1)
                           / CAST(class_tot.nc + (SELECT v FROM v)
                                  AS DOUBLE)) * {SCALE}) AS BIGINT)
               AS logp_q
      FROM vocab CROSS JOIN class_tot
      LEFT JOIN ctc ON ctc.token = vocab.token AND ctc.y = class_tot.y
    ), te_tok AS (
      SELECT {id_col}, {label_col} AS true_y, unnest({tok_list}) AS token
      FROM te
    ), scored AS (
      SELECT t.{id_col}, t.true_y, m.y,
             CAST(SUM(m.logp_q) AS BIGINT) + ANY_VALUE(p.prior_q)
               AS score_q
      FROM te_tok t
      JOIN matrix m ON m.token = t.token
      JOIN priors p ON p.y = m.y
      GROUP BY t.{id_col}, t.true_y, m.y
    )
    SELECT {id_col},
           true_y AS true_label,
           y AS pred_label,
           score_q
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY {id_col} ORDER BY score_q DESC, y DESC
    ) = 1
    """


CHI2_SCALE = 1_000_000  # micro quantization of chi² statistics


def chi2_tokens(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    k: int = 50,
) -> DataFrame:
    """χ² feature selection: the top-``k`` tokens most associated with
    a binary document label (presence-based contingency, the classic
    text-classification feature ranking). Returns
    ``(token, n_pos_docs, n_neg_docs, chi2_q)`` ordered by χ²
    descending, token ascending — a deterministic total order.

    Contingency per token over DISTINCT (doc, token) presence:
    a = positive docs containing it, b = negative docs containing it,
    c/d the complements; χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    (ad−bc) is computed exactly in BIGINT, then squared and combined in
    DOUBLE (overflow-safe at any corpus size) — the same IEEE sequence
    on both engines — and micro-quantized. Tokens in fewer than
    ``min_df`` or more than N−``min_df`` docs are excluded (degenerate
    margins divide by zero and select nothing useful anyway).

    Plan: explode → distinct presence (one shuffle) → per-token counts
    (second shuffle, vocabulary-sized) → TakeOrderedAndProject. The two
    class totals are the only driver pull (one 1-row aggregate).
    """
    pres = (
        docs.select(
            F.col(id_col),
            label.cast("int").alias("_y"),
            F.explode(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    tot = docs.agg(
        F.sum(label.cast("int")).alias("p"),
        F.sum(F.lit(1) - label.cast("int")).alias("q"),
    ).collect()[0]
    p, q = int(tot["p"]), int(tot["q"])
    n = p + q
    a = F.col("n_pos_docs")
    b = F.col("n_neg_docs")
    c = F.lit(p) - a
    d = F.lit(q) - b
    det = (a * d - b * c).cast("bigint")  # exact
    chi2 = (
        F.lit(float(n))
        * det.cast("double")
        * det.cast("double")
        / (
            (a + b).cast("double")
            * (c + d).cast("double")
            * (a + c).cast("double")
            * (b + d).cast("double")
        )
    )
    return (
        pres.groupBy("token")
        .agg(
            F.sum("_y").cast("bigint").alias("n_pos_docs"),
            F.sum(F.lit(1) - F.col("_y")).cast("bigint").alias("n_neg_docs"),
        )
        .where(
            ((a + b) >= min_df) & ((a + b) <= n - min_df)
        )
        .select(
            "token",
            "n_pos_docs",
            "n_neg_docs",
            F.round(chi2 * CHI2_SCALE).cast("bigint").alias("chi2_q"),
        )
        .orderBy(F.col("chi2_q").desc(), F.col("token").asc())
        .limit(k)
    )


def chi2_tokens_oracle_sql(
    table: str,
    label_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    k: int = 50,
) -> str:
    """DuckDB twin of :func:`chi2_tokens` — same presence distinct,
    same BIGINT determinant, same DOUBLE combination order, same
    (χ² desc, token asc) total order."""
    tok_list = (
        f"list_filter(string_split_regex(trim(lower({text_col})),"
        " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    )
    return f"""
    WITH pres AS (
      SELECT DISTINCT {id_col},
             CAST({label_sql} AS INT) AS y,
             unnest({tok_list}) AS token
      FROM {table}
    ), tot AS (
      SELECT CAST(SUM(CAST({label_sql} AS INT)) AS BIGINT) AS p,
             CAST(SUM(1 - CAST({label_sql} AS INT)) AS BIGINT) AS q
      FROM {table}
    ), cnt AS (
      SELECT token,
             CAST(SUM(y) AS BIGINT) AS n_pos_docs,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg_docs
      FROM pres GROUP BY token
    )
    SELECT token, n_pos_docs, n_neg_docs,
           CAST(round(
             (CAST(p + q AS DOUBLE)
              * CAST(n_pos_docs * (q - n_neg_docs)
                     - n_neg_docs * (p - n_pos_docs) AS DOUBLE)
              * CAST(n_pos_docs * (q - n_neg_docs)
                     - n_neg_docs * (p - n_pos_docs) AS DOUBLE)
              / (CAST(n_pos_docs + n_neg_docs AS DOUBLE)
                 * CAST((p - n_pos_docs) + (q - n_neg_docs) AS DOUBLE)
                 * CAST(n_pos_docs + (p - n_pos_docs) AS DOUBLE)
                 * CAST(n_neg_docs + (q - n_neg_docs) AS DOUBLE)))
             * {CHI2_SCALE}) AS BIGINT) AS chi2_q
    FROM cnt CROSS JOIN tot
    WHERE n_pos_docs + n_neg_docs >= {min_df}
      AND n_pos_docs + n_neg_docs <= (p + q) - {min_df}
    ORDER BY chi2_q DESC, token ASC
    LIMIT {k}
    """


def logreg_cv(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    fold_col: str = "fold",
    folds: int = 5,
    iters: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """k-fold cross-validation for :func:`logreg_fit` — the model-
    selection loop: for each fold i, fit on the other k−1 folds and
    report the HELD-OUT confusion (out-of-sample, unlike
    ``logreg_train``'s in-sample report). Returns one row per fold:
    (fold, n, tp, fp, fn, tn, w*_nano).

    ``feats`` must carry a deterministic integer ``fold_col`` (hash-
    assigned, e.g. ``corpus.md5_int60(id) % folds`` — NEVER a random
    split, which is neither replayable nor oracle-checkable).

    Execution (r14, guide §1.2): all folds advance TOGETHER — one
    grouped count supplies every fold's training size, and each GD
    iteration is ONE aggregate computing every fold's gradient sums as
    conditional (``fold != i``) nano-quantized bigint sums — exact
    integer sums over exactly the rows the per-fold spelling scans, so
    every fold's weight trajectory is bit-identical (the hash-grade
    oracle unrolls the per-fold trajectories) while ``folds × iters``
    serial driver jobs collapse to ``iters + 1``.
    """
    k = len(feature_cols)
    counts = {
        int(r[fold_col]): r["_c"]
        for r in feats.groupBy(fold_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
        # NULL fold rows fail every `fold != i` / `fold == i` predicate
        # in the per-fold spelling — keep them out of every count here
        if r[fold_col] is not None
    }
    n_total = sum(counts.values())
    n_train = {i: n_total - counts.get(i, 0) for i in range(folds)}
    for i in range(folds):
        if n_train[i] == 0:
            raise ValueError("logreg_fit: empty input")
    W = {i: [0.0] * k for i in range(folds)}
    for _ in range(iters):
        aggs = []
        for i in range(folds):
            z = F.lit(0.0)
            for j, c in enumerate(feature_cols):
                z = z + F.lit(W[i][j]) * F.col(c)
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(label_col)
            for j, c in enumerate(feature_cols):
                aggs.append(
                    F.sum(
                        F.when(
                            F.col(fold_col) != i,
                            F.round(err * F.col(c) * SCALE).cast("bigint"),
                        )
                    ).alias(f"_g_{i}_{j}")
                )
        row = feats.agg(*aggs).collect()[0]
        for i in range(folds):
            W[i] = [
                W[i][j] - lr * (row[f"_g_{i}_{j}"] / SCALE) / n_train[i]
                for j in range(k)
            ]
    out = None
    for i in range(folds):
        rep = logreg_report(
            feats.where(F.col(fold_col) == i), feature_cols, label_col, W[i]
        ).select(F.lit(i).cast("bigint").alias("fold"), "*")
        out = rep if out is None else out.unionByName(rep)
    return out


def logreg_cv_oracle_sql(
    all_cte: str,
    feature_exprs: list[str],
    label_expr: str,
    fold_col: str = "fold",
    folds: int = 5,
    iters: int = 3,
    lr: float = 1.0,
) -> str:
    """DuckDB twin of :func:`logreg_cv`: one full unrolled GD chain per
    fold (train = the other folds, report = the held-out fold), UNION
    ALL'd. ``all_cte`` must be a CTE body defining ``all_f`` with the
    feature/label/fold columns."""
    parts = []
    for i in range(folds):
        feats_cte = (
            f"{all_cte}, feats AS (SELECT * FROM all_f WHERE {fold_col} <> {i}),"
            f" rep AS (SELECT * FROM all_f WHERE {fold_col} = {i})"
        )
        parts.append(
            "(" + logreg_oracle_sql(
                feats_cte,
                feature_exprs,
                label_expr,
                iters=iters,
                lr=lr,
                report_from="rep",
                lead_select=f"CAST({i} AS BIGINT) AS fold,",
            ) + ")"
        )
    return " UNION ALL ".join(parts)
