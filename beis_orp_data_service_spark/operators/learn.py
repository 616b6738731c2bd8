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

import math

from pyspark.sql import DataFrame
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
) -> str:
    """DuckDB twin: the whole GD trajectory unrolled as CTEs.

    ``feats_cte`` must be a CTE body defining ``feats`` with columns
    matching ``feature_exprs``/``label_expr`` (plain column names).
    Reproduces iteration for iteration what :func:`logreg_fit` +
    :func:`logreg_report` compute, including the nano quantization of
    per-row terms and the float weight-update arithmetic.
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
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN (0.0 + {z}) >= 0 AND ({label_expr}) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN (0.0 + {z}) >= 0 AND ({label_expr}) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN (0.0 + {z}) < 0 AND ({label_expr}) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN (0.0 + {z}) < 0 AND ({label_expr}) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           {w_out}
    FROM feats CROSS JOIN {last}
    GROUP BY {", ".join(w_terms)}
    """
