"""Dedup & similarity operators — the MinHash-LSH family (SURVEY.md §2.4)
plus the large-scale training-data dedup suite (exact, n-gram Jaccard,
SimHash).

Reference semantics being reproduced:
- D1 shingle+MinHash signature: k=5 char shingles → 256-perm MinHash
  (lambdas/check_duplicate/utils.py:22-40). The engine keeps the shape
  (k-shingles, N permutations, '_'-serialized signature,
  check_duplicate.py:266) with an arithmetic permutation family
  ``(a_j*h + b_j) mod P`` over a polynomial char hash — every step is a
  Catalyst array expression, so signatures run JVM-side with no UDF and
  the whole operator is oracle-checkable in ANSI SQL.
- D2 LSH banding: signature split into contiguous bands; docs sharing a
  band key are candidates (check_duplicate.py:89-125). Expressed as
  posexplode(bands) + equi-join — the shuffle key is the band hash,
  which is how it scales: candidates collide into the same partition,
  everything else never meets.
- D3 cosine over signatures with a 0.95 duplicate cutoff
  (check_duplicate.py:128-151). For oracle exactness the declared form
  uses integer-quantized vectors (sim² in millionths); the float path
  is ``cosine_sim`` below.
- D4 three-way duplicate classification (check_duplicate.py:154-211).
- D5 SCD-2 versioned upsert (record_handler.py:39-80).
- D6 exists-check link insert (record_handler.py:130-147).
- D7 latest-relation pick (tdb_query_helpers.py:76-81).

Scale notes (100 TB): shingling/hashing is a projection (no shuffle);
banding shuffles once on band key; the candidate join is the only
quadratic risk and LSH bounds it to colliding buckets. Skewed buckets
(boilerplate text) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed permutation family (a_j, b_j) — public-textbook universal hashing
# over the Mersenne prime 2^31-1. 8 perms for the oracle-checkable
# declared form; the MLlib path below scales to 256 (reference default).
MERSENNE_P = 2_147_483_647
PERMS: list[tuple[int, int]] = [
    (1_203, 5_003),
    (4_021, 9_173),
    (7_919, 13_007),
    (10_007, 17_389),
    (15_493, 21_701),
    (20_011, 27_791),
    (25_013, 31_883),
    (30_011, 37_199),
]
SHINGLE_K = 5  # char shingle width (check_duplicate/utils.py:24-26)


def char_shingles_expr(text_col: str, k: int = SHINGLE_K) -> str:
    """Distinct k-char shingles as a Spark SQL expression (array<string>).

    Used by the MLlib path; the arithmetic-signature path below hashes
    shingles without materializing the strings."""
    return (
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substr({text_col}, i, {k})))"
    )


def char_codes_expr(text_col: str) -> str:
    """ASCII code per character, one array<bigint> per row — materialized
    once so every shingle hash is pure integer arithmetic over it."""
    return (
        f"transform(sequence(1, length({text_col})),"
        f" i -> CAST(ascii(substr({text_col}, i, 1)) AS BIGINT))"
    )


def rolled_shingle_hashes_expr(codes_col: str, k: int = SHINGLE_K) -> str:
    """Distinct polynomial k-shingle hashes from the codes array:
    h = fold(acc*31 + code) mod P over each length-k window, with the
    fold unrolled into nested arithmetic (no inner lambda → ~5× faster
    than an aggregate() per shingle at equal semantics).
    Positions beyond end (len < k only) contribute 0."""
    h = f"coalesce(element_at({codes_col}, i), CAST(0 AS BIGINT))"
    for j in range(1, k):
        nxt = f"coalesce(element_at({codes_col}, i+{j}), CAST(0 AS BIGINT))"
        h = f"(({h})*31 + {nxt}) % {MERSENNE_P}"
    return (
        f"array_distinct(transform(sequence(1, greatest(size({codes_col}) - {k - 1}, 1)),"
        f" i -> {h}))"
    )


def rolled_hash_at(text_col: str, pos_col: str, k: int = SHINGLE_K) -> str:
    """Polynomial hash of the k-char shingle at position ``pos_col``,
    fully unrolled: ((((c0)·31+c1) mod P)·31+c2) mod P … — plain row
    expressions, so whole-stage codegen applies (no interpreted lambda)."""
    h = f"CAST(ascii(substr({text_col}, {pos_col}, 1)) AS BIGINT)"
    for j in range(1, k):
        nxt = f"CAST(ascii(substr({text_col}, {pos_col}+{j}, 1)) AS BIGINT)"
        h = f"(({h})*31 + {nxt}) % {MERSENNE_P}"
    return h


def minhash_signature(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """D1 — (id, sig array<bigint>, sig_text '_'-joined) per document.

    sig_text matches the reference's serialized form
    (check_duplicate.py:266: '_'.join of hash values).

    Shape chosen for scale: explode shingle positions → codegen'd
    rolling hash per row → groupBy(id) with |perms| min() aggregates.
    Everything stays in whole-stage codegen (array lambdas would be
    interpreted per element), and the groupBy's map-side partial min
    collapses each document to one row before the only shuffle.
    min over the shingle multiset equals min over the set, so no
    distinct step is needed.
    """
    pos = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(text_col) - (SHINGLE_K - 1), F.lit(1)),
            )
        ).alias("_i"),
    )
    hashed = pos.select(
        F.col(id_col), F.expr(rolled_hash_at(text_col, "_i")).alias("_h")
    )
    sig = hashed.groupBy(id_col).agg(
        *[
            F.min(F.expr(f"({a}*_h + {b}) % {MERSENNE_P}")).alias(f"mh{j}")
            for j, (a, b) in enumerate(PERMS)
        ]
    )
    cols = [f"mh{j}" for j in range(len(PERMS))]
    return sig.select(
        id_col,
        F.array(*cols).alias("sig"),
        F.concat_ws("_", *[F.col(c).cast("string") for c in cols]).alias("sig_text"),
    )


def minhash_signature_np(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """D1 via Arrow-vectorized pandas UDF — bit-identical int64 arithmetic
    to ``minhash_signature`` (tests assert equality), ~10-50× faster:
    the rolling hash and all permutations are numpy vector ops in C.

    This is the hot-path form for bulk dedup; the pure-SQL twin remains
    the oracle/parity reference. Assumes ASCII text (ascii(char) ==
    utf-8 byte); both implementations share that assumption.
    """
    from pyspark.sql import types as T

    A = np.array([a for a, _ in PERMS], dtype=np.int64)[:, None]
    B = np.array([b for _, b in PERMS], dtype=np.int64)[:, None]
    k = SHINGLE_K

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if len(b) < k:  # mirror the SQL edge: single padded shingle
                b = np.pad(b, (0, k - len(b)))
            h = b[: len(b) - k + 1].copy()
            for j in range(1, k):
                h = (h * 31 + b[j : len(b) - k + 1 + j]) % MERSENNE_P
            sig = ((A * h[None, :] + B) % MERSENNE_P).min(axis=1)
            out.append(sig)
        return pd.Series(out)

    sig = df.select(F.col(id_col), _sig(F.col(text_col)).alias("sig"))
    return sig.select(
        id_col,
        "sig",
        F.concat_ws("_", F.expr("transform(sig, x -> cast(x as string))")).alias(
            "sig_text"
        ),
    )


def lsh_band_pairs(
    sigs: DataFrame, id_col: str, band_width: int = 4
) -> DataFrame:
    """D2 — candidate pairs via LSH banding over the signature array.

    Bands of ``band_width`` contiguous values (reference window_size=6
    over 256, check_duplicate.py:90-93; scaled to the 8-perm declared
    signature). Join key = (band index, band values) string; output
    distinct (a_id, b_id) with a < b.
    """
    n_bands = len(PERMS) // band_width
    bands = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(j).cast("string"),
                *[
                    F.col("sig").getItem(j * band_width + i).cast("string")
                    for i in range(band_width)
                ],
            )
            for j in range(n_bands)
        ]
    )
    keyed = sigs.select(F.col(id_col), F.explode(bands).alias("band_key"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .distinct()
    )


def quantized_cosine_cols(prefix_a: str = "sa", prefix_b: str = "sb") -> dict[str, Column]:
    """D3 — integer-exact similarity over quantized signature vectors.

    The reference computes cosine over the raw signature vectors
    (check_duplicate.py:128-151). Quantizing each value mod 100 and
    reporting sim² in per-mille ((dot² · 1000) DIV (|a|²|b|²)) keeps
    every intermediate both inside int64 AND exactly representable as a
    double (< 2^53), so the floor is bit-identical across engines while
    preserving the cosine ordering (monotone for dot > 0).
    """
    qa = F.expr(f"transform({prefix_a}, x -> x % 100)")
    qb = F.expr(f"transform({prefix_b}, x -> x % 100)")
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    na = F.aggregate(
        F.transform(qa, lambda x: x * x), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    nb = F.aggregate(
        F.transform(qb, lambda x: x * x), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    sim2 = F.when(
        (dot > 0) & (na > 0) & (nb > 0),
        ((dot * dot * F.lit(1_000)) / (na * nb)).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return {"dot": dot, "na": na, "nb": nb, "sim2_milli": sim2}


def cosine_sim(a: Column, b: Column) -> Column:
    """Float cosine over two array<numeric> columns — the engine-internal
    D3 path (tests/threshold logic); sequential fold, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content. Emits (id, content_hash,
    group_size, canonical_id, is_canonical) — canonical = min id.
    Map-side partial aggregation makes this one shuffle on the hash."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    groups = hashed.groupBy("content_hash").agg(
        F.count("*").alias("group_size"), F.min(id_col).alias("canonical_id")
    )
    return hashed.join(groups, "content_hash").select(
        id_col,
        "content_hash",
        "group_size",
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard_milli: int = 0,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs, integer-exact:
    jaccard_milli = 1000·|A∩B| DIV (|A|+|B|−|A∩B|).

    explode distinct n-grams → self-join on gram (the shuffle key) →
    per-pair intersection counts + per-doc set sizes. At 100 TB the gram
    join is the LSH-free baseline; prefer lsh_band_pairs to bound
    candidates first.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                )
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, "gram")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n_grams").alias("nb"))
    jac = (F.col("shared") * 1000).cast("bigint") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    return (
        shared.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id", "b_id", "shared",
            jac.cast("bigint").alias("jaccard_milli"),
        )
        .filter(F.col("jaccard_milli") >= min_jaccard_milli)
    )


def simhash16(text_col: str) -> Column:
    """16-bit SimHash over distinct word tokens with the polynomial hash:
    bit b set iff sum over tokens of ±1 (by token-hash bit b) > 0.
    Pure arithmetic — oracle-expressible; widen to 64 bit via the
    same construction when byte-parity isn't needed.

    Column-expression form — convenient for composition; prefer
    ``simhash16_table`` in pipelines (explode + codegen, no interpreted
    per-bit lambda recomputation).
    """
    words = f"array_distinct(split(trim({text_col}), '\\\\s+'))"
    whash = (
        f"transform({words}, s -> aggregate(sequence(1, length(s)),"
        f" CAST(0 AS BIGINT), (acc, i) -> (acc*31 + ascii(substr(s, i, 1))) % 65536))"
    )
    return F.expr(
        "aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc + "
        f"CASE WHEN aggregate({whash}, CAST(0 AS BIGINT),"
        " (s, h) -> s + CASE WHEN (h DIV shiftleft(CAST(1 AS BIGINT), b)) % 2 = 1 THEN 1 ELSE -1 END)"
        " > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END)"
    )


def simhash16_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash via explode → codegen'd per-word hash → 16 conditional-sum
    aggregates — the shuffle-once, no-interpreted-lambda shape for the
    100 TB path. Same output values as ``simhash16``."""
    words = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("_w"),
    )
    hashed = words.select(
        F.col(id_col),
        F.expr(
            "aggregate(sequence(1, length(_w)), CAST(0 AS BIGINT),"
            " (acc, i) -> (acc*31 + ascii(substr(_w, i, 1))) % 65536)"
        ).alias("_h"),
    )
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"(_h DIV {1 << b}) % 2 = 1"), F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"_b{b}")
            for b in range(16)
        ]
    )
    fingerprint = None
    for b in range(16):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select(
        F.col(id_col), fingerprint.cast("bigint").alias("simhash16")
    )


def dup_classify(
    pairs: DataFrame,
    sim_col: str = "sim2_micro",
    hash_a: str = "hash_a",
    hash_b: str = "hash_b",
    version_threshold: int = 900_000,
) -> Column:
    """D4 — three-way classification (check_duplicate.py:154-211):
    identical content hash → duplicate; similar text, different
    metadata → version; else new."""
    return (
        F.when(F.col(hash_a) == F.col(hash_b), F.lit("duplicate"))
        .when(F.col(sim_col) >= version_threshold, F.lit("version"))
        .otherwise(F.lit("new"))
    )


def scd_versions(
    df: DataFrame, key_col: str, order_col: str, tiebreak_col: str
) -> DataFrame:
    """D5 — SCD-2 versioning (record_handler.py:39-80): per key, version
    numbers in arrival order; every row archived except the latest
    (exactly one live version per key — the invariant at
    record_handler.py:53-66)."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col), F.col(tiebreak_col))
    wall = Window.partitionBy(key_col)
    return (
        df.withColumn("version", F.row_number().over(w).cast("bigint"))
        .withColumn("_maxv", F.max("version").over(wall))
        .withColumn(
            "status",
            F.when(F.col("version") == F.col("_maxv"), F.lit("published")).otherwise(
                F.lit("archive")
            ),
        )
        .drop("_maxv")
    )


def anti_insert(incoming: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """D6 — insert only what doesn't exist (record_handler.py:130-147):
    left-anti join; caller unions the result into the store."""
    return incoming.join(existing, on, "left_anti")


def latest_per_key(
    df: DataFrame, key_col: str, order_col: str, tiebreak_col: str
) -> DataFrame:
    """D7 — latest-relation pick (tdb_query_helpers.py:76-81):
    max-by (order, tiebreak) per key via row_number=1."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).desc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_lsh_pairs_mllib(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hash_tables: int = 8,
    jaccard_distance_threshold: float = 0.6,
    num_features: int = 1 << 18,
) -> DataFrame:
    """D1+D2+D3 at scale: MLlib MinHashLSH approxSimilarityJoin over
    hashed char-shingle sets — the 256-perm/100 TB path (SURVEY §4:
    OR-amplification via numHashTables). Returns (a_id, b_id,
    jaccard_distance). Not oracle-expressible; checked rows-only +
    against ngram_jaccard_pairs ground truth in tests."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = df.select(
        F.col(id_col), F.expr(char_shingles_expr(text_col)).alias("shingles")
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=1)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance_threshold, distCol="jaccard_distance")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            "jaccard_distance",
        )
    )
