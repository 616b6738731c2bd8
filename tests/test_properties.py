"""Property-based tests (hypothesis) — SURVEY §5.3.

Python-side rules (postprocess/clip) get wide random coverage; Spark
column expressions are checked in one batched job per property.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from beis_orp_data_service_spark.operators import models

TEXTY = st.text(
    alphabet=st.sampled_from("abcdefgh .()ABC\n\t"), min_size=0, max_size=300
)


@given(TEXTY)
@settings(max_examples=200, deadline=None)
def test_postprocess_title_properties(s):
    out = models.postprocess_title(s)
    # never ends with a stopword
    toks = out.split()
    if toks:
        assert toks[-1].lower() not in models.STOPWORDS
    # idempotent
    assert models.postprocess_title(out) == out
    # non-stopword tokens unique (case-insensitive)
    non_stop = [t.lower() for t in toks if t.lower() not in models.STOPWORDS]
    assert len(non_stop) == len(set(non_stop))


@given(st.text(alphabet=st.sampled_from("xyz .,"), min_size=0, max_size=2000))
@settings(max_examples=200, deadline=None)
def test_smart_clip_properties(s):
    out = models.smart_clip(s)
    assert len(out) <= models.SUMMARY_MAX
    if len(s) <= models.SUMMARY_MAX:
        assert out == s
    else:
        assert s.startswith(out)


@given(st.text(alphabet=st.sampled_from("abc def"), min_size=0, max_size=500))
@settings(max_examples=200, deadline=None)
def test_fake_keywords_properties(s):
    kws = models.fake_keywords(s, top_k=10)
    assert len(kws) <= 10
    assert len(kws) == len(set(kws))
    for k in kws:
        assert k not in models.STOPWORDS and len(k) >= 3


def test_clean_text_idempotent_on_random_batch(spark):
    # one Spark job over a deterministic pseudo-random corpus
    import random

    from pyspark.sql import functions as F

    from beis_orp_data_service_spark.functions.text import clean_text

    rng = random.Random(7)
    alphabet = "ab c.\n\t  A?"
    rows = [
        ("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))),)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "s string")
    once = df.select(clean_text("s").alias("c1"))
    bad = once.select(clean_text("c1").alias("c2"), "c1").filter(
        F.col("c1") != F.col("c2")
    )
    assert bad.count() == 0


def test_minhash_jaccard_correlation(spark):
    # signature agreement must track true shingle jaccard (monotone on a
    # controlled similarity ladder)
    from beis_orp_data_service_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog and the cat " * 3
    rows = [(0, base)]
    words = base.split()
    for i, frac in enumerate([0.1, 0.4, 0.8], start=1):
        n_swap = int(len(words) * frac)
        mutated = ["zz" + w if j < n_swap else w for j, w in enumerate(words)]
        rows.append((i, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = {r.doc_id: r.sig for r in dd.minhash_signature(df, "doc_id", "text").collect()}

    def agree(a, b):
        return sum(1 for x, y in zip(a, b) if x == y)

    agreements = [agree(sigs[0], sigs[i]) for i in (1, 2, 3)]
    assert agreements[0] >= agreements[1] >= agreements[2]


@given(
    st.integers(min_value=1, max_value=60000),
    st.integers(min_value=1, max_value=60000),
)
@settings(max_examples=100, deadline=None)
def test_probe_media_header_roundtrip_dims(w, h):
    """Any (w, h) written into a PNG IHDR / GIF screen / JPEG SOF0 must
    be read back exactly by the header probe."""
    import struct

    from beis_orp_data_service_spark.operators import multimodal as mm

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )
    assert mm.probe_media_header(png) == {"container": "png", "width": w, "height": h}
    if w <= 0xFFFF and h <= 0xFFFF:
        gif = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6
        assert mm.probe_media_header(gif) == {
            "container": "gif", "width": w, "height": h,
        }
        sof0 = (
            b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00"
        )
        jpeg = b"\xff\xd8" + sof0 + b"\xff\xd9"
        assert mm.probe_media_header(jpeg) == {
            "container": "jpeg", "width": w, "height": h,
        }


def test_phrase_match_equals_python_reference_on_random_batch(spark):
    # one Spark job over a pseudo-random token corpus, every doc checked
    # against a pure-Python sliding-window reference
    import random

    from beis_orp_data_service_spark.operators import search as so

    rnd = random.Random(17)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 25))))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for phrase in ("aa bb", "bb bb", "aa bb aa", "cc"):
        got = {
            (r["doc_id"], r["start"])
            for r in so.phrase_match(docs, phrase).collect()
        }
        terms = phrase.split()
        want = set()
        for i, text in rows:
            toks = text.lower().split()
            for s in range(len(toks) - len(terms) + 1):
                if toks[s : s + len(terms)] == terms:
                    want.add((i, s))
        assert got == want, phrase


def test_heavy_hitters_equals_exact_on_random_zipf_batch(spark):
    # zipf-ish random corpus: two-pass MG output must equal the naive
    # exact groupBy for several k, at a counter budget far below vocab
    import random

    import pyspark.sql.functions as F

    from beis_orp_data_service_spark.operators import corpus as corpus_ops

    rnd = random.Random(23)
    vocab = [f"w{i}" for i in range(400)]
    weights = [1.0 / (i + 1) for i in range(400)]
    rows = [
        (i, " ".join(rnd.choices(vocab, weights=weights, k=30)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    n = toks.count()
    freqs = {
        r["t"]: r["c"]
        for r in toks.groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for k, counters in ((20, 64), (60, 64), (150, None)):
        got = {
            (r["token"], r["freq"])
            for r in corpus_ops.heavy_hitters(
                docs, k=k, counters=counters
            ).collect()
        }
        want = {(t, c) for t, c in freqs.items() if c * k > n}
        assert got == want, k


def test_char_entropy_bounds_batched(spark):
    """One batched job: for ~120 adversarial texts, 0 ≤ H ≤
    ln(#distinct chars) (+ per-term rounding slack of half a nano
    each), and H = 0 exactly iff the text uses a single character."""
    import math
    import random

    rng = random.Random(8)
    alphabet = "abcdef \n.!"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 200)))
        for _ in range(100)
    ] + ["a", "aaaa", "ab", " ", "\n\n\n", "abcdefabcdef"]
    from beis_orp_data_service_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.entropy_q for r in ts.char_entropy(docs).collect()}
    for i, t in enumerate(texts):
        distinct = len(set(t))
        upper = round(math.log(max(distinct, 1)) * ts.ENTROPY_SCALE) + distinct
        assert 0 <= got[i] <= upper, (t, got[i], upper)
        assert (got[i] == 0) == (distinct == 1), t


def test_recency_scores_bounds_batched(spark):
    """One batched job: per user 0 < recency_q ≤ n_events·SCALE (each
    decay term is in (0, 1]; the newest event scores exactly SCALE)."""
    import random

    from pyspark.sql import functions as F

    from beis_orp_data_service_spark.operators import behavior as bh

    rng = random.Random(8)
    rows = [
        (i, f"2024-01-{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:00:00",
         rng.randint(1, 9))
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = bh.recency_scores(ev).collect()
    assert {r.user_id for r in out} == {u for _, _, u in rows}
    newest_user = max(rows, key=lambda r: r[1])[2]
    for r in out:
        assert 0 < r.recency_q <= r.n_events * bh.RECENCY_SCALE
    # the user owning the table-max event carries at least one full term
    nu = next(r for r in out if r.user_id == newest_user)
    assert nu.recency_q >= bh.RECENCY_SCALE


# ---------------------------------------------------------------------------
# BPE unrolled-CTE oracle vs the pure-Python Sennrich reference
# ---------------------------------------------------------------------------

# tiny alphabet forces merge collisions, overlap runs (aaa), and
# argmax ties — exactly the traps the fold + (count DESC, a, b)
# tie-break must survive
_BPE_WORD = st.text(alphabet=st.sampled_from("aabbc"), min_size=1, max_size=6)
_BPE_DOC = st.lists(_BPE_WORD, min_size=0, max_size=8).map(" ".join)


@given(st.lists(_BPE_DOC, min_size=1, max_size=6), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_bpe_oracle_sql_matches_reference_on_random_corpora(texts, k):
    import duckdb

    from beis_orp_data_service_spark.operators import corpus as co
    from tests.test_corpus import TestBpeLearnMerges

    expect = TestBpeLearnMerges._reference_bpe(texts, k)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = con.sql(co.bpe_merges_oracle_sql(k)).fetchall()
    assert sorted(got) == sorted(expect)


# ---------------------------------------------------------------------------
# WordPiece unrolled-CTE oracle vs the pure-Python reference trainer
# ---------------------------------------------------------------------------


@given(st.lists(_BPE_DOC, min_size=1, max_size=6), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_wordpiece_oracle_sql_matches_reference_on_random_corpora(texts, k):
    """Same trap corpus as the BPE property test (collisions, overlap
    runs, ties), but the WordPiece likelihood argmax must also survive
    score-key ties between pairs whose rational scores differ by less
    than 1e-18 (quantize equal -> (a, b) tie-break)."""
    import duckdb

    from beis_orp_data_service_spark.operators import corpus as co
    from tests.test_corpus import TestWordPiece

    expect = TestWordPiece._reference_wp(texts, k)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = con.sql(co.wordpiece_merges_oracle_sql(k)).fetchall()
    assert sorted(got) == sorted(expect)
