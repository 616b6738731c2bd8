"""Golden-row tests for model-backed UDFs (SURVEY §5.2): deterministic
fakes → pinned outputs; postprocess/clip rules are the real reference
algorithms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import models


def test_postprocess_title_rules():
    # de-dup non-stopword tokens keep-first
    assert models.postprocess_title("Water water quality Water rules") == "Water quality rules"
    # stopwords are never deduped
    assert models.postprocess_title("the cat and the dog") == "the cat and the dog"
    # trailing stopwords trimmed (iteratively)
    assert models.postprocess_title("Fishing rules of the") == "Fishing rules"
    # unbalanced bracket cut
    assert models.postprocess_title("Safety guide (part") == "Safety guide"
    assert models.postprocess_title("") == ""


def test_smart_clip_boundaries():
    base = ("word " * 200).strip()  # 999 chars, no periods
    out = models.smart_clip(base)
    assert 500 <= len(out) <= 600
    assert not out.endswith(" ") and out.split()[-1] == "word"
    # sentence boundary preferred when it lands in [500, 600]
    sent = "a" * 540 + ". " + "b" * 200
    assert models.smart_clip(sent) == "a" * 540 + "."
    # early period ignored (before lo) → word boundary
    early = "c" * 10 + ". " + "d" * 800
    assert len(models.smart_clip(early)) <= 600
    # short text unchanged
    assert models.smart_clip("short") == "short"


def test_fake_keywords_ranked_and_capped():
    text = "fish fish fish water water rules the the the of and to in xx"
    kws = models.fake_keywords(text, top_k=3)
    assert kws == ["fish", "water", "rules"]  # freq desc, stopwords/short dropped


def test_enrich_documents_chain(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 20)],
        "doc_id bigint, text string",
    )
    out = models.enrich_documents(df).first()
    assert out.title == "The Quick Brown Fox Jumps"
    assert 500 <= len(out.summary) <= 600
    assert "quick" in out.subject_keywords and len(out.subject_keywords) <= 10
    assert out.language == "en"


def test_title_generate_udf_matches_fake(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma delta epsilon zeta")],
                               "doc_id bigint, text string")
    got = df.select(models.title_generate("text").alias("t")).first().t
    assert got == "Alpha Beta Gamma Delta Epsilon"
