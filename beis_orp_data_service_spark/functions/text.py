"""Column-level text functions — pure Spark SQL expressions, no UDFs.

The reference implements these as per-row Python string ops inside each
Lambda; here every one is a Catalyst expression chain so it stays inside
whole-stage codegen and vectorized parquet reads at 100 TB.

- ``clean_text``: the `clean_text` normalization copied across four
  reference lambdas (pdf_to_orpml.py:20-57, identical in docx/odf/glue),
  reproduced step-for-step (see its docstring for the two documented
  deviations).
- ``hash_id``: the deterministic node-id hash
  (misc/stream_update_process/utils/functions.py:5-8) — alnum-lower the
  concatenated key fields, then hash. The reference uses
  shake_256[:16]; the engine substitutes sha2-256 truncated to the same
  width (identical determinism/collision properties; documented
  deviation — both are fixed-width one-way digests over the same
  canonicalized key).
- ``year_spans``: 4-digit year detection
  (lambdas/legislative_origin_extraction/legislative_origin_extraction.py:45-53).
- ``sentence_chunks``: sentence segmentation for phrase matching. The
  reference's custom period-sentencizer (legislative_origin_extraction.py:18-27)
  splits on '.'; for period-free corpora the engine falls back to
  fixed-width token chunks, which is what this returns.
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_text(col: Column | str) -> Column:
    """Full-fidelity normalization chain of reference pdf_to_orpml.py:20-57
    (byte-identical copies in docx_to_orpml.py:30-67 / odf_to_orpml.py:21-58
    / glue pdf_to_text.py:73-110), in the reference's order:

    newline→space; ' .'→'. '; digit-spacing repair (every number becomes
    ``' N .'``); whitespace collapse; stray-``' .'`` sweep + doubled-
    punctuation dedup (remove_excess_punctuation, one pass per
    ``string.punctuation`` char in order); control-char strip (openpyxl
    ILLEGAL_CHARACTERS_RE); mergedWords split *before any case change*
    (``aB``→``a B``, ``ABc``→``A Bc`` — the chain never lowercases);
    strip; tab→space; ``_x000c_`` removal; ascii-fold; collapse;
    tag strip ``<.*?>``; ``\\.{4,}``→``.``.

    The reference's lookahead alternation ``[a-z](?=[A-Z])|[A-Z](?=[A-Z][a-z])``
    is expressed as two sequential backreference passes (AAb first, then
    aB) so the DuckDB RE2 twin — which has no lookahead — can mirror it;
    the two forms are equivalent because pass 1 only inserts a space
    after an uppercase letter, which cannot create or destroy a
    lower→upper boundary for pass 2.

    Two documented deviations, both strictly more normalized than the
    reference: the stray-``' .'`` sweep re-runs after pair-dedup (the
    reference leaks a ``' .'`` when a pair removal lands next to a
    period), and a final trim (the reference can leave edge whitespace
    after ascii-fold/tag-strip). These make the chain idempotent on
    tag-free ASCII input — clean_text(clean_text(x)) == clean_text(x) —
    which the engine treats as a contract (property-tested).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit("\n"), F.lit(" "))
    c = F.replace(c, F.lit(" ."), F.lit(". "))
    c = F.regexp_replace(c, r"(\d+(\.\d+)?)", r" $1 .")  # digit spacing
    c = F.regexp_replace(c, r"[ \t\n\x0B\f\r]+", " ")
    # remove_excess_punctuation: stray ' .' sweep, then doubled-punct pairs
    c = F.replace(c, F.lit(" ."), F.lit(""))
    for p in _string.punctuation:
        c = F.replace(c, F.lit(p + p), F.lit(""))
    c = F.replace(c, F.lit(" ."), F.lit(""))  # deviation: re-sweep (idempotence)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", " ")
    c = F.regexp_replace(c, r"([A-Z])([A-Z][a-z])", r"$1 $2")  # mergedWords...
    c = F.regexp_replace(c, r"([a-z])([A-Z])", r"$1 $2")  # ...two-pass split
    c = F.trim(c)
    c = F.replace(c, F.lit("\t"), F.lit(" "))
    c = F.replace(c, F.lit("_x000c_"), F.lit(""))
    c = F.regexp_replace(c, r"[^\x00-\x7F]", "")  # ascii-fold
    c = F.regexp_replace(c, r"[ \t\n\x0B\f\r]+", " ")
    c = F.regexp_replace(c, r"<.*?>", "")
    c = F.regexp_replace(c, r"\.{4,}", ".")
    return F.trim(c)  # deviation: final trim (idempotence)


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_text` — the same chain as nested SQL
    over expression ``expr``, for oracle checks. RE2 quirks mirrored:
    backreference replacements use ``\\1`` and every regexp_replace takes
    the ``'g'`` flag."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    x = f"replace({expr}, chr(10), ' ')"
    x = f"replace({x}, ' .', '. ')"
    x = rf"regexp_replace({x}, '(\d+(\.\d+)?)', ' \1 .', 'g')"
    x = rf"regexp_replace({x}, '\s+', ' ', 'g')"
    x = f"replace({x}, ' .', '')"
    for p in _string.punctuation:
        x = f"replace({x}, {lit(p + p)}, '')"
    x = f"replace({x}, ' .', '')"
    x = rf"regexp_replace({x}, '[\x00-\x08\x0b\x0c\x0e-\x1f]', ' ', 'g')"
    x = rf"regexp_replace({x}, '([A-Z])([A-Z][a-z])', '\1 \2', 'g')"
    x = rf"regexp_replace({x}, '([a-z])([A-Z])', '\1 \2', 'g')"
    x = f"trim({x})"
    x = f"replace({x}, chr(9), ' ')"
    x = f"replace({x}, '_x000c_', '')"
    x = rf"regexp_replace({x}, '[^\x00-\x7F]', '', 'g')"
    x = rf"regexp_replace({x}, '\s+', ' ', 'g')"
    x = f"regexp_replace({x}, '<.*?>', '', 'g')"
    x = rf"regexp_replace({x}, '\.{{4,}}', '.', 'g')"
    return f"trim({x})"


def remove_excess_punct(col: Column | str) -> Column:
    """The standalone ``remove_excess_punctuation`` step (reference
    title_generation/preprocess/preprocess_functions.py:43-53, the last
    stage of the title/keyword preprocess chain): drop stray ``' .'``,
    then delete every doubled punctuation pair, one literal pass per
    ``string.punctuation`` char in the reference's order. All literal
    ``replace`` — stays in whole-stage codegen. :func:`clean_text`
    inlines the same steps mid-chain; this is the chain-tail form the
    title/keyword preprocess applies on its own."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit(" ."), F.lit(""))
    for p in _string.punctuation:
        c = F.replace(c, F.lit(p + p), F.lit(""))
    return c


def remove_excess_punct_sql(expr: str) -> str:
    """DuckDB twin of :func:`remove_excess_punct` — the identical
    literal-replace chain as nested SQL."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    x = f"replace({expr}, ' .', '')"
    for p in _string.punctuation:
        x = f"replace({x}, {lit(p + p)}, '')"
    return x


def hash_id(*cols: Column | str, length: int = 32) -> Column:
    """Deterministic id over key fields (functions.py:5-8):
    concat → strip non-alphanumerics → lowercase → hash → first N hex."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lower(
        F.regexp_replace(F.concat_ws("", *[p.cast("string") for p in parts]), r"[^a-zA-Z0-9]", "")
    )
    return F.substring(F.sha2(key, 256), 1, length)


def year_spans(col: Column | str) -> Column:
    """Distinct 4-digit year tokens (19xx/20xx) in a string, as an array
    (legislative_origin_extraction.py:45-53's SHAPE:dddd matcher)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(F.regexp_extract_all(c, F.lit(r"\b((?:19|20)\d{2})\b"), 1))


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+")


# UNICODE PARITY ASSUMPTION (documented engine boundary, same class as
# the ln() 1-ulp note): Spark (Java/ICU) and DuckDB (utf8proc) agree on
# length/substr/md5/lower for ASCII, Latin-1, CJK and astral-plane
# text (probed: emoji lengths match — both count codepoints), but
# DISAGREE on (a) Unicode special casing — lower('İ') is 'i̇'
# (i + U+0307) in Java but 'i' in DuckDB — and (b) grapheme handling
# in reverse() — DuckDB reverses grapheme clusters, Java reverses
# codepoints, so combining marks change positional arithmetic built on
# reverse(). Every hash-grade text oracle therefore assumes corpus
# text free of special-casing codepoints (İ I-dotless ẞ and friends)
# and of combining marks in positional windows; the divergence itself
# is pinned by tests/test_text_functions.py::TestUnicodeEngineBoundary
# so an engine upgrade that moves it gets noticed.
#
# The one whitespace-token split every oracle-paired text operator
# shares (BM25/TF-IDF, bigram LM, token-KL, RAG chunking, CMS words).
# The class is spelled EXPLICITLY: Java's \s is exactly
# [ \t\n\x0B\f\r] but DuckDB's RE2 \s omits \x0B, so a bare \s
# desynchronizes the engines on vertical-tab text. Its DuckDB twin is
# list_filter(string_split_regex(lower(x), '[ \t\n\x0B\f\r]+'),
# t -> t <> '') — keep BOTH forms in sync; a drift here silently
# desynchronizes every downstream oracle at once, which is exactly why
# there is a single copy (the .alt perturbed fixture plants a \x0B
# document to pin this).
LC_TOKEN_SPLIT = r"[ \t\n\x0B\f\r]+"


def lc_tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the
    engine-portable tokenizer (split/lower are identical in Spark and
    DuckDB, unlike any locale-aware tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), LC_TOKEN_SPLIT), lambda t: t != "")


def sentence_chunks(col: Column | str, width: int = 8) -> Column:
    """Fixed-width token chunks standing in for sentences (the engine's
    period-sentencizer analog for period-free text). Returns
    array<string>; element i covers tokens [i*width, (i+1)*width).
    """
    t = tokens(col)
    n_chunks = F.ceil(F.size(t) / F.lit(width)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * width + 1, width)),
    )


def sentences(col: Column | str, fallback_width: int | None = 8) -> Column:
    """Period sentencizer — the reference's custom_sentencizer scans for
    ``.`` tokens only (legislative_origin_extraction.py:18-27): split on
    periods, trim each piece, drop empties. Text containing no period at
    all falls back to ``sentence_chunks(fallback_width)`` (pass
    ``fallback_width=None`` for strict period-only splitting, where a
    period-free document is one single sentence)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.filter(
        F.transform(F.split(c, r"\."), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    if fallback_width is None:
        return parts
    return F.when(c.contains("."), parts).otherwise(
        sentence_chunks(col, fallback_width)
    )


def scan_window(col: Column | str, min_chars: int = 2000, fraction: float = 0.1) -> Column:
    """Search-space pruning of the reference's bulk jobs: scan only the
    first max(min_chars, fraction*len) characters
    (lo_extraction.py:6,18-19; rule_based_dti.py:17,31-32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        c, 1, F.greatest(F.lit(min_chars), (F.length(c) * fraction).cast("int"))
    )
