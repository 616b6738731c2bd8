"""Column-level text functions — pure Spark SQL expressions, no UDFs.

The reference implements these as per-row Python string ops inside each
Lambda; here every one is a Catalyst expression chain so it stays inside
whole-stage codegen and vectorized parquet reads at 100 TB.

- ``clean_text``: the `clean_text` normalization copied across four
  reference lambdas (pdf_to_orpml.py:20-57, identical in docx/odf/glue).
- ``hash_id``: the deterministic node-id hash
  (misc/stream_update_process/utils/functions.py:5-8) — alnum-lower the
  concatenated key fields, then hash. The reference uses
  shake_256[:16]; the engine uses sha2-256 truncated to 16 bytes (same
  determinism/collision properties; a shake-parity pandas UDF exists in
  operators/enrichment.py for byte-parity needs).
- ``year_spans``: 4-digit year detection
  (lambdas/legislative_origin_extraction/legislative_origin_extraction.py:45-53).
- ``sentence_chunks``: sentence segmentation for phrase matching. The
  reference's custom period-sentencizer (legislative_origin_extraction.py:18-27)
  splits on '.'; for period-free corpora the engine falls back to
  fixed-width token chunks, which is what this returns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_text(col: Column | str) -> Column:
    """Normalization chain of reference pdf_to_orpml.py:20-57:
    newlines → spaces, collapse whitespace, de-dup punctuation runs,
    drop stray single-letter tokens, trim, lowercase.

    Idempotent: clean_text(clean_text(x)) == clean_text(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)  # FIRST: the later rules see canonical case
    c = F.regexp_replace(c, r"[\n\r\t]", " ")  # newlines/tabs → space
    c = F.regexp_replace(c, r"\.{2,}", ".")  # '....' → '.'
    # stray article runs: ' (a )+' (greedy) so consecutive ' a a ' can't
    # leave a residue that a second pass would still remove
    c = F.regexp_replace(c, r" (a )+", " ")
    c = F.regexp_replace(c, r"  +", " ")  # collapse runs of spaces
    return F.trim(c)


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
    return F.split(F.trim(c), r"\s+")


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


def scan_window(col: Column | str, min_chars: int = 2000, fraction: float = 0.1) -> Column:
    """Search-space pruning of the reference's bulk jobs: scan only the
    first max(min_chars, fraction*len) characters
    (lo_extraction.py:6,18-19; rule_based_dti.py:17,31-32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        c, 1, F.greatest(F.lit(min_chars), (F.length(c) * fraction).cast("int"))
    )
