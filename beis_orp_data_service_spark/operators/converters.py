"""Document converters — E1-E4: PDF/DOCX/ODF/HTML binary → text + metadata
(SURVEY §2.2), as one dispatching mapInPandas operator.

The reference implements one Lambda per format (pdf_to_orpml.py:92-139,
docx_to_orpml.py:102-154, odf_to_orpml.py:93-151, html_to_orpml.py:20-84)
routed by a Step Functions extension match, plus a bulk dispatcher
(doc_format_map, glue_bulk_enrichment.ipynb cell 3). The engine fuses
them: one binary DataFrame in, one dispatcher column out — format
routing is data, not orchestration.

The actual parsers are STUBS (pdfplumber/python-docx/bs4 are not in
this container): each ``parse_*`` raises NotImplementedError on real
payloads and falls back to a deterministic fake that decodes the bytes
as UTF-8 (the test corpus ships text-as-binary). The per-row try/except
null-row tolerance of the reference's bulk job (notebook cell 4) is
kept: parse failures yield a null text + error column, counted, never
thrown.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONVERTED_SCHEMA = (
    "media_id bigint, document_format string, text string, "
    "n_pages bigint, parse_error string"
)


def _fake_decode(content: bytes) -> tuple[str, int]:
    text = (content or b"").decode("utf-8", errors="replace")
    n_pages = 1 + len(text) // 2000  # deterministic page-count stand-in
    return text, n_pages


def parse_pdf(content: bytes) -> tuple[str, int]:
    """E1 — pdfplumber page loop with pdfminer→PyPDF2→fitz fallback chain
    (glue pdf_to_text.py:12-69). Stubbed: decode-as-text fake."""
    try:  # pragma: no cover - not installed here
        import pdfplumber  # noqa: F401

        raise NotImplementedError("wire pdfplumber.open(BytesIO(content)) here")
    except ImportError:
        return _fake_decode(content)


def parse_docx(content: bytes) -> tuple[str, int]:
    """E2 — unzip word/document.xml, iterate w:p/w:t (docx_to_orpml.py:102-154)."""
    return _fake_decode(content)


def parse_odf(content: bytes) -> tuple[str, int]:
    """E3 — unzip content.xml/meta.xml (odf_to_orpml.py:93-151)."""
    return _fake_decode(content)


def parse_html(content: bytes) -> tuple[str, int]:
    """E4 — selector-fallback body extraction (html_to_orpml.py:20-84)."""
    return _fake_decode(content)


PARSERS = {
    "PDF": parse_pdf,
    "DOCX": parse_docx,
    "ODF": parse_odf,
    "HTML": parse_html,
}


def convert_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts, pages, errors = [], [], []
        for content, fmt in zip(pdf["content"], pdf["document_format"]):
            parser = PARSERS.get(fmt)
            if parser is None:
                texts.append(None); pages.append(0); errors.append(f"unsupported format: {fmt}")
                continue
            try:
                t, n = parser(bytes(content or b""))
                texts.append(t); pages.append(n); errors.append(None)
            except Exception as e:  # noqa: BLE001 — per-row tolerance (notebook cell 4)
                texts.append(None); pages.append(0); errors.append(str(e)[:200])
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "document_format": pdf["document_format"],
                "text": texts,
                "n_pages": pd.Series(pages, dtype="int64"),
                "parse_error": errors,
            }
        )


def convert_documents(binaries: DataFrame) -> DataFrame:
    """Dispatching converter: (media_id, document_format, content) →
    (text, n_pages, parse_error). mapInPandas: partition-preserving,
    binary never leaves the executor, failures are rows not exceptions."""
    return binaries.select("media_id", "document_format", "content").mapInPandas(
        convert_batch, CONVERTED_SCHEMA
    )


def conversion_stats(converted: DataFrame) -> DataFrame:
    """The bulk job's failure accounting (SURVEY §4: count failures as a
    metric, never break the job)."""
    return converted.groupBy("document_format").agg(
        F.count("*").alias("n_docs"),
        F.count("parse_error").alias("n_failures"),
        F.sum("n_pages").alias("total_pages"),
    )
