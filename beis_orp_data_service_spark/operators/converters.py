"""Document converters — E1-E4: PDF/DOCX/ODF/HTML binary → text + metadata
(SURVEY §2.2), as one dispatching mapInPandas operator.

The reference implements one Lambda per format (pdf_to_orpml.py:92-139,
docx_to_orpml.py:102-154, odf_to_orpml.py:93-151, html_to_orpml.py:20-84)
routed by a Step Functions extension match, plus a bulk dispatcher
(doc_format_map, glue_bulk_enrichment.ipynb cell 3). The engine fuses
them: one binary DataFrame in, one dispatcher column out — format
routing is data, not orchestration.

DOCX / ODF / HTML kernels are REAL, stdlib-only:

- DOCX (docx_to_orpml.py:102-154 + extract_docx_metadata): unzip
  ``word/document.xml``, walk ``w:p``/``w:t`` paragraph runs, join with
  blank lines; core-properties dates/title/creator from
  ``docProps/core.xml`` (dcterms:modified falling back to created, the
  reference's prop.modified/prop.created priority).
- ODF (odf_to_orpml.py:93-151): unzip ``content.xml`` and ``meta.xml``;
  body = every text node of content.xml space-joined with newlines
  dropped; metadata from ``office:meta`` (dc:title/dc:date/creator).
- HTML (html_to_orpml.py:20-67): the 3-tier selector fallback on a
  stdlib ``html.parser`` mini-DOM — (1) ``id=contentContainer`` body +
  ``<title>``, (2) last ``<ol><li>`` breadcrumb title + ``<main>``
  paragraphs, (3) ``id=mainContent`` paragraphs.

Only PDF stays gated: pdfplumber/pdfminer are not in this container, so
a real ``%PDF`` payload yields a parse-error row (the reference's page
loop is documented at glue pdf_to_text.py:12-69 for when the lib is
wired in).

Payloads that are not in their declared container format (the synthetic
corpus ships text-as-binary) fall back to a UTF-8 decode — the bulk
job's tolerance posture. Per-row try/except null-row semantics of the
reference's bulk job (notebook cell 4) are kept: parse failures yield a
null text + error column, counted, never thrown.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONVERTED_SCHEMA = (
    "media_id bigint, document_format string, text string, "
    "n_pages bigint, parse_error string, lossy boolean, "
    "meta_title string, meta_date string, meta_publisher string"
)

# typed parse_error value for password-protected PDFs — conversion_stats
# counts these separately from ordinary parse failures
PDF_ENCRYPTED_ERROR = "encrypted"


class PdfEncryptedError(ValueError):
    """The PDF trailer references an /Encrypt dictionary: content streams
    are ciphertext, so extraction is impossible without the key. The
    reference's fallback chain (glue pdf_to_text.py:12-69) surfaces these
    as library errors; the engine types them so stats can distinguish
    'encrypted' from 'corrupt'."""

_ZIP_MAGIC = b"PK\x03\x04"

# OpenXML / ODF / Dublin Core namespaces (public schema URIs)
_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_CORE_NS = {
    "cp": "http://schemas.openxmlformats.org/package/2006/metadata/core-properties",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
}
_ODF_DC = "{http://purl.org/dc/elements/1.1/}"
_ODF_META = "{urn:oasis:names:tc:opendocument:xmlns:meta:1.0}"


@dataclass
class Parsed:
    text: str
    n_pages: int
    title: str | None = None
    date: str | None = None
    publisher: str | None = None
    # True when extraction degraded to glyph-id passthrough (CID font
    # without a ToUnicode CMap): the text is "(cid:N)" tokens, usable for
    # dedup/fingerprints but not human-readable — flagged, not failed.
    lossy: bool = False


def _page_count(text: str) -> int:
    # deterministic page-count stand-in for paginated formats
    return 1 + len(text) // 2000


def _fallback_decode(content: bytes) -> Parsed:
    text = (content or b"").decode("utf-8", errors="replace")
    return Parsed(text, _page_count(text))


def _date10(iso: str | None) -> str | None:
    """ISO timestamp → '%Y-%m-%d' (the strftime at docx_to_orpml.py:110)."""
    return iso[:10] if iso else None


def parse_pdf(content: bytes) -> Parsed:
    """E1 — pdfplumber page loop with pdfminer→PyPDF2→fitz fallback chain
    (glue pdf_to_text.py:12-69). When the libs are absent (this
    container) a minimal stdlib extractor handles the common cases —
    FlateDecode (zlib) or plain content streams; literal-string AND
    hex-string ``Tj``/``'``/``"``/``TJ`` show operators; subset-embedded
    fonts whose codes are mapped back to Unicode through simple
    ``/ToUnicode`` CMaps (``beginbfchar``/``beginbfrange``), the layout
    most real government PDFs use. Page count from ``/Type /Page``
    objects. A PDF it cannot extract anything from becomes a parse-error
    row; non-PDF bytes take the text fallback.

    CID/Identity-H fonts WITHOUT a ToUnicode CMap degrade to glyph-id
    passthrough — each 2-byte code rendered as ``(cid:N)`` (pdfminer's
    public convention for unmapped CIDs) and the row flagged
    ``lossy=true`` instead of erroring. Encrypted PDFs (trailer
    ``/Encrypt``) first try standard-security-handler decryption with
    the EMPTY user password (RC4-40..128 and AES-128/AESV2 — the
    owner-password-only documents regulators commonly publish, which
    the reference's library chain opens transparently); only when /U
    fails to verify do they raise :class:`PdfEncryptedError`, surfaced
    as a typed ``parse_error='encrypted'`` row."""
    if content.startswith(b"%PDF"):
        import re

        # /Encrypt is only meaningful in a trailer dictionary or an
        # xref-STREAM dictionary (PDF 1.5+, /Type /XRef) — scanning the
        # whole byte stream would misclassify a readable PDF whose TEXT
        # mentions '/Encrypt N 0 R' (e.g. a document about PDF
        # internals). Valid PDF syntax allows '/Encrypt<<' with no
        # whitespace, hence \s* not \s+. The classic-trailer window runs
        # to the following 'startxref' so nested '>>' tokens inside the
        # trailer dict can't hide the key; the xref-stream window is the
        # bytes around the /Type /XRef token (its dictionary).
        enc_key = rb"/Encrypt\s*(?:\d+\s+\d+\s+R|<<)"
        regions = [
            m.group(1)
            for m in re.finditer(
                rb"trailer(.{0,2000}?)(?:startxref|%%EOF|\Z)", content, re.S
            )
        ]
        regions += [
            content[max(0, m.start() - 1000) : m.end() + 1000]
            for m in re.finditer(rb"/Type\s*/XRef\b", content)
        ]
        if any(re.search(enc_key, region) for region in regions):
            # standard-security-handler documents with only an OWNER
            # password open with the empty user password (§7.6.3) —
            # the commonest "encrypted" regulator upload; only a
            # verification failure stays a typed encrypted row
            decrypted = _pdf_decrypt_empty(content)
            if decrypted is None:
                raise PdfEncryptedError(PDF_ENCRYPTED_ERROR)
            content = decrypted
        try:
            import pdfplumber
        except ImportError:
            pdfplumber = None
        if pdfplumber is not None:  # pragma: no cover - lib absent here
            # the reference's page loop (glue pdf_to_text.py:12-69):
            # per-page extract_text joined by newlines; same Parsed
            # contract as the stdlib path so plans never change
            with pdfplumber.open(io.BytesIO(content)) as pdf:
                pages = [p.extract_text() or "" for p in pdf.pages]
            text = "\n".join(pages).strip()
            if not text:
                raise ValueError("PDF payload with no extractable text stream")
            return Parsed(text, len(pages))
        text, n_pages, lossy = _pdf_extract_minimal(content)
        if not text:
            raise ValueError("PDF payload with no extractable text stream")
        return Parsed(text, n_pages or _page_count(text), lossy=lossy)
    return _fallback_decode(content)


_PDF_STREAM_RE = None  # compiled lazily; module import stays cheap


# --------------------------------------------------------------------------
# Standard-security-handler decryption with the EMPTY user password
# (ISO 32000-1 §7.6.3, Algorithms 2/4/5) — the commonest "encrypted"
# regulator uploads are readable-by-anyone PDFs whose producer set only
# an owner password; the reference's pdfplumber/PyPDF2 fallback chain
# (glue pdf_to_text.py:12-69) opens these transparently, so the engine
# must too. Supports /V 1|2 (RC4-40..128) and /V 4 with /CFM V2 (RC4)
# or /CFM AESV2 (AES-128-CBC); /R 2|3|4. A PDF whose /U entry does NOT
# verify against the empty password stays a typed 'encrypted' row.
#
# Stdlib-only: RC4 is 10 lines; AES-128 inverse cipher is implemented
# below with precomputed GF(2^8) tables (FIPS-197 §5.3). Cost note:
# decryption is per-document edge work inside the Arrow batch kernel —
# pure-Python AES runs ~1 MB/s, fine for the document sizes this
# pipeline sees; a deployment drowning in AES PDFs wires `cryptography`
# behind the same function signature.
# --------------------------------------------------------------------------

_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


_AES_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_AES_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_AES_SBOX):
    _AES_INV_SBOX[_v] = _i
_AES_INV_SBOX = bytes(_AES_INV_SBOX)


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


_GM9 = bytes(_gmul(9, x) for x in range(256))
_GM11 = bytes(_gmul(11, x) for x in range(256))
_GM13 = bytes(_gmul(13, x) for x in range(256))
_GM14 = bytes(_gmul(14, x) for x in range(256))


def _aes128_expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2 key expansion → 11 round keys of 16 bytes."""
    rcon = 1
    words = [key[i : i + 4] for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = words[i - 1]
        if i % 4 == 0:
            t = bytes(
                [
                    _AES_SBOX[t[1]] ^ rcon,
                    _AES_SBOX[t[2]],
                    _AES_SBOX[t[3]],
                    _AES_SBOX[t[0]],
                ]
            )
            rcon = _gmul(rcon, 2)
        words.append(bytes(a ^ b for a, b in zip(words[i - 4], t)))
    return [b"".join(words[r * 4 : r * 4 + 4]) for r in range(11)]


def _aes128_decrypt_block(rks: list[bytes], block: bytes) -> bytes:
    """FIPS-197 §5.3 inverse cipher, state held as a flat 16-byte
    column-major list (byte i = row i%4, col i//4 — the spec's layout,
    so ShiftRows moves within rows = stride-4 positions)."""
    s = [b ^ k for b, k in zip(block, rks[10])]
    for rnd in range(9, 0, -1):
        # InvShiftRows + InvSubBytes fused
        s = [
            _AES_INV_SBOX[s[(i - 4 * (i % 4)) % 16]]
            for i in range(16)
        ]
        rk = rks[rnd]
        s = [b ^ k for b, k in zip(s, rk)]
        # InvMixColumns
        ns = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            ns[c] = _GM14[a0] ^ _GM11[a1] ^ _GM13[a2] ^ _GM9[a3]
            ns[c + 1] = _GM9[a0] ^ _GM14[a1] ^ _GM11[a2] ^ _GM13[a3]
            ns[c + 2] = _GM13[a0] ^ _GM9[a1] ^ _GM14[a2] ^ _GM11[a3]
            ns[c + 3] = _GM11[a0] ^ _GM13[a1] ^ _GM9[a2] ^ _GM14[a3]
        s = ns
    s = [_AES_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)]
    return bytes(b ^ k for b, k in zip(s, rks[0]))


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC with the IV prepended (the PDF AESV2 layout,
    §7.6.2) and PKCS#5 padding stripped. Truncates a trailing partial
    block (EOL bytes regex capture can drag in) instead of failing."""
    if len(key) != 16 or len(data) < 32:
        raise ValueError("AESV2 needs a 16-byte key and IV + >=1 block")
    data = data[: len(data) - (len(data) - 16) % 16]
    rks = _aes128_expand_key(key)
    prev = data[:16]
    out = bytearray()
    for off in range(16, len(data), 16):
        blk = data[off : off + 16]
        plain = _aes128_decrypt_block(rks, blk)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def _pdf_string_bytes(tok: bytes) -> bytes | None:
    """A PDF string token — literal ``(...)`` or hex ``<...>`` — to raw
    bytes (for /O and /U and /ID entries)."""
    tok = tok.strip()
    if tok.startswith(b"(") and tok.endswith(b")"):
        return _pdf_unescape(tok[1:-1])
    if tok.startswith(b"<") and tok.endswith(b">"):
        h = b"".join(tok[1:-1].split())
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii"))
        except ValueError:
            return None
    return None


def _pdf_dict_string(body: bytes, key: bytes) -> bytes | None:
    import re

    m = re.search(key + rb"\s*(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)", body, re.S)
    return _pdf_string_bytes(m.group(1)) if m else None


def _pdf_empty_password_key(
    o: bytes, u: bytes, p: int, id0: bytes, r: int, key_len: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 2 with the empty user password, then verify via
    Algorithm 4 (R=2) / 5 (R>=3) against /U. Returns the file key, or
    None when the document genuinely needs a password."""
    import hashlib
    import struct

    h = hashlib.md5(
        _PDF_PAD + o[:32] + struct.pack("<i", p) + id0
    )
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    key = key[:key_len]
    if r == 2:
        ok = _rc4(key, _PDF_PAD) == u[:32]
    else:
        x = hashlib.md5(_PDF_PAD + id0).digest()
        x = _rc4(key, x)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == u[:16]
    return key if ok else None


def _pdf_object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Per-object key (§7.6.2): MD5(file key ‖ objnum[0:3] ‖ gen[0:2]
    ‖ 'sAlT' for AESV2), truncated to min(len+5, 16)."""
    import hashlib
    import struct

    ext = struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
    d = file_key + ext + (b"sAlT" if aes else b"")
    return hashlib.md5(d).digest()[: min(len(file_key) + 5, 16)]


def _pdf_decrypt_empty(content: bytes) -> bytes | None:
    """Attempt full-document decryption with the empty user password.
    Returns a rewritten buffer with every encrypted stream body replaced
    by plaintext (offsets shift — irrelevant to the regex extractor,
    which never walks the xref), or None when the handler is not the
    Standard one, the crypt method is unsupported, or /U fails to
    verify (a REAL password) — callers then surface the typed
    'encrypted' row as before. The /Encrypt object itself and xref
    streams (/Type /XRef — never encrypted, §7.5.8.2) are left alone;
    dictionary strings (e.g. /Title) stay ciphertext, documented lossy
    for metadata but complete for text."""
    import re

    m = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", content)
    enc_num = None
    if m is not None:
        enc_num = int(m.group(1))
        om = re.search(
            rb"(?<![0-9])%d\s+%d\s+obj\b(.*?)endobj" % (enc_num, int(m.group(2))),
            content,
            re.S,
        )
        enc_body = om.group(1) if om else None
    else:
        im = re.search(rb"/Encrypt\s*(<<.{0,1200}?>>)", content, re.S)
        enc_body = im.group(1) if im else None
    if enc_body is None:
        return None
    if not re.search(rb"/Filter\s*/Standard\b", enc_body):
        return None

    def num_of(key: bytes, default: int | None = None) -> int | None:
        nm = re.search(key + rb"\s+(-?\d+)", enc_body)
        return int(nm.group(1)) if nm else default

    v = num_of(rb"/V", 0)
    r = num_of(rb"/R", 2)
    p = num_of(rb"/P")
    length = num_of(rb"/Length", 40)
    o = _pdf_dict_string(enc_body, rb"/O")
    u = _pdf_dict_string(enc_body, rb"/U")
    if p is None or o is None or u is None or r not in (2, 3, 4):
        return None
    aes = False
    if v == 4:
        cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
        if cfm is None:
            return None
        if cfm.group(1) == b"AESV2":
            aes = True
        elif cfm.group(1) == b"Identity":
            return content  # no stream encryption after all
        elif cfm.group(1) != b"V2":
            return None  # AESV3/R5-6 need /V 5 handling — out of scope
    elif v not in (1, 2):
        return None
    em = re.search(rb"/EncryptMetadata\s+(true|false)", enc_body)
    encrypt_metadata = em is None or em.group(1) == b"true"
    # first element of /ID from the trailer (required input to Alg 2;
    # a handful of broken writers omit it — empty works for those)
    idm = re.search(
        rb"/ID\s*\[\s*(<[0-9A-Fa-f\s]*>|\((?:[^()\\]|\\.)*\))", content, re.S
    )
    id0 = _pdf_string_bytes(idm.group(1)) if idm else b""
    key_len = 5 if r == 2 else max(5, min(16, (length or 40) // 8))
    file_key = _pdf_empty_password_key(
        o, u, p, id0 or b"", r, key_len, encrypt_metadata
    )
    if file_key is None:
        return None

    stream_re = re.compile(rb"stream\r?\n(.*?)endstream", re.S)

    def decrypt_obj(om: "re.Match[bytes]") -> bytes:
        num, gen, body = int(om.group(1)), int(om.group(2)), om.group(3)
        if num == enc_num or re.search(rb"/Type\s*/XRef\b", body):
            return om.group(0)

        def repl(sm: "re.Match[bytes]") -> bytes:
            raw = sm.group(1)
            # EOL before 'endstream' is not stream data (§7.3.8.1)
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
            okey = _pdf_object_key(file_key, num, gen, aes)
            try:
                plain = _aes_cbc_decrypt(okey, raw) if aes else _rc4(okey, raw)
            except ValueError:
                return sm.group(0)
            return b"stream\n" + plain + b"\nendstream"

        return om.group(1) + b" " + om.group(2) + b" obj" + stream_re.sub(
            repl, body
        ) + b"endobj"

    return re.sub(
        rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", decrypt_obj, content, flags=re.S
    )


def _pdf_unescape(s: bytes) -> bytes:
    """Literal-string escapes of PDF 32000-1:2008 §7.3.4.2."""
    import re

    s = re.sub(
        rb"\\([nrtbf()\\])",
        lambda m: {
            b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\",
        }[m.group(1)],
        s,
    )
    return re.sub(
        rb"\\([0-7]{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), s
    )


def _pdf_parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """Parse a simple ToUnicode CMap stream (PDF §9.10.3): code width
    from the codespacerange, ``beginbfchar`` single mappings and
    ``beginbfrange`` contiguous/array mappings, destinations UTF-16BE."""
    import re

    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
    width = max(1, len(m.group(1)) // 2) if m else 2

    def uni(hexs: bytes) -> str:
        return bytes.fromhex(hexs.decode("ascii")).decode(
            "utf-16-be", errors="replace"
        )

    cmap: dict[int, str] = {}
    for block in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            cmap[int(src, 16)] = uni(dst)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for lo, _hi, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", block, re.S
        ):
            for i, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                cmap[int(lo, 16) + i] = uni(dst)
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            base = bytes.fromhex(dst.decode("ascii"))
            prefix, last = base[:-2], int.from_bytes(base[-2:] or b"\x00\x00", "big")
            for c in range(int(lo, 16), int(hi, 16) + 1):
                unit = (last + c - int(lo, 16)) & 0xFFFF
                cmap[c] = (prefix + unit.to_bytes(2, "big")).decode(
                    "utf-16-be", errors="replace"
                )
    return cmap, width


# font decoder spec: ("cmap", code->str map, code width) for fonts with a
# parsed ToUnicode CMap; ("cid", None, 2) for composite Identity-H/V fonts
# without one (glyph-id passthrough, flagged lossy upstream)
FontDecoder = tuple[str, "dict[int, str] | None", int]


def _pdf_font_cmaps(content: bytes) -> dict[bytes, FontDecoder]:
    """Resource-name → font decoder for subset-embedded fonts, from the
    classic object layout: font dicts carry ``/ToUnicode N 0 R``; page
    resources name them ``/Font << /F1 N 0 R … >>``. Composite fonts
    (``/Subtype /Type0`` with ``/Encoding /Identity-H|V``) that lack a
    usable ToUnicode CMap map to the ``("cid", None, 2)`` passthrough
    decoder. (Cross-ref / object streams are out of scope for the
    minimal extractor — the real pdfplumber path handles those when the
    lib is present.)"""
    import re
    import zlib

    objects: dict[int, bytes] = {}
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", content, re.S):
        objects.setdefault(int(m.group(1)), m.group(2))

    def stream_of(body: bytes) -> bytes | None:
        sm = _PDF_STREAM_RE.search(body)
        if sm is None:
            return None
        raw = sm.group(1)
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return raw

    obj_dec: dict[int, FontDecoder] = {}
    for num, body in objects.items():
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if tm is not None:
            cm_body = objects.get(int(tm.group(1)))
            data = stream_of(cm_body) if cm_body is not None else None
            if data is not None and (b"beginbfchar" in data or b"beginbfrange" in data):
                cmap, width = _pdf_parse_tounicode(data)
                obj_dec[num] = ("cmap", cmap, width)
                continue
        # Identity-H/V composite font with no (usable) ToUnicode: 2-byte
        # codes ARE the glyph ids — passthrough, lossy
        if re.search(rb"/Subtype\s*/Type0\b", body) and re.search(
            rb"/Encoding\s*/Identity-[HV]\b", body
        ):
            obj_dec[num] = ("cid", None, 2)

    by_name: dict[bytes, FontDecoder] = {}
    for body in objects.values():
        for fm in re.finditer(rb"/Font\s*<<(.*?)>>", body, re.S):
            for name, ref in re.findall(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
                if int(ref) in obj_dec:
                    by_name.setdefault(name, obj_dec[int(ref)])
    return by_name


def _pdf_extract_minimal(content: bytes) -> tuple[str, int, bool]:
    """Best-effort text from PDF content streams, stdlib only: inflate
    each ``stream…endstream`` body (FlateDecode is zlib §RFC1951; other
    filters are skipped), then read the show operators in order —
    literal ``(…)`` and hex ``<…>`` strings under ``Tj``/``'``/``"``,
    and mixed ``[…] TJ`` arrays (PDF 32000-1:2008 §7.3.4, §9.4.3).
    ``Tf`` operators track the current font; strings shown in a font
    with a parsed ToUnicode CMap are decoded code-by-code through it
    (fixed code width from the codespacerange); strings in an
    Identity-H/V font without a CMap become ``(cid:N)`` glyph-id tokens
    and set the returned lossy flag; everything else decodes as latin-1.
    Scanned or ObjStm-packed documents yield '' and become parse-error
    rows upstream. Returns (text, n_pages, lossy)."""
    import re
    import zlib

    global _PDF_STREAM_RE
    if _PDF_STREAM_RE is None:
        _PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)

    font_cmaps = _pdf_font_cmaps(content)
    token_re = re.compile(
        rb"/(?P<font>\w+)\s+[-\d.]+\s+Tf"
        rb"|\((?P<lit>(?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")"
        rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?:Tj|'|\")"
        rb"|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ",
        re.S,
    )
    arr_re = re.compile(rb"\((?P<lit>(?:[^()\\]|\\.)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")

    lossy = False

    def decode(raw: bytes, dec: FontDecoder | None) -> str:
        nonlocal lossy
        if dec is None:
            return raw.decode("latin-1")
        kind, cmap, width = dec
        if kind == "cid":
            lossy = True
            return "".join(
                f"(cid:{int.from_bytes(raw[i : i + width], 'big')})"
                for i in range(0, len(raw) - width + 1, width)
            )
        return "".join(
            cmap.get(int.from_bytes(raw[i : i + width], "big"), "")
            for i in range(0, len(raw) - width + 1, width)
        )

    def hex_bytes(h: bytes) -> bytes:
        h = b"".join(h.split())
        if len(h) % 2:
            h += b"0"  # §7.3.4.3: odd final digit implies trailing 0
        return bytes.fromhex(h.decode("ascii"))

    pieces: list[str] = []
    for raw in _PDF_STREAM_RE.findall(content):
        data = raw
        try:
            data = zlib.decompress(raw)
        except zlib.error:
            pass  # not Flate — try the bytes as-is (uncompressed streams)
        if (
            b"Tj" not in data
            and b"TJ" not in data
            and b"'" not in data
            and b'"' not in data
        ):  # pre-filter must admit the quote show operators too
            continue
        cur = None  # current font's cmap (None = unmapped/simple font)
        for tok in token_re.finditer(data):
            if tok.group("font") is not None:
                cur = font_cmaps.get(tok.group("font"))
            elif tok.group("lit") is not None:
                pieces.append(decode(_pdf_unescape(tok.group("lit")), cur))
            elif tok.group("hex") is not None:
                pieces.append(decode(hex_bytes(tok.group("hex")), cur))
            else:
                for el in arr_re.finditer(tok.group("arr")):
                    if el.group("lit") is not None:
                        pieces.append(decode(_pdf_unescape(el.group("lit")), cur))
                    else:
                        pieces.append(decode(hex_bytes(el.group("hex")), cur))
        pieces.append("\n")
    n_pages = len(re.findall(rb"/Type\s*/Page[^s]", content))
    return "".join(pieces).strip(), n_pages, lossy


def parse_docx(content: bytes) -> Parsed:
    """E2 — unzip word/document.xml, iterate w:p paragraphs joining their
    w:t runs (docx_to_orpml.py:139-154); core-properties metadata with
    modified-over-created date priority (docx_to_orpml.py:102-125)."""
    if not content.startswith(_ZIP_MAGIC):
        return _fallback_decode(content)
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        body = ET.XML(z.read("word/document.xml"))
        core = (
            ET.XML(z.read("docProps/core.xml"))
            if "docProps/core.xml" in z.namelist()
            else None
        )
    paragraphs = []
    for para in body.iter(_W + "p"):
        runs = [node.text for node in para.iter(_W + "t") if node.text]
        if runs:
            paragraphs.append("".join(runs))
    text = "\n\n".join(paragraphs)
    title = publisher = date = None
    if core is not None:

        def prop(path: str) -> str | None:
            el = core.find(path, _CORE_NS)
            return el.text if el is not None and el.text else None

        title = prop("dc:title")
        publisher = prop("dc:creator")
        date = _date10(prop("dcterms:modified") or prop("dcterms:created"))
    return Parsed(text, _page_count(text), title, date, publisher)


def parse_odf(content: bytes) -> Parsed:
    """E3 — unzip content.xml/meta.xml; body is every text node of
    content.xml space-joined with newlines dropped (odf_to_orpml.py:93-151,
    extract_odf_text); office:meta dc:title/dc:date/initial-creator."""
    if not content.startswith(_ZIP_MAGIC):
        return _fallback_decode(content)
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = set(z.namelist())
        body = ET.XML(z.read("content.xml")) if "content.xml" in names else None
        meta = ET.XML(z.read("meta.xml")) if "meta.xml" in names else None
    if body is None:
        raise ValueError("ODF container without content.xml")
    text = " ".join(body.itertext()).replace("\n", " ")
    title = publisher = date = None
    if meta is not None:
        t = meta.find(".//" + _ODF_DC + "title")
        d = meta.find(".//" + _ODF_DC + "date")
        c = meta.find(".//" + _ODF_META + "initial-creator")
        title = t.text if t is not None else None
        date = _date10(d.text if d is not None else None)
        publisher = c.text if c is not None else None
    return Parsed(text, _page_count(text), title, date, publisher)


# --- minimal DOM for the HTML selector fallback (stdlib html.parser) ---

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str | None]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node | str] = []

    def text(self) -> str:
        out: list[str] = []
        stack: list[_Node | str] = [self]
        while stack:
            cur = stack.pop()
            if isinstance(cur, str):
                out.append(cur)
            else:
                stack.extend(reversed(cur.children))
        return "".join(out)

    def find_all(self, tag: str | None = None, node_id: str | None = None):
        stack = list(reversed(self.children))
        while stack:
            cur = stack.pop()
            if isinstance(cur, str):
                continue
            if (tag is None or cur.tag == tag) and (
                node_id is None or cur.attrs.get("id") == node_id
            ):
                yield cur
            stack.extend(reversed(cur.children))

    def find(self, tag: str | None = None, node_id: str | None = None):
        return next(self.find_all(tag, node_id), None)


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _squash_ws(s: str) -> str:
    return " ".join(s.replace("\n", " ").split())


def _looks_like_html(content: bytes) -> bool:
    head = content[:512].lstrip()
    return head.startswith(b"<") and (
        b"<html" in content[:2048].lower() or b"<!doctype" in head[:64].lower()
    )


def parse_html(content: bytes) -> Parsed:
    """E4 — the reference's 3-tier selector fallback
    (html_to_orpml.py:20-67, get_title_and_text):
    1. body#contentContainer text, title from <head><title>;
    2. last <ol><li> breadcrumb as title (else <title>), text = joined
       <main> paragraph texts;
    3. same title rule, text = joined #mainContent paragraph texts.
    """
    if not _looks_like_html(content):
        return _fallback_decode(content)
    builder = _DomBuilder()
    builder.feed(content.decode("utf-8", errors="replace"))
    doc = builder.root

    title_el = doc.find("title")
    head_title = _squash_ws(title_el.text()) if title_el is not None else None
    ol = doc.find("ol")
    lis = list(ol.find_all("li")) if ol is not None else []
    breadcrumb_title = _squash_ws(lis[-1].text()) if lis else None

    # tier 1: dedicated content container
    container = doc.find(node_id="contentContainer")
    if container is not None and head_title is not None:
        text = _squash_ws(container.text())
        return Parsed(text, _page_count(text), head_title)

    # tier 2: <main> paragraphs
    main = doc.find("main")
    title = breadcrumb_title or head_title
    if main is not None and title is not None:
        text = _squash_ws(" ".join(p.text() for p in main.find_all("p")))
        return Parsed(text, _page_count(text), title)

    # tier 3: #mainContent paragraphs
    container = doc.find(node_id="mainContent")
    if container is not None and title is not None:
        text = _squash_ws(" ".join(p.text() for p in container.find_all("p")))
        return Parsed(text, _page_count(text), title)

    raise ValueError("no extractable HTML content (all selector tiers failed)")


PARSERS = {
    "PDF": parse_pdf,
    "DOCX": parse_docx,
    "ODF": parse_odf,
    "HTML": parse_html,
}


def convert_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        cols: dict[str, list] = {
            "text": [], "n_pages": [], "parse_error": [], "lossy": [],
            "meta_title": [], "meta_date": [], "meta_publisher": [],
        }

        def emit(text, pages, err, title=None, date=None, publisher=None, lossy=False):
            cols["text"].append(text)
            cols["n_pages"].append(pages)
            cols["parse_error"].append(err)
            cols["lossy"].append(lossy)
            cols["meta_title"].append(title)
            cols["meta_date"].append(date)
            cols["meta_publisher"].append(publisher)

        for content, fmt in zip(pdf["content"], pdf["document_format"]):
            parser = PARSERS.get(fmt)
            if parser is None:
                emit(None, 0, f"unsupported format: {fmt}")
                continue
            try:
                p = parser(bytes(content or b""))
                emit(p.text, p.n_pages, None, p.title, p.date, p.publisher, p.lossy)
            except PdfEncryptedError:
                emit(None, 0, PDF_ENCRYPTED_ERROR)
            except Exception as e:  # noqa: BLE001 — per-row tolerance (notebook cell 4)
                emit(None, 0, str(e)[:200])
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "document_format": pdf["document_format"],
                "text": cols["text"],
                "n_pages": pd.Series(cols["n_pages"], dtype="int64"),
                "parse_error": cols["parse_error"],
                "lossy": pd.Series(cols["lossy"], dtype="bool"),
                "meta_title": cols["meta_title"],
                "meta_date": cols["meta_date"],
                "meta_publisher": cols["meta_publisher"],
            }
        )


def convert_documents(binaries: DataFrame) -> DataFrame:
    """Dispatching converter: (media_id, document_format, content) →
    (text, n_pages, parse_error, meta_*). mapInPandas: partition-
    preserving, binary never leaves the executor, failures are rows not
    exceptions."""
    return binaries.select("media_id", "document_format", "content").mapInPandas(
        convert_batch, CONVERTED_SCHEMA
    )


def conversion_stats(converted: DataFrame) -> DataFrame:
    """The bulk job's failure accounting (SURVEY §4: count failures as a
    metric, never break the job). Distinguishes ok / lossy (CID glyph-id
    passthrough) / encrypted so operators can see extraction QUALITY,
    not just success."""
    return converted.groupBy("document_format").agg(
        F.count("*").alias("n_docs"),
        F.count("parse_error").alias("n_failures"),
        F.count(F.when(F.col("lossy"), 1)).alias("n_lossy"),
        F.count(F.when(F.col("parse_error") == PDF_ENCRYPTED_ERROR, 1)).alias(
            "n_encrypted"
        ),
        F.sum("n_pages").alias("total_pages"),
    )
