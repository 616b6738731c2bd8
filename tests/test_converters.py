"""Golden tests for the E1-E4 converter kernels on real container bytes
built in-test (zip/XML for DOCX+ODF, html for the 3-tier selector), plus
the per-row failure tolerance and stats accounting through Spark."""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from beis_orp_data_service_spark.operators import converters as conv


def _zip_bytes(entries: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


DOCX_BODY = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
  <w:body>
    <w:p><w:r><w:t>Guidance on widget </w:t></w:r><w:r><w:t>safety.</w:t></w:r></w:p>
    <w:p><w:r><w:t xml:space="preserve">Second paragraph text.</w:t></w:r></w:p>
    <w:p></w:p>
    <w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
  </w:body>
</w:document>"""

DOCX_CORE = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<cp:coreProperties
    xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
  <dc:title>Widget Safety Guidance</dc:title>
  <dc:creator>Widget Regulator</dc:creator>
  <dcterms:created xsi:type="dcterms:W3CDTF">2021-03-01T09:00:00Z</dcterms:created>
  <dcterms:modified xsi:type="dcterms:W3CDTF">2022-07-15T10:30:00Z</dcterms:modified>
</cp:coreProperties>"""


def docx_fixture() -> bytes:
    return _zip_bytes({"word/document.xml": DOCX_BODY, "docProps/core.xml": DOCX_CORE})


ODF_CONTENT = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
    xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
  <office:body><office:text>
    <text:p>Opening paragraph of the ODF.</text:p>
    <text:p>Closing
paragraph.</text:p>
  </office:text></office:body>
</office:document-content>"""

ODF_META = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-meta
    xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    xmlns:meta="urn:oasis:names:tc:opendocument:xmlns:meta:1.0"
    xmlns:dc="http://purl.org/dc/elements/1.1/">
  <office:meta>
    <dc:title>ODF Fixture Title</dc:title>
    <dc:date>2020-05-04T12:00:00Z</dc:date>
    <meta:initial-creator>ODF Author</meta:initial-creator>
  </office:meta>
</office:document-meta>"""


def odf_fixture() -> bytes:
    return _zip_bytes({"content.xml": ODF_CONTENT, "meta.xml": ODF_META})


HTML_TIER1 = b"""<!doctype html><html><head><title> Tier One Title </title></head>
<body><div id="contentContainer">Primary
   container   text.</div><main><p>ignored</p></main></body></html>"""

HTML_TIER2 = b"""<html><head><title>Head Title</title></head><body>
<ol><li>Home</li><li>Breadcrumb Leaf</li></ol>
<main><p>First para.</p><div><p>Second para.</p></div></main></body></html>"""

HTML_TIER3 = b"""<html><head><title>T3 Title</title></head><body>
<div id="mainContent"><p>Only para here.</p></div></body></html>"""

HTML_HOPELESS = b"""<html><head></head><body><div>nothing selectable</div></body></html>"""


# --- pure-kernel golden assertions -------------------------------------


def test_docx_kernel_text_and_core_properties():
    p = conv.parse_docx(docx_fixture())
    assert p.text == "Guidance on widget safety.\n\nSecond paragraph text.\n\ncell text"
    assert p.title == "Widget Safety Guidance"
    assert p.publisher == "Widget Regulator"
    assert p.date == "2022-07-15"  # modified wins over created


def test_docx_kernel_created_fallback_date():
    core = DOCX_CORE.replace(
        "<dcterms:modified xsi:type=\"dcterms:W3CDTF\">2022-07-15T10:30:00Z</dcterms:modified>",
        "",
    )
    raw = _zip_bytes({"word/document.xml": DOCX_BODY, "docProps/core.xml": core})
    assert conv.parse_docx(raw).date == "2021-03-01"


def test_odf_kernel_text_and_meta():
    p = conv.parse_odf(odf_fixture())
    assert "Opening paragraph of the ODF." in p.text
    assert "Closing paragraph." in " ".join(p.text.split())
    assert "\n" not in p.text
    assert p.title == "ODF Fixture Title"
    assert p.date == "2020-05-04"
    assert p.publisher == "ODF Author"


def test_html_tier1_content_container():
    p = conv.parse_html(HTML_TIER1)
    assert p.text == "Primary container text."
    assert p.title == "Tier One Title"


def test_html_tier2_main_paragraphs_and_breadcrumb_title():
    p = conv.parse_html(HTML_TIER2)
    assert p.text == "First para. Second para."
    assert p.title == "Breadcrumb Leaf"


def test_html_tier3_main_content():
    p = conv.parse_html(HTML_TIER3)
    assert p.text == "Only para here."
    assert p.title == "T3 Title"


def test_html_all_tiers_fail_raises():
    with pytest.raises(ValueError):
        conv.parse_html(HTML_HOPELESS)


def test_text_as_binary_fallback_all_formats():
    raw = "plain corpus text".encode()
    for fmt in ("PDF", "DOCX", "ODF"):
        assert conv.PARSERS[fmt](raw).text == "plain corpus text"
    # non-HTML bytes under HTML format also fall back
    assert conv.parse_html(raw).text == "plain corpus text"


def pdf_fixture(compress: bool) -> bytes:
    """Minimal single-page PDF with one content stream of Tj/TJ show
    operators, optionally FlateDecode-compressed — built byte-by-byte in
    the test, no library."""
    import zlib

    ops = (
        b"BT /F1 12 Tf 72 700 Td (Hello \\(PDF\\) world) Tj "
        b"[(and) -250 ( array) -250 ( text\\056)] TJ ET"
    )
    body = zlib.compress(ops) if compress else ops
    filt = b"/Filter /FlateDecode " if compress else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt
        + b"/Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body
        + b"endstream endobj\n"
        b"%%EOF\n"
    )


def test_pdf_minimal_kernel_flate_and_plain():
    for compress in (True, False):
        got = conv.parse_pdf(pdf_fixture(compress))
        assert "Hello (PDF) world" in got.text
        assert "and array text." in got.text.replace("\n", "")
        assert got.n_pages == 1


def test_pdf_without_text_streams_is_an_error():
    with pytest.raises(ValueError):
        conv.parse_pdf(b"%PDF-1.7 no streams here")


def pdf_cid_fixture() -> bytes:
    """Single-page PDF in the subset-embedded-font layout: a Type0 font
    with a FlateDecode ToUnicode CMap (bfchar + bfrange), text shown as
    2-byte-code hex strings — plus a second plain font shown as a
    literal string. Built byte-by-byte in the test, no library."""
    import zlib

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0048> <0048>\n<0065> <0065>\nendbfchar\n"
        b"1 beginbfrange\n<006C> <006F> <006C>\nendbfrange\n"
        b"endcmap\nend\nend\n"
    )
    cmap_z = zlib.compress(cmap)
    # F1 (CID, hex codes): 0048 0065 006C = "Hel", TJ array <006C> <006F>
    # with kerning = "lo"; F2 (simple font, literal) = " world"
    ops = (
        b"BT /F1 12 Tf 72 700 Td <00480065006C> Tj "
        b"[<006C> -250 <006F>] TJ "
        b"/F2 12 Tf ( world) Tj ET"
    )
    ops_z = zlib.compress(ops)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F1 4 0 R /F2 6 0 R >> >> "
        b"/Contents 5 0 R >> endobj\n"
        b"4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-Subset "
        b"/ToUnicode 7 0 R >> endobj\n"
        b"6 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"5 0 obj << /Filter /FlateDecode /Length "
        + str(len(ops_z)).encode() + b" >>\nstream\n" + ops_z + b"endstream endobj\n"
        b"7 0 obj << /Filter /FlateDecode /Length "
        + str(len(cmap_z)).encode() + b" >>\nstream\n" + cmap_z + b"endstream endobj\n"
        b"%%EOF\n"
    )


def test_pdf_hex_strings_with_tounicode_cmap():
    got = conv.parse_pdf(pdf_cid_fixture())
    assert got.text.replace("\n", "") == "Hello world"
    assert got.n_pages == 1


def test_pdf_hex_tj_without_cmap_is_latin1():
    # hex show operators in a font with no ToUnicode map decode as raw
    # latin-1 bytes (the pre-CMap behavior, now reachable for hex too)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"2 0 obj << /Length 29 >>\nstream\n"
        b"BT <48692068657821> Tj ET\nendstream endobj\n"
        b"%%EOF\n"
    )
    got = conv.parse_pdf(pdf)
    assert got.text.strip() == "Hi hex!"


def pdf_identity_h_fixture() -> bytes:
    """Single-page PDF with a Type0 /Identity-H font and NO ToUnicode
    CMap — the commonest real-world extraction gap (subset-embedded CID
    fonts). A second simple font shows a literal string so the mixed
    case is covered. Built byte-by-byte, no library."""
    import zlib

    # F1 (Identity-H, no CMap): glyph ids 72, 101 → "(cid:72)(cid:101)";
    # F2 (simple) shows " readable"
    ops = (
        b"BT /F1 12 Tf 72 700 Td <00480065> Tj "
        b"/F2 12 Tf ( readable) Tj ET"
    )
    ops_z = zlib.compress(ops)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F1 4 0 R /F2 6 0 R >> >> "
        b"/Contents 5 0 R >> endobj\n"
        b"4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-CID "
        b"/Encoding /Identity-H >> endobj\n"
        b"6 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"5 0 obj << /Filter /FlateDecode /Length "
        + str(len(ops_z)).encode() + b" >>\nstream\n" + ops_z + b"endstream endobj\n"
        b"%%EOF\n"
    )


def pdf_encrypted_fixture() -> bytes:
    """PDF whose trailer references an /Encrypt dictionary — content
    streams are ciphertext, extraction must fail TYPED (not garbage)."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"5 0 obj << /Filter /Standard /V 2 /R 3 /O <aa> /U <bb> /P -44 >> endobj\n"
        b"2 0 obj << /Length 20 >>\nstream\n"
        b"\x8f\x3a\xb1\xc4 cipher \x02\x7f\nendstream endobj\n"
        b"trailer << /Size 6 /Encrypt 5 0 R /Root 1 0 R >>\n"
        b"%%EOF\n"
    )


def test_pdf_identity_h_without_cmap_is_lossy_passthrough():
    got = conv.parse_pdf(pdf_identity_h_fixture())
    assert got.lossy is True
    assert "(cid:72)(cid:101)" in got.text
    assert " readable" in got.text
    assert got.n_pages == 1


def test_pdf_with_tounicode_cmap_is_not_lossy():
    got = conv.parse_pdf(pdf_cid_fixture())
    assert got.lossy is False


def test_pdf_encrypted_raises_typed():
    with pytest.raises(conv.PdfEncryptedError):
        conv.parse_pdf(pdf_encrypted_fixture())


def test_pdf_mentioning_encrypt_in_content_not_misclassified():
    """A readable PDF whose TEXT talks about '/Encrypt 5 0 R' (e.g. a
    document about PDF internals) must extract normally — detection is
    scoped to trailer dictionaries, not the whole byte stream."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"2 0 obj << /Length 53 >>\nstream\n"
        b"BT (the /Encrypt 5 0 R key marks encryption) Tj ET\nendstream endobj\n"
        b"%%EOF\n"
    )
    got = conv.parse_pdf(pdf)
    assert "/Encrypt 5 0 R key marks encryption" in got.text


def test_pdf_encrypted_tight_trailer_serialization():
    # '/Encrypt<<' with no whitespace is valid PDF syntax
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"trailer << /Size 2 /Encrypt<</Filter/Standard/V 2>> /Root 1 0 R >>\n"
        b"%%EOF\n"
    )
    with pytest.raises(conv.PdfEncryptedError):
        conv.parse_pdf(pdf)


def test_rc4_known_vector():
    # classic RC4 test vector: key "Key", plaintext "Plaintext"
    got = conv._rc4(b"Key", b"Plaintext")
    assert got.hex() == "bbf316e8d940af0ad3"
    assert conv._rc4(b"Key", got) == b"Plaintext"  # symmetric


def test_aes128_decrypt_fips197_vector():
    # FIPS-197 appendix C.1: the inverse cipher must invert the spec's
    # single-block example exactly
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rks = conv._aes128_expand_key(key)
    assert conv._aes128_decrypt_block(rks, ct).hex() == (
        "00112233445566778899aabbccddeeff"
    )


def _aes_cbc_encrypt_for_test(key: bytes, iv: bytes, padded: bytes) -> bytes:
    """Forward AES-128-CBC written independently in the test (only the
    module's S-box table is shared) — mutual consistency with the
    module's inverse cipher plus the FIPS vector pins both."""
    def gmul2(a):
        return ((a << 1) ^ (0x1B if a & 0x80 else 0)) & 0xFF

    rks = conv._aes128_expand_key(key)

    def enc_block(b):
        s = [x ^ k for x, k in zip(b, rks[0])]
        for rnd in range(1, 10):
            s = [conv._AES_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)]
            ns = [0] * 16
            for c in range(0, 16, 4):
                a = s[c : c + 4]
                for j in range(4):
                    x, y = a[j], a[(j + 1) % 4]
                    ns[c + j] = gmul2(x) ^ gmul2(y) ^ y ^ a[(j + 2) % 4] ^ a[(j + 3) % 4]
            s = [x ^ k for x, k in zip(ns, rks[rnd])]
        s = [conv._AES_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)]
        return bytes(x ^ k for x, k in zip(s, rks[10]))

    out, prev = bytearray(), iv
    for off in range(0, len(padded), 16):
        blk = bytes(a ^ b for a, b in zip(padded[off : off + 16], prev))
        prev = enc_block(blk)
        out += prev
    return bytes(out)


def test_aes_cbc_roundtrip():
    key = bytes(range(16))
    iv = bytes(range(100, 116))
    msg = b"regulator pdf stream bytes!"  # 27 bytes -> 5 bytes padding
    pad = 16 - len(msg) % 16
    ct = iv + _aes_cbc_encrypt_for_test(key, iv, msg + bytes([pad]) * pad)
    assert conv._aes_cbc_decrypt(key, ct) == msg


def pdf_empty_password_fixture(
    r: int = 3, length: int = 128, aes: bool = False, wrong_password: bool = False
) -> bytes:
    """Standard-security-handler PDF encrypted with the EMPTY user
    password (owner-password-only — the common regulator upload). The
    builder computes the file key per Algorithm 2 and /U per Algorithm
    4/5 inline (hashlib only), encrypts the Flate content stream with
    the per-object key, and emits the /Encrypt dict + trailer /ID."""
    import hashlib
    import struct
    import zlib

    ops = b"BT /F1 12 Tf 72 700 Td (Secret regulator text) Tj ET"
    body_plain = zlib.compress(ops)
    o = bytes(range(32))
    p = -44
    id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
    key_len = 5 if r == 2 else length // 8
    key = hashlib.md5(
        conv._PDF_PAD + o + struct.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    key = key[:key_len]
    if r == 2:
        u = conv._rc4(key, conv._PDF_PAD)
    else:
        x = hashlib.md5(conv._PDF_PAD + id0).digest()
        x = conv._rc4(key, x)
        for i in range(1, 20):
            x = conv._rc4(bytes(b ^ i for b in key), x)
        u = x + bytes(16)
    if wrong_password:
        u = bytes(32)
    okey = conv._pdf_object_key(key, 4, 0, aes)
    if aes:
        iv = bytes(range(16))
        pad = 16 - len(body_plain) % 16
        body = iv + _aes_cbc_encrypt_for_test(
            okey, iv, body_plain + bytes([pad]) * pad
        )
    else:
        body = conv._rc4(okey, body_plain)
    if aes:
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44"
            b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>"
        )
    else:
        enc_dict = (
            b"<< /Filter /Standard /V 2 /R " + str(r).encode()
            + b" /Length " + str(length).encode() + b" /P -44"
            b" /O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>"
        )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode() + b" >>\nstream\n"
        + body
        + b"\nendstream endobj\n"
        b"5 0 obj " + enc_dict + b" endobj\n"
        b"trailer << /Size 6 /Root 1 0 R /Encrypt 5 0 R"
        b" /ID [<" + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] >>\n"
        b"startxref\n0\n"
        b"%%EOF\n"
    )


def test_pdf_empty_password_rc4_r3_decrypts():
    got = conv.parse_pdf(pdf_empty_password_fixture(r=3, length=128))
    assert "Secret regulator text" in got.text
    assert got.lossy is False


def test_pdf_empty_password_rc4_r2_40bit_decrypts():
    got = conv.parse_pdf(pdf_empty_password_fixture(r=2, length=40))
    assert "Secret regulator text" in got.text


def test_pdf_empty_password_aesv2_decrypts():
    got = conv.parse_pdf(pdf_empty_password_fixture(aes=True))
    assert "Secret regulator text" in got.text


def test_pdf_real_password_stays_typed_encrypted():
    # /U does not verify against the empty password -> a REAL user
    # password protects the document; must stay the typed row, never
    # emit ciphertext garbage
    with pytest.raises(conv.PdfEncryptedError):
        conv.parse_pdf(pdf_empty_password_fixture(wrong_password=True))


def test_convert_stats_empty_password_moves_encrypted_to_ok(spark):
    rows = [
        (1, "PDF", bytearray(pdf_empty_password_fixture(r=3))),
        (2, "PDF", bytearray(pdf_empty_password_fixture(aes=True))),
        (3, "PDF", bytearray(pdf_empty_password_fixture(wrong_password=True))),
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, document_format string, content binary"
    )
    out = {r.media_id: r for r in conv.convert_documents(df).collect()}
    assert out[1].parse_error is None and "Secret" in out[1].text
    assert out[2].parse_error is None and "Secret" in out[2].text
    assert out[3].parse_error == conv.PDF_ENCRYPTED_ERROR
    stats = conv.conversion_stats(conv.convert_documents(df)).collect()[0]
    assert stats.n_encrypted == 1


def test_convert_stats_distinguish_ok_lossy_encrypted(spark):
    rows = [
        (1, "PDF", bytearray(pdf_fixture(True))),            # ok
        (2, "PDF", bytearray(pdf_identity_h_fixture())),     # lossy
        (3, "PDF", bytearray(pdf_encrypted_fixture())),      # encrypted
        (4, "PDF", bytearray(b"%PDF-1.7 no streams here")),  # plain failure
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, document_format string, content binary"
    )
    out = {r.media_id: r for r in conv.convert_documents(df).collect()}
    assert out[1].parse_error is None and out[1].lossy is False
    assert out[2].parse_error is None and out[2].lossy is True
    assert out[3].parse_error == conv.PDF_ENCRYPTED_ERROR
    assert out[4].parse_error is not None and out[4].parse_error != "encrypted"
    stats = conv.conversion_stats(conv.convert_documents(df)).collect()[0]
    assert stats.n_docs == 4
    assert stats.n_failures == 2   # encrypted + plain failure
    assert stats.n_lossy == 1
    assert stats.n_encrypted == 1


def test_corrupt_zip_raises():
    with pytest.raises(Exception):
        conv.parse_docx(b"PK\x03\x04 this is not a zip")


# --- Spark-side dispatch, tolerance, stats -----------------------------


def test_convert_documents_mixed_batch(spark):
    rows = [
        (1, "DOCX", bytearray(docx_fixture())),
        (2, "ODF", bytearray(odf_fixture())),
        (3, "HTML", bytearray(HTML_TIER2)),
        (4, "PDF", bytearray(b"%PDF-1.4 real pdf")),          # error row
        (5, "DOCX", bytearray(b"PK\x03\x04broken")),           # error row
        (6, "EPUB", bytearray(b"whatever")),                   # unsupported
        (7, "PDF", bytearray("fallback text".encode())),       # fallback
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, document_format string, content binary"
    )
    out = {r.media_id: r for r in conv.convert_documents(df).collect()}
    assert out[1].text.startswith("Guidance on widget safety.")
    assert out[1].meta_title == "Widget Safety Guidance"
    assert out[1].meta_date == "2022-07-15"
    assert out[2].meta_publisher == "ODF Author"
    assert out[3].text == "First para. Second para."
    assert out[3].meta_title == "Breadcrumb Leaf"
    for bad in (4, 5, 6):
        assert out[bad].text is None
        assert out[bad].parse_error is not None
        assert out[bad].n_pages == 0
    assert out[7].text == "fallback text"

    stats = {
        r.document_format: r
        for r in conv.conversion_stats(conv.convert_documents(df)).collect()
    }
    assert stats["PDF"].n_docs == 2 and stats["PDF"].n_failures == 1
    assert stats["DOCX"].n_docs == 2 and stats["DOCX"].n_failures == 1
    assert stats["EPUB"].n_failures == 1
    assert stats["HTML"].n_failures == 0


def test_pdf_quote_only_show_operators():
    """A stream whose only show operators are ' / \" must pass the
    stream pre-filter and extract (regression: the Tj/TJ-only filter
    skipped it)."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"2 0 obj << /Length 40 >>\nstream\n"
        b"BT (line one) ' (line two) ' ET\nendstream endobj\n"
        b"%%EOF\n"
    )
    got = conv.parse_pdf(pdf)
    assert "line one" in got.text and "line two" in got.text


def test_pdf_encrypted_xref_stream_detected():
    """PDF 1.5+ encrypted files have no 'trailer' keyword — /Encrypt
    lives in the xref-STREAM dictionary (/Type /XRef)."""
    pdf = (
        b"%PDF-1.5\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"7 0 obj << /Type /XRef /Size 8 /W [1 2 1] /Encrypt 5 0 R "
        b"/Root 1 0 R /Length 4 >>\nstream\n\x00\x01\x02\x03\nendstream endobj\n"
        b"startxref\n9\n%%EOF\n"
    )
    with pytest.raises(conv.PdfEncryptedError):
        conv.parse_pdf(pdf)


def test_pdf_encrypted_after_nested_dict_in_trailer():
    # a '>>' token BEFORE the /Encrypt key (nested dict value) must not
    # hide it — the detection window runs to startxref, not first '>>'
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        b"trailer << /Info << /Title (x) >> /Encrypt 5 0 R /Root 1 0 R >>\n"
        b"startxref\n9\n%%EOF\n"
    )
    with pytest.raises(conv.PdfEncryptedError):
        conv.parse_pdf(pdf)
