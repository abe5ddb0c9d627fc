"""Pure-byte PDF text extraction (sources/pdf_pure.py) pinned against
independently-built PDFs — catalog/page-tree layouts, FlateDecode and
ObjStm object streams, literal/hex strings with escapes, indirect and
broken /Length fields, trailer metadata — plus the honest-None gates
(encryption, unsupported filters, non-PDF bytes).

Reference tie-in: this kernel is the in-container counterpart of the
reference's core fitz loop (data_ingestion.py:110-135)."""

from __future__ import annotations

import zlib

from data_ingestion_py_spark.sources import pdf as pdf_mod
from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text


def _obj(num: int, body: bytes) -> bytes:
    return f"{num} 0 obj\n".encode() + body + b"\nendobj\n"


def _stream_obj(
    num: int,
    data: bytes,
    extra: str = "",
    compress: bool = False,
    length=None,
) -> bytes:
    if compress:
        data = zlib.compress(data)
        extra += " /Filter /FlateDecode"
    ln = len(data) if length is None else length
    d = f"<< /Length {ln}{extra} >>".encode()
    return (
        f"{num} 0 obj\n".encode() + d + b"\nstream\n" + data
        + b"\nendstream\nendobj\n"
    )


def _basic_pdf(
    contents: list[bytes],
    compress: bool = False,
    info: bytes | None = None,
    length=None,
) -> bytes:
    """One page per content stream, classic trailer."""
    n = len(contents)
    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    out = b"%PDF-1.7\n"
    out += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    out += _obj(
        2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for i in range(n):
        out += _obj(
            3 + i,
            f"<< /Type /Page /Parent 2 0 R /Contents {3 + n + i} 0 R >>".encode(),
        )
    for i, c in enumerate(contents):
        out += _stream_obj(3 + n + i, c, compress=compress, length=length)
    trailer = b"<< /Size 99 /Root 1 0 R"
    if info is not None:
        out += _obj(50, info)
        trailer += b" /Info 50 0 R"
    out += b"trailer\n" + trailer + b" >>\nstartxref\n0\n%%EOF"
    return out


def test_pdf_text_operators_and_layout_rule():
    pdf = _basic_pdf(
        [
            b"BT /F1 12 Tf (Hello, ) Tj (world) Tj T* (line two) Tj ET",
            b"BT [(Sp) -120 (lit ) 30 (TJ)] TJ T* (after star) ' ET",
        ]
    )
    pages, meta = parse_pdf_text(pdf)
    assert pages == ["Hello, world\nline two", "Split TJ\nafter star"]
    # hex strings, escapes (octal, specials, nested parens, continuation)
    pdf = _basic_pdf(
        [
            rb"BT <48692121> Tj (a\(b\)c) Tj (oct\101) Tj (cont\
inued) Tj ET",
        ]
    )
    pages, _ = parse_pdf_text(pdf)
    assert pages == ["Hi!!a(b)coctAcontinued"]


def test_pdf_flate_objstm_and_length_quirks():
    # FlateDecode content stream
    pages, _ = parse_pdf_text(
        _basic_pdf([b"BT (zipped) Tj ET"], compress=True)
    )
    assert pages == ["zipped"]
    # broken /Length (off by a lot): endstream-scan fallback
    pages, _ = parse_pdf_text(
        _basic_pdf([b"BT (scan me) Tj ET"], length=3)
    )
    assert pages == ["scan me"]
    # ObjStm: catalog/pages/page dicts inside a compressed object
    # stream, xref-stream style (no classic trailer at all)
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    o3 = b"<< /Type /Page /Contents 5 0 R >>"
    header = f"1 0 2 {len(o1) + 1} 3 {len(o1) + len(o2) + 2} ".encode()
    data = header + o1 + b" " + o2 + b" " + o3
    pdf = b"%PDF-1.7\n"
    pdf += _stream_obj(
        8, data, extra=f" /Type /ObjStm /N 3 /First {len(header)}",
        compress=True,
    )
    pdf += _stream_obj(5, b"BT (from objstm) Tj ET")
    pdf += b"%%EOF"
    pages, _ = parse_pdf_text(pdf)
    assert pages == ["from objstm"]


def test_pdf_metadata_and_multilevel_tree():
    info = b"<< /Title (My Doc) /Author <FEFF00C91074> >>"
    pdf = _basic_pdf([b"BT (x) Tj ET"], info=info)
    _, meta = parse_pdf_text(pdf)
    assert meta["Title"] == "My Doc"
    assert meta["Author"] == "Éၴ"  # UTF-16BE with BOM
    # nested Pages nodes flatten in order
    out = b"%PDF-1.7\n"
    out += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    out += _obj(2, b"<< /Type /Pages /Kids [10 0 R 4 0 R] /Count 2 >>")
    out += _obj(10, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    out += _obj(3, b"<< /Type /Page /Contents 5 0 R >>")
    out += _obj(4, b"<< /Type /Page /Contents 6 0 R >>")
    out += _stream_obj(5, b"BT (first) Tj ET")
    out += _stream_obj(6, b"BT (second) Tj ET")
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    pages, _ = parse_pdf_text(out)
    assert pages == ["first", "second"]


def test_pdf_honest_nones_and_guards():
    good = _basic_pdf([b"BT (x) Tj ET"])
    assert parse_pdf_text(b"not a pdf") is None
    assert parse_pdf_text(b"%PDF-1.7\njunk only") is None
    # encryption: refuse rather than emit garbage
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    assert parse_pdf_text(enc) is None
    # unsupported filter on the content stream -> page decodes empty,
    # never invented text
    lzw = _basic_pdf([b"BT (x) Tj ET"]).replace(
        b" >>\nstream", b" /Filter /LZWDecode >>\nstream"
    )
    assert b"LZWDecode" in lzw
    pages, _ = parse_pdf_text(lzw)
    assert pages == [""]
    # a deflate bomb in a content stream is length-capped, not decoded
    bomb = zlib.compress(b"(A) Tj " * 12_000_000)  # 84 MB > the 64 MB cap
    pdf = b"%PDF-1.7\n"
    pdf += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    pdf += _obj(3, b"<< /Type /Page /Contents 5 0 R >>")
    pdf += (
        b"5 0 obj\n"
        + f"<< /Length {len(bomb)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + bomb + b"\nendstream\nendobj\n"
    )
    pdf += b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    pages, _ = parse_pdf_text(pdf)
    assert pages == [""]
    # crafted deep nesting can't recurse unboundedly
    deep = b"%PDF-1.7\n" + _obj(1, b"[" * 500 + b"]" * 500)
    assert parse_pdf_text(deep) is None


def test_extract_pages_routes_through_pure_parser(spark):
    pdf = _basic_pdf(
        [b"BT (page one) Tj ET", b"BT (page two) Tj ET"],
        info=b"<< /Title (T) >>",
    )
    df = spark.createDataFrame(
        [("mem://a.pdf", bytearray(pdf)), ("mem://b.txt", bytearray(b"plain\ftext"))],
        "path string, content binary",
    )
    rows = {
        (r.document_name, r.page_number): r
        for r in pdf_mod.extract_pages(df).collect()
    }
    assert rows[("a.pdf", 1)].page_text == "page one"
    assert rows[("a.pdf", 2)].page_text == "page two"
    assert rows[("a.pdf", 1)].document_metadata["extractor"] == "pure-byte"
    assert rows[("a.pdf", 1)].document_metadata["Title"] == "T"
    assert not rows[("a.pdf", 1)].needs_ocr
    # non-PDF payloads keep the documented UTF-8 fallback
    assert rows[("b.txt", 2)].page_text == "text"
    assert rows[("b.txt", 1)].document_metadata["extractor"] == "fallback-utf8"


def test_lzwdecode_content_stream():
    """LZWDecode content streams (r12): the MSB-first early-change LZW
    kernel shared with TIFF Compression 5 decodes PDF text streams;
    EarlyChange 0 honored via DecodeParms; predictors stay the honest
    seam."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sources import _lzw_msb_encode

    content = b"BT (lzw says hi) Tj T* (line two) Tj ET"
    enc = _lzw_msb_encode(content)
    pdf = (
        b"%PDF-1.7\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
        + _stream_obj(4, enc, extra=" /Filter /LZWDecode")
        + b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    )
    pages, _meta = parse_pdf_text(pdf)
    assert pages == ["lzw says hi\nline two"]

    # EarlyChange 0
    enc0 = _lzw_msb_encode(content, early_change=False)
    pdf0 = pdf.replace(
        b"/Filter /LZWDecode",
        b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
    ).replace(enc, enc0)
    pages0, _ = parse_pdf_text(pdf0)
    assert pages0 == ["lzw says hi\nline two"]

    # r14: predictors now DECODE (Predictor 2 with the default
    # Columns 1 is the identity transform per §7.4.4.4) ...
    pdfp = pdf.replace(
        b"/Filter /LZWDecode",
        b"/Filter /LZWDecode /DecodeParms << /Predictor 2 >>",
    )
    pagesp, _ = parse_pdf_text(pdfp)
    assert pagesp == ["lzw says hi\nline two"]
    # ... while the genuinely unsupported sub-byte TIFF-predictor
    # shape stays an honest refusal
    pdfq = pdf.replace(
        b"/Filter /LZWDecode",
        b"/Filter /LZWDecode /DecodeParms << /Predictor 2"
        b" /BitsPerComponent 4 >>",
    )
    pagesq, _ = parse_pdf_text(pdfq)
    assert pagesq == [""]


def test_filter_chains_runlength_ascii_armor():
    """r12: ASCII armor filters + chains — ASCII85 (pinned against
    stdlib base64.a85encode, incl. 'z' groups and partial tails),
    ASCIIHex (odd-digit pad, EOD required), RunLengthDecode (PackBits
    with EOD 128), and 2-element chains armor→binary. Undecodable or
    unsupported links break the chain to the honest empty page."""
    import base64
    import zlib

    content = b"BT (armored text) Tj T* (second line) Tj ET"

    def pdf_with(stream: bytes, filt: bytes) -> bytes:
        return (
            b"%PDF-1.7\n"
            + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
            + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
            + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
            + _stream_obj(4, stream, extra=b" /Filter ".decode() + filt.decode())
            + b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
        )

    want = ["armored text\nsecond line"]
    # ASCII85 alone (stdlib encoder), with embedded whitespace + zeros
    padded = content + b"\x00\x00\x00\x00\x00"  # exercises a 'z' group
    a85 = base64.a85encode(padded)
    a85 = a85[:10] + b"\n  " + a85[10:] + b"~>"
    pages, _ = parse_pdf_text(pdf_with(a85, b"/ASCII85Decode"))
    assert pages == ["armored text\nsecond line"]
    # ASCII85 -> Flate chain
    a85f = base64.a85encode(zlib.compress(content)) + b"~>"
    pages, _ = parse_pdf_text(
        pdf_with(a85f, b"[/ASCII85Decode /FlateDecode]")
    )
    assert pages == want
    # ASCIIHex -> RunLength chain (odd-digit hex pad exercised)
    def rle(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            j = i
            while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
                j += 1
            if j > i:
                out += bytes([257 - (j - i + 1), data[i]])
                i = j + 1
            else:
                out += bytes([0, data[i]])
                i += 1
        out.append(128)
        return bytes(out)

    hexed = rle(content).hex().encode() + b">"
    pages, _ = parse_pdf_text(
        pdf_with(hexed, b"[/ASCIIHexDecode /RunLengthDecode]")
    )
    assert pages == want
    # torn RunLength (no EOD) → empty page, never a crash
    pages, _ = parse_pdf_text(pdf_with(rle(content)[:-1], b"/RunLengthDecode"))
    assert pages == [""]
    # bad ASCII85 char and missing EOD → empty page
    pages, _ = parse_pdf_text(pdf_with(b"\x80bad~>", b"/ASCII85Decode"))
    assert pages == [""]
    pages, _ = parse_pdf_text(pdf_with(b"9jqo", b"/ASCII85Decode"))
    assert pages == [""]
    # unsupported link in a chain → empty page
    pages, _ = parse_pdf_text(
        pdf_with(a85f, b"[/ASCII85Decode /DCTDecode]")
    )
    assert pages == [""]


def test_type0_identity_h_tounicode_text():
    """r13: 2-byte Type0/Identity-H show strings decode through the
    font's ToUnicode CMap (bfchar, offset-form bfrange, array-form
    bfrange incl. a multi-char destination); simple and CID fonts mix
    on one page via Tf tracking; a Type0 font WITHOUT ToUnicode
    contributes no text (honest — codes are glyph ids); unmapped codes
    surface as U+FFFD, never vanish."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        _parse_tounicode,
        parse_pdf_text,
    )

    cmap_body = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n"
        b"1 beginbfrange\n<E100> <E102> [<0058> <0059005A> <005A>]\n"
        b"endbfrange\n"
        b"2 beginbfchar\n<E000> <0023>\n<E001> <0040>\nendbfchar\n"
        b"endcmap end"
    )
    m = _parse_tounicode(cmap_body)
    assert m[0x20] == " " and m[0x41] == "A" and m[0x7E] == "~"
    assert m[0xE000] == "#" and m[0xE001] == "@"
    assert m[0xE100] == "X" and m[0xE101] == "YZ" and m[0xE102] == "Z"
    # torn sections and odd token counts refuse the whole cmap
    assert _parse_tounicode(b"1 beginbfchar <0041> <0042>") is None
    assert _parse_tounicode(
        b"1 beginbfchar <0041> endbfchar"
    ) is None

    def pdf(with_tounicode: bool, codes_hex: str) -> bytes:
        c = (
            b"BT /F1 12 Tf (plain) Tj T* /F2 12 Tf <"
            + codes_hex.encode() + b"> Tj ET"
        )
        tu = b" /ToUnicode 5 0 R" if with_tounicode else b""
        parts = [b"%PDF-1.7\n"]
        parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        parts.append(
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        )
        parts.append(
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 6 0 R /F2 7 0 R >> >> /Contents 4 0 R "
            b">>\nendobj\n"
        )
        parts.append(
            b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c)
            + c + b"\nendstream\nendobj\n"
        )
        parts.append(
            b"5 0 obj\n<< /Length %d >>\nstream\n" % len(cmap_body)
            + cmap_body + b"\nendstream\nendobj\n"
        )
        parts.append(
            b"6 0 obj\n<< /Type /Font /Subtype /Type1 >>\nendobj\n"
        )
        parts.append(
            b"7 0 obj\n<< /Type /Font /Subtype /Type0 /Encoding "
            b"/Identity-H" + tu + b" >>\nendobj\n"
        )
        parts.append(
            b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
        )
        return b"".join(parts)

    codes = "".join(f"{ord(ch):04X}" for ch in "Hi 42") + "E000E101"
    pages, _meta = parse_pdf_text(pdf(True, codes))
    assert pages == ["plain\nHi 42#YZ"]
    # unmapped code -> U+FFFD (visible, not dropped)
    pages2, _ = parse_pdf_text(pdf(True, "F0F0"))
    assert pages2 == ["plain\n�"]
    # no ToUnicode: the CID line yields nothing, the simple line stays
    pages3, _ = parse_pdf_text(pdf(False, codes))
    assert pages3 == ["plain"]


def _std_encrypt_keys(owner_pw, user_pw, p, id0, r, nbytes):
    """Independent standard-security ENCRYPTER for the tests
    (PDF 32000-1 Algorithms 2/3/4/5) — shares only _rc4/_PW_PAD
    primitives with the decoder under test."""
    import hashlib

    from data_ingestion_py_spark.sources.pdf_pure import _PW_PAD, _rc4

    md5 = lambda b: hashlib.md5(b).digest()  # noqa: E731
    h = md5((owner_pw + _PW_PAD)[:32])
    if r >= 3:
        for _ in range(50):
            h = md5(h[:nbytes])
    okey = h[:nbytes]
    o = _rc4(okey, (user_pw + _PW_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    h = md5(
        (user_pw + _PW_PAD)[:32] + o
        + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    )
    if r >= 3:
        for _ in range(50):
            h = md5(h[:nbytes])
    key = h[:nbytes]
    if r == 2:
        u = _rc4(key, _PW_PAD)
    else:
        u = _rc4(key, md5(_PW_PAD + id0))
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u += b"\x00" * 16
    return o, u, key


def _rc4_objkey(key, num, gen=0):
    import hashlib

    return hashlib.md5(
        key + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    ).digest()[: min(len(key) + 5, 16)]


def _encrypted_pdf(r=2, nbytes=5, user_pw=b"", deflate=False,
                   filt_name=b"/Standard", omit_length=False):
    import zlib

    from data_ingestion_py_spark.sources.pdf_pure import _rc4

    p = -44
    id0 = bytes(range(16))
    o, u, key = _std_encrypt_keys(b"owner-secret", user_pw, p, id0, r, nbytes)
    content = b"BT /F1 12 Tf (Secret 123456) Tj ET"
    stored, filt = (
        (zlib.compress(content), b" /Filter /FlateDecode")
        if deflate else (content, b"")
    )
    c_enc = _rc4(_rc4_objkey(key, 4), stored)
    title = _rc4(_rc4_objkey(key, 8), b"Locked Doc")
    hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
    parts = [b"%PDF-1.7\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Length %d%s >>\nstream\n" % (len(c_enc), filt)
        + c_enc + b"\nendstream\nendobj\n"
    )
    v = 1 if r == 2 else 2
    lenfld = (
        b"" if r == 2 or omit_length else b" /Length %d" % (nbytes * 8)
    )
    parts.append(
        b"5 0 obj\n<< /Filter " + filt_name
        + b" /V %d /R %d%s /O " % (v, r, lenfld) + hx(o)
        + b" /U " + hx(u) + b" /P %d >>\nendobj\n" % p
    )
    parts.append(b"8 0 obj\n<< /Title " + hx(title) + b" >>\nendobj\n")
    parts.append(
        b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R /Encrypt 5 0 R"
        b" /ID [" + hx(id0) + b" " + hx(id0) + b"] >>\nstartxref\n0\n%%EOF"
    )
    return b"".join(parts)


def test_rc4_encrypted_pdf_decrypts_with_empty_user_password():
    """r13: the /Encrypt refusal narrowed to what is genuinely
    unreadable — V1/V2 R2/R3 standard security with an EMPTY user
    password (the owner-locked-but-readable shape most encrypted PDFs
    have) now decrypts: file key from O/P/ID (Algorithm 2, incl. the
    R3 50-fold MD5), /U verification (Algorithms 4/5), per-object RC4
    of streams AND Info strings, composing with FlateDecode."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

    for r, nb, defl in ((2, 5, False), (3, 16, False), (3, 16, True),
                        (3, 5, False)):
        got = parse_pdf_text(_encrypted_pdf(r=r, nbytes=nb, deflate=defl))
        assert got is not None, (r, nb, defl)
        pages, meta = got
        assert pages == ["Secret 123456"], (r, nb, defl)
        assert meta.get("Title") == "Locked Doc"


def test_r3_omitted_length_defaults_resolve_by_u_verification():
    """r14 (advisor): /Length defaults to 40 for EVERY revision (PDF
    32000-1 Table 20), so an R3/V2 document that omits /Length and
    uses a 40-bit key must still verify and decrypt — as must the
    (far more common) 128-bit-without-/Length shape; /U verification
    disambiguates, never a guess that emits RC4 noise."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

    for nb in (5, 16):  # 40-bit and 128-bit keys, both sans /Length
        got = parse_pdf_text(
            _encrypted_pdf(r=3, nbytes=nb, omit_length=True)
        )
        assert got is not None, nb
        pages, meta = got
        assert pages == ["Secret 123456"], nb
        assert meta.get("Title") == "Locked Doc"


def test_bfrange_offset_form_non_bmp_and_ligature_destinations():
    """r14 (advisor): offset-form bfrange destinations are UTF-16BE
    strings whose LAST code unit increments (PDF 32000 §9.10.3) — a
    surrogate-pair dstStart (non-BMP math alphanumerics) or a
    multi-char ligature destination must map correctly, never raise
    out of parse_pdf_text; a range that overflows the last code unit
    keeps its in-range prefix."""
    from data_ingestion_py_spark.sources.pdf_pure import _parse_tounicode

    m = _parse_tounicode(
        b"1 beginbfrange\n<0001> <0003> <D835DC00>\nendbfrange"
    )
    # U+1D400 MATHEMATICAL BOLD CAPITAL A, then B, then C
    assert m[1] == "\U0001d400"
    assert m[2] == "\U0001d401"
    assert m[3] == "\U0001d402"
    m = _parse_tounicode(
        b"1 beginbfrange\n<0010> <0011> <00660066>\nendbfrange"
    )
    assert m[0x10] == "ff" and m[0x11] == "fg"
    # last-code-unit overflow: keep the representable prefix
    m = _parse_tounicode(
        b"1 beginbfrange\n<0001> <0003> <FFFE>\nendbfrange"
    )
    assert m == {1: "￾", 2: "￿"}


def test_encrypted_pdf_honest_refusals():
    """A REAL user password, a non-standard handler, or a mangled /U
    must refuse the whole document (None) — never RC4 noise as text."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

    assert parse_pdf_text(_encrypted_pdf(user_pw=b"real-pw")) is None
    assert parse_pdf_text(
        _encrypted_pdf(filt_name=b"/MyCustomSecurity")
    ) is None
    pdf = _encrypted_pdf()
    o_at = pdf.find(b"/U <") + 4
    bad = pdf[:o_at] + b"00" + pdf[o_at + 2 :]
    assert parse_pdf_text(bad) is None


def _aes_enc_block(rks, b):
    """Independent FORWARD AES-128 (the decoder under test only
    implements the inverse cipher)."""
    from data_ingestion_py_spark.sources.pdf_pure import _AES_SBOX

    def xt(a):
        a <<= 1
        return (a ^ 0x1B) & 0xFF if a & 0x100 else a

    s = bytes(x ^ y for x, y in zip(b, rks[0]))
    for r in range(1, len(rks) - 1):
        s = bytes(_AES_SBOX[x] for x in s)
        s = bytes(s[(i + 4 * (i % 4)) % 16] for i in range(16))
        o = bytearray(16)
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            o[4 * c] = xt(a0) ^ (xt(a1) ^ a1) ^ a2 ^ a3
            o[4 * c + 1] = a0 ^ xt(a1) ^ (xt(a2) ^ a2) ^ a3
            o[4 * c + 2] = a0 ^ a1 ^ xt(a2) ^ (xt(a3) ^ a3)
            o[4 * c + 3] = (xt(a0) ^ a0) ^ a1 ^ a2 ^ xt(a3)
        s = bytes(x ^ y for x, y in zip(o, rks[r]))
    s = bytes(_AES_SBOX[x] for x in s)
    s = bytes(s[(i + 4 * (i % 4)) % 16] for i in range(16))
    return bytes(x ^ y for x, y in zip(s, rks[-1]))


def _aes_cbc_encrypt(key, iv, data):
    from data_ingestion_py_spark.sources.pdf_pure import _aes128_round_keys

    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    rks = _aes128_round_keys(key)
    prev = iv
    out = bytearray(iv)
    for off in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[off : off + 16], prev))
        e = _aes_enc_block(rks, blk)
        out += e
        prev = e
    return bytes(out)


def _aesv2_pdf(user_pw=b""):
    import hashlib

    from data_ingestion_py_spark.sources.pdf_pure import _rc4  # noqa: F401

    p = -3904
    id0 = bytes(range(15, -1, -1))
    o, u, key = _std_encrypt_keys(b"owner-x", user_pw, p, id0, 4, 16)

    def objkey(num):
        return hashlib.md5(
            key + (num & 0xFFFFFF).to_bytes(3, "little")
            + b"\x00\x00" + b"sAlT"
        ).digest()[:16]

    content = b"BT /F1 12 Tf (AES page text) Tj ET"
    c_enc = _aes_cbc_encrypt(objkey(4), bytes(range(16)), content)
    title = _aes_cbc_encrypt(objkey(8), bytes(range(16, 32)), b"AES Doc")
    hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
    parts = [b"%PDF-1.7\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c_enc)
        + c_enc + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"5 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128"
        b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
        b" /StmF /StdCF /StrF /StdCF /O " + hx(o) + b" /U " + hx(u)
        + b" /P %d >>\nendobj\n" % p
    )
    parts.append(b"8 0 obj\n<< /Title " + hx(title) + b" >>\nendobj\n")
    parts.append(
        b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R /Encrypt 5 0 R"
        b" /ID [" + hx(id0) + b" " + hx(id0) + b"] >>\nstartxref\n0\n%%EOF"
    )
    return b"".join(parts)


def test_aesv2_encrypted_pdf_decrypts():
    """r13: V4/R4 AESV2 — the MODERN encrypted-PDF shape — decrypts
    with an empty user password: crypt-filter dict validation, the
    sAlT object-key marker, 16-byte IV prefix, CBC, padding strip;
    the same handler math otherwise. FIPS-197-vector and CBC
    properties are pinned separately below."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

    got = parse_pdf_text(_aesv2_pdf())
    assert got is not None
    pages, meta = got
    assert pages == ["AES page text"]
    assert meta.get("Title") == "AES Doc"
    # real user password: refusal
    assert parse_pdf_text(_aesv2_pdf(user_pw=b"pw")) is None
    # a non-AESV2 crypt filter name: refusal
    bad = _aesv2_pdf().replace(b"/CFM /AESV2", b"/CFM /AESV3")
    assert parse_pdf_text(bad) is None
    # corrupt ciphertext (bad padding) never returns text
    pdf = _aesv2_pdf()
    at = pdf.find(b"stream\n") + 7
    corrupt = pdf[:at + 20] + bytes([pdf[at + 20] ^ 0xFF]) + pdf[at + 21:]
    got2 = parse_pdf_text(corrupt)
    assert got2 is None or got2[0] == [""]


def test_aes128_fips_vector_and_cbc_contract():
    from data_ingestion_py_spark.sources.pdf_pure import (
        _aes128_cbc_decrypt,
        _aes128_decrypt_block,
        _aes128_round_keys,
    )

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _aes128_decrypt_block(_aes128_round_keys(key), ct) == pt
    assert _aes_enc_block(_aes128_round_keys(key), pt) == ct
    # CBC roundtrip at every length mod 16, incl. empty
    for n in range(0, 49):
        data = bytes(range(n % 251, n % 251 + n)) if n else b""
        enc = _aes_cbc_encrypt(key, bytes(16), data)
        assert _aes128_cbc_decrypt(key, enc) == data
    # length/padding violations refuse
    assert _aes128_cbc_decrypt(key, b"\x00" * 16) is None  # no body
    assert _aes128_cbc_decrypt(key, b"\x00" * 33) is None  # not 16-mult
    assert _aes128_cbc_decrypt(key, bytes(32)) is None  # pad byte 0


def test_encrypted_objstm_layout_decrypts():
    """r13: the MODERN encrypted layout — page-tree objects and the
    Info dict packed in a (deflated, encrypted) /ObjStm, an
    xref-stream-style trailer — parses end-to-end: the scan defers
    ObjStm expansion, _setup_encryption arms the key and re-expands,
    and per §7.6.2 the strings INSIDE ObjStm objects are NOT
    separately decrypted (they were encrypted wholesale with the
    stream)."""
    import zlib

    from data_ingestion_py_spark.sources.pdf_pure import _rc4, parse_pdf_text

    p = -44
    id0 = bytes(range(16))
    o, u, key = _std_encrypt_keys(b"own", b"", p, id0, 3, 16)
    content = b"BT /F1 12 Tf (inside objstm) Tj ET"
    c_enc = _rc4(_rc4_objkey(key, 4), content)
    # objects 1,2,3,8 live in the ObjStm (object 9); strings inside
    # stay PLAINTEXT (the stream is encrypted as a whole)
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (8, b"<< /Title (Packed Title) >>"),
    ]
    offs, body = [], b""
    for num, ob in inner:
        offs.append((num, len(body)))
        body += ob + b" "
    header = " ".join(f"{n} {off}" for n, off in offs).encode() + b" "
    stm_plain = header + body
    stm = _rc4(_rc4_objkey(key, 9), zlib.compress(stm_plain))
    hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
    parts = [b"%PDF-1.7\n"]
    parts.append(
        b"9 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d"
        b" /Filter /FlateDecode >>\nstream\n" % (
            len(inner), len(header), len(stm))
        + stm + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c_enc)
        + c_enc + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"5 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /O "
        + hx(o) + b" /U " + hx(u) + b" /P %d >>\nendobj\n" % p
    )
    parts.append(
        b"trailer\n<< /Size 10 /Root 1 0 R /Info 8 0 R /Encrypt 5 0 R"
        b" /ID [" + hx(id0) + b" " + hx(id0) + b"] >>\nstartxref\n0\n%%EOF"
    )
    got = parse_pdf_text(b"".join(parts))
    assert got is not None
    pages, meta = got
    assert pages == ["inside objstm"]
    assert meta.get("Title") == "Packed Title"


def test_simple_font_differences_encoding():
    """r13: /Encoding /Differences remaps (subset-font PDFs): integers
    set the next code, glyph names consume successive codes, AGL
    names resolve to text, unknown names fall back to the code's
    latin-1, fonts without Differences stay plain latin-1."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        _parse_differences,
        parse_pdf_text,
    )

    m = _parse_differences(
        [200, "/zero", "/one", "/period", 240, "/A", "/unknowable"]
    )
    assert m[200] == "0" and m[201] == "1" and m[202] == "."
    assert m[240] == "A" and m[241] == chr(241)
    assert _parse_differences(["/zero"]) is None  # name before a code
    assert _parse_differences([300, "/zero"]) is None

    def pdf(enc_entry: bytes, shown: bytes) -> bytes:
        c = b"BT /F1 12 Tf (" + shown + b") Tj ET"
        parts = [b"%PDF-1.7\n"]
        parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        parts.append(
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        )
        parts.append(
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        )
        parts.append(
            b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c)
            + c + b"\nendstream\nendobj\n"
        )
        parts.append(
            b"5 0 obj\n<< /Type /Font /Subtype /Type1" + enc_entry
            + b" >>\nendobj\n"
        )
        parts.append(
            b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
        )
        return b"".join(parts)

    enc = (
        b" /Encoding << /Type /Encoding /Differences "
        b"[ 200 /D /o /c /space /four /two ] >>"
    )
    shown = bytes([200, 201, 202, 202, 203, 204, 205])
    pages, _ = parse_pdf_text(pdf(enc, shown))
    assert pages == ["Docc 42"]
    # no Differences: plain latin-1 passthrough
    pages2, _ = parse_pdf_text(pdf(b"", b"plain"))
    assert pages2 == ["plain"]


def _png_predict_forward(data: bytes, stride: int, bpp: int = 1) -> bytes:
    """Independent forward PNG-filtering (writer side of PDF
    Predictor >= 10): rows of ``stride`` bytes, cycling filter types
    Sub/Up/Average/Paeth/None so every inverse path is exercised."""
    assert len(data) % stride == 0
    rows = [bytearray(data[i : i + stride])
            for i in range(0, len(data), stride)]
    out = bytearray()
    prev = bytearray(stride)
    for r, row in enumerate(rows):
        f = (r % 5)  # 0..4
        enc = bytearray(stride)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (row[x] - pred) & 0xFF
        out += bytes([f]) + enc
        prev = row
    return bytes(out)


def _tiff2_forward(data: bytes, stride: int) -> bytes:
    """Writer side of Predictor 2 (TIFF horizontal differencing,
    colors=1, 8-bit)."""
    assert len(data) % stride == 0
    out = bytearray()
    for i in range(0, len(data), stride):
        row = data[i : i + stride]
        out.append(row[0])
        for x in range(1, stride):
            out.append((row[x] - row[x - 1]) & 0xFF)
    return bytes(out)


def test_predictor_png_and_tiff_content_streams():
    """r14 (VERDICT task #1): /FlateDecode and /LZWDecode streams with
    /Predictor 2 (TIFF) and 10-15 (PNG, all five row filters) decode
    through the SAME filter chain as unpredicted ones — text from a
    predictor'd content stream extracts; torn predictor rows refuse
    the stream (empty page), never emit differenced bytes as text."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sources import _lzw_msb_encode

    text = b"BT /F1 12 Tf (Predicted text 427) Tj ET"
    stride = 16
    pad = (-len(text)) % stride
    content = text + b" " * pad

    def pdf(encoded: bytes, filt: str, parms: str) -> bytes:
        extra = f" /Filter {filt} /DecodeParms {parms}"
        return _basic_pdf([encoded], length=len(encoded)).replace(
            b"<< /Length %d >>" % len(encoded),
            f"<< /Length {len(encoded)}{extra} >>".encode(),
            1,
        )

    # PNG predictor (12 declared; per-row tags cycle through 0-4)
    enc = zlib.compress(_png_predict_forward(content, stride))
    pages, _ = parse_pdf_text(pdf(
        enc, "/FlateDecode",
        f"<< /Predictor 12 /Columns {stride} >>"))
    assert pages == ["Predicted text 427"]
    # TIFF predictor 2
    enc2 = zlib.compress(_tiff2_forward(content, stride))
    pages, _ = parse_pdf_text(pdf(
        enc2, "/FlateDecode",
        f"<< /Predictor 2 /Columns {stride} >>"))
    assert pages == ["Predicted text 427"]
    # LZW + PNG predictor (the other compressor shares _unpredict)
    enc3 = _lzw_msb_encode(_png_predict_forward(content, stride))
    pages, _ = parse_pdf_text(pdf(
        enc3, "/LZWDecode",
        f"<< /Predictor 10 /Columns {stride} >>"))
    assert pages == ["Predicted text 427"]
    # torn rows: drop the final byte -> len % (stride+1) != 0 -> refuse
    torn = zlib.compress(_png_predict_forward(content, stride)[:-1])
    pages, _ = parse_pdf_text(pdf(
        torn, "/FlateDecode",
        f"<< /Predictor 12 /Columns {stride} >>"))
    assert pages == [""]
    # torn TIFF rows likewise
    torn2 = zlib.compress(_tiff2_forward(content, stride)[:-3])
    pages, _ = parse_pdf_text(pdf(
        torn2, "/FlateDecode",
        f"<< /Predictor 2 /Columns {stride} >>"))
    assert pages == [""]
    # unknown predictor value refuses
    pages, _ = parse_pdf_text(pdf(
        enc, "/FlateDecode",
        f"<< /Predictor 7 /Columns {stride} >>"))
    assert pages == [""]


def test_predictor_image_xobject_raster():
    """r14: a Predictor-12 FlateDecode /DeviceGray image XObject — the
    classic real-world lossless-image shape — now extracts its raster
    bit-exactly through extract_page_images (kind 'raw')."""
    import numpy as np

    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_page_images,
    )

    w, h = 24, 9
    rng = np.random.default_rng(7)
    raster = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
    enc = zlib.compress(_png_predict_forward(raster, w))
    c = b"q 24 0 0 9 0 0 cm /Im0 Do Q"
    parts = [b"%PDF-1.7\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    parts.append(_obj(
        3, b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>"))
    parts.append(_stream_obj(4, c))
    parts.append(
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 24"
        b" /Height 9 /ColorSpace /DeviceGray /BitsPerComponent 8"
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12"
        b" /Columns 24 >> /Length %d >>\nstream\n" % len(enc)
        + enc + b"\nendstream\nendobj\n"
    )
    parts.append(b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF")
    pdf = b"".join(parts)
    imgs = extract_page_images(pdf)
    assert imgs is not None and len(imgs) == 1
    pno, idx, name, iw, ih, bpc, kind, data = imgs[0]
    assert (pno, iw, ih, bpc, kind) == (1, 24, 9, 8, "raw")
    assert data == raster


def _inline_pdf(body: bytes) -> bytes:
    """One page whose content stream is ``body`` verbatim."""
    return (
        b"%PDF-1.7\n"
        + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
        + _stream_obj(4, body)
        + b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    )


def test_inline_images_decode_and_tokenize():
    """r14 (VERDICT task #2): BI/ID/EI inline images — unfiltered gray
    rasters (exact computed span, even with an 'EI' byte pair INSIDE
    the data), /Fl (Flate) via decode-verified EI scan, abbreviation
    expansion, and honest skips for non-gray rasters — all while the
    surrounding text still extracts."""
    import numpy as np

    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_page_images,
    )

    # raster with an embedded whitespace-delimited "EI" trap
    raster = bytearray(range(48))
    raster[10:14] = b" EI "
    raster = bytes(raster)
    body = (
        b"BT (before) Tj ET "
        b"BI /W 8 /H 6 /BPC 8 /CS /G ID " + raster + b" EI\n"
        b"BT (after) Tj ET"
    )
    pdf = _inline_pdf(body)
    pages, _ = parse_pdf_text(pdf)
    assert pages == ["before\nafter"]
    imgs = extract_page_images(pdf)
    assert len(imgs) == 1
    pno, idx, name, w, h, bpc, kind, data = imgs[0]
    assert (pno, idx, name, w, h, bpc, kind) == (1, 0, "BI0", 8, 6, 8, "raw")
    assert data == raster

    # Flate-compressed inline image: span found by decode verification
    px = bytes((i * 7 + 3) % 256 for i in range(24))
    comp = zlib.compress(px)
    body2 = (
        b"BI /W 4 /H 6 /BPC 8 /CS /G /F /Fl ID " + comp + b" EI\n"
        b"BT (text lives) Tj ET"
    )
    pdf2 = _inline_pdf(body2)
    imgs2 = extract_page_images(pdf2)
    assert len(imgs2) == 1
    assert imgs2[0][6] == "raw" and imgs2[0][7] == px
    pages2, _ = parse_pdf_text(pdf2)
    assert pages2 == ["text lives"]

    # non-gray raw (RGB): honestly skipped, span still consumed
    rgb = bytes(36)
    body3 = (
        b"BI /W 3 /H 4 /BPC 8 /CS /RGB ID " + rgb + b" EI\n"
        b"BT (still here) Tj ET"
    )
    pdf3 = _inline_pdf(body3)
    assert extract_page_images(pdf3) == []
    pages3, _ = parse_pdf_text(pdf3)
    assert pages3 == ["still here"]

    # a BI inside a STRING operand is not an image
    body4 = b"BT (fake BI /W 1 ID x EI inside) Tj ET"
    assert extract_page_images(_inline_pdf(body4)) == []
    pages4, _ = parse_pdf_text(_inline_pdf(body4))
    assert pages4 == ["fake BI /W 1 ID x EI inside"]


def test_inline_ccitt_g4_image_decodes():
    """r14: the classic scanned-fax shape — one inline /CCF (CCITT G4)
    image per page — decodes through the fax kernel to an 8-bit gray
    raster, ready for OCR-lite."""
    import numpy as np

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_ccitt import g4_encode

    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_page_images,
    )

    rng = np.random.default_rng(11)
    img = np.where(rng.random((10, 33)) < 0.4, 0, 255).astype(np.uint8)
    enc = g4_encode(img)
    body = (
        b"BI /W 33 /H 10 /BPC 1 /IM true /F /CCF"
        b" /DP << /K -1 /Columns 33 /Rows 10 >> ID " + enc + b" EI"
    )
    imgs = extract_page_images(_inline_pdf(body))
    assert len(imgs) == 1
    pno, idx, name, w, h, bpc, kind, data = imgs[0]
    assert (w, h, kind) == (33, 10, "raw")
    assert np.frombuffer(data, np.uint8).reshape(10, 33).tolist() == img.tolist()


def test_aes256_fips_vectors_and_forward_cipher():
    """r14: FIPS-197 Appendix C vectors — AES-256 inverse cipher (the
    AESV3 path) and the house FORWARD cipher (Algorithm 2.B's inner
    encryptor) for both key sizes."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_round_keys,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # AES-128 (C.1)
    k128 = bytes(range(16))
    ct128 = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rks = _aes_round_keys(k128)
    assert _aes_encrypt_block(rks, pt) == ct128
    assert _aes_decrypt_block(rks, ct128) == pt
    # AES-256 (C.3)
    k256 = bytes(range(32))
    ct256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rks = _aes_round_keys(k256)
    assert _aes_encrypt_block(rks, ct256 * 0 + pt) == ct256
    assert _aes_decrypt_block(rks, ct256) == pt


def test_hash_2b_matches_independent_implementation():
    """Algorithm 2.B (ISO 32000-2 §7.6.4.3.4) cross-checked against an
    independent straight-from-the-spec implementation built on the
    test's own forward AES."""
    import hashlib

    from data_ingestion_py_spark.sources.pdf_pure import (
        _aes_round_keys,
        _hash_2b,
    )

    def hash_2b_indep(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
        k = hashlib.sha256(pw + salt + udata).digest()
        rnd = 0
        while True:
            k1 = (pw + k + udata) * 64
            rks = _aes_round_keys(k[:16])
            prev = k[16:32]
            e = bytearray()
            for off in range(0, len(k1), 16):
                blk = bytes(
                    x ^ y for x, y in zip(k1[off : off + 16], prev)
                )
                prev = _aes_enc_block(rks, blk)
                e += prev
            e = bytes(e)
            k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][
                sum(e[:16]) % 3
            ](e).digest()
            rnd += 1
            if rnd >= 64 and e[-1] <= rnd - 32:
                return k[:32]

    for pw, salt in ((b"", b"saltsalt"), (b"", bytes(8)),
                     (b"pw", b"\x01" * 8)):
        assert _hash_2b(pw, salt) == hash_2b_indep(pw, salt), (pw, salt)


def _aesv3_pdf(user_pw=b"", r=6, tamper_u=False, tamper_perms=False):
    """Independent R5/R6 AES-256 PDF writer: picks a random-looking
    file key, derives U/UE from the salts with the INDEPENDENT 2.B
    (via the module's, already cross-checked above), encrypts Perms,
    the content stream, and the Info title with AES-256-CBC."""
    import hashlib

    from data_ingestion_py_spark.sources.pdf_pure import (
        _aes_round_keys,
        _hash_2b,
    )

    file_key = bytes((i * 37 + 11) % 256 for i in range(32))
    vsalt, ksalt = b"VsaltVs1", b"KsaltKs1"
    if r == 6:
        uhash = _hash_2b(user_pw, vsalt)
        ik = _hash_2b(user_pw, ksalt)
    else:
        uhash = hashlib.sha256(user_pw + vsalt).digest()
        ik = hashlib.sha256(user_pw + ksalt).digest()
    if tamper_u:
        uhash = bytes([uhash[0] ^ 1]) + uhash[1:]
    u = uhash + vsalt + ksalt
    # UE = AES-256-CBC-encrypt(ik, iv=0, file_key), no padding
    rks = _aes_round_keys(ik)
    prev = bytes(16)
    ue = bytearray()
    for off in (0, 16):
        blk = bytes(x ^ y for x, y in zip(file_key[off : off + 16], prev))
        prev = _aes_enc_block(rks, blk)
        ue += prev
    p = -44
    perms_pt = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff" + b"T" + b"adb" + bytes(4)
    )
    perms = _aes_enc_block(_aes_round_keys(file_key), perms_pt)
    if tamper_perms:
        perms = bytes([perms[0] ^ 1]) + perms[1:]
    content = b"BT /F1 12 Tf (AES256 Secret) Tj ET"
    c_enc = _aes_cbc_encrypt(file_key, bytes(range(16)), content)
    title = _aes_cbc_encrypt(file_key, bytes(range(16, 32)), b"V5 Doc")
    hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
    parts = [b"%PDF-2.0\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c_enc)
        + c_enc + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"5 0 obj\n<< /Filter /Standard /V 5 /R %d /Length 256" % r
        + b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
        b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
        b" /O " + hx(bytes(48)) + b" /OE " + hx(bytes(32))
        + b" /U " + hx(u) + b" /UE " + hx(bytes(ue))
        + b" /Perms " + hx(perms)
        + b" /P %d >>\nendobj\n" % p
    )
    parts.append(b"8 0 obj\n<< /Title " + hx(title) + b" >>\nendobj\n")
    parts.append(
        b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R /Encrypt 5 0 R"
        b" /ID [" + hx(bytes(16)) + b" " + hx(bytes(16)) + b"] >>"
        b"\nstartxref\n0\n%%EOF"
    )
    return b"".join(parts)


def test_aesv3_r6_and_r5_decrypt_with_empty_user_password():
    """r14 (VERDICT task #5): V5/R6 (PDF 2.0) and V5/R5 (AEL3) AES-256
    documents with an empty user password decrypt end-to-end — 2.B
    password verification against /U, /UE file-key recovery, /Perms
    round-trip check, AES-256-CBC streams AND Info strings."""
    for r in (6, 5):
        got = parse_pdf_text(_aesv3_pdf(r=r))
        assert got is not None, r
        pages, meta = got
        assert pages == ["AES256 Secret"], r
        assert meta.get("Title") == "V5 Doc"


def test_aesv3_honest_refusals():
    """A real user password, a tampered /U hash, or a tampered /Perms
    must refuse the whole document — never AES noise as text."""
    assert parse_pdf_text(_aesv3_pdf(user_pw=b"real-pw")) is None
    assert parse_pdf_text(_aesv3_pdf(tamper_u=True)) is None
    assert parse_pdf_text(_aesv3_pdf(tamper_perms=True)) is None


def test_predictor_objstm_parses():
    """r14: a predictor'd OBJECT stream (the other real-world
    Predictor-12 site besides image XObjects) — catalog/pages/page
    dicts inside a FlateDecode+Predictor-12 ObjStm parse through the
    same _unpredict chain."""
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    o3 = b"<< /Type /Page /Contents 5 0 R >>"
    header = f"1 0 2 {len(o1) + 1} 3 {len(o1) + len(o2) + 2} ".encode()
    data = header + o1 + b" " + o2 + b" " + o3
    stride = 16
    data += b" " * (-len(data) % stride)
    enc = zlib.compress(_png_predict_forward(data, stride))
    pdf = b"%PDF-1.7\n"
    pdf += (
        b"8 0 obj\n"
        + (
            b"<< /Length %d /Type /ObjStm /N 3 /First %d"
            b" /Filter /FlateDecode /DecodeParms << /Predictor 12"
            b" /Columns %d >> >>" % (len(enc), len(header), stride)
        )
        + b"\nstream\n" + enc + b"\nendstream\nendobj\n"
    )
    pdf += _stream_obj(5, b"BT (predicted objstm) Tj ET")
    pdf += b"%%EOF"
    pages, _ = parse_pdf_text(pdf)
    assert pages == ["predicted objstm"]


def test_form_xobject_text_extracts():
    """r14: text inside /Subtype /Form XObjects — headers, stamps,
    n-up imposition — extracts when the page paints them with Do:
    form-own AND inherited resources, nested forms, a self-referential
    form terminating at the depth bound, and image XObjects still
    ignored by the text path."""
    def build(form_res: bytes | None, self_ref=False, nest=False):
        c_page = b"BT (page body) Tj ET q 1 0 0 1 10 10 cm /Fm1 Do Q"
        c_form = b"BT /F9 9 Tf (stamp text) Tj ET"
        if self_ref:
            c_form += b" /Fm1 Do"
        if nest:
            c_form += b" /Fm2 Do"
        c_inner = b"BT (inner) Tj ET"
        out = b"%PDF-1.7\n"
        out += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        out += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        page_res = (
            b"<< /XObject << /Fm1 6 0 R /Im0 8 0 R >> "
            b"/Font << /F9 9 0 R >> >>"
        )
        out += _obj(
            3, b"<< /Type /Page /Parent 2 0 R /Resources " + page_res
            + b" /Contents 4 0 R >>")
        out += _stream_obj(4, c_page)
        fdict = b"" if form_res is None else b" /Resources " + form_res
        out += (
            b"6 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 9 9]"
            + fdict
            + (b" /Length %d >>\nstream\n" % len(c_form))
            + c_form + b"\nendstream\nendobj\n"
        )
        out += (
            b"7 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 9 9]"
            + (b" /Length %d >>\nstream\n" % len(c_inner))
            + c_inner + b"\nendstream\nendobj\n"
        )
        out += (
            b"8 0 obj\n<< /Type /XObject /Subtype /Image /Width 1"
            b" /Height 1 /ColorSpace /DeviceGray /BitsPerComponent 8"
            b" /Length 1 >>\nstream\n\x80\nendstream\nendobj\n"
        )
        out += _obj(9, b"<< /Type /Font /Subtype /Type1 >>")
        out += b"trailer\n<< /Size 10 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
        return out

    # form with its OWN resources
    pages, _ = parse_pdf_text(build(
        b"<< /Font << /F9 9 0 R >> /XObject << /Fm2 7 0 R >> >>"))
    assert pages == ["page body\nstamp text"]
    # form WITHOUT resources inherits the page's
    pages, _ = parse_pdf_text(build(None))
    assert pages == ["page body\nstamp text"]
    # nested form executes (inner resources via the outer form's dict)
    pages, _ = parse_pdf_text(build(
        b"<< /Font << /F9 9 0 R >> /XObject << /Fm2 7 0 R >> >>",
        nest=True))
    assert pages == ["page body\nstamp text\ninner"]
    # self-referential form terminates at the depth bound
    pages, _ = parse_pdf_text(build(None, self_ref=True))
    assert pages[0].startswith("page body\nstamp text")
    assert pages[0].count("stamp text") <= 8


def test_annotation_text_extracts():
    """r14: /Annots contents — review comments and free-text boxes —
    extract per page with subtype and index; widget annots without
    /Contents and non-dict entries are skipped; UTF-16BE decodes."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_annotations,
    )

    out = b"%PDF-1.7\n"
    out += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    out += _obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
    out += _obj(
        3, b"<< /Type /Page /Contents 5 0 R"
           b" /Annots [7 0 R 8 0 R 9 0 R] >>")
    out += _obj(4, b"<< /Type /Page /Contents 5 0 R /Annots [10 0 R] >>")
    out += _stream_obj(5, b"BT (body) Tj ET")
    out += _obj(
        7, b"<< /Type /Annot /Subtype /Text /Rect [0 0 9 9]"
           b" /Contents (first note) >>")
    out += _obj(
        8, b"<< /Type /Annot /Subtype /Widget /Rect [0 0 9 9] >>")
    out += _obj(
        9, b"<< /Type /Annot /Subtype /FreeText"
           b" /Contents <FEFF004F004B2021> >>")  # UTF-16BE 'OK\u2021'
    out += _obj(
        10, b"<< /Type /Annot /Subtype /Highlight /Contents (p2) >>")
    out += b"trailer\n<< /Size 11 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    got = extract_annotations(out)
    assert got == [
        (1, 0, "Text", "first note"),
        (1, 1, "FreeText", "OK‡"),
        (2, 0, "Highlight", "p2"),
    ]
    assert extract_annotations(b"junk") is None


def test_annotation_indirect_contents_and_encrypted_direct():
    """r15 (advice): an indirect /Contents string resolves (and in an
    encrypted doc decrypts under the STRING object's own number); a
    direct annot dict inside the page object of an encrypted doc is
    skipped rather than emitted as ciphertext."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_annotations,
    )

    out = b"%PDF-1.7\n"
    out += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    out += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    out += _obj(
        3, b"<< /Type /Page /Contents 5 0 R /Annots [7 0 R] >>")
    out += _stream_obj(5, b"BT (body) Tj ET")
    out += _obj(
        7, b"<< /Type /Annot /Subtype /Text /Contents 8 0 R >>")
    out += _obj(8, b"(via indirect string)")
    out += b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    assert extract_annotations(out) == [
        (1, 0, "Text", "via indirect string"),
    ]

    # encrypted (RC4 R2, empty user password) doc, built with the
    # suite's independent key-derivation writer: an annot object whose
    # /Contents is an INDIRECT string decrypts under the STRING
    # object's own number; a direct annot dict inside the page object
    # is skipped (no owning number -> would be ciphertext).
    from data_ingestion_py_spark.sources.pdf_pure import _rc4, _scan

    p = -44
    id0 = bytes(range(16))
    o, u, key = _std_encrypt_keys(b"owner-secret", b"", p, id0, 2, 5)
    c_enc = _rc4(_rc4_objkey(key, 4), b"BT (x) Tj ET")
    note = _rc4(_rc4_objkey(key, 8), b"indirect note")
    hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
    enc = b"%PDF-1.4\n"
    enc += _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    enc += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    enc += _obj(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Annots"
        b" [7 0 R << /Type /Annot /Subtype /Text /Contents (zz) >>]"
        b" >>",
    )
    enc += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c_enc)
        + c_enc + b"\nendstream\nendobj\n"
    )
    enc += _obj(
        5,
        b"<< /Filter /Standard /V 1 /R 2 /O " + hx(o)
        + b" /U " + hx(u) + b" /P %d >>" % p,
    )
    enc += _obj(7, b"<< /Type /Annot /Subtype /Text /Contents 8 0 R >>")
    enc += _obj(8, hx(note))
    enc += (
        b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 5 0 R /ID ["
        + hx(id0) + b" " + hx(id0) + b"] >>\nstartxref\n0\n%%EOF"
    )
    from data_ingestion_py_spark.sources.pdf_pure import _walk_pages

    doc = _scan(enc)
    assert _walk_pages(doc) is not None  # arms RC4 standard security
    assert doc.enc_key is not None
    assert extract_annotations(enc) == [
        (1, 0, "Text", "indirect note"),
    ]


def test_caller_supplied_user_passwords_decrypt():
    """r15 (VERDICT #5): a caller-supplied USER password threads
    through parse_pdf_text/extract_page_images/extract_annotations →
    _setup_encryption → the existing key-derivation kernels, across
    every supported handler revision; the empty default and any wrong
    password refuse (honest None), never mojibake."""
    from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

    pw = b"s3cret-Pa55"
    # RC4: R2/40, R3/128, R3/40
    for r, nb in ((2, 5), (3, 16), (3, 5)):
        doc = _encrypted_pdf(r=r, nbytes=nb, user_pw=pw)
        got = parse_pdf_text(doc, password=pw)
        assert got is not None and got[0] == ["Secret 123456"], (r, nb)
        assert parse_pdf_text(doc) is None, (r, nb)
        assert parse_pdf_text(doc, password=b"wrong") is None, (r, nb)
    # AESV2 (V4 R4)
    doc = _aesv2_pdf(user_pw=pw)
    got = parse_pdf_text(doc, password=pw)
    assert got is not None and got[0] == ["AES page text"]
    assert parse_pdf_text(doc) is None
    assert parse_pdf_text(doc, password=pw + b"x") is None
    # AESV3: R6 (Algorithm 2.B with the password) and R5
    for r in (6, 5):
        doc = _aesv3_pdf(user_pw=pw, r=r)
        got = parse_pdf_text(doc, password=pw)
        assert got is not None and got[0] == ["AES256 Secret"], r
        assert parse_pdf_text(doc) is None, r
        assert parse_pdf_text(doc, password=b"nope") is None, r
    # an empty-password doc still opens when a password IS supplied?
    # no — a wrong non-empty password must refuse (strictness), while
    # the empty default keeps working:
    doc = _encrypted_pdf(r=3, nbytes=16, user_pw=b"")
    assert parse_pdf_text(doc) is not None
    assert parse_pdf_text(doc, password=b"extra") is None
    # R6 over-long passwords truncate at 127 bytes per §7.6.4.3.2
    long_pw = bytes(range(200)).replace(b"\x00", b"\x01")
    doc = _aesv3_pdf(user_pw=long_pw[:127], r=6)
    assert parse_pdf_text(doc, password=long_pw) is not None
