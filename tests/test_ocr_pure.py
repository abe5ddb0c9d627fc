"""OCR-lite (sources/ocr_pure) + scanned-PDF image extraction
(pdf_pure.extract_page_images / image_stream) — r13, VERDICT tasks
#4/#5: the reference's scanned-PDF OCR branch (data_ingestion.py:
136-168) executable in-container. Fixtures here are built by an
INDEPENDENT writer (this file), not the column-algebra builders the
queries use."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_py_spark.sources.ocr_pure import (
    DIGIT_TEMPLATES,
    match_glyph_grid,
    ocr_pdf_pages,
)
from data_ingestion_py_spark.sources.pdf_pure import (
    extract_page_images,
    parse_pdf_text,
)

CELL = 8
DARK, LIGHT = bytes.fromhex("E3EF"), bytes.fromhex("EC0F")


def render(digits: str, ink=32, paper=224) -> np.ndarray:
    img = np.full((3 * CELL, len(digits) * 2 * CELL), paper, np.uint8)
    for g, d in enumerate(digits):
        for r in range(3):
            for c in range(2):
                if DIGIT_TEMPLATES[d][r][c]:
                    img[
                        r * CELL : (r + 1) * CELL,
                        (g * 2 + c) * CELL : (g * 2 + c + 1) * CELL,
                    ] = ink
    return img


def jpeg_header(w: int, h: int) -> bytes:
    """DC-only gray baseline header with DRI=1 (independent of the
    query builder's hex version)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
    out += bytes([8] + [16] * 63)
    out += (
        b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    out += b"\xff\xc4" + (27).to_bytes(2, "big") + b"\x00"
    out += bytes([0, 0, 7, 1] + [0] * 12) + bytes(range(8))
    out += b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x10"
    out += bytes([1] + [0] * 15) + bytes([0])
    out += b"\xff\xdd" + (4).to_bytes(2, "big") + (1).to_bytes(2, "big")
    out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0, 0, 63, 0])
    return bytes(out)


def jpeg_digits(digits: str) -> bytes:
    bw, bh = len(digits) * 2, 3
    out = bytearray(jpeg_header(bw * 8, bh * 8))
    n = bw * bh
    for i in range(n):
        r, c = divmod(i, bw)
        out += DARK if DIGIT_TEMPLATES[digits[c // 2]][r][c % 2] else LIGHT
        if i != n - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)


def scanned_pdf(digits: str, jpeg: bytes | None = None,
                filters: str = "/DCTDecode") -> bytes:
    jpg = jpeg if jpeg is not None else jpeg_digits(digits)
    w, h = len(digits) * 16, 24
    c4 = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
    parts = [b"%PDF-1.7\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
        b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c4)
        + c4 + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter %s"
        b" /Length %d >>\nstream\n" % (w, h, filters.encode(), len(jpg))
        + jpg + b"\nendstream\nendobj\n"
    )
    parts.append(
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    )
    return b"".join(parts)


def test_font_templates_pairwise_distinct():
    flat = {d: tuple(x for row in t for x in row)
            for d, t in DIGIT_TEMPLATES.items()}
    assert len(set(flat.values())) == 10


def test_match_glyph_grid_exact_and_strictness():
    img = render("0412393857")
    assert match_glyph_grid(img) == "0412393857"
    # corrupt one cell to a pattern NOT in the font (0 -> 111110)
    img2 = render("04213")
    img2[16:24, 8:16] = 224
    assert match_glyph_grid(img2) is None  # strict: whole page refused
    assert match_glyph_grid(img2, strict=False, max_hamming=1) == "04213"
    # far-from-any-template raster in non-strict mode reads as '?'
    # (all-paper: the 000000 pattern is in no template; all-INK would
    # exactly match '0', whose template is all-ones)
    noise = np.full((24, 16), 224, np.uint8)
    got = match_glyph_grid(noise, strict=False, max_hamming=0)
    assert got == "?"
    assert match_glyph_grid(noise) is None


def test_match_glyph_grid_multirow_and_threshold():
    img = np.vstack([render("123"), render("456")])
    assert match_glyph_grid(img) == "123\n456"
    # cell means sit on either side of the threshold
    assert match_glyph_grid(render("7", ink=100, paper=160)) == "7"


def test_jpeg_glyph_roundtrip_through_dc_kernel():
    from data_ingestion_py_spark.sources.multimodal import decode_jpeg_array

    got = decode_jpeg_array(jpeg_digits("09876"))
    assert got is not None
    w, h, pix = got
    assert (w, h) == (80, 24)
    gray = pix.reshape(h, w)
    assert set(np.unique(gray)) == {32, 224}
    assert match_glyph_grid(gray) == "09876"


def test_extract_page_images_dct_xobject():
    pdf = scanned_pdf("04213")
    assert parse_pdf_text(pdf)[0] == [""]  # P9 predicate fires
    imgs = extract_page_images(pdf)
    assert imgs is not None and len(imgs) == 1
    pno, idx, name, w, h, bpc, kind, data = imgs[0]
    assert (pno, idx, name, w, h, bpc, kind) == (
        1, 0, "Im0", 80, 24, 8, "jpeg",
    )
    assert data == jpeg_digits("04213")  # byte-exact JPEG hand-off


def test_extract_page_images_armor_chain_and_refusals():
    import binascii

    jpg = jpeg_digits("11111")
    # ASCIIHex armor IN FRONT of DCT: applied, JPEG still terminal
    armored = binascii.hexlify(jpg) + b">"
    pdf = scanned_pdf("11111", jpeg=armored,
                      filters="[/ASCIIHexDecode /DCTDecode]")
    imgs = extract_page_images(pdf)
    assert imgs and imgs[0][6] == "jpeg" and imgs[0][7] == jpg
    # DCT not terminal → honest refusal (no half-decoded emission)
    pdf2 = scanned_pdf("11111", jpeg=jpg,
                       filters="[/DCTDecode /ASCIIHexDecode]")
    assert extract_page_images(pdf2) == []
    # unsupported image filter → honest skip
    pdf3 = scanned_pdf("11111", jpeg=jpg, filters="/CCITTFaxDecode")
    assert extract_page_images(pdf3) == []


def test_extract_page_images_raw_gray8():
    raw = render("31415").tobytes()
    pdf = scanned_pdf("31415", jpeg=raw, filters="")
    pdf = pdf.replace(b" /Filter  /Length", b" /Length")
    imgs = extract_page_images(pdf)
    assert imgs and imgs[0][6] == "raw" and imgs[0][7] == raw
    assert ocr_pdf_pages(pdf) == ["31415"]


def test_ocr_pdf_pages_end_to_end_and_strict_fallback():
    assert ocr_pdf_pages(scanned_pdf("00042")) == ["00042"]
    # a page whose raster is NOT the font refuses in strict mode
    blank = b"\x80" * (24 * 80)  # all-paper: no exact glyph match
    hdr = jpeg_header(80, 24)  # valid JPEG of the wrong content?
    # simplest honest case: raw image with non-font content
    pdf = scanned_pdf("00042", jpeg=blank, filters="")
    pdf = pdf.replace(b" /Filter  /Length", b" /Length")
    assert ocr_pdf_pages(pdf, strict=True) is None
    assert hdr  # (header unused beyond construction sanity)


def test_extract_pages_runs_ocr_lite_in_container(spark):
    """The Spark stage: an empty-text scanned PDF comes back with OCR'd
    page_text, needs_ocr=True, extractor='ocr-lite'; a non-font scan
    keeps empty text (the honest pytesseract seam)."""
    from data_ingestion_py_spark.sources import pdf as pdf_src

    blank_scan = scanned_pdf("77777", jpeg=b"\x80" * (24 * 80), filters="")
    blank_scan = blank_scan.replace(b" /Filter  /Length", b" /Length")
    binary = spark.createDataFrame(
        [("mem://s1.pdf", scanned_pdf("00042")),
         ("mem://s2.pdf", blank_scan)],
        "path string, content binary",
    )
    rows = {r.document_name: r
            for r in pdf_src.extract_pages(binary).collect()}
    s1 = rows["s1.pdf"]
    assert s1.page_text == "00042" and s1.needs_ocr is True
    assert s1.document_metadata["extractor"] == "ocr-lite"
    s2 = rows["s2.pdf"]
    assert s2.page_text == "" and s2.needs_ocr is True
    assert s2.document_metadata.get("extractor") == "pure-byte"


def test_extract_image_xobjects_dataframe_stage(spark):
    from data_ingestion_py_spark.sources import pdf as pdf_src

    binary = spark.createDataFrame(
        [("mem://a.pdf", scanned_pdf("12345")),
         ("mem://notpdf.pdf", b"plain text, no images")],
        "path string, content binary",
    )
    rows = pdf_src.extract_image_xobjects(binary).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.document_name, r.page_number, r.image_index, r.kind) == (
        "a.pdf", 1, 0, "jpeg",
    )
    assert bytes(r.data) == jpeg_digits("12345")


def test_text_templates_and_extract_scanned_text(spark):
    """r13: the extended font (digits + '.' + ' ') reads running text
    with sentence structure; extract_scanned_text is the
    caller-chosen-font stage (extract_pages keeps the digits-only
    default so unknown scans still refuse)."""
    from data_ingestion_py_spark.sources import pdf as pdf_src
    from data_ingestion_py_spark.sources.ocr_pure import TEXT_TEMPLATES

    flat = {d: tuple(x for row in t for x in row)
            for d, t in TEXT_TEMPLATES.items()}
    assert len(set(flat.values())) == 12  # all distinct

    def render_ext(text, cell=8):
        img = np.full((3 * cell, len(text) * 2 * cell), 224, np.uint8)
        for g, ch in enumerate(text):
            t = TEXT_TEMPLATES[ch]
            for r in range(3):
                for c in range(2):
                    if t[r][c]:
                        img[r * cell:(r + 1) * cell,
                            (g * 2 + c) * cell:(g * 2 + c + 1) * cell] = 32
        return img

    img = render_ext("12. 34.")
    assert match_glyph_grid(img, templates=TEXT_TEMPLATES) == "12. 34."
    # digits-only font refuses the same raster ('.' and ' ' unknown)
    assert match_glyph_grid(img) is None

    raw = render_ext("08. 15.").tobytes()
    pdf = scanned_pdf("08. 15.", jpeg=raw, filters="")
    pdf = pdf.replace(b" /Filter  /Length", b" /Length")
    binary = spark.createDataFrame(
        [("mem://t.pdf", pdf), ("mem://x.pdf", b"not a pdf")],
        "path string, content binary",
    )
    rows = pdf_src.extract_scanned_text(
        binary, templates=TEXT_TEMPLATES
    ).collect()
    assert len(rows) == 1
    assert rows[0].page_text == "08. 15." and rows[0].page_number == 1
    # strict default font through the same stage: refused, no rows
    assert pdf_src.extract_scanned_text(binary).collect() == []


def render_alnum(text: str, ink=32, paper=224) -> np.ndarray:
    """Independent renderer for the 4x3-cell alphanumeric font: one
    line of glyphs at 8x8 cells (32 px tall, 24 px per glyph)."""
    from data_ingestion_py_spark.sources.ocr_pure import ALNUM_TEMPLATES

    img = np.full((4 * CELL, len(text) * 3 * CELL), paper, np.uint8)
    for g, ch in enumerate(text):
        t = ALNUM_TEMPLATES[ch]
        for r in range(4):
            for c in range(3):
                if t[r][c]:
                    img[
                        r * CELL : (r + 1) * CELL,
                        (g * 3 + c) * CELL : (g * 3 + c + 1) * CELL,
                    ] = ink
    return img


def test_alnum_font_min_hamming_distance_two():
    """r14 (VERDICT task #3): the full A-Z/0-9/./space font — 38
    glyphs, all pairwise Hamming distance >= 3 (disjoint radius-1
    spheres), so one flipped cell uniquely decodes, never misreads."""
    import itertools

    from data_ingestion_py_spark.sources.ocr_pure import ALNUM_TEMPLATES

    assert len(ALNUM_TEMPLATES) == 38
    assert set(ALNUM_TEMPLATES) == set(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789. "
    )
    flat = {
        k: [x for row in t for x in row] for k, t in ALNUM_TEMPLATES.items()
    }
    assert all(len(v) == 12 for v in flat.values())
    for a, b in itertools.combinations(sorted(flat), 2):
        d = sum(x != y for x, y in zip(flat[a], flat[b]))
        assert d >= 3, (a, b, d)


def test_alnum_words_match_and_strict_refusal():
    from data_ingestion_py_spark.sources.ocr_pure import (
        ALNUM_TEMPLATES,
        match_glyph_grid,
    )

    img = render_alnum("GOLD IRON MOSS.")
    got = match_glyph_grid(img, templates=ALNUM_TEMPLATES)
    assert got == "GOLD IRON MOSS."
    # two lines
    img2 = np.vstack([render_alnum("THE QUICK"), render_alnum("BROWN FOX")])
    assert match_glyph_grid(img2, templates=ALNUM_TEMPLATES) == (
        "THE QUICK\nBROWN FOX"
    )
    # a single corrupted cell: strict refuses the page; with distance
    # >= 2, max_hamming=1 still recovers the INTENDED glyph
    img3 = render_alnum("ZINC")
    img3[:8, :8] = 224 if img3[0, 0] < 128 else 32
    assert match_glyph_grid(img3, templates=ALNUM_TEMPLATES) is None
    assert match_glyph_grid(
        img3, templates=ALNUM_TEMPLATES, strict=False, max_hamming=1
    ) == "ZINC"
    # off-font raster (digit-font geometry) refuses, never garbage
    assert match_glyph_grid(render("123"), templates=ALNUM_TEMPLATES) is None


def test_extract_pages_falls_through_digits_to_alnum_font(spark):
    """r14: the PDF OCR fallback tries the digits font, then the full
    alphanumeric font — a scanned PROSE page (inline raw gray image,
    no text operators) reads real words end-to-end; an off-font raster
    still refuses honestly (needs_ocr stays set, text empty)."""
    from data_ingestion_py_spark.sources import pdf as pdf_mod

    def inline_pdf(raster: np.ndarray) -> bytes:
        h, w = raster.shape
        body = (
            b"BI /W %d /H %d /BPC 8 /CS /G ID " % (w, h)
            + raster.tobytes() + b" EI"
        )
        return (
            b"%PDF-1.7\n"
            + b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            + b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            + b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            + b"endobj\n"
            + (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(body))
            + body + b"\nendstream\nendobj\n"
            + b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
        )

    prose = inline_pdf(render_alnum("FERN OPAL JUTE."))
    rng = np.random.default_rng(3)
    noise = inline_pdf(
        rng.integers(0, 256, (32, 48), dtype=np.uint8)
    )
    df = spark.createDataFrame(
        [("mem://p.pdf", bytearray(prose)), ("mem://n.pdf", bytearray(noise))],
        "path string, content binary",
    )
    rows = {
        r.document_name: r for r in pdf_mod.extract_pages(df).collect()
    }
    assert rows["p.pdf"].page_text == "FERN OPAL JUTE."
    assert rows["p.pdf"].needs_ocr
    assert rows["p.pdf"].document_metadata["extractor"] == "ocr-lite"
    assert rows["n.pdf"].page_text == ""  # honest refusal
    assert rows["n.pdf"].needs_ocr
