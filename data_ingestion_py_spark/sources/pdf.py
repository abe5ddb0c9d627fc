"""PDF ingestion source (SURVEY §2.1 S1/S2) — Spark-first.

Reference behavior (data_ingestion.py:110-168): open each PDF with
PyMuPDF, iterate pages extracting text + metadata; if the whole document
has no text, rasterize and OCR each page (pdf2image + pytesseract +
cv2) — serially, through one shared temp file.

Spark design: ``spark.read.format("binaryFile")`` scans the directory
(distributed, whole files as BinaryType rows) → ``mapInPandas`` runs the
extraction library per executor with Arrow-batched transfer. The OCR
fallback is decided by the P9 predicate (total extracted text length ==
0 per document) INSIDE the UDF, so each document makes one pass. The
heavyweight libs load once per worker (module scope) — not once per page
like the reference (:171).

The container has no fitz/pytesseract: both engines are optional
imports. Without them the extractor uses a deterministic fallback that
treats the binary payload as UTF-8 text with form-feed page breaks —
keeping the Spark plumbing (schema, batching, page numbering, link
derivation) real and testable. OCR without pytesseract raises
NotImplementedError only for docs that genuinely need it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_py_spark.sources.spread import spread_for_kernel

PAGE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("document_name", T.StringType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("page_text", T.StringType(), True),
        T.StructField("needs_ocr", T.BooleanType(), False),
        T.StructField(
            "document_metadata", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

try:  # optional: PyMuPDF (reference's fitz, :110)
    import fitz  # type: ignore

    HAVE_FITZ = True
except Exception:  # pragma: no cover - env without PyMuPDF
    fitz = None
    HAVE_FITZ = False

try:  # optional: OCR stack (reference :136-168)
    import pytesseract  # type: ignore

    HAVE_OCR = True
except Exception:  # pragma: no cover
    pytesseract = None
    HAVE_OCR = False


def _extract_pages_fitz(content: bytes) -> tuple[list[str], dict]:
    doc = fitz.open(stream=content, filetype="pdf")
    meta = {k: str(v) for k, v in (doc.metadata or {}).items() if v is not None}
    return [page.get_text() for page in doc], meta


def _extract_pages_fallback(
    content: bytes, password: bytes = b""
) -> tuple[list[str], dict]:
    """Extras-free extraction: REAL pure-byte PDF parse first (object
    scan → page tree → FlateDecode content streams → Tj/TJ/'/\" text
    operators, sources/pdf_pure.py — the in-container kernel for the
    reference's core fitz loop, data_ingestion.py:110-135), then the
    deterministic UTF-8/form-feed stand-in for non-PDF payloads (the
    planted test fixtures)."""
    if content.startswith(b"%PDF-"):
        from data_ingestion_py_spark.sources.pdf_pure import parse_pdf_text

        parsed = parse_pdf_text(content, password)
        if parsed is not None:
            pages, meta = parsed
            meta = {**meta, "extractor": "pure-byte"}
            return pages, meta
    try:
        text = content.decode("utf-8")
    except UnicodeDecodeError:
        return [""], {}
    return text.split("\f"), {"extractor": "fallback-utf8"}


def _ocr_pages(content: bytes) -> list[str]:
    """Real OCR kernel: rasterize each page with PyMuPDF, run
    tesseract on the pixmap. Executable wherever the ``[ingest]``
    extras (pymupdf + pytesseract + pillow, see pyproject.toml) are
    installed. Without them (this container), the extras-free OCR-lite
    path runs first (r13): extract the page image XObjects
    (``pdf_pure.extract_page_images`` — /DCTDecode streams decode
    through the in-container JPEG kernel), then STRICT bitmap-font
    glyph matching (``sources/ocr_pure``) — strict meaning any page
    whose rasters don't match the font exactly falls through to the
    honest NotImplementedError seam rather than reading as garbage.
    The reference does the same work serially through one shared temp
    file (data_ingestion.py:136-168); here the rasterize+OCR runs per
    document inside the Arrow-batched mapInPandas, no temp files.
    """
    if not (HAVE_OCR and HAVE_FITZ):  # env seam: try OCR-lite first
        from data_ingestion_py_spark.sources.ocr_pure import (
            ALNUM_TEMPLATES,
            ocr_pdf_pages,
        )

        # try the digits font then the full A-Z/0-9 font (r14 —
        # real WORDS from scanned prose); one parse + raster decode
        # for both, and strict still refuses off-font scans
        lite = ocr_pdf_pages(
            content, strict=True, templates=[None, ALNUM_TEMPLATES]
        )
        if lite is not None:
            return lite
        raise NotImplementedError(
            "OCR fallback requires pytesseract + pymupdf + pillow "
            "(pip install 'data-ingestion-py-spark[ingest]'); not "
            "available in this environment, and the document's page "
            "images are not bitmap-font rasters the extras-free "
            "OCR-lite path recognizes "
            "(reference: data_ingestion.py:136-168)"
        )
    from PIL import Image  # pragma: no cover - exercised via extras

    doc = fitz.open(stream=content, filetype="pdf")  # pragma: no cover
    out: list[str] = []  # pragma: no cover
    for page in doc:  # pragma: no cover
        pix = page.get_pixmap(dpi=150)
        img = Image.frombytes("RGB", (pix.width, pix.height), pix.samples)
        out.append(pytesseract.image_to_string(img))
    return out  # pragma: no cover


def scan_pdf_directory(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Distributed binary scan of a directory of PDFs.

    At 100 TB: binaryFile splits by file across executors; tune
    ``spark.sql.files.maxPartitionBytes``/``openCostInBytes`` so small
    PDFs batch into shared tasks.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )


def extract_pages(
    binary_df: DataFrame, password: bytes = b""
) -> DataFrame:
    """binaryFile rows → one row per page (S1 + P9 OCR-need flag).

    Arrow-batched mapInPandas; the extraction lib is loaded once per
    executor process at module import (vs per-page in the reference,
    data_ingestion.py:171). ``password`` (r15) is the corpus-level
    USER password for encrypted documents — a plan-time constant
    captured into the Arrow stage (the common whole-archive-one-
    password shape); per-document passwords would be a join column,
    deliberately out of scope. Wrong-password documents fall through
    exactly like unparseable ones: empty text, needs_ocr set, honest.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "file_path": [],
                "document_name": [],
                "page_number": [],
                "page_text": [],
                "needs_ocr": [],
                "document_metadata": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                if HAVE_FITZ:
                    pages, meta = _extract_pages_fitz(content)
                else:
                    pages, meta = _extract_pages_fallback(
                        content, password
                    )
                # P9: whole-document empty-text predicate decides OCR
                needs_ocr = sum(len(p.strip()) for p in pages) == 0
                if needs_ocr:
                    try:
                        pages = _ocr_pages(content)
                        meta = {**meta, "extractor": "ocr"
                                if HAVE_OCR else "ocr-lite"}
                    except NotImplementedError:
                        pass  # honest: text stays empty, flag stays set
                name = path.rsplit("/", 1)[-1]
                for i, text in enumerate(pages):
                    out["file_path"].append(path)
                    out["document_name"].append(name)
                    out["page_number"].append(i + 1)
                    out["page_text"].append(text)
                    out["needs_ocr"].append(needs_ocr)
                    out["document_metadata"].append(meta)
            yield pd.DataFrame(out)

    return spread_for_kernel(binary_df).mapInPandas(_extract, PAGE_ROW_SCHEMA)


IMAGE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("document_name", T.StringType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("image_index", T.IntegerType(), False),
        T.StructField("xobject_name", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def extract_image_xobjects(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → one row per page image XObject (r13, VERDICT
    task #4): the scanned-PDF entry point the reference rasterizes for
    OCR (data_ingestion.py:136-168), extras-free. ``kind='jpeg'`` rows
    carry the COMPLETE JPEG file a terminal /DCTDecode stream stores
    (decodable downstream by the in-container kernel —
    ``multimodal.pixel_checksums`` / ``decode_jpeg_array``);
    ``kind='raw'`` rows carry 8-bit /DeviceGray samples. Arrow-batched
    mapInPandas, one narrow stage, no shuffle; documents that aren't
    parseable unencrypted PDFs (or whose images hide behind
    CCITT/JBIG2/JPX) emit no rows — never guessed pixels."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_page_images,
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out: dict[str, list] = {
                f.name: [] for f in IMAGE_ROW_SCHEMA.fields
            }
            for path, content in zip(
                pdf_batch["path"], pdf_batch["content"]
            ):
                imgs = extract_page_images(bytes(content))
                if not imgs:
                    continue
                name = path.rsplit("/", 1)[-1]
                for pno, idx, xname, w, h, _bpc, kind, data in imgs:
                    out["file_path"].append(path)
                    out["document_name"].append(name)
                    out["page_number"].append(pno)
                    out["image_index"].append(idx)
                    out["xobject_name"].append(xname)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["kind"].append(kind)
                    out["data"].append(data)
            yield pd.DataFrame(out)

    return spread_for_kernel(binary_df).mapInPandas(_extract, IMAGE_ROW_SCHEMA)


SCANNED_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("document_name", T.StringType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("page_text", T.StringType(), False),
    ]
)


def extract_scanned_text(
    binary_df: DataFrame,
    templates: dict | None = None,
    strict: bool = True,
) -> DataFrame:
    """binaryFile rows → one row per OCR-lite-recognized page of a
    scanned PDF: the dedicated stage for corpora KNOWN to be typeset
    in a bitmap font (pass ``ocr_pure.TEXT_TEMPLATES`` for digits +
    '.'/' ' running text). Unlike ``extract_pages`` — whose OCR branch
    keeps the digits-only default so unknown scans fall through to the
    pytesseract seam — this stage lets the caller choose the font.
    Documents with no recognizable page images emit no rows. One
    narrow Arrow stage, no shuffle."""
    from data_ingestion_py_spark.sources.ocr_pure import ocr_pdf_pages

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out: dict[str, list] = {
                f.name: [] for f in SCANNED_TEXT_SCHEMA.fields
            }
            for path, content in zip(
                pdf_batch["path"], pdf_batch["content"]
            ):
                pages = ocr_pdf_pages(
                    bytes(content), strict=strict, templates=templates
                )
                if pages is None:
                    continue
                name = path.rsplit("/", 1)[-1]
                for i, text in enumerate(pages):
                    out["file_path"].append(path)
                    out["document_name"].append(name)
                    out["page_number"].append(i + 1)
                    out["page_text"].append(text)
            yield pd.DataFrame(out)

    return spread_for_kernel(binary_df).mapInPandas(_extract, SCANNED_TEXT_SCHEMA)


def pages_with_links(pages: DataFrame, link_col: str = "file_path") -> DataFrame:
    """T4 derived page link: file_link + '#page=' + n (reference :128)."""
    return pages.withColumn(
        "page_link",
        F.concat(F.col(link_col), F.lit("#page="), F.col("page_number").cast("string")),
    )


ANNOT_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("document_name", T.StringType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("annot_index", T.IntegerType(), False),
        T.StructField("subtype", T.StringType(), False),
        T.StructField("contents", T.StringType(), False),
    ]
)


def extract_annotation_text(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → one row per page annotation with a string
    /Contents (r14): the markup layer outside content streams —
    review comments, sticky notes, free-text boxes. Arrow-batched
    mapInPandas over ``pdf_pure.extract_annotations``, one narrow
    stage, no shuffle; unparseable documents emit no rows."""
    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_annotations,
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out: dict[str, list] = {
                f.name: [] for f in ANNOT_ROW_SCHEMA.fields
            }
            for path, content in zip(
                pdf_batch["path"], pdf_batch["content"]
            ):
                rows = extract_annotations(bytes(content))
                if not rows:
                    continue
                name = path.rsplit("/", 1)[-1]
                for pno, idx, sub, text in rows:
                    out["file_path"].append(path)
                    out["document_name"].append(name)
                    out["page_number"].append(pno)
                    out["annot_index"].append(idx)
                    out["subtype"].append(sub)
                    out["contents"].append(text)
            yield pd.DataFrame(out)

    return spread_for_kernel(binary_df).mapInPandas(_extract, ANNOT_ROW_SCHEMA)
