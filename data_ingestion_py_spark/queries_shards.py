"""Compressed text-shard ingestion queries (sources/shards.py kernels).

The reference ingests one local uncompressed file at a time
(data_ingestion.py:110-134); real LLM corpora arrive as compressed
shards — ``.jsonl.zst`` (Dolma/Pile), ``.tar.zst`` (WebDataset), raw
``.lz4``. These queries plant COMPLETE VALID compressed shards in column
algebra (zstd raw/RLE frames and LZ4 stored blocks need no entropy coder,
so the fixture bytes are exact arithmetic), push them through the Arrow
``mapInPandas`` walkers, and oracle every emitted row arithmetically in
DuckDB — a walker that mis-sizes a frame header, forgets the two-byte FCS
bias, or desyncs a block walk position-mismatches immediately. Entropy-
coded shards (pyarrow's C encoders), checksum verification, and the
corruption contracts are pinned in tests/test_shards.py.

Scale shape: every query is ONE narrow Arrow stage over the shard table —
no shuffle, no collect; the frame/block rows ARE the byte-range split plan
a 1000-executor reader would fan out (the warc.gz / MP4-sample-table
pattern applied to corpus shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_py_spark.io import load_table
from data_ingestion_py_spark.queries import register
from data_ingestion_py_spark.queries_mm import _tar_header_hex
from data_ingestion_py_spark.sources import shards
from data_ingestion_py_spark.sources.shards import xxh32

_ZSTD_MAGIC_HEX = "28b52ffd"  # 0xFD2FB528 little-endian
_LZ4_MAGIC_HEX = "04224d18"  # 0x184D2204 little-endian


def _le_hex(value: Column | int, nbytes: int) -> Column:
    """Little-endian ``nbytes`` hex of a column value — how zstd/LZ4
    headers store sizes (Spark's ``hex`` is big-endian, so bytes are
    emitted least-significant first)."""
    v = F.lit(value) if isinstance(value, int) else value
    return F.concat(
        *[
            F.lpad(F.hex(F.pmod(F.floor(v / (256**i)), F.lit(256))), 2, "0")
            for i in range(nbytes)
        ]
    )


@register(
    "shards_zstd_frame_plan",
    """
SELECT doc_id AS media_id, 0 AS frame_index,
       CAST(0 AS BIGINT) AS offset,
       CAST(9 + 100 + doc_id % 50 AS BIGINT) AS comp_size,
       CAST(100 + doc_id % 50 AS BIGINT) AS content_size,
       'zstd' AS kind, 1 AS n_blocks
FROM documents
UNION ALL
SELECT doc_id, 1,
       CAST(9 + 100 + doc_id % 50 AS BIGINT),
       CAST(8 + doc_id % 32 AS BIGINT),
       CAST(doc_id % 32 AS BIGINT),
       'skippable', 0
FROM documents
UNION ALL
SELECT doc_id, 2,
       CAST(17 + 100 + doc_id % 50 + doc_id % 32 AS BIGINT),
       CAST(11 AS BIGINT),
       CAST(256 + doc_id % 200 AS BIGINT),
       'zstd', 1
FROM documents
""",
    tags=("shards", "source", "zstd"),
)
def q_shards_zstd_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zstd shard SPLIT PLAN end-to-end: three concatenated frames per
    document — a raw-block frame (single-segment, 1-byte FCS), a
    skippable frame (the zstd-dictionary / seek-table idiom, magic
    nibble varying per row), and an RLE frame whose TWO-BYTE FCS
    exercises the spec's +256 bias (content 256..455 regenerated from
    one stored byte) — built entirely in column algebra and walked back
    into per-frame byte ranges by ``sources/shards.zstd_frames`` WITHOUT
    decompressing. The oracle states every offset/size arithmetically:
    a walk that mis-counts the frame header, forgets the FCS bias, or
    treats the RLE block's regenerated size as its stored size
    position-mismatches. Entropy-coded frames are pinned against
    pyarrow's C encoder in tests/test_shards.py. One narrow Arrow
    stage, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    la = doc % 50 + 100
    ls = doc % 32
    lb_fcs = doc % 200  # stored FCS value; content = 256 + value
    frame_a = F.concat(
        F.lit(_ZSTD_MAGIC_HEX + "20"),
        _le_hex(la, 1),                 # 1-byte FCS
        _le_hex(la * 8 + 1, 3),         # block header: raw, last
        F.repeat(F.lit("78"), la.cast("int")),
    )
    skip = F.concat(
        F.lpad(F.hex(F.lit(0x50) + F.pmod(doc, F.lit(16))), 2, "0"),
        F.lit("2a4d18"),
        _le_hex(ls, 4),
        F.repeat(F.lit("79"), ls.cast("int")),
    )
    frame_b = F.concat(
        F.lit(_ZSTD_MAGIC_HEX + "60"),
        _le_hex(lb_fcs, 2),                       # 2-byte FCS (+256 bias)
        _le_hex((lb_fcs + 256) * 8 + 2 + 1, 3),   # block header: RLE, last
        F.lit("41"),                              # the one stored byte
    )
    media = d.select(
        doc.alias("media_id"),
        F.unhex(F.concat(frame_a, skip, frame_b)).alias("payload"),
    )
    return shards.zstd_frame_manifest(media).select(
        "media_id",
        "frame_index",
        "offset",
        "comp_size",
        "content_size",
        "kind",
        "n_blocks",
    )


@register(
    "corpus_jsonl_zst_lines",
    """
WITH recs AS (
    SELECT doc_id,
           unnest(generate_series(0, 2 + doc_id % 4)) AS j
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(j AS INT) AS line_index,
       CAST(19 + length(CAST(doc_id AS VARCHAR)) + 1
               + length(CAST(j AS VARCHAR))
               + 5 + (doc_id + j * 5) % 11 AS INT) AS line_bytes,
       CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS rec_id,
       CAST(5 + (doc_id + j * 5) % 11 AS INT) AS n_text_chars
FROM recs
""",
    tags=("shards", "source", "zstd", "corpus"),
    bench=True,
)
def q_corpus_jsonl_zst_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.jsonl.zst`` corpus ingestion end-to-end — the Dolma/Pile shard
    layout: each document becomes a zstd frame (raw block, planted in
    column algebra) holding 3-6 REAL JSON records
    ``{"id":"<doc>-<j>","text":"<c×L>"}`` with arithmetic id/text shapes;
    ``sources/shards.jsonl_shard_manifest`` decompresses the frame
    (pure raw-block walk — zero libraries), splits the jsonl framing,
    parses each record, and emits (line_index, line_bytes, rec_id,
    n_text_chars). The oracle restates every record arithmetically — a
    reader that drops the trailing-newline rule, miscounts a record's
    bytes, or mis-parses the JSON text field mismatches row-for-row.
    Entropy-coded shards and the gzip/bz2/xz/lz4 variants of the same
    reader are pinned in tests/test_shards.py. One narrow Arrow stage,
    no shuffle — shards decode independently, the 100 TB shape."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    content, total = _jsonl_content(doc)
    payload_hex = F.concat(
        F.lit(_ZSTD_MAGIC_HEX + "20"),
        _le_hex(total, 1),
        _le_hex(total * 8 + 1, 3),
        F.hex(F.encode(content, "UTF-8")),
    )
    media = d.select(
        doc.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return shards.jsonl_shard_manifest(media).select(
        "media_id", "line_index", "line_bytes", "rec_id", "n_text_chars"
    )


def _jsonl_content(doc: Column) -> tuple[Column, Column]:
    """The shared planted jsonl shard body: 3-6 REAL JSON records
    ``{"id":"<doc>-<j>","text":"<c×L>"}`` with arithmetic shapes;
    returns (content string, total byte length — ASCII so chars ==
    bytes, < 256 per shard)."""
    k = (doc % 4 + 3).cast("int")

    def line(j: Column) -> Column:
        length = (doc + j * 5) % 11 + 5
        ch = F.char(F.pmod(doc * 7 + j * 3, F.lit(26)) + 97)
        return F.concat(
            F.lit('{"id":"'),
            doc.cast("string"),
            F.lit("-"),
            j.cast("string"),
            F.lit('","text":"'),
            F.repeat(ch, length.cast("int")),
            F.lit('"}\n'),
        )

    content = F.concat_ws(
        "", F.transform(F.sequence(F.lit(0), k - 1), line)
    )
    return content, F.length(content)


@register(
    "shards_lz4_block_plan",
    """
SELECT doc_id AS media_id, 0 AS frame_index, 0 AS block_index,
       CAST(11 AS BIGINT) AS offset,
       CAST(64 + doc_id % 64 AS BIGINT) AS comp_size,
       TRUE AS stored
FROM documents
UNION ALL
SELECT doc_id, 0, 1,
       CAST(15 + 64 + doc_id % 64 AS BIGINT),
       CAST(32 + doc_id % 32 AS BIGINT),
       TRUE
FROM documents
""",
    tags=("shards", "source", "lz4"),
)
def q_shards_lz4_block_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ4 shard split plan end-to-end: per document one
    block-INDEPENDENT LZ4 frame (FLG 0x60 — version 1, independence
    flag; BD 0x40) with two stored blocks of varying size and the
    mandatory EndMark, planted in column algebra with the REAL one-byte
    header checksum (XXH32 of the descriptor — the walker VERIFIES it,
    so a planting with the wrong FLG/BD or a walk with the wrong xxh32
    emits zero rows; xxh32 itself is pinned against pyarrow's C encoder
    in tests/test_shards.py). ``sources/shards.lz4_blocks`` walks the
    frame back into per-block byte ranges without decoding — stored
    blocks ship as-is, and independence-flagged compressed blocks decode
    on any executor in any order (the fine-grained 100 TB split).
    Oracle restates offsets/sizes arithmetically. One narrow Arrow
    stage, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    b1 = doc % 64 + 64
    b2 = doc % 32 + 32
    hc = (xxh32(bytes([0x60, 0x40])) >> 8) & 0xFF
    payload_hex = F.concat(
        F.lit(_LZ4_MAGIC_HEX + "6040" + format(hc, "02x")),
        _le_hex(b1, 3),
        F.lit("80"),  # high bit of the size word: stored block
        F.repeat(F.lit("61"), b1.cast("int")),
        _le_hex(b2, 3),
        F.lit("80"),
        F.repeat(F.lit("62"), b2.cast("int")),
        F.lit("00000000"),  # EndMark
    )
    media = d.select(
        doc.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return shards.lz4_block_manifest(media).select(
        "media_id", "frame_index", "block_index", "offset", "comp_size",
        "stored",
    )


@register(
    "corpus_tar_zst_members",
    """
SELECT doc_id AS media_id,
       'd' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || 't.txt' AS name,
       CAST(64 AS BIGINT) AS size,
       CAST(512 AS BIGINT) AS byte_offset
FROM documents
""",
    tags=("shards", "source", "zstd", "web"),
)
def q_corpus_tar_zst_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset ``.tar.zst`` member extraction end-to-end: the planted
    ustar archive (one 64-byte member, spec-shaped header INCLUDING the
    recomputed octal checksum — the same column-algebra construction as
    archive_tar_manifest) is wrapped in a zstd raw-block frame (2048
    bytes → two-byte FCS with the +256 bias, constant header hex), then
    ``sources/shards.compressed_tar_manifest`` sniffs the magic,
    decompresses with the pure raw-block walk, and re-walks the ustar
    headers with checksum verification. A wrong FCS bias, a raw-block
    size off by one, or a tar checksum mis-plant yields zero rows — the
    kernels never guess. Real zstd/gzip/bz2/xz/lz4 tars from stdlib
    tarfile + pyarrow are pinned in tests/test_shards.py. One narrow
    Arrow stage, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    digits = F.lpad(F.col("doc_id").cast("string"), 8, "0")
    dsum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.substring(digits, i, 1).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    # _TAR_CHK_BASE(3521) + suffix "t.txt"(514) + size-octal "100"(1)
    hdr = _tar_header_hex(
        digits, "t.txt", F.lit("00000000100"), F.lit(4036) + dsum
    )
    # tar = header(512) + content 64 padded to 512 + end-of-archive 1024
    # = 2048 bytes → zstd raw frame: FHD 0x60, FCS LE16(2048-256=1792),
    # block header LE24((2048<<3)|1)
    tar_hex = F.concat(
        hdr,
        F.lit("74" * 64 + "00" * 448),
        F.lit("00" * 1024),
    )
    payload_hex = F.concat(
        F.lit(_ZSTD_MAGIC_HEX + "60" + "0007" + "014000"),
        tar_hex,
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(payload_hex).alias("payload"),
    )
    return shards.compressed_tar_manifest(media).where(
        F.col("typeflag") == "0"
    ).select("media_id", "name", "size", "byte_offset")


@register(
    "archive_orc_stripes",
    """
SELECT doc_id AS media_id, 0 AS stripe_index,
       CAST(3 AS BIGINT) AS offset,
       CAST(0 AS BIGINT) AS index_length,
       CAST(64 + doc_id % 60 AS BIGINT) AS data_length,
       CAST(0 AS BIGINT) AS footer_length,
       CAST(doc_id % 100 + 1 AS BIGINT) AS n_rows,
       CAST(doc_id % 100 + 1 AS BIGINT) AS file_rows,
       'none' AS compression
FROM documents
""",
    tags=("shards", "source", "orc"),
)
def q_archive_orc_stripes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC stripe SPLIT PLAN end-to-end — the parquet-footer walk
    (archive_parquet_rowgroups) re-expressed for the other columnar
    format: complete valid ORC files planted in column algebra ('ORC'
    magic, a data region of varying size, an UNCOMPRESSED protobuf
    footer whose stripe directory / type tree / row counts are
    hand-encoded varint fields — all planted values < 128 so every
    varint is one arithmetic byte — and the never-compressed postscript
    with the field-8000 'ORC' magic), walked TAIL-FIRST by
    ``sources/archive.orc_file_info`` into per-stripe byte ranges. The
    oracle restates the directory arithmetically — a walk that misreads
    the postscript length byte, the footer length, or any varint tag
    emits zero or shifted rows. Real files from pyarrow's C++ writer at
    all five compression kinds (zlib/snappy/lz4/zstd chunk framing
    through the pure kernels) and from Spark's own ORC writer are
    pinned in tests/test_orc.py. One narrow Arrow stage, no shuffle;
    stripes are independently readable, so these rows are exactly what
    a 1000-executor scheduler fans out."""
    from data_ingestion_py_spark.sources.archive import orc_stripe_manifest

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    dlen = doc % 60 + 64   # data_length: 1-byte varint
    rows = doc % 100 + 1   # numberOfRows: 1-byte varint
    b = lambda col: F.lpad(F.hex(col), 2, "0")  # noqa: E731
    footer_hex = F.concat(
        F.lit("0803"), F.lit("10"), b(dlen + 3),      # headerLen, contentLen
        F.lit("1a0a" "0803" "1000" "18"), b(dlen),    # stripe: off 3, idx 0
        F.lit("2000" "28"), b(rows),                  #   ftr 0, rows
        F.lit("2208" "080c" "120101" "1a0161"),       # struct{a: int}
        F.lit("2202" "0803"),                         # child type INT
        F.lit("30"), b(rows),                         # numberOfRows
    )
    payload_hex = F.concat(
        F.lit("4f5243"),                              # 'ORC'
        F.repeat(F.lit("7a"), dlen.cast("int")),      # stripe data region
        footer_hex,
        F.lit("0820" "1000" "82f40303" "4f5243"),     # postscript
        F.lit("0b"),                                  # postscript length
    )
    media = d.select(
        doc.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return orc_stripe_manifest(media).select(
        "media_id", "stripe_index", "offset", "index_length",
        "data_length", "footer_length", "n_rows", "file_rows",
        "compression",
    )


@register(
    "corpus_zstd_entropy_records",
    """
SELECT doc_id AS media_id,
       CAST(0 AS INT) AS line_index,
       CAST(13 AS INT) AS line_bytes,
       TRUE AS json_ok,
       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS rec_id
FROM documents
""",
    tags=("shards", "source", "zstd", "corpus", "decode"),
)
def q_corpus_zstd_entropy_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 PURE zstd ENTROPY decoder (sources/zstd_pure.py) in the
    driver's correctness gate: a REAL Huffman-compressed zstd block
    planted in column algebra. The trick that makes an entropy stream
    plantable: a 32-symbol alphabet whose weights are all 1 yields
    constant-width 5-bit canonical codes (code = the symbol's rank),
    so every bit position is plan-time constant and only the four
    digit codes of the record id vary per row — each stream byte is a
    constant plus shiftright(digit-code) terms, the TIFF-LZW planting
    pattern applied to zstd's BACKWARD bitstream (marker bit on top,
    codes MSB-first downward). The frame is a complete
    zstd frame holding one Compressed_Block: literals header
    (type 2, 1-stream, regen 14 / comp 73), a 64-byte direct-weights
    Huffman tree description (symbols 0..125 listed, the implied last
    weight completing the Kraft sum at '~'), the 9-byte code stream,
    and a zero sequence count — and carries NO Frame_Content_Size
    (window-descriptor form, the streaming-writer shape), so the
    exact-size pyarrow kernel cannot run and decoding goes through the
    pure FSE/Huffman decoder unconditionally. jsonl_shard_manifest
    parses the regenerated '{"id":"NNNN"}' JSON record, and the oracle
    restates the id arithmetically — one wrong weight, rank, bit
    position, or literals-header field and the frame refuses to decode
    (zero rows) or the id mismatches. One narrow Arrow stage, no
    shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")

    chars = sorted(
        [10, 34] + list(range(48, 58)) + [58, 100, 105]
        + list(range(109, 123)) + [123, 125, 126]
    )
    rank = {c: i for i, c in enumerate(chars)}

    # tree description: constant (symbols 0..125 direct 4-bit weights)
    weights = [0] * 126
    for c in chars:
        if c != 126:
            weights[c] = 1
    wb = bytearray(63)
    for i, w in enumerate(weights):
        wb[i // 2] |= w << (4 if i % 2 == 0 else 0)
    tree_hex = (bytes([127 + 126]) + bytes(wb)).hex()

    # the 14-char content '{"id":"NNNN"}\n'; codes are 5-bit ranks,
    # packed below the marker bit (bit 70), MSB-first per char
    content = '{"id":"' + "????" + '"}\n'
    digit_pos = {7: 3, 8: 2, 9: 1, 10: 0}  # char index -> 10^k place

    def digit_code(k: int) -> "F.Column":
        return (
            F.pmod(F.floor(F.pmod(doc, F.lit(10000)) / (10**k)), F.lit(10))
            + 2  # rank('0') == 2 and digits are contiguous ranks
        ).cast("int")

    stream_bytes = []
    for n in range(9):
        const = 0
        terms = []
        for j in range(8 * n, 8 * n + 8):
            if j == 70:
                const += 1 << (j - 8 * n)  # the padding marker bit
                continue
            if j > 70:
                continue
            ci = (70 - 1 - j) // 5  # which char covers bit j
            lo = 70 - 5 * (ci + 1)
            if ci in digit_pos:
                terms.append(
                    F.pmod(
                        F.shiftright(digit_code(digit_pos[ci]), j - lo),
                        F.lit(2),
                    )
                    * (1 << (j - 8 * n))
                )
            else:
                code = rank[ord(content[ci])]
                const += ((code >> (j - lo)) & 1) << (j - 8 * n)
        stream_bytes.append(
            F.lpad(F.hex(sum(terms, F.lit(const))), 2, "0")
        )

    lit_hdr = (2 | (14 << 4) | (73 << 14)).to_bytes(3, "little").hex()
    block_hdr = ((77 << 3) | (2 << 1) | 1).to_bytes(3, "little").hex()
    payload_hex = F.concat(
        F.lit(_ZSTD_MAGIC_HEX + "0088" + block_hdr + lit_hdr + tree_hex),
        *stream_bytes,
        F.lit("00"),  # Number_of_Sequences = 0
    )
    media = d.select(
        doc.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return shards.jsonl_shard_manifest(media).select(
        "media_id", "line_index", "line_bytes", "json_ok", "rec_id"
    )


@register(
    "corpus_jsonl_lz4_lines",
    """
WITH recs AS (
    SELECT doc_id,
           unnest(generate_series(0, 2 + doc_id % 4)) AS j
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(j AS INT) AS line_index,
       CAST(19 + length(CAST(doc_id AS VARCHAR)) + 1
               + length(CAST(j AS VARCHAR))
               + 5 + (doc_id + j * 5) % 11 AS INT) AS line_bytes,
       CAST(doc_id AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS rec_id,
       CAST(5 + (doc_id + j * 5) % 11 AS INT) AS n_text_chars
FROM recs
""",
    tags=("shards", "source", "lz4", "corpus"),
)
def q_corpus_jsonl_lz4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_jsonl_zst_lines with the OTHER container — the
    codec-agnostic intake claim in executable form: the IDENTICAL
    planted jsonl records (same `_jsonl_content` fixture, same oracle
    arithmetic) arrive as an LZ4 frame (FLG 0x60 with the REAL
    verified XXH32 header-checksum byte, one stored block, EndMark)
    instead of a zstd frame, and the same sniff-and-decompress reader
    (`jsonl_shard_manifest` → `decompress_auto`) emits byte-identical
    rows. A reader that special-cases one codec, mis-walks the LZ4
    stored-block size word, or mis-plants the checksum emits zero or
    shifted rows. One narrow Arrow stage, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    doc = F.col("doc_id")
    content, total = _jsonl_content(doc)
    hc = (xxh32(bytes([0x60, 0x40])) >> 8) & 0xFF
    payload_hex = F.concat(
        F.lit(_LZ4_MAGIC_HEX + "6040" + format(hc, "02x")),
        _le_hex(total, 3),
        F.lit("80"),  # stored-block flag on the size word
        F.hex(F.encode(content, "UTF-8")),
        F.lit("00000000"),  # EndMark
    )
    media = d.select(
        doc.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )
    return shards.jsonl_shard_manifest(media).select(
        "media_id", "line_index", "line_bytes", "rec_id", "n_text_chars"
    )
