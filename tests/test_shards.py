"""Compressed text-shard ingestion kernels (sources/shards.py).

Every checksum implementation is pinned against an INDEPENDENT
implementation that ships in this container: XXH32 against the
header-checksum byte pyarrow's C LZ4 encoder writes (plus the spec's
empty-input vector), XXH64 against Spark's JVM ``F.xxhash64`` (XXH64,
seed 42, over binary columns). The LZ4 block decoder and zstd frame
walk are pinned against pyarrow's C encoders end-to-end, and every
walker carries the house corruption contract: torn tail → verified
prefix, bad magic → None, bounded regeneration (bomb guard).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
import tarfile

import pyarrow as pa
import pytest

from data_ingestion_py_spark.sources import shards as S


def _u32(x: int) -> bytes:
    return struct.pack("<I", x)


def _zstd_raw_frame(
    content: bytes, rle: tuple[int, int] | None = None, cksum: bool = False
) -> bytes:
    """Hand-build a raw(+optional RLE tail)-block zstd frame with a
    single-segment header and an exact FCS — the planted-fixture shape."""
    total = len(content) + (rle[1] if rle else 0)
    fhd = 0x20 | (0x04 if cksum else 0)
    if total < 256:
        fcs = bytes([total])
    elif total - 256 <= 0xFFFF:
        fhd |= 0x40
        fcs = struct.pack("<H", total - 256)
    else:
        fhd |= 0x80
        fcs = struct.pack("<I", total)
    out = _u32(S.ZSTD_FRAME_MAGIC) + bytes([fhd]) + fcs
    last_raw = 0 if rle else 1
    out += struct.pack("<I", (len(content) << 3) | last_raw)[:3] + content
    body = content
    if rle:
        byte, count = rle
        out += struct.pack("<I", (count << 3) | 2 | 1)[:3] + bytes([byte])
        body = content + bytes([byte]) * count
    if cksum:
        out += _u32(S.xxh64(body) & 0xFFFFFFFF)
    return out


# ---------------------------------------------------------------- xxhash


def test_xxh_spec_vectors():
    assert S.xxh32(b"") == 0x02CC5D05
    assert S.xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh32_pinned_by_pyarrow_lz4_header_checksum():
    """pyarrow's C LZ4 encoder writes HC = (XXH32(descriptor)>>8)&0xFF;
    our walk re-derives it — a frame from the independent C encoder
    walking at all IS the xxh32 pin (wrong xxh32 → torn-tail None)."""
    comp = bytes(pa.Codec("lz4").compress(b"pin me " * 512))
    frames = S.lz4_frames(comp)
    assert frames is not None and frames[0][1] == len(comp)


def test_xxh64_pinned_by_spark_jvm_implementation(spark):
    """Spark's ``xxhash64`` over a binary column is XXH64 seed 42 in the
    JVM — an implementation we didn't write. Byte lengths cross every
    code path: empty, <4, 4..7, 8..31, exactly 32, >32 with all tails."""
    from pyspark.sql import functions as F

    blobs = [
        bytes([(i * 37 + n) % 256 for i in range(n)])
        for n in (0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 100, 257)
    ]
    rows = spark.createDataFrame(
        [(b,) for b in blobs], "b binary"
    ).select(F.xxhash64("b").alias("h")).collect()
    for blob, row in zip(blobs, rows):
        mine = S.xxh64(blob, seed=42)
        assert mine - (mine >= 1 << 63) * (1 << 64) == row.h


# ------------------------------------------------------------------ LZ4


def test_lz4_block_roundtrip_vs_pyarrow_c_encoder():
    data = b"the quick brown fox jumps over the lazy dog " * 300
    raw = bytes(pa.Codec("lz4_raw").compress(data))
    assert len(raw) < len(data)  # really compressed, matches exercised
    assert S.lz4_block_decompress(raw) == data


def test_lz4_block_overlap_copy_and_malformed():
    # token: 4 literals "abcd", then match len 8 at offset 2 (overlap RLE)
    blk = bytes([0x44]) + b"abcd" + b"\x02\x00" + bytes([0x10]) + b"z"
    assert S.lz4_block_decompress(blk) == b"abcd" + b"cdcdcdcd" + b"z"
    assert S.lz4_block_decompress(b"") is None
    assert S.lz4_block_decompress(bytes([0x44]) + b"ab") is None  # torn lit
    # offset before window start
    bad = bytes([0x14]) + b"a" + b"\x09\x00" + bytes([0x00])
    assert S.lz4_block_decompress(bad) is None
    # offset zero
    bad0 = bytes([0x14]) + b"a" + b"\x00\x00" + bytes([0x00])
    assert S.lz4_block_decompress(bad0) is None


def test_lz4_block_bomb_guard():
    # 15+255+... literal extension declaring more than max_out
    data = b"x" * 100
    raw = bytes(pa.Codec("lz4_raw").compress(data))
    assert S.lz4_block_decompress(raw, max_out=10) is None


def test_lz4_frame_walk_and_decompress_vs_pyarrow():
    data = bytes([(i * 13) % 251 for i in range(50_000)])
    comp = bytes(pa.Codec("lz4").compress(data))
    frames = S.lz4_frames(comp)
    assert frames is not None and len(frames) == 1
    off, comp_sz, csize, nb, indep, ccksum = frames[0]
    assert (off, comp_sz) == (0, len(comp)) and nb >= 1 and indep
    assert S.lz4_frame_decompress(comp) == data
    blocks = S.lz4_blocks(comp)
    assert blocks is not None and len(blocks) == nb
    # block byte ranges are exact: re-slicing decodes each block alone
    out = b""
    for _fi, _bi, boff, bsz, stored in blocks:
        piece = comp[boff : boff + bsz]
        out += piece if stored else S.lz4_block_decompress(piece)
    assert out == data


def test_lz4_dependent_frame_with_content_checksum():
    """Hand-built block-DEPENDENT frame: block 2's match reaches into
    block 1's decoded history; content checksum verified at the end."""
    descriptor = bytes([0x44, 0x40])  # v1, dependent, content-checksum
    hc = (S.xxh32(descriptor) >> 8) & 0xFF
    blk1 = b"ABCDEFGH"
    # 0 literals, match len 8 @ offset 8 (= blk1), then literal tail "ZZ"
    blk2 = bytes([0x04]) + b"\x08\x00" + bytes([0x20]) + b"ZZ"
    content = blk1 + b"ABCDEFGHZZ"
    frame = (
        _u32(S.LZ4_FRAME_MAGIC)
        + descriptor
        + bytes([hc])
        + _u32(0x80000000 | len(blk1))
        + blk1
        + _u32(len(blk2))
        + blk2
        + _u32(0)
        + _u32(S.xxh32(content))
    )
    assert S.lz4_frame_decompress(frame) == content
    # flip one content byte: checksum catches it
    bad = bytearray(frame)
    bad[11] ^= 1  # inside blk1 (stored)
    assert S.lz4_frame_decompress(bytes(bad)) is None


def test_lz4_frames_corruption_contract():
    data = b"y" * 4096
    comp = bytes(pa.Codec("lz4").compress(data))
    assert S.lz4_frames(b"\x00" * 16) is None
    assert S.lz4_frames(None) is None
    # torn tail: walk returns None when nothing verified
    assert S.lz4_frames(comp[: len(comp) // 2]) is None
    # two frames, second torn → verified prefix only
    both = comp + comp[: len(comp) - 3]
    frames = S.lz4_frames(both)
    assert frames is not None and len(frames) == 1
    # corrupted header-checksum byte → torn at frame 0
    bad = bytearray(comp)
    bad[6] ^= 0xFF
    assert S.lz4_frames(bytes(bad)) is None


# ----------------------------------------------------------------- zstd


def test_zstd_frame_walk_vs_pyarrow():
    data = bytes([(i * 31) % 256 for i in range(30_000)])
    comp = bytes(pa.Codec("zstd").compress(data))
    frames = S.zstd_frames(comp)
    assert frames is not None and len(frames) == 1
    off, comp_sz, csize, kind, nb, ck = frames[0]
    assert (off, comp_sz, csize, kind) == (0, len(comp), len(data), "zstd")
    assert S.zstd_frame_decompress(comp) == data


def test_zstd_raw_rle_pure_decode_and_checksum():
    frame = _zstd_raw_frame(b"hello world", rle=(0x41, 500), cksum=True)
    frames = S.zstd_frames(frame)
    assert frames == [(0, len(frame), 511, "zstd", 2, True)]
    assert (
        S.zstd_frame_decompress(frame) == b"hello world" + b"A" * 500
    )
    bad = bytearray(frame)
    bad[-5] ^= 1  # corrupt the RLE byte → checksum mismatch
    assert S.zstd_frame_decompress(bytes(bad)) is None


def test_zstd_multi_frame_and_skippable():
    f1 = _zstd_raw_frame(b"first")
    skip = _u32(0x184D2A5C) + _u32(6) + b"dictid"
    f2 = bytes(pa.Codec("zstd").compress(b"second " * 100))
    payload = f1 + skip + f2
    frames = S.zstd_frames(payload)
    assert [f[3] for f in frames] == ["zstd", "skippable", "zstd"]
    assert frames[1][:2] == (len(f1), 14)
    assert S.zstd_decompress_all(payload) == b"first" + b"second " * 100


def test_zstd_corruption_contract():
    f1 = _zstd_raw_frame(b"ok")
    assert S.zstd_frames(b"not zstd at all") is None
    assert S.zstd_frames(None) is None
    # reserved block type (3) → torn at that frame
    bad = f1[:7] + struct.pack("<I", (2 << 3) | (3 << 1) | 1)[:3] + b"xx"
    assert S.zstd_frames(bad) is None
    # second frame torn → verified prefix
    frames = S.zstd_frames(f1 + f1[:5])
    assert frames is not None and len(frames) == 1
    # bomb guard: RLE regenerating past the bound
    big = _zstd_raw_frame(b"", rle=(0x42, 1 << 20))
    assert S.zstd_frame_decompress(big, max_content_bytes=1 << 10) is None


def test_zstd_no_fcs_compressed_block_decodes_pure():
    """A streaming-written frame (no FCS) whose blocks are entropy-coded
    can't use the exact-size pyarrow kernel; the byte-range rows ship
    with content_size None and decompression routes through the r12
    pure FSE/Huffman decoder (sources/zstd_pure) — the former honest
    seam, closed (tests/test_zstd_pure.py has the full matrix)."""
    plain = b"q" * 5000
    comp = bytearray(pa.Codec("zstd").compress(plain))
    fhd = comp[4]
    assert fhd >> 6 == 1 and (fhd >> 5) & 1  # pyarrow writes 2-byte FCS
    # rebuild header: drop single-segment + FCS, add window descriptor
    rebuilt = comp[:4] + bytes([0x00, 0x88]) + comp[7:]
    frames = S.zstd_frames(bytes(rebuilt))
    assert frames is not None and frames[0][2] is None
    assert S.zstd_frame_decompress(bytes(rebuilt)) == plain


# ------------------------------------------------- sniff / auto / jsonl


def test_sniff_and_decompress_auto_all_codecs():
    data = b'{"id": 7, "text": "hello"}\n' * 50
    cases = {
        "gzip": gzip.compress(data),
        "bz2": bz2.compress(data),
        "xz": lzma.compress(data),
        "zstd": bytes(pa.Codec("zstd").compress(data)),
        "lz4": bytes(pa.Codec("lz4").compress(data)),
        "raw": data,
    }
    for codec, payload in cases.items():
        assert S.sniff_compression(payload) == codec
        assert S.decompress_auto(payload) == data, codec
    assert S.sniff_compression(None) is None
    assert S.sniff_compression(b"") is None


def test_gzip_multi_member_and_torn():
    g = gzip.compress(b"a\n") + gzip.compress(b"b\n")
    assert S.decompress_auto(g) == b"a\nb\n"
    assert S.decompress_auto(g[:-4]) is None  # torn trailer: no guess


def test_shard_text_lines_trailing_newline():
    payload = bytes(pa.Codec("zstd").compress(b"l1\nl2\nl3"))
    assert S.shard_text_lines(payload) == [b"l1", b"l2", b"l3"]
    payload2 = gzip.compress(b"l1\nl2\n")
    assert S.shard_text_lines(payload2) == [b"l1", b"l2"]
    assert S.shard_text_lines(b"\x1f\x8bxx") is None


def test_jsonl_shard_manifest(spark):
    shard = (
        b'{"id": "d1", "text": "hello world"}\n'
        b'not json at all\n'
        b'{"id": 2, "text": "hi", "meta": {"x": 1}}\n'
    )
    media = spark.createDataFrame(
        [
            (1, bytes(pa.Codec("zstd").compress(shard))),
            (2, gzip.compress(shard)),
            (3, b"\x1f\x8btorn"),
            (4, None),
        ],
        "media_id long, payload binary",
    )
    rows = {
        (r.media_id, r.line_index): r
        for r in S.jsonl_shard_manifest(media).collect()
    }
    assert len(rows) == 6  # shards 3 and 4 emit nothing
    r = rows[(1, 0)]
    assert (r.json_ok, r.rec_id, r.n_text_chars) == (True, "d1", 11)
    assert rows[(1, 1)].json_ok is False
    assert rows[(2, 2)].rec_id == "2"
    assert rows[(2, 2)].n_text_chars == 2


# ------------------------------------------------------- compressed tar


@pytest.mark.parametrize("codec", ["zstd", "gzip", "bz2", "xz", "lz4"])
def test_compressed_tar_members_stdlib_tarfile(codec):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, body in (("a.txt", b"A" * 64), ("b/c.bin", b"B" * 700)):
            info = tarfile.TarInfo(name)
            info.size = len(body)
            t.addfile(info, io.BytesIO(body))
    tar = buf.getvalue()
    if codec == "gzip":
        payload = gzip.compress(tar)
    elif codec == "bz2":
        payload = bz2.compress(tar)
    elif codec == "xz":
        payload = lzma.compress(tar)
    else:
        payload = bytes(pa.Codec(codec).compress(tar))
    members = S.compressed_tar_members(payload)
    assert members is not None
    names = [(m[0], m[1]) for m in members]
    assert ("a.txt", 64) in names and ("b/c.bin", 700) in names
    assert S.compressed_tar_members(b"\x28\xb5\x2f\xfdxx") is None


def test_compressed_tar_manifest_dataframe(spark):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        info = tarfile.TarInfo("doc.txt")
        info.size = 5
        t.addfile(info, io.BytesIO(b"hello"))
    payload = bytes(pa.Codec("zstd").compress(buf.getvalue()))
    media = spark.createDataFrame(
        [(9, payload)], "media_id long, payload binary"
    )
    rows = S.compressed_tar_manifest(media).collect()
    assert [(r.media_id, r.name, r.size) for r in rows] == [(9, "doc.txt", 5)]


# -------------------------------------------------- manifest DataFrames


def test_zstd_frame_manifest_dataframe(spark):
    payload = _zstd_raw_frame(b"xyz") + bytes(
        pa.Codec("zstd").compress(b"w" * 999)
    )
    media = spark.createDataFrame(
        [(5, payload), (6, b"nope")], "media_id long, payload binary"
    )
    rows = sorted(
        S.zstd_frame_manifest(media).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.media_id for r in rows] == [5, 5]
    assert rows[0].content_size == 3 and rows[1].content_size == 999
    assert rows[1].offset == len(_zstd_raw_frame(b"xyz"))


def test_lz4_block_manifest_dataframe(spark):
    """pyarrow writes multi-block frames block-DEPENDENT (FLG indep 0),
    so per-block ranges replay sequentially threading the history window
    — the manifest's byte ranges must reproduce the stream exactly."""
    orig = bytes(range(256)) * 400
    comp = bytes(pa.Codec("lz4").compress(orig))
    assert S.lz4_frames(comp)[0][4] is False  # dependent: history threads
    media = spark.createDataFrame(
        [(7, comp)], "media_id long, payload binary"
    )
    rows = S.lz4_block_manifest(media).collect()
    assert len(rows) > 1 and all(r.media_id == 7 for r in rows)
    data = b""
    for r in sorted(rows, key=lambda r: (r.frame_index, r.block_index)):
        piece = comp[r.offset : r.offset + r.comp_size]
        if not r.stored:
            piece = S.lz4_block_decompress(piece, prefix=data[-65536:])
        data += piece
    assert data == orig


def test_multi_frame_shard_never_truncates():
    """r13 advisor regression: a 70-frame concatenated shard (the
    pzstd / frame-per-chunk shape) used to hit the old max_frames=64
    walk cap and return 64 frames' content AS SUCCESS. The walks are
    now uncapped by default; all 70 records come back, for zstd and
    LZ4 alike."""
    zc = pa.Codec("zstd")
    lc = pa.Codec("lz4")
    recs = [b'{"id":%d,"text":"rec"}' % i for i in range(70)]
    zpay = b"".join(bytes(zc.compress(r + b"\n")) for r in recs)
    lpay = b"".join(bytes(lc.compress(r + b"\n")) for r in recs)
    assert len(S.zstd_frames(zpay)) == 70
    assert len(S.lz4_frames(lpay)) == 70
    assert S.shard_text_lines(zpay) == recs
    assert S.shard_text_lines(lpay) == recs
    assert S.zstd_frames(zpay, max_frames=8) is not None  # plan views may cap


def test_decompress_all_refuses_partial_walk():
    """A shard whose frame walk stops early (torn tail / garbage after
    a valid frame) must fail the WHOLE shard — returning the verified
    prefix as success silently drops documents."""
    zc = pa.Codec("zstd")
    good = bytes(zc.compress(b"l1\nl2\n"))
    assert S.zstd_decompress_all(good + b"\xfdgarbage") is None
    assert S.zstd_decompress_all(good + good[: len(good) // 2]) is None
    lgood = bytes(pa.Codec("lz4").compress(b"l1\nl2\n"))
    assert S.decompress_auto(lgood + lgood[:6]) is None


def test_sniff_skippable_first_frame_routes_by_follower():
    """r13 advisor regression: a shard whose FIRST frame is skippable
    (magic 0x184D2A5x — shared by zstd and LZ4) must be routed by the
    first NON-skippable magic; routing skippable+LZ4 to the zstd
    walker used to drop the whole shard's content as an empty
    success."""
    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    lz = bytes(pa.Codec("lz4").compress(b"l1\nl2\n"))
    zs = bytes(pa.Codec("zstd").compress(b"l1\nl2\n"))
    assert S.sniff_compression(skip + lz) == "lz4"
    assert S.sniff_compression(skip + zs) == "zstd"
    assert S.sniff_compression(skip + skip + lz) == "lz4"
    assert S.sniff_compression(skip) == "zstd"  # all-skippable: empty ok
    assert S.decompress_auto(skip + lz) == b"l1\nl2\n"
    assert S.decompress_auto(skip + zs) == b"l1\nl2\n"
    assert S.decompress_auto(skip) == b""


def test_shard_text_lines_over_cap_fails_not_truncates():
    """A shard holding more records than max_lines returns None (never
    a silently-truncated prefix)."""
    payload = bytes(pa.Codec("zstd").compress(b"x\n" * 100))
    assert S.shard_text_lines(payload, max_lines=99) is None
    assert len(S.shard_text_lines(payload, max_lines=100)) == 100
