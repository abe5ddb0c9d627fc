"""Pure zstd decoder (sources/zstd_pure.py) pinned against pyarrow's C
zstd ENCODER — an implementation we didn't write — across content
shapes (text, low-entropy, incompressible, RLE-ish, structured),
compression levels 1..19, and sizes up to multi-block (>128 KiB), plus
the engine integration: no-FCS streaming frames decode through
sources/shards.zstd_frame_decompress, closing the former seam. House
corruption contract throughout.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from data_ingestion_py_spark.sources import shards as S
from data_ingestion_py_spark.sources.zstd_pure import (
    _FseTable,
    _parse_fse_header,
    zstd_decompress_frame,
)


def _cases() -> dict[str, bytes]:
    rng = random.Random(11)
    words = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(2, 9)))
        for _ in range(500)
    ]
    return {
        "ascii_rep": b"the quick brown fox jumps over the lazy dog " * 120,
        "low_entropy": bytes(rng.randrange(4) for _ in range(5000)),
        "jsonish": b'{"id": 123, "text": "hello world"}\n' * 300,
        "tiny": b"abc",
        "incompressible": bytes(rng.randrange(256) for _ in range(3000)),
        "zeros": b"\x00" * 10000,
        "rle_runs": b"".join(
            bytes([rng.randrange(16)]) * rng.randrange(1, 30)
            for _ in range(10_000)
        ),
        "multiblock_text": b" ".join(
            rng.choice(words) for _ in range(120_000)
        ),
    }


@pytest.mark.parametrize("name", sorted(_cases()))
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_vs_pyarrow_c_encoder(name, level):
    data = _cases()[name]
    comp = bytes(pa.Codec("zstd", compression_level=level).compress(data))
    assert zstd_decompress_frame(comp, max_out=1 << 24) == data


def test_no_fcs_streaming_frame_decodes_through_shards():
    """Strip the single-segment flag + FCS from a pyarrow frame (the
    streaming-writer shape) — the former documented seam: the walk
    reports content_size None, and decompression now succeeds through
    the pure FSE/Huffman decoder."""
    data = b'{"id":"d1","text":"streaming writer"}\n' * 200
    comp = bytearray(pa.Codec("zstd").compress(data))
    assert comp[4] >> 6 == 1 and (comp[4] >> 5) & 1  # 2-byte FCS form
    nofcs = bytes(comp[:4]) + bytes([0x00, 0x88]) + bytes(comp[7:])
    frames = S.zstd_frames(nofcs)
    assert frames is not None and frames[0][2] is None
    assert S.zstd_frame_decompress(nofcs) == data
    assert S.shard_text_lines(nofcs) is not None
    # and the jsonl reader end-to-end
    assert S.decompress_auto(nofcs) == data


def test_fse_header_and_table_roundtrip_predefined_shapes():
    """The three RFC default distributions build spread tables whose
    cells cover exactly their normalized counts."""
    from data_ingestion_py_spark.sources.zstd_pure import (
        _LL_DEFAULTS,
        _ML_DEFAULTS,
        _OF_DEFAULTS,
    )

    for norm, al in (_LL_DEFAULTS, _ML_DEFAULTS, _OF_DEFAULTS):
        t = _FseTable(norm, al)
        counts = {}
        for s in t.sym:
            counts[s] = counts.get(s, 0) + 1
        for s, c in enumerate(norm):
            assert counts.get(s, 0) == abs(c) if c else s not in counts
        # every transition lands back inside the table
        size = 1 << al
        for i in range(size):
            assert 0 <= t.base[i] <= size
            assert t.base[i] + (1 << t.nb[i]) <= size + size


def test_fse_header_parse_malformed():
    assert _parse_fse_header(b"", 0, 9, 36) is None
    assert _parse_fse_header(b"\xff", 0, 9, 36) is None  # AL too big
    # truncated mid-counts
    data = bytes(pa.Codec("zstd").compress(b"ab" * 400))
    assert zstd_decompress_frame(data[: len(data) // 2]) is None


def test_corruption_contract():
    data = _cases()["multiblock_text"]
    comp = bytes(pa.Codec("zstd").compress(data))
    assert zstd_decompress_frame(b"") is None
    assert zstd_decompress_frame(b"\x00" * 20) is None
    # bomb guard: output capped below the content size
    assert zstd_decompress_frame(comp, max_out=1000) is None
    # flip a byte mid-stream: either None or a wrong-size result — the
    # declared-content-size check catches silent desyncs; never raises
    for flip in (len(comp) // 3, len(comp) // 2, 2 * len(comp) // 3):
        bad = bytearray(comp)
        bad[flip] ^= 0x5A
        got = zstd_decompress_frame(bytes(bad), max_out=1 << 24)
        assert got is None or got != data[: len(got)] or len(got) != len(
            data
        )


def test_checksummed_frame_verifies_through_shards():
    """A frame WITH a content checksum whose FCS we also strip: the
    pure decoder produces the bytes and shards verifies XXH64."""
    data = b"checksummed payload " * 64
    comp = bytearray(pa.Codec("zstd").compress(data))
    # pyarrow writes no checksum; append one by rebuilding the FHD
    from data_ingestion_py_spark.sources.shards import xxh64

    fhd = comp[4]
    assert not (fhd >> 2) & 1
    # set checksum flag, drop single-segment+FCS (window descriptor)
    rebuilt = (
        bytes(comp[:4])
        + bytes([0x04, 0x88])
        + bytes(comp[7:])
        + (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    )
    frames = S.zstd_frames(rebuilt)
    assert frames is not None and frames[0][5] is True
    assert S.zstd_frame_decompress(rebuilt) == data
    # corrupt the checksum: decode refuses
    bad = rebuilt[:-1] + bytes([rebuilt[-1] ^ 1])
    assert S.zstd_frame_decompress(bad) is None


def test_dictionary_frames_are_refused():
    """A frame that declares a Dictionary_ID cannot decode without the
    dictionary's window/entropy state — both the pure decoder and the
    shards path refuse rather than emit wrong bytes."""
    data = b"dict frame " * 50
    comp = bytearray(pa.Codec("zstd").compress(data))
    # FHD: set dictid flag to 1-byte, drop single-segment (add WD),
    # keep no FCS; insert the dict id byte after the window descriptor
    rebuilt = (
        bytes(comp[:4]) + bytes([0x01, 0x88, 0x2A]) + bytes(comp[7:])
    )
    frames = S.zstd_frames(rebuilt)
    assert frames is not None  # the walk still yields byte ranges
    assert zstd_decompress_frame(rebuilt) is None
    assert S.zstd_frame_decompress(rebuilt) is None
