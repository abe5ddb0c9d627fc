"""ORC postscript/footer walk (sources/archive.orc_file_info).

Pinned against files written by pyarrow's C++ ORC writer at EVERY
compression kind it ships (none/zlib/snappy/lz4/zstd — the zstd and lz4
chunk paths route through the pure kernels in sources/shards), and
against a file written by Spark's own ORC writer — two independent
producers. House corruption contract: bad magic / truncated tail /
overrunning footer / unknown codec → None.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from data_ingestion_py_spark.sources.archive import (
    orc_file_info,
    orc_stripe_manifest,
)


def _orc_bytes(compression: str, stripe_size: int = 1024) -> bytes:
    t = pa.table(
        {"a": list(range(5000)), "b": [f"s{i}" for i in range(5000)]}
    )
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=compression, stripe_size=stripe_size
    )
    return buf.getvalue()


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "lz4", "zstd"]
)
def test_orc_walk_matches_pyarrow_reader(compression):
    data = _orc_bytes(compression)
    info = orc_file_info(data)
    ref = orc.ORCFile(io.BytesIO(data))
    assert info is not None
    assert info["n_rows"] == ref.nrows
    assert info["n_stripes"] == ref.nstripes == len(info["stripes"])
    assert info["field_names"] == ["a", "b"]
    assert sum(s[4] for s in info["stripes"]) == ref.nrows
    # stripe ranges tile the content region exactly: each stripe's
    # offset + index + data + footer = the next stripe's offset
    for cur, nxt in zip(info["stripes"], info["stripes"][1:]):
        assert cur[0] + cur[1] + cur[2] + cur[3] == nxt[0]


def test_orc_multi_stripe_split_plan():
    data = _orc_bytes("uncompressed", stripe_size=1024)
    info = orc_file_info(data)
    assert info["n_stripes"] > 1  # small stripes: a real split plan
    assert all(rows > 0 for *_rng, rows in info["stripes"])


def test_orc_from_spark_writer(spark, tmp_path):
    """Spark's ORC writer (zlib-compressed by default) is a second
    independent producer — the walk must agree with what Spark reports."""
    df = spark.range(2000).selectExpr("id", "id * 2 AS twice")
    out = str(tmp_path / "spark_orc")
    df.coalesce(1).write.orc(out)
    import glob

    path = glob.glob(out + "/part-*.orc")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    info = orc_file_info(data)
    assert info is not None and info["n_rows"] == 2000
    assert info["field_names"] == ["id", "twice"]
    assert info["compression"] in ("zlib", "snappy", "none", "zstd")


def test_orc_corruption_contract():
    data = _orc_bytes("zlib")
    assert orc_file_info(None) is None
    assert orc_file_info(b"ORC") is None
    assert orc_file_info(b"not an orc file" * 10) is None
    # flip the magic inside the postscript
    bad = bytearray(data)
    bad[-2] ^= 0xFF
    assert orc_file_info(bytes(bad)) is None
    # truncate mid-footer: postscript gone entirely
    assert orc_file_info(data[: len(data) // 2]) is None
    # footer length overrunning the file start
    ps_len = data[-1]
    ps = bytearray(data[-1 - ps_len : -1])
    assert ps[0] == 0x08  # footerLength varint field
    # craft: footerLength = huge (2-byte varint) → overrun → None
    crafted = data[:-1 - ps_len] + bytes([0x08, 0xFF, 0x7F]) + ps[2:] + bytes(
        [ps_len + 1]
    )
    assert orc_file_info(crafted) is None
    # corrupt a compressed footer chunk: ORC's raw-deflate chunks carry
    # no checksum (integrity is out-of-band in ORC), so the walk may
    # return None or garbage fields — the contract is it NEVER raises
    # and never reports more stripes than the directory had
    foot_start = len(data) - 1 - ps_len - _footer_len(data)
    good = orc_file_info(data)
    bad2 = bytearray(data)
    bad2[foot_start + 5] ^= 0xFF
    got = orc_file_info(bytes(bad2))
    assert got is None or got["n_stripes"] <= good["n_stripes"]


def _footer_len(data: bytes) -> int:
    ps_len = data[-1]
    ps = data[-1 - ps_len : -1]
    # footerLength is field 1 varint at the front of the postscript
    v, shift, i = 0, 0, 1
    while True:
        v |= (ps[i] & 0x7F) << shift
        if not ps[i] & 0x80:
            return v
        shift += 7
        i += 1


def test_orc_stripe_manifest_dataframe(spark):
    data = _orc_bytes("uncompressed", stripe_size=1024)
    ref = orc.ORCFile(io.BytesIO(data))
    media = spark.createDataFrame(
        [(1, data), (2, b"junk"), (3, None)],
        "media_id long, payload binary",
    )
    rows = orc_stripe_manifest(media).collect()
    assert len(rows) == ref.nstripes
    assert all(r.media_id == 1 and r.compression == "none" for r in rows)
    assert sum(r.n_rows for r in rows) == ref.nrows
    assert all(r.file_rows == ref.nrows for r in rows)
