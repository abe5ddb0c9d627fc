"""Property tests for the shard-format walkers: on hypothesis-generated
archives, each pure-byte kernel must reproduce the ground truth of an
independent encoder — the stdlib (tarfile/zipfile) where one exists,
a clean-room spec encoder otherwise — including byte-exact member
addressing (slicing the payload at the returned offset yields the
member's bytes). The SURVEY §5.2 strategy applied to sources/archive.py
and sources/web.py."""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_py_spark.sources.archive import (
    masked_crc32c,
    tar_members,
    tfrecord_records,
    zip_members,
)
from data_ingestion_py_spark.sources.web import warc_records

_NAME = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-./",
    min_size=1,
    max_size=40,
).filter(lambda s: not s.startswith("/") and ".." not in s and s[-1] != "/")

_MEMBERS = st.lists(
    st.tuples(_NAME, st.binary(min_size=0, max_size=2000)),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(members=_MEMBERS)
def test_tar_walk_matches_stdlib(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    tar = buf.getvalue()
    got = [m for m in tar_members(tar, max_members=64) if m[3] == "0"]
    assert [(m[0], m[1]) for m in got] == [(n, len(d)) for n, d in members]
    for (name, size, off, _), (_, data) in zip(got, members):
        assert tar[off : off + size] == data


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    members=_MEMBERS,
    deflate=st.booleans(),
    comment=st.binary(max_size=60),
)
def test_zip_walk_matches_stdlib(members, deflate, comment):
    comp = zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=comp) as zf:
        for name, data in members:
            zf.writestr(name, data)
        zf.comment = comment
    z = buf.getvalue()
    got = zip_members(z, max_members=64)
    assert [(m[0], m[2]) for m in got] == [(n, len(d)) for n, d in members]
    for (name, method, uncomp, csize, off), (_, data) in zip(got, members):
        blob = z[off : off + csize]
        if method == 0:
            assert blob == data
        else:
            import zlib

            assert zlib.decompress(blob, -15) == data


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(datas=st.lists(st.binary(max_size=1500), min_size=1, max_size=8))
def test_tfrecord_walk_round_trips(datas):
    shard = b""
    for d in datas:
        ln = struct.pack("<Q", len(d))
        shard += ln + struct.pack("<I", masked_crc32c(ln))
        shard += d + struct.pack("<I", masked_crc32c(d))
    got = tfrecord_records(shard, max_records=64)
    assert [(m[0], m[1]) for m in got] == [
        (i, len(d)) for i, d in enumerate(datas)
    ]
    for (_, length, off), d in zip(got, datas):
        assert shard[off : off + length] == d


_HDR_VAL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/.-", min_size=1, max_size=40
)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata", "resource"]),
            st.one_of(st.none(), _HDR_VAL),
            st.binary(max_size=1500),  # bodies may contain CRLFCRLF
        ),
        min_size=1,
        max_size=6,
    )
)
def test_warc_walk_round_trips(recs):
    shard = b""
    for wtype, uri, body in recs:
        head = ["WARC/1.0", f"WARC-Type: {wtype}"]
        if uri is not None:
            head.append(f"WARC-Target-URI: {uri}")
        head.append(f"Content-Length: {len(body)}")
        shard += "\r\n".join(head).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
    got = warc_records(shard, max_records=64)
    assert [(g[0], g[1], g[3]) for g in got] == [
        (t, u, b) for t, u, b in recs
    ]


def _box(fourcc: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data) + 8) + fourcc + data


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    spc=st.lists(st.integers(1, 5), min_size=1, max_size=6),  # per-chunk
    deltas=st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 1000)),
        min_size=1,
        max_size=4,
    ),
    timescale=st.integers(1, 48000),
    data=st.data(),
)
def test_mp4_sample_table_matches_model(spc, deltas, timescale, data):
    """Random stts run-lengths × random stsc chunk runs × random sizes
    and offsets: the kernel's expansion must equal a clean-room
    sequential model of ISO 14496-12 §8.6-8.7."""
    from data_ingestion_py_spark.sources.multimodal import mp4_sample_table

    n_samples = sum(spc)
    # stts runs must cover exactly n_samples: rescale the last run
    runs = []
    left = n_samples
    for cnt, dl in deltas:
        take = min(cnt, left)
        if take:
            runs.append((take, dl))
            left -= take
    if left:
        runs[-1] = (runs[-1][0] + left, runs[-1][1])
    sizes = [data.draw(st.integers(0, 5000)) for _ in range(n_samples)]
    # chunk offsets are opaque inputs to the walk (the spec does not
    # require contiguity) — any values work; the model reuses them
    offsets = [data.draw(st.integers(8, 1 << 30)) for _ in spc]

    # stsc: collapse consecutive equal samples-per-chunk into runs
    stsc_rows = []
    for ci, k in enumerate(spc, start=1):
        if not stsc_rows or stsc_rows[-1][1] != k:
            stsc_rows.append((ci, k))

    mdhd = _box(b"mdhd", struct.pack(">6I", 0, 0, 0, timescale, 0, 0))
    stts = _box(
        b"stts",
        struct.pack(">2I", 0, len(runs))
        + b"".join(struct.pack(">2I", c, d) for c, d in runs),
    )
    stsz = _box(
        b"stsz",
        struct.pack(">3I", 0, 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = _box(
        b"stsc",
        struct.pack(">2I", 0, len(stsc_rows))
        + b"".join(struct.pack(">3I", fc, k, 1) for fc, k in stsc_rows),
    )
    stco = _box(
        b"stco",
        struct.pack(">2I", 0, len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stts + stsz + stsc + stco)
    mp4 = _box(b"ftyp", b"isom\0\0\0\0") + _box(
        b"moov",
        _box(b"trak", _box(b"mdia", mdhd + _box(b"minf", stbl))),
    )

    # clean-room model
    expected = []
    dts = []
    t = 0
    for cnt, dl in runs:
        for _ in range(cnt):
            dts.append(t)
            t += dl
    si = 0
    for ci, k in enumerate(spc):
        pos = offsets[ci]
        for _ in range(k):
            expected.append((si, dts[si], sizes[si], pos))
            pos += sizes[si]
            si += 1

    tab = mp4_sample_table(mp4, max_samples=n_samples)
    assert tab["timescale"] == timescale
    assert tab["samples"] == expected


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(1, 1_000_000),  # record counts need multi-byte varints
            st.binary(max_size=800),
        ),
        min_size=1,
        max_size=6,
    ),
    neg_map=st.booleans(),
)
def test_avro_block_walk_round_trips(blocks, neg_map):
    import sys

    sys.path.insert(0, "tests")
    from test_sources import _avro_file

    from data_ingestion_py_spark.sources.archive import avro_blocks

    f = _avro_file(blocks, neg_map=neg_map)
    got = avro_blocks(f, max_blocks=64)
    assert [(b[1], b[2]) for b in got["blocks"]] == [
        (nr, len(d)) for nr, d in blocks
    ]
    for (_, nr, size, off), (_, d) in zip(got["blocks"], blocks):
        assert f[off : off + size] == d


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    frames=st.lists(
        st.lists(st.integers(0, 255), min_size=12, max_size=12),
        min_size=1,
        max_size=4,
    ),
    top_down=st.booleans(),
    w=st.just(4),
)
def test_avi_frame_decode_round_trips(frames, top_down, w):
    """Random 4×3 rasters through the AVI encoder/decoder pair: the
    decoder must return every frame's pixels in top-down image order
    regardless of the DIB's stored orientation."""
    import sys

    sys.path.insert(0, "tests")
    from test_sources import _avi

    from data_ingestion_py_spark.sources.multimodal import (
        decode_avi_frames,
        decode_pnm,
    )

    avi = _avi(frames, w=4, h=3, top_down=top_down)
    got = decode_avi_frames(avi, max_frames=8)
    assert len(got) == len(frames)
    for frame_pgm, px in zip(got, frames):
        assert decode_pnm(frame_pgm) == (4, 3, px)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_rows=st.integers(1, 2000),
    rg_size=st.integers(1, 700),
    n_cols=st.integers(1, 5),
    codec=st.sampled_from(["snappy", "zstd", "none"]),
)
def test_parquet_footer_walk_matches_pyarrow(n_rows, rg_size, n_cols, codec):
    """Random tables × row-group sizes × codecs through pyarrow's
    writer: the pure-byte thrift-compact footer walk must reproduce
    pyarrow's own metadata report exactly."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_ingestion_py_spark.sources.archive import parquet_row_groups

    t = pa.table(
        {f"c{k}": [i * (k + 1) for i in range(n_rows)] for k in range(n_cols)}
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=rg_size, compression=codec)
    payload = buf.getvalue()
    got = parquet_row_groups(payload)
    md = pq.ParquetFile(io.BytesIO(payload)).metadata
    assert got["num_rows"] == n_rows
    assert len(got["row_groups"]) == md.num_row_groups
    for gi, nr, bs, nc in got["row_groups"]:
        rg = md.row_group(gi)
        assert (nr, bs, nc) == (rg.num_rows, rg.total_byte_size, rg.num_columns)
