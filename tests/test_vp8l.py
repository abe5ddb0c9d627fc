"""VP8L decoder (sources/vp8l.py) pinned against an INDEPENDENT
from-the-spec encoder — the GIF-round pattern: the encoder below builds
real VP8L bitstreams (canonical Huffman codes emitted through the
code-length code, simple codes, LZ77 with plane-code distances, color
cache, meta prefix groups, and all four transforms); the decoder must
round-trip them bit-exactly. Plus corruption gates and the cross-format
gray-rule pin (WebP ≡ PNG for equal pixels).
"""

from __future__ import annotations

import heapq
import random

import numpy as np
import pytest

from data_ingestion_py_spark.sources import vp8l as V


# ---------------------------------------------------------------------------
# Independent encoder (written from the spec, not from the decoder)
# ---------------------------------------------------------------------------


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, nbits: int) -> None:
        for k in range(nbits):
            self.bits.append((value >> k) & 1)

    def w_code(self, code: int, nbits: int) -> None:
        """Prefix-code bits are written MSB of the code first."""
        for k in reversed(range(nbits)):
            self.bits.append((code >> k) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _huff_lengths(freqs: dict[int, int], maxlen: int = 15) -> dict[int, int]:
    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    nxt = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, g1 + g2))
        nxt += 1
    assert max(depth.values()) <= maxlen, "test images keep codes short"
    return depth


def _canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, nbits), canonical by (length, symbol)."""
    out = {}
    code = 0
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        code <<= lengths[s] - prev_len
        prev_len = lengths[s]
        out[s] = (code, lengths[s])
        code += 1
    return out


def _write_prefix(bw: _BW, lengths: dict[int, int], alphabet: int):
    """Emit one prefix code; returns symbol→(code,bits) for payload
    emission (empty dict values for a 0-bit single-symbol code)."""
    used = sorted(lengths)
    if len(used) <= 2 and all(lengths[s] == 1 for s in used) and used:
        bw.w(1, 1)  # simple
        bw.w(len(used) - 1, 1)
        first_8 = 0 if used[0] <= 1 and len(used) == 1 else 1
        bw.w(first_8, 1)
        bw.w(used[0], 8 if first_8 else 1)
        if len(used) == 2:
            bw.w(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return _canon_codes(lengths)
    bw.w(0, 1)  # normal
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    cl_freq: dict[int, int] = {}
    for v in seq:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, maxlen=7)
    cl_codes = _canon_codes(cl_lengths)
    order = V._CLC_ORDER
    ncl = max(order.index(s) for s in cl_lengths) + 1
    ncl = max(ncl, 4)
    bw.w(ncl - 4, 4)
    for i in range(ncl):
        bw.w(cl_lengths.get(order[i], 0), 3)
    bw.w(0, 1)  # no max_symbol shortcut
    single_cl = len(cl_lengths) == 1
    for v in seq:
        if not single_cl:
            bw.w_code(*cl_codes[v])
    return _canon_codes(lengths)


def _lz77_code(v: int) -> tuple[int, int, int]:
    """value → (prefix code, n extra bits, extra value)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        base = (2 + (code & 1)) << extra
        if base + 1 <= v <= base + (1 << extra):
            return code, extra, v - base - 1
    raise AssertionError(v)


_INV_PLANE = {off: i + 1 for i, off in enumerate(V._plane_code_offsets())}


def _dist_to_code(dist: int, w: int) -> int:
    dy, dx = dist // w, dist % w
    if dx > 8:
        dx -= w
        dy += 1
    if (dx, dy) in _INV_PLANE and dy * w + dx == dist:
        return _INV_PLANE[(dx, dy)]
    return dist + 120


def encode_vp8l(
    w: int,
    h: int,
    argb: list[int],
    cache_bits: int = 0,
    lz77: bool = False,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: list[int] | None = None,
    meta_bits: int | None = None,
    riff: bool = True,
) -> bytes:
    """Independent VP8L encoder: tokenizes (greedy LZ77 if asked, color
    cache if asked), builds per-group canonical prefix codes from real
    frequencies, and emits the full bitstream incl. transforms."""
    px = list(argb)
    bw = _BW()
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version
    xsize = w
    if subtract_green:
        bw.w(1, 1)
        bw.w(2, 2)
        for i, p in enumerate(px):
            g = (p >> 8) & 0xFF
            r = (((p >> 16) & 0xFF) - g) & 0xFF
            b = ((p & 0xFF) - g) & 0xFF
            px[i] = (p & 0xFF00FF00) | (r << 16) | b
    if predictor_mode is not None:
        bw.w(1, 1)
        bw.w(0, 2)
        size_bits = 2
        bw.w(size_bits - 2, 3)
        tw = (xsize + 3) >> 2
        th = (h + 3) >> 2
        mode_img = [0xFF000000 | (predictor_mode << 8)] * (tw * th)
        _encode_substream(bw, mode_img)
        res = list(px)
        for i in range(w * h):  # forward: residual = pixel - pred
            x, y = i % w, i // w
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                l, t, tl, tr = (
                    px[i - 1],
                    px[i - w],
                    px[i - w - 1],
                    px[i - w + 1],
                )
                pred = {
                    0: 0xFF000000,
                    1: l,
                    2: t,
                    3: tr,
                    4: tl,
                    5: V._avg2(V._avg2(l, tr), t),
                    6: V._avg2(l, tl),
                    7: V._avg2(l, t),
                    8: V._avg2(tl, t),
                    9: V._avg2(t, tr),
                    10: V._avg2(V._avg2(l, tl), V._avg2(t, tr)),
                    11: V._select(t, l, tl),
                    12: V._clamp_add_full(l, t, tl),
                    13: V._clamp_add_half(l, t, tl),
                }[predictor_mode]
            res[i] = (
                (((px[i] >> 24) - (pred >> 24)) & 0xFF) << 24
                | (((px[i] >> 16) - (pred >> 16)) & 0xFF) << 16
                | (((px[i] >> 8) - (pred >> 8)) & 0xFF) << 8
                | ((px[i] - pred) & 0xFF)
            )
        px = res
    if palette is not None:
        bw.w(1, 1)
        bw.w(3, 2)
        bw.w(len(palette) - 1, 8)
        deltas = []
        prev = 0
        for e in palette:
            deltas.append(
                (((e >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((e >> 16) - (prev >> 16)) & 0xFF) << 16
                | (((e >> 8) - (prev >> 8)) & 0xFF) << 8
                | ((e - prev) & 0xFF)
            )
            prev = e
        _encode_substream(bw, deltas)
        nc = len(palette)
        wb = 0 if nc > 16 else 1 if nc > 4 else 2 if nc > 2 else 3
        per = 1 << wb
        bpp = 8 >> wb
        lut = {e: i for i, e in enumerate(palette)}
        packed_w = (w + per - 1) >> wb
        packed = []
        for y in range(h):
            for bx in range(packed_w):
                g = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        g |= lut[px[y * w + x]] << (k * bpp)
                packed.append(0xFF000000 | (g << 8))
        px = packed
        xsize = packed_w
    bw.w(0, 1)  # end of transforms
    _encode_body(bw, px, xsize, cache_bits, lz77, meta_bits, level0=True,
                 h=h)
    chunk = bw.bytes()
    if not riff:
        return chunk
    pad = b"\x00" if len(chunk) & 1 else b""
    riff_size = 4 + 8 + len(chunk) + len(pad)
    return (
        b"RIFF"
        + riff_size.to_bytes(4, "little")
        + b"WEBP"
        + b"VP8L"
        + len(chunk).to_bytes(4, "little")
        + chunk
        + pad
    )


def _encode_substream(bw: _BW, px: list[int]) -> None:
    """Entropy-coded sub-image (transform data / palette): no
    transforms, no cache, no meta — plain literal tokens."""
    bw.w(0, 1)  # no color cache
    _emit_group_tokens(bw, [("lit", p) for p in px], cache_bits=0)


def _encode_body(bw, px, xsize, cache_bits, lz77, meta_bits, level0, h):
    if cache_bits:
        bw.w(1, 1)
        bw.w(cache_bits, 4)
    else:
        bw.w(0, 1)
    groups_of: list[list] = [[]]
    gidx = [0] * len(px)
    if level0:
        if meta_bits is not None:
            bw.w(1, 1)
            bw.w(meta_bits - 2, 3)
            ew = (xsize + (1 << meta_bits) - 1) >> meta_bits
            eh = (h + (1 << meta_bits) - 1) >> meta_bits
            # two groups, split by tile parity
            entropy = [
                ((ty * ew + tx) % 2) for ty in range(eh) for tx in range(ew)
            ]
            _encode_substream(
                bw, [0xFF000000 | (g << 8) for g in entropy]
            )
            groups_of = [[], []]
            for i in range(len(px)):
                x, y = i % xsize, i // xsize
                gidx[i] = entropy[(y >> meta_bits) * ew + (x >> meta_bits)]
        else:
            bw.w(0, 1)
    # tokenize (greedy LZ77 + cache), assigning tokens to groups by the
    # group of their START pixel
    tokens: list[tuple[int, tuple]] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    while i < len(px):
        g = gidx[i]
        if lz77 and i >= 1:
            best_len, best_dist = 0, 0
            for dist in range(1, min(i, 4096) + 1):
                ln = 0
                while (
                    i + ln < len(px)
                    and px[i + ln] == px[i - dist + ln]
                    and ln < 24
                ):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append((g, ("copy", best_len, best_dist)))
                if cache is not None:
                    for k in range(best_len):
                        p = px[i + k]
                        cache[
                            (0x1E35A7BD * p & 0xFFFFFFFF)
                            >> (32 - cache_bits)
                        ] = p
                i += best_len
                continue
        p = px[i]
        if cache is not None:
            key = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == p:
                tokens.append((g, ("cache", key)))
                i += 1
                continue
            cache[key] = p
        tokens.append((g, ("lit", p)))
        i += 1
    n_groups = len(groups_of)
    per_group = [[t for g, t in tokens if g == gi] for gi in range(n_groups)]
    # frequencies per group
    all_codes = []
    for gi in range(n_groups):
        freq = [dict() for _ in range(5)]
        for t in per_group[gi]:
            if t[0] == "lit":
                p = t[1]
                for ch, val in (
                    (0, (p >> 8) & 0xFF),
                    (1, (p >> 16) & 0xFF),
                    (2, p & 0xFF),
                    (3, (p >> 24) & 0xFF),
                ):
                    freq[ch][val] = freq[ch].get(val, 0) + 1
            elif t[0] == "copy":
                lc = 256 + _lz77_code(t[1])[0]
                freq[0][lc] = freq[0].get(lc, 0) + 1
                dc = _lz77_code(_dist_to_code(t[2], xsize))[0]
                freq[4][dc] = freq[4].get(dc, 0) + 1
            else:
                cc = 280 + t[1]
                freq[0][cc] = freq[0].get(cc, 0) + 1
        # every tree must exist; give empty ones a dummy symbol
        for ch in range(5):
            if not freq[ch]:
                freq[ch][0] = 1
        alphabets = (280 + (1 << cache_bits if cache_bits else 0),
                     256, 256, 256, 40)
        codes = []
        for ch in range(5):
            lengths = _huff_lengths(freq[ch])
            codes.append(_write_prefix(bw, lengths, alphabets[ch]))
        all_codes.append(codes)
    # emit tokens in stream order
    for g, t in tokens:
        codes = all_codes[g]
        if t[0] == "lit":
            p = t[1]
            bw.w_code(*codes[0][(p >> 8) & 0xFF])
            bw.w_code(*codes[1][(p >> 16) & 0xFF])
            bw.w_code(*codes[2][p & 0xFF])
            bw.w_code(*codes[3][(p >> 24) & 0xFF])
        elif t[0] == "copy":
            lc, le, lx = _lz77_code(t[1])
            bw.w_code(*codes[0][256 + lc])
            bw.w(lx, le)
            dc, de, dx = _lz77_code(_dist_to_code(t[2], xsize))
            bw.w_code(*codes[4][dc])
            bw.w(dx, de)
        else:
            bw.w_code(*codes[0][280 + t[1]])


def _emit_group_tokens(bw: _BW, tokens, cache_bits):
    """Single-group emission used by sub-streams."""
    freq = [dict() for _ in range(5)]
    for t in tokens:
        p = t[1]
        for ch, val in (
            (0, (p >> 8) & 0xFF),
            (1, (p >> 16) & 0xFF),
            (2, p & 0xFF),
            (3, (p >> 24) & 0xFF),
        ):
            freq[ch][val] = freq[ch].get(val, 0) + 1
    for ch in range(5):
        if not freq[ch]:
            freq[ch][0] = 1
    alphabets = (280, 256, 256, 256, 40)
    codes = [
        _write_prefix(bw, _huff_lengths(freq[ch]), alphabets[ch])
        for ch in range(5)
    ]
    for t in tokens:
        p = t[1]
        bw.w_code(*codes[0][(p >> 8) & 0xFF])
        bw.w_code(*codes[1][(p >> 16) & 0xFF])
        bw.w_code(*codes[2][p & 0xFF])
        bw.w_code(*codes[3][(p >> 24) & 0xFF])


def _rand_img(w, h, ncolors, seed):
    rng = random.Random(seed)
    pal = [
        0xFF000000
        | (rng.randrange(256) << 16)
        | (rng.randrange(256) << 8)
        | rng.randrange(256)
        for _ in range(ncolors)
    ]
    return [pal[rng.randrange(ncolors)] for _ in range(w * h)]


def _decode(data):
    got = V.decode_vp8l_pixels(data) if data[:1] == b"\x2f" else None
    if got is None:
        riff = V.decode_webp_array(data)
        return riff
    return got


# ------------------------------------------------------------------ tests


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("ncolors", [2, 7, 40])
def test_roundtrip_plain(seed, ncolors):
    w, h = 13, 9
    img = _rand_img(w, h, ncolors, seed)
    data = encode_vp8l(w, h, img, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[:2] == (w, h)
    assert got[2] == img


def test_roundtrip_riff_container_and_gray():
    w, h = 16, 16
    img = [
        0xFF000000 | (v << 16) | (v << 8) | v
        for v in [(i * 37) % 256 for i in range(w * h)]
    ]
    data = encode_vp8l(w, h, img, riff=True)
    got = V.decode_webp_array(data)
    assert got is not None
    gw, gh, gray = got
    assert (gw, gh) == (w, h)
    assert list(gray) == [(i * 37) % 256 for i in range(w * h)]


def test_webp_equals_png_gray_rule():
    """Same planted pixels through the WebP and PNG kernels → identical
    gray rasters: the decoder-independence claim, executable."""
    from data_ingestion_py_spark.sources.multimodal import decode_png_array
    import zlib
    import struct

    w, h = 16, 16
    vals = [(i * 31 + 7) % 256 for i in range(w * h)]
    img = [0xFF000000 | (v << 16) | (v << 8) | v for v in vals]
    webp = encode_vp8l(w, h, img, riff=True)
    wp = V.decode_webp_array(webp)

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    raw = b"".join(
        b"\x00" + bytes(vals[y * w : (y + 1) * w]) for y in range(h)
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    pg = decode_png_array(png)
    assert wp is not None and pg is not None
    assert list(wp[2]) == list(pg[2]) == vals


def test_roundtrip_lz77_plane_and_linear_distances():
    w, h = 24, 12
    # rows repeat → matches at dist = w (plane code) and long literals
    base = [(i * 53) % 251 for i in range(w)]
    img = [
        0xFF000000 | (v << 16) | (v << 8) | v
        for _ in range(h)
        for v in base
    ]
    data = encode_vp8l(w, h, img, lz77=True, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img
    # distances beyond the plane map: a sparse repeat 300 px back
    img2 = _rand_img(25, 20, 60, seed=9)
    img2[320:330] = img2[10:20]
    data2 = encode_vp8l(25, 20, img2, lz77=True, riff=False)
    got2 = V.decode_vp8l_pixels(data2)
    assert got2 is not None and got2[2] == img2


@pytest.mark.parametrize("cache_bits", [1, 4, 8])
def test_roundtrip_color_cache(cache_bits):
    img = _rand_img(20, 10, 5, seed=cache_bits)
    data = encode_vp8l(20, 10, img, cache_bits=cache_bits, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img


def test_roundtrip_subtract_green():
    img = _rand_img(11, 7, 30, seed=4)
    data = encode_vp8l(11, 7, img, subtract_green=True, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    img = _rand_img(14, 10, 25, seed=100 + mode)
    data = encode_vp8l(14, 10, img, predictor_mode=mode, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img, f"mode {mode}"


@pytest.mark.parametrize("ncolors", [2, 4, 16, 30])
def test_roundtrip_palette_bundling(ncolors):
    rng = random.Random(ncolors)
    pal = [
        0xFF000000 | (rng.randrange(256) << 16) | (rng.randrange(256) << 8)
        | rng.randrange(256)
        for _ in range(ncolors)
    ]
    w, h = 13, 6  # 13 is not a multiple of any bundle width
    img = [pal[rng.randrange(ncolors)] for _ in range(w * h)]
    data = encode_vp8l(w, h, img, palette=pal, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[:2] == (w, h)
    assert got[2] == img


def test_roundtrip_meta_prefix_groups():
    img = _rand_img(20, 12, 12, seed=5)
    data = encode_vp8l(20, 12, img, meta_bits=2, riff=False)
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img


def test_roundtrip_stacked_transforms():
    img = _rand_img(16, 8, 18, seed=6)
    data = encode_vp8l(
        16, 8, img, subtract_green=True, predictor_mode=7, riff=False
    )
    got = V.decode_vp8l_pixels(data)
    assert got is not None and got[2] == img


def test_corruption_contract():
    img = _rand_img(10, 10, 8, seed=7)
    data = encode_vp8l(10, 10, img, riff=False)
    assert V.decode_vp8l_pixels(b"") is None
    assert V.decode_vp8l_pixels(b"\x00" + data[1:]) is None  # bad sig
    assert V.decode_vp8l_pixels(data[: len(data) // 2]) is None  # torn
    # version bits nonzero
    bad = bytearray(data)
    bad[4] |= 0xE0
    assert V.decode_vp8l_pixels(bytes(bad)) is None
    # bomb guard
    assert V.decode_vp8l_pixels(data, max_pixels=10) is None
    # RIFF contract
    full = encode_vp8l(10, 10, img, riff=True)
    assert V.decode_webp_array(None) is None
    assert V.decode_webp_array(full[:20]) is None
    assert V.decode_webp_array(b"RIFF\x00\x00\x00\x00WAVE") is None
    # lossy VP8 chunk: honest None
    lossy = bytearray(full)
    lossy[12:16] = b"VP8 "
    assert V.decode_webp_array(bytes(lossy)) is None
