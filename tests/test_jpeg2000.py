"""JPEG 2000 lossless decoder (sources/jpeg2000.py) pinned against an
INDEPENDENT test-side encoder: forward 5/3 DWT built as the algebraic
inverse of the decoder's lifting, a Tier-1 EBCOT encoder mirroring
the spec's pass structure over the test suite's own MQ encoder (the
one the T.88 Annex E conformance vector pins byte-exact in
test_ccitt.py), tag-tree and packet-header writers from B.10."""

from __future__ import annotations

import random

import numpy as np

from data_ingestion_py_spark.sources.jpeg2000 import (
    _CTX_INIT,
    _N_CTX,
    _RLC,
    _UNI,
    _BlockCoder,
    _zc_context,
    decode_codeblock,
    decode_jp2k,
    idwt53,
)
from tests.test_ccitt import _MQEncoder


# ------------------------------------------------------- forward DWT


def _fdwt53_1d(x: "np.ndarray"):
    """Algebraic inverse of the decoder's `_idwt53_1d` — identical
    extension conventions, so perfect reconstruction is structural."""
    x = x.astype(np.int64)
    n = len(x)
    if n == 1:
        return x.copy(), x[:0]
    ev = x[0::2].copy()
    od = x[1::2].copy()
    l2 = ev[: len(od)]
    r2 = np.empty_like(od)
    if len(ev) > len(od):
        r2[:] = ev[1 : len(od) + 1]
    else:
        r2[:-1] = ev[1:]
        r2[-1] = ev[-1]
    hi = od - ((l2 + r2) >> 1)
    left = np.empty_like(ev)
    right = np.empty_like(ev)
    left[0] = hi[0] if len(hi) else 0
    left[1:] = hi[: len(ev) - 1]
    if n % 2 == 0:
        right[:] = hi[: len(ev)]
    else:
        right[: len(ev) - 1] = hi
        right[len(ev) - 1] = hi[-1] if len(hi) else 0
    lo = ev + ((left + right + 2) >> 2)
    return lo, hi


def fdwt53(tile: "np.ndarray", levels: int):
    """tile → (ll, [(hl, lh, hh) coarsest-first])."""
    cur = tile.astype(np.int64)
    bands = []
    for _ in range(levels):
        h, w = cur.shape
        lo_w = (w + 1) // 2
        lo_h = (h + 1) // 2
        left = np.zeros((h, lo_w), np.int64)
        right = np.zeros((h, w - lo_w), np.int64)
        for r in range(h):
            lo, hi = _fdwt53_1d(cur[r])
            left[r], right[r] = lo, hi
        ll = np.zeros((lo_h, lo_w), np.int64)
        lh = np.zeros((h - lo_h, lo_w), np.int64)
        hl = np.zeros((lo_h, w - lo_w), np.int64)
        hh = np.zeros((h - lo_h, w - lo_w), np.int64)
        for c in range(lo_w):
            lo, hi = _fdwt53_1d(left[:, c])
            ll[:, c], lh[:, c] = lo, hi
        for c in range(w - lo_w):
            lo, hi = _fdwt53_1d(right[:, c])
            hl[:, c], hh[:, c] = lo, hi
        bands.append((hl, lh, hh))
        cur = ll
    bands.reverse()
    return cur, bands


# ------------------------------------------------------ Tier-1 encoder


def encode_codeblock(coeffs, band: str) -> tuple[bytes, int]:
    """EBCOT-encode one block of signed coefficients; returns
    (codeword segment, n_passes). Mirrors the decoder's pass walk —
    significance/visited bookkeeping is re-derived, with the MQ
    ENCODER from test_ccitt underneath."""
    h = len(coeffs)
    w = len(coeffs[0])
    mag = [[abs(v) for v in row] for row in coeffs]
    neg = [[1 if v < 0 else 0 for v in row] for row in coeffs]
    max_mag = max((v for row in mag for v in row), default=0)
    planes = max(1, max_mag.bit_length())
    n_passes = 3 * planes - 2
    enc = _MQEncoder()
    cx = [(0, 0)] * _N_CTX
    for c, st in _CTX_INIT.items():
        cx[c] = (st, 0)
    bc = _BlockCoder(w, h, band)

    def bit_of(y, x, p):
        return (mag[y][x] >> p) & 1

    def become_sig(y, x):
        ctx, xor = bc._sign_ctx(y, x)
        enc.encode(cx, ctx, neg[y][x] ^ xor)
        # through the class mutator so the r16 incremental neighbor
        # counters stay in sync (a bare sig[y][x]=1 stales them)
        bc.mark_significant(y, x)
        bc.sign[y][x] = neg[y][x]

    for p in range(planes - 1, -1, -1):
        first = p == planes - 1
        if not first:
            # SPP
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        if bc.sig[y][x]:
                            continue
                        hh, vv, dd = bc._neigh(y, x)
                        if hh + vv + dd == 0:
                            continue
                        bc.visited[y][x] = 1
                        b = bit_of(y, x, p)
                        enc.encode(
                            cx, _zc_context(hh, vv, dd, band), b
                        )
                        if b:
                            become_sig(y, x)
            # MRP
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        if not bc.sig[y][x] or bc.visited[y][x]:
                            continue
                        if bc.refined[y][x]:
                            ctx = 16
                        else:
                            hh, vv, dd = bc._neigh(y, x)
                            ctx = 15 if hh + vv + dd else 14
                            bc.refined[y][x] = 1
                        enc.encode(cx, ctx, bit_of(y, x, p))
                        bc.visited[y][x] = 1
        # CP
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if (
                    y0 + 4 <= h
                    and not any(
                        bc.visited[y0 + k][x] or bc.sig[y0 + k][x]
                        for k in range(4)
                    )
                    and not any(
                        bc._neigh(y0 + k, x) != (0, 0, 0)
                        for k in range(4)
                    )
                ):
                    hits = [
                        k for k in range(4) if bit_of(y0 + k, x, p)
                    ]
                    if not hits:
                        enc.encode(cx, _RLC, 0)
                        continue
                    enc.encode(cx, _RLC, 1)
                    r = hits[0]
                    enc.encode(cx, _UNI, (r >> 1) & 1)
                    enc.encode(cx, _UNI, r & 1)
                    become_sig(y0 + r, x)
                    y = y0 + r + 1
                while y < min(y0 + 4, h):
                    if not bc.visited[y][x] and not bc.sig[y][x]:
                        hh, vv, dd = bc._neigh(y, x)
                        b = bit_of(y, x, p)
                        enc.encode(
                            cx, _zc_context(hh, vv, dd, band), b
                        )
                        if b:
                            become_sig(y, x)
                    y += 1
        for y in range(h):
            for x in range(w):
                bc.visited[y][x] = 0
    return enc.flush(), n_passes


# ------------------------------------------------ Tier-2 / codestream


class _HdrW:
    """Packet-header bit writer with 0xFF stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def _cap(self) -> int:
        return 7 if (self.out and self.out[-1] == 0xFF) else 8

    def bit(self, b: int):
        self.cur = (self.cur << 1) | b
        self.nbits += 1
        if self.nbits == self._cap():
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def bits(self, v: int, k: int):
        for i in range(k - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self) -> bytes:
        while self.nbits:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


class _TagTreeEnc:
    def __init__(self, w: int, h: int, leaves: list[list[int]]):
        self.sizes = []
        ww, hh = w, h
        while True:
            self.sizes.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww, hh = (ww + 1) // 2, (hh + 1) // 2
        self.val = []
        cur = [
            leaves[y][x] for y in range(h) for x in range(w)
        ]
        self.val.append(cur)
        pw, ph = w, h
        for sw, sh in self.sizes[1:]:
            nxt = [0] * (sw * sh)
            for y in range(sh):
                for x in range(sw):
                    cs = []
                    for dy in range(2):
                        for dx in range(2):
                            yy, xx = 2 * y + dy, 2 * x + dx
                            if yy < ph and xx < pw:
                                cs.append(
                                    self.val[-1][yy * pw + xx]
                                )
                    nxt[y * sw + x] = min(cs)
            self.val.append(nxt)
            pw, ph = sw, sh
        self.low = [[0] * len(v) for v in self.val]
        self.known = [[False] * len(v) for v in self.val]

    def encode(self, w: "_HdrW", x: int, y: int, threshold: int):
        nodes = []
        xx, yy = x, y
        for lvl in range(len(self.sizes)):
            nodes.append((lvl, xx, yy))
            xx >>= 1
            yy >>= 1
        low = 0
        for lvl, xx, yy in reversed(nodes):
            k = yy * self.sizes[lvl][0] + xx
            if self.low[lvl][k] < low:
                self.low[lvl][k] = low
            while not self.known[lvl][k] and self.low[lvl][k] < threshold:
                if self.low[lvl][k] == self.val[lvl][k]:
                    w.bit(1)
                    self.known[lvl][k] = True
                else:
                    w.bit(0)
                    self.low[lvl][k] += 1
            low = (
                self.val[lvl][k]
                if self.known[lvl][k]
                else self.low[lvl][k]
            )
            if low >= threshold:
                return

    def encode_value(self, w: "_HdrW", x: int, y: int, value: int):
        t = 1
        while True:
            self.encode(w, x, y, t)
            if value < t:
                return
            t += 1


def _write_n_passes(w: "_HdrW", n: int):
    if n == 1:
        w.bit(0)
    elif n == 2:
        w.bits(0b10, 2)
    elif n <= 5:
        w.bits(0b11, 2)
        w.bits(n - 3, 2)
    elif n <= 36:
        w.bits(0b1111, 4)
        w.bits(n - 6, 5)
    else:
        w.bits(0b111111111, 9)
        w.bits(n - 37, 7)


def encode_jp2k(
    img: "np.ndarray", levels: int = 2, cb_exp: tuple = (6, 6)
) -> bytes:
    """Full lossless encoder for the decoder's supported profile:
    grayscale 8-bit, single tile, single layer LRCP."""
    h, w = img.shape
    tile = img.astype(np.int64) - 128  # DC level shift
    ll, bands = fdwt53(tile, levels)
    cb_w, cb_h = 1 << cb_exp[0], 1 << cb_exp[1]

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\x4f")  # SOC
    siz = (
        (0).to_bytes(2, "big")
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes(8)
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes(8)
        + (1).to_bytes(2, "big")
        + bytes([7, 1, 1])
    )
    out += seg(b"\xff\x51", siz)
    cod = bytes([0, 0]) + (1).to_bytes(2, "big") + bytes(
        [0, levels, cb_exp[0] - 2, cb_exp[1] - 2, 0, 1]
    )
    out += seg(b"\xff\x52", cod)
    qcd = bytes([0x40]) + bytes([9 << 3] * (3 * levels + 1))
    out += seg(b"\xff\x5c", qcd)

    # tile part
    packets = bytearray()
    for res in range(levels + 1):
        if res == 0:
            blist = [("LL", ll)]
        else:
            hl, lh, hh = bands[res - 1]
            blist = [("HL", hl), ("LH", lh), ("HH", hh)]
        hw = _HdrW()
        bodies = bytearray()
        any_block = any(b.size for _n, b in blist)
        hw.bit(1 if any_block else 0)
        if any_block:
            for bname, band in blist:
                bh, bw = band.shape
                if bh == 0 or bw == 0:
                    continue
                ncbx = (bw + cb_w - 1) // cb_w
                ncby = (bh + cb_h - 1) // cb_h
                inc = _TagTreeEnc(
                    ncbx, ncby, [[0] * ncbx for _ in range(ncby)]
                )
                zbp = _TagTreeEnc(
                    ncbx, ncby, [[0] * ncbx for _ in range(ncby)]
                )
                for cby in range(ncby):
                    for cbx in range(ncbx):
                        blk = band[
                            cby * cb_h : cby * cb_h + cb_h,
                            cbx * cb_w : cbx * cb_w + cb_w,
                        ]
                        data, nps = encode_codeblock(
                            [[int(v) for v in row] for row in blk],
                            bname,
                        )
                        inc.encode(hw, cbx, cby, 1)
                        zbp.encode_value(hw, cbx, cby, 0)
                        _write_n_passes(hw, nps)
                        lblock = 3
                        nbits = lblock + max(0, nps.bit_length() - 1)
                        while len(data) >= (1 << nbits):
                            hw.bit(1)
                            lblock += 1
                            nbits += 1
                        hw.bit(0)
                        hw.bits(len(data), nbits)
                        bodies += data
        packets += hw.align() + bodies
    sot = (
        (0).to_bytes(2, "big")
        + (12 + len(packets) + 2).to_bytes(4, "big")
        + bytes([0, 1])
    )
    out += seg(b"\xff\x90", sot)
    out += b"\xff\x93" + packets  # SOD
    out += b"\xff\xd9"  # EOC
    return bytes(out)


# ------------------------------------------------------------- tests


def test_dwt53_roundtrip_all_shapes():
    rng = np.random.RandomState(5)
    for trial in range(40):
        h = rng.randint(1, 40)
        w = rng.randint(1, 40)
        levels = rng.randint(0, 4)
        img = rng.randint(-300, 300, (h, w)).astype(np.int64)
        ll, bands = fdwt53(img, levels)
        back = idwt53(ll, bands)
        assert (back == img).all(), (trial, h, w, levels)


def test_codeblock_roundtrip():
    rng = random.Random(7)
    for trial in range(60):
        h = rng.randrange(1, 20)
        w = rng.randrange(1, 20)
        band = rng.choice(["LL", "HL", "LH", "HH"])
        density = rng.choice([0.0, 0.1, 0.5, 0.9])
        coeffs = [
            [
                (rng.choice([1, -1, 2, -5, 11, -100, 300])
                 if rng.random() < density else 0)
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        data, nps = encode_codeblock(coeffs, band)
        got = decode_codeblock(data, w, h, band, nps)
        assert got == coeffs, (trial, band, h, w)


def test_jp2k_end_to_end_lossless():
    rng = np.random.RandomState(11)
    for levels in (0, 1, 2, 3):
        for (h, w) in ((8, 8), (21, 13), (40, 64), (65, 33)):
            img = rng.randint(0, 256, (h, w)).astype(np.uint8)
            stream = encode_jp2k(img, levels=levels)
            got = decode_jp2k(stream)
            assert got is not None, (levels, h, w)
            assert (got["width"], got["height"]) == (w, h)
            assert (got["components"][0] == img).all(), (levels, h, w)


def test_jp2k_small_codeblocks_and_gradients():
    rng = np.random.RandomState(13)
    # natural-image-ish gradient: sparse high-frequency bands, deep
    # run-length mode coverage
    y, x = np.mgrid[0:48, 0:37]
    img = ((x * 3 + y * 2) % 251).astype(np.uint8)
    for cb in ((4, 4), (5, 6), (6, 6)):
        stream = encode_jp2k(img, levels=2, cb_exp=cb)
        got = decode_jp2k(stream)
        assert got is not None, cb
        assert (got["components"][0] == img).all(), cb
    flat = np.full((16, 16), 77, np.uint8)
    got = decode_jp2k(encode_jp2k(flat, levels=1))
    assert got is not None and (got["components"][0] == flat).all()
    assert rng is not None


def test_jp2k_refusals():
    img = np.full((8, 8), 10, np.uint8)
    good = encode_jp2k(img, levels=1)
    assert decode_jp2k(good) is not None
    assert decode_jp2k(None) is None
    assert decode_jp2k(b"junk") is None
    # 9/7 irreversible transform: refuse
    bad = bytearray(good)
    i = bad.find(b"\xff\x52")
    bad[i + 2 + 2 + 9] = 0  # SPcod transform byte -> 9/7
    assert decode_jp2k(bytes(bad)) is None
    # CABAC-style unsupported codeblock style bits: refuse
    bad = bytearray(good)
    bad[i + 2 + 2 + 8] = 1  # bypass flag
    assert decode_jp2k(bytes(bad)) is None
    # truncated body
    assert decode_jp2k(good[: len(good) // 2]) is None


def test_pdf_jpx_xobject_reads_through_ocr():
    """/JPXDecode image XObject end-to-end: planted PDF -> codestream
    parse -> EBCOT -> inverse DWT -> glyph OCR."""
    from data_ingestion_py_spark.sources.ocr_pure import match_glyph_grid
    from data_ingestion_py_spark.sources.pdf_pure import (
        extract_page_images,
    )
    from tests.test_ocr_pure import render

    img = render("6183")
    stream = encode_jp2k(img.astype(np.uint8), levels=2)
    h, w = img.shape
    c = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
        b"<< /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c))
        + c + b"\nendstream\nendobj\n"
        + (b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width %d"
           b" /Height %d /ColorSpace /DeviceGray /BitsPerComponent 8"
           b" /Filter /JPXDecode /Length %d >>\nstream\n"
           % (w, h, len(stream)))
        + stream + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF"
    )
    imgs = extract_page_images(pdf)
    assert imgs is not None and len(imgs) == 1
    _pno, _idx, _name, gw, gh, _bpc, kind, data = imgs[0]
    assert (gw, gh, kind) == (w, h, "raw")
    gray = np.frombuffer(data, np.uint8).reshape(h, w)
    assert (gray == img).all()  # lossless: exact
    assert match_glyph_grid(gray) == "6183"
