"""Pure-byte PDF text extraction — no fitz, no extras.

The reference's ENTIRE job is PDF page-text ingestion
(data_ingestion.py:110-135: fitz.open → page.get_text per page). In a
container without PyMuPDF, ``sources/pdf.py`` used to fall back to
"decode the payload as UTF-8" — real plumbing, fake parsing. This
module is the honest in-container kernel, the PDF sibling of the
stdlib-zlib PNG / pure-Huffman JPEG decoders: a tolerant object scan
(``N G obj`` … ``endobj``), a recursive-descent value parser for PDF
dicts/arrays/names/strings/refs, FlateDecode via stdlib zlib with a
LENGTH-CAPPED inflater, compressed object streams (/Type /ObjStm —
the layout every modern writer emits), the Catalog → Pages → Kids
page-tree walk, a content-stream text interpreter for the
Tj / TJ / ' / " show operators with Tf font tracking, Type0/
Identity-H composite fonts' 2-byte code text through their ToUnicode
CMaps (r13 — bfchar + both bfrange forms; the encoding nearly every
modern writer emits), and page image XObjects incl. terminal
/DCTDecode streams handed whole to the in-container JPEG kernel
(r13, ``extract_page_images``).

Standard-security encryption decrypts when the USER password is
empty — the owner-locked-but-readable shape most encrypted PDFs in
the wild have: RC4 V1/V2 R2/R3 and AESV2 V4/R4 (r13: Algorithm 2
file key from /O + /P + /ID with /U verification, per-object keys,
streams and object-graph strings), plus AESV3 V5 R5/R6 — the PDF
2.0 handler — via SHA-2 Algorithm 2.B, /UE file-key recovery, and a
/Perms round-trip check (r14).

Honest limits (→ None or empty page text, never guessed):
documents with a REAL user password or a non-standard security
handler (custom crypt filters), JBIG2/JPX content
filters, Type0 fonts WITHOUT a ToUnicode CMap (their codes are glyph
ids — no text is invented; unmapped codes surface as U+FFFD), and
non-Identity CMap encodings. ObjStm expansion is deferred for
encrypted documents and re-runs once decryption arms, so the modern
ObjStm+XRef-stream+encrypted layout parses (r13). Text layout is
deterministic and documented: show-operator strings concatenate in
stream order; T* / Td / TD / ' / " and ET insert one newline.

Object offsets come from the scan, NOT the xref table — so damaged or
xref-stream PDFs parse as long as their objects are intact, which is
also why the column-algebra fixtures in queries_pdf need no offset
bookkeeping.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# ~1000x inflation cap per stream: enough for any real content stream,
# small enough that a crafted deflate bomb can't balloon the executor
_MAX_INFLATE = 1 << 26


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and buf[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


def _parse_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """Literal string after '(' — nested parens, spec escapes."""
    out = bytearray()
    depth = 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                            0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val = 0
                for _ in range(3):
                    if i < n and 0x30 <= buf[i] <= 0x37:
                        val = val * 8 + (buf[i] - 0x30)
                        i += 1
                    else:
                        break
                out.append(val & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(buf: bytes, i: int) -> tuple[bytes, int]:
    digits = bytearray()
    n = len(buf)
    while i < n and buf[i] != 0x3E:  # '>'
        c = buf[i]
        if c in b"0123456789abcdefABCDEF":
            digits.append(c)
        i += 1
    if len(digits) % 2:
        digits.append(0x30)  # odd count: pad with '0' per spec
    return bytes.fromhex(digits.decode("ascii")), i + 1


def _parse_name(buf: bytes, i: int) -> tuple[str, int]:
    out = bytearray()
    n = len(buf)
    while i < n and buf[i] not in _WS and buf[i] not in _DELIM:
        if buf[i] == 0x23 and i + 2 < n:  # #xx escape
            try:
                out.append(int(buf[i + 1 : i + 3], 16))
                i += 3
                continue
            except ValueError:
                pass
        out.append(buf[i])
        i += 1
    return out.decode("latin-1"), i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _parse_value(buf: bytes, i: int, depth: int = 0):
    """One PDF value at offset i → (value, next_offset). Refs are
    returned as _Ref; dicts as {str: value}; names as str prefixed
    with '/'. Depth-bounded against crafted nesting."""
    if depth > 48:
        raise ValueError("nesting")
    i = _skip_ws(buf, i)
    n = len(buf)
    if i >= n:
        raise ValueError("eof")
    c = buf[i]
    if c == 0x3C:  # '<'
        if i + 1 < n and buf[i + 1] == 0x3C:  # dict
            i += 2
            d: dict = {}
            while True:
                i = _skip_ws(buf, i)
                if i + 1 < n and buf[i] == 0x3E and buf[i + 1] == 0x3E:
                    return d, i + 2
                if i >= n:
                    raise ValueError("dict eof")
                if buf[i] != 0x2F:
                    raise ValueError("dict key")
                key, i = _parse_name(buf, i + 1)
                val, i = _parse_value(buf, i, depth + 1)
                d[key] = val
        s, i = _parse_hex_string(buf, i + 1)
        return s, i
    if c == 0x28:  # '('
        return _parse_string(buf, i + 1)
    if c == 0x2F:  # name
        name, i = _parse_name(buf, i + 1)
        return "/" + name, i
    if c == 0x5B:  # '['
        i += 1
        arr = []
        while True:
            i = _skip_ws(buf, i)
            if i < n and buf[i] == 0x5D:
                return arr, i + 1
            if i >= n:
                raise ValueError("array eof")
            v, i = _parse_value(buf, i, depth + 1)
            arr.append(v)
    m = _NUM_RE.match(buf, i)
    if m:
        # possibly "num gen R" — an indirect reference
        j = _skip_ws(buf, m.end())
        m2 = _NUM_RE.match(buf, j)
        if m2 and b"." not in m.group():
            k = _skip_ws(buf, m2.end())
            if k < n and buf[k : k + 1] == b"R" and (
                k + 1 >= n or buf[k + 1] in _WS or buf[k + 1] in _DELIM
            ):
                return _Ref(int(m.group()), int(m2.group())), k + 1
        tok = m.group()
        return (float(tok) if b"." in tok else int(tok)), m.end()
    for lit, val, ln in ((b"true", True, 4), (b"false", False, 5),
                         (b"null", None, 4)):
        if buf[i : i + ln] == lit:
            return val, i + ln
    raise ValueError(f"bad token at {i}")


def _inflate(raw: bytes) -> bytes | None:
    try:
        d = zlib.decompressobj()
        out = d.decompress(raw, _MAX_INFLATE)
        if d.unconsumed_tail:  # bomb cap hit
            return None
        return out
    except zlib.error:
        return None


# PDF 32000-1 §7.6.3.3 Algorithm 2 password padding string
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % kl]) & 255
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 255
        j = (j + s[i]) & 255
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 255]
    return bytes(out)


# AES-128 (FIPS 197) decryption, pure stdlib — the AESV2 crypt filter
# (PDF 32000-1 §7.6.2, /V 4 /R 4). Tables derive from the forward
# S-box at import; ~10 µs/block in CPython, fine for the per-document
# scale this parser runs at (one content stream per page).
_AES_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_AES_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_AES_SBOX):
    _AES_INV_SBOX[_v] = _i
_AES_INV_SBOX = bytes(_AES_INV_SBOX)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a = _xtime(a)
    return p


_AES_MUL9 = bytes(_gmul(9, x) for x in range(256))
_AES_MUL11 = bytes(_gmul(11, x) for x in range(256))
_AES_MUL13 = bytes(_gmul(13, x) for x in range(256))
_AES_MUL14 = bytes(_gmul(14, x) for x in range(256))
_AES_RCON = bytes.fromhex("01020408102040801b36")


def _aes_round_keys(key: bytes) -> list[bytes]:
    """FIPS 197 key expansion for AES-128 (11 round keys) and AES-256
    (15 round keys — the AESV3 handler, r14)."""
    nk = len(key) // 4
    rounds = nk + 6
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(
                _AES_SBOX[t[(j + 1) % 4]] for j in range(4)
            )
            t = bytes([t[0] ^ _AES_RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk == 8 and i % nk == 4:
            t = bytes(_AES_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(rounds + 1)]


_aes128_round_keys = _aes_round_keys  # back-compat alias (tests)


def _aes_decrypt_block(rks: list[bytes], block: bytes) -> bytes:
    n_rounds = len(rks) - 1
    s = bytes(a ^ b for a, b in zip(block, rks[n_rounds]))
    for rnd in range(n_rounds - 1, 0, -1):
        # InvShiftRows + InvSubBytes (column-major state layout)
        s = bytes(
            _AES_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
        )
        s = bytes(a ^ b for a, b in zip(s, rks[rnd]))
        # InvMixColumns
        out = bytearray(16)
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            out[4 * c] = (
                _AES_MUL14[a0] ^ _AES_MUL11[a1]
                ^ _AES_MUL13[a2] ^ _AES_MUL9[a3]
            )
            out[4 * c + 1] = (
                _AES_MUL9[a0] ^ _AES_MUL14[a1]
                ^ _AES_MUL11[a2] ^ _AES_MUL13[a3]
            )
            out[4 * c + 2] = (
                _AES_MUL13[a0] ^ _AES_MUL9[a1]
                ^ _AES_MUL14[a2] ^ _AES_MUL11[a3]
            )
            out[4 * c + 3] = (
                _AES_MUL11[a0] ^ _AES_MUL13[a1]
                ^ _AES_MUL9[a2] ^ _AES_MUL14[a3]
            )
        s = bytes(out)
    s = bytes(
        _AES_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
    )
    return bytes(a ^ b for a, b in zip(s, rks[0]))


_aes128_decrypt_block = _aes_decrypt_block  # back-compat alias (tests)

_AES_MUL2 = bytes(_gmul(2, x) for x in range(256))
_AES_MUL3 = bytes(_gmul(3, x) for x in range(256))


def _aes_encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    """FORWARD cipher — needed by the AESV3 Algorithm-2.B password
    hash, which ENCRYPTS its state between SHA rounds (r14)."""
    n_rounds = len(rks) - 1
    s = bytes(a ^ b for a, b in zip(block, rks[0]))
    for rnd in range(1, n_rounds):
        # SubBytes + ShiftRows (column-major state layout)
        s = bytes(
            _AES_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        out = bytearray(16)
        for c in range(4):  # MixColumns
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            out[4 * c] = _AES_MUL2[a0] ^ _AES_MUL3[a1] ^ a2 ^ a3
            out[4 * c + 1] = a0 ^ _AES_MUL2[a1] ^ _AES_MUL3[a2] ^ a3
            out[4 * c + 2] = a0 ^ a1 ^ _AES_MUL2[a2] ^ _AES_MUL3[a3]
            out[4 * c + 3] = _AES_MUL3[a0] ^ a1 ^ a2 ^ _AES_MUL2[a3]
        s = bytes(a ^ b for a, b in zip(out, rks[rnd]))
    s = bytes(
        _AES_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
    )
    return bytes(a ^ b for a, b in zip(s, rks[n_rounds]))


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with NO padding (block-multiple input only) — the
    exact mode Algorithm 2.B uses on its 64× repeated state."""
    rks = _aes_round_keys(key)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off : off + 16], prev))
        prev = _aes_encrypt_block(rks, blk)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """AESV2/AESV3 stream layout (§7.6.2): 16-byte IV prefix, CBC
    body, PKCS#7-style padding (1..16, always present). Key length 16
    (AESV2) or 32 (AESV3). None on any length or padding violation —
    corrupt ciphertext never returns bytes."""
    if len(key) not in (16, 32) or len(data) < 32 or len(data) % 16:
        return None
    rks = _aes_round_keys(key)
    prev = data[:16]
    out = bytearray()
    for off in range(16, len(data), 16):
        blk = data[off : off + 16]
        out += bytes(
            a ^ b for a, b in zip(_aes_decrypt_block(rks, blk), prev)
        )
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or any(b != pad for b in out[-pad:]):
        return None
    return bytes(out[:-pad])


_aes128_cbc_decrypt = _aes_cbc_decrypt  # back-compat alias (tests)


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the R6 password hash:
    SHA-256 seed, then rounds of (repeat 64× → AES-128-CBC encrypt
    with the state's own key/IV → SHA-256/384/512 chosen by the
    ciphertext's first-16-byte sum mod 3), until round >= 64 AND the
    ciphertext's last byte <= round - 32. Returns 32 bytes."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e).digest()
            if mod == 0
            else hashlib.sha384(e).digest()
            if mod == 1
            else hashlib.sha512(e).digest()
        )
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _aesv3_file_key(
    enc: dict, resolve, password: bytes = b""
) -> bytes | None:
    """AES-256 file key for /V 5 /R 5 (AEL3, plain-SHA-256 hash) and
    /V 5 /R 6 (PDF 2.0, Algorithm 2.B), USER password — empty by
    default, caller-supplied via ``password`` (r15; UTF-8 bytes,
    truncated to 127 per §7.6.4.3.2 — SASLprep normalization is the
    caller's concern, documented divergence): verify against /U's
    validation salt, decrypt /UE with the key-salt hash (AES-256 CBC,
    zero IV, no padding), then check /Perms round-trips to 'adb'
    under the recovered key (Algorithm 13 — a wrong key NEVER
    ships). None on any mismatch."""
    import hashlib

    r = enc.get("R")
    u, ue = enc.get("U"), enc.get("UE")
    if (
        r not in (5, 6)
        or not isinstance(u, bytes)
        or not isinstance(ue, bytes)
        or len(u) < 48
        or len(ue) != 32
    ):
        return None
    pw = password[:127]
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        if _hash_2b(pw, vsalt) != u[:32]:
            return None
        ik = _hash_2b(pw, ksalt)
    else:  # R5: single SHA-256 (Adobe Extension Level 3)
        if hashlib.sha256(pw + vsalt).digest() != u[:32]:
            return None
        ik = hashlib.sha256(pw + ksalt).digest()
    # /UE: AES-256 CBC, zero IV, NO padding
    rks = _aes_round_keys(ik)
    prev = b"\x00" * 16
    key = bytearray()
    for off in (0, 16):
        blk = ue[off : off + 16]
        key += bytes(
            a ^ b for a, b in zip(_aes_decrypt_block(rks, blk), prev)
        )
        prev = blk
    key = bytes(key)
    perms = resolve(enc.get("Perms"))
    if isinstance(perms, bytes) and len(perms) == 16:
        dec = _aes_decrypt_block(_aes_round_keys(key), perms)
        if dec[9:12] != b"adb":
            return None  # wrong key or tampered perms: refuse
        p = enc.get("P")
        if isinstance(p, int) and int.from_bytes(
            dec[:4], "little", signed=False
        ) != (p & 0xFFFFFFFF):
            return None
    return key


def _std_security_key(
    enc: dict, id0: bytes, password: bytes = b""
) -> bytes | None:
    """Standard security handler file key (PDF 32000-1 §7.6.3.3
    Algorithm 2) for RC4 revisions 2/3, VERIFYING the user password
    against /U (Algorithms 4/5 — the check that distinguishes the
    ubiquitous owner-locked-but-readable PDF, where the USER password
    is empty, from a genuinely password-protected one). Returns the
    n-byte file key, or None when the revision is unsupported or the
    password does not verify — the caller refuses the document rather
    than emitting RC4 noise as text."""
    import hashlib

    r = enc.get("R")
    v = enc.get("V")
    o = enc.get("O")
    u = enc.get("U")
    p = enc.get("P")
    if (
        r not in (2, 3, 4)
        or v not in (1, 2, 4)
        or (r == 4) != (v == 4)
        or not isinstance(o, bytes)
        or not isinstance(u, bytes)
        or not isinstance(p, int)
        or len(o) != 32
        or len(u) < 16
    ):
        return None
    # /Length defaults to 40 for EVERY revision (PDF 32000-1 Table 20)
    # — but R3+ writers that omit it overwhelmingly mean 128, so when
    # the key is unspecified try both and let /U verification pick.
    length = enc.get("Length")
    if length is None:
        candidates = [40] if r == 2 else [128, 40]
    else:
        if (
            not isinstance(length, int)
            or length % 8
            or not 40 <= length <= 128
        ):
            return None
        candidates = [length]
    padded = (password + _PW_PAD)[:32]
    suffix = b""
    if r == 4 and enc.get("EncryptMetadata") is False:
        suffix = b"\xff\xff\xff\xff"
    h0 = hashlib.md5(
        padded + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0 + suffix
    ).digest()
    for cand in candidates:
        n = 5 if r == 2 else cand // 8
        h = h0
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        key = h[:n]
        # verify the (empty) user password against /U
        if r == 2:
            ok = _rc4(key, _PW_PAD) == u[:32]
        else:  # Algorithm 5 (R3 and R4 alike)
            t = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
            for i in range(1, 20):
                t = _rc4(bytes(b ^ i for b in key), t)
            ok = t == u[:16]
        if ok:
            return key
    return None


class _PdfDoc:
    """Scanned object table + lazy stream decoding."""

    def __init__(self, buf: bytes):
        self.buf = buf
        # (num) -> (dict_or_value, stream_start, stream_dict) ; latest
        # occurrence wins (incremental updates append newer objects)
        self.objs: dict[int, tuple] = {}
        # standard-security file key once _setup_encryption verifies
        # the empty user password; None = unencrypted doc. enc_aes
        # selects the AESV2 crypt filter (V4/R4) over plain RC4.
        self.enc_key: bytes | None = None
        self.enc_aes: bool = False
        self.enc_v5: bool = False  # AESV3: file key used directly
        self.enc_num: int | None = None  # the /Encrypt object: never
        # decrypted (its own O/U strings are stored in the clear)
        # objects unpacked from /ObjStm: their strings are already
        # plaintext (the WHOLE stream was encrypted, §7.6.2)
        self.from_objstm: set[int] = set()

    def _object_key(self, num: int, gen: int = 0) -> bytes:
        """Per-object key (§7.6.2 Algorithm 1): MD5(file key + low 3
        bytes of the object number + low 2 bytes of the generation
        [+ the AESV2 'sAlT' marker]), truncated to min(n+5, 16). The
        scan stores one object per number, so generation is 0 — true
        for every non-incrementally-rewritten file."""
        import hashlib

        assert self.enc_key is not None
        if self.enc_v5:  # AESV3: the file key IS every object's key
            return self.enc_key
        h = hashlib.md5(
            self.enc_key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
            + (b"sAlT" if self.enc_aes else b"")
        ).digest()
        return h[: min(len(self.enc_key) + 5, 16)]

    def _decrypt(self, num: int, data: bytes) -> bytes | None:
        key = self._object_key(num)
        if self.enc_aes:
            return _aes128_cbc_decrypt(key, data)
        return _rc4(key, data)

    def decrypt_string(self, num: int, s: bytes) -> bytes:
        """Strings stored directly in object ``num``'s graph (e.g. the
        Info dict's /Title) are encrypted with that object's key —
        EXCEPT objects that came out of an ObjStm, whose strings were
        encrypted (and already decrypted) wholesale with the stream."""
        if self.enc_key is None or num in self.from_objstm:
            return s
        got = self._decrypt(num, s)
        return got if got is not None else b""

    def resolve(self, v, depth: int = 0):
        while isinstance(v, _Ref) and depth < 32:
            got = self.objs.get(v.num)
            if got is None:
                return None
            v = got[0]
            depth += 1
        return v

    def _raw_stream(
        self, num: int
    ) -> tuple[dict, bytes, list, list] | None:
        """(stream dict, raw bytes, filters, decode-parms) of object
        ``num`` — the shared preamble of ``stream_bytes`` and
        ``image_stream``: /Length-or-endstream recovery done, filter
        chain NOT yet applied."""
        got = self.objs.get(num)
        if got is None or got[1] is None:
            return None
        d, start = got
        if not isinstance(d, dict):
            return None
        length = self.resolve(d.get("Length"))
        raw = None
        if isinstance(length, int) and 0 <= length <= len(self.buf) - start:
            raw = self.buf[start : start + length]
            # tolerate writers whose Length is off: verify endstream
            tail = _skip_ws(self.buf, start + length)
            if self.buf[tail : tail + 9] != b"endstream":
                raw = None
        if raw is None:  # fall back to scanning for endstream
            end = self.buf.find(b"endstream", start)
            if end < 0:
                return None
            raw = self.buf[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        if self.enc_key is not None and num != self.enc_num:
            # §7.6.2: every stream (except the Encrypt dict's own, and
            # cross-reference streams — which this scan-based parser
            # never decodes as content) is encrypted with the object
            # key: RC4, or AES-CBC under the AESV2 crypt filter
            raw = self._decrypt(num, raw)
            if raw is None:
                return None  # bad AES padding/length: corrupt
        filt = self.resolve(d.get("Filter"))
        filts = (
            [] if filt is None
            else (filt if isinstance(filt, list) else [filt])
        )
        parms = self.resolve(d.get("DecodeParms"))
        if not isinstance(parms, list):
            parms = [parms] * len(filts)
        if len(parms) != len(filts):
            return None
        return d, raw, filts, parms

    def stream_bytes(self, num: int) -> bytes | None:
        """Decoded stream content of object ``num`` (None if absent or
        undecodable). Supports no filter and /FlateDecode (scalar or
        1-element array)."""
        got = self._raw_stream(num)
        if got is None:
            return None
        _d, data, filts, parms = got
        for f, dp in zip(filts, parms):
            data = self._apply_filter(
                self.resolve(f), self.resolve(dp), data
            )
            if data is None:
                return None  # any undecodable link breaks the chain
        return data

    def image_stream(self, num: int) -> tuple[str, bytes] | None:
        """Image XObject stream content, DCT-aware (r13, VERDICT task
        #4): a TERMINAL /DCTDecode is not applied — the remaining bytes
        ARE a complete JPEG file, returned as ``('jpeg', data)`` for
        the in-container JPEG kernel (``multimodal.decode_jpeg_array``)
        to decode; armor filters in front of it are applied normally.
        A fully-applied chain (or no filter) returns ``('raw', data)``.
        /DCTDecode anywhere but last, or any unsupported link, → None
        (honest: never emit half-decoded bytes as an image)."""
        got = self._raw_stream(num)
        if got is None:
            return None
        d, data, filts, parms = got
        for i, (f, dp) in enumerate(zip(filts, parms)):
            name = self.resolve(f)
            if name == "/DCTDecode":
                if i != len(filts) - 1:
                    return None
                rdp = self.resolve(dp)
                if rdp is not None and not isinstance(rdp, dict):
                    return None
                return ("jpeg", data)
            if name == "/CCITTFaxDecode":
                # terminal fax-compressed bilevel (r13): pure Group 4
                # (K < 0), 1D Group 3 (K == 0), and r15 mixed-2D
                # Group 3 (K > 0) decode through sources/ccitt into
                # an 8-bit gray raster. /BlackIs1 only flips the
                # STORED bit polarity, which this gray-emitting path
                # never materializes.
                if i != len(filts) - 1:
                    return None
                rdp = self.resolve(dp)
                if rdp is not None and not isinstance(rdp, dict):
                    return None
                rdp = rdp or {}
                k = self.resolve(rdp.get("K", 0))
                if not isinstance(k, int):
                    return None
                cols = self.resolve(rdp.get("Columns", 1728))
                rows = self.resolve(
                    rdp.get("Rows", self.resolve(d.get("Height")))
                )
                if not isinstance(cols, int) or not isinstance(rows, int):
                    return None
                from data_ingestion_py_spark.sources.ccitt import (
                    g3_1d_decode,
                    g3_2d_decode,
                    g4_decode,
                )

                if k < 0:  # pure Group 4
                    if self.resolve(rdp.get("EncodedByteAlign")) is True:
                        return None
                    arr = g4_decode(data, cols, rows)
                elif k > 0:  # mixed 2D Group 3 (r15): EOL framing
                    # self-delimits, so /EncodedByteAlign fill is
                    # subsumed by the decoder's zero-skip
                    arr = g3_2d_decode(data, cols, rows)
                else:  # K == 0: Group 3 one-dimensional (r13)
                    arr = g3_1d_decode(
                        data,
                        cols,
                        rows,
                        byte_align=self.resolve(
                            rdp.get("EncodedByteAlign")
                        )
                        is True,
                    )
                if arr is None:
                    return None
                return ("gray8", arr.tobytes())
            if name == "/JBIG2Decode":
                # terminal modern-fax bilevel (r14, VERDICT stretch
                # #4): MMR-coded generic regions decode through the
                # JBIG2 segment walk + T.6 kernel; arithmetic-coded
                # regions stay the honest seam (sources/jbig2.py).
                if i != len(filts) - 1:
                    return None
                rdp = self.resolve(dp)
                if rdp is not None and not isinstance(rdp, dict):
                    return None
                gdata = None
                if isinstance(rdp, dict) and "JBIG2Globals" in rdp:
                    gref = rdp["JBIG2Globals"]
                    if not isinstance(gref, _Ref):
                        return None
                    gdata = self.stream_bytes(gref.num)
                    if gdata is None:
                        return None
                from data_ingestion_py_spark.sources.jbig2 import (
                    jbig2_generic_decode,
                )

                arr = jbig2_generic_decode(data, gdata)
                if arr is None:
                    return None
                return ("gray8", arr.tobytes())
            if name == "/JPXDecode":
                # terminal book-scan wavelet bilevel/gray (r15,
                # VERDICT stretch #6): the lossless reversible
                # JPEG 2000 profile decodes through the MQ coder +
                # EBCOT + 5/3 DWT (sources/jpeg2000.py); irreversible
                # 9/7, multi-tile, and quantized streams stay the
                # honest seam.
                if i != len(filts) - 1:
                    return None
                from data_ingestion_py_spark.sources.jpeg2000 import (
                    decode_jp2k,
                )

                got = decode_jp2k(data)
                if got is None or len(got["components"]) != 1:
                    return None  # gray only in the raster path
                return ("gray8", got["components"][0].tobytes())
            data = self._apply_filter(name, self.resolve(dp), data)
            if data is None:
                return None
        return ("raw", data)

    def _unpredict(self, data: bytes, parms) -> bytes | None:
        """Invert a /DecodeParms /Predictor on decompressed Flate/LZW
        output (PDF 32000-1 §7.4.4.4, r14 — the gap real-world
        generators hit constantly: Predictor-12 image XObjects and
        predictor'd xref/object streams). Predictor 2 = TIFF
        horizontal differencing (8-bit components — the only depth the
        wild uses; sub-byte stays an honest None); 10–15 = PNG filters
        (one tag byte per row, inverted by the SAME row machinery as
        ``multimodal._png_unfilter`` — per PNG spec the per-row tag
        decides, so all six values decode identically). None on torn
        rows / bad geometry — never emits differenced bytes as data."""
        if not isinstance(parms, dict):
            return data
        pred = self.resolve(parms.get("Predictor", 1))
        if pred in (None, 1):
            return data
        colors = self.resolve(parms.get("Colors", 1))
        bpc = self.resolve(parms.get("BitsPerComponent", 8))
        cols = self.resolve(parms.get("Columns", 1))
        if (
            not all(isinstance(x, int) for x in (pred, colors, bpc, cols))
            or colors < 1
            or cols < 1
            or bpc not in (1, 2, 4, 8, 16)
        ):
            return None
        import numpy as np

        if pred == 2:  # TIFF horizontal differencing
            if bpc != 8:
                return None  # sub-byte/16-bit TIFF predictor: seam
            stride = cols * colors
            if not data or len(data) % stride:
                return None  # torn rows
            arr = (
                np.frombuffer(data, np.uint8)
                .reshape(-1, cols, colors)
                .copy()
            )
            np.add.accumulate(arr, axis=1, out=arr)  # uint8 wraps
            return arr.tobytes()
        if 10 <= pred <= 15:  # PNG filters, per-row tag byte
            from data_ingestion_py_spark.sources.multimodal import (
                _png_unfilter,
            )

            stride = (cols * colors * bpc + 7) // 8
            if not data or len(data) % (stride + 1):
                return None  # torn rows
            h = len(data) // (stride + 1)
            bpp = max(1, (colors * bpc) // 8)
            recon = _png_unfilter(data, stride, h, bpp)
            if recon is None:
                return None
            return recon.tobytes()
        return None  # unknown predictor value

    def _apply_filter(self, name, parms, data: bytes) -> bytes | None:
        """One link of a /Filter chain (r12: chains supported — the
        common real-world shape is an ASCII armor filter in front of a
        binary one). Implemented: FlateDecode, LZWDecode (EarlyChange
        honored, both with /Predictor 2 and 10–15 via ``_unpredict``),
        RunLengthDecode, ASCIIHexDecode, ASCII85Decode.
        Honest None: DCT/CCITT/JBIG2/JPX/Crypt (terminal image
        filters are handled by ``image_stream``)."""
        if name == "/FlateDecode":
            if parms is not None and not isinstance(parms, dict):
                return None
            out = _inflate(data)
            if out is None:
                return None
            return self._unpredict(out, parms)
        if name == "/LZWDecode":
            early = 1
            if isinstance(parms, dict):
                early = self.resolve(parms.get("EarlyChange", 1))
                if early not in (0, 1):
                    return None
            elif parms is not None:
                return None
            from data_ingestion_py_spark.sources.multimodal import (
                lzw_msb_decode,
            )

            out = lzw_msb_decode(
                data, _MAX_INFLATE, early_change=bool(early)
            )
            if out is None:
                return None
            return self._unpredict(out, parms)
        if name == "/RunLengthDecode":
            out = bytearray()
            i, n = 0, len(data)
            while True:
                if i >= n:
                    return None  # EOD (128) never arrived: torn
                b = data[i]
                i += 1
                if b == 128:
                    return bytes(out)
                if b < 128:  # literal run of b+1 bytes
                    if i + b + 1 > n:
                        return None
                    out += data[i : i + b + 1]
                    i += b + 1
                else:  # repeat next byte 257-b times
                    if i >= n:
                        return None
                    out += bytes([data[i]]) * (257 - b)
                    i += 1
                if len(out) > _MAX_INFLATE:
                    return None
        if name == "/ASCIIHexDecode":
            digits = []
            for b in data:
                if b in b" \t\r\n\x0c\x00":
                    continue
                if b == 0x3E:  # '>' EOD
                    break
                c = chr(b)
                if c not in "0123456789abcdefABCDEF":
                    return None
                digits.append(c)
            else:
                return None  # EOD never arrived
            if len(digits) % 2:
                digits.append("0")  # spec: odd final digit, pad 0
            return bytes.fromhex("".join(digits))
        if name == "/ASCII85Decode":
            out = bytearray()
            group: list[int] = []
            i, n = 0, len(data)
            while i < n:
                b = data[i]
                if b in b" \t\r\n\x0c\x00":
                    i += 1
                    continue
                if b == 0x7E:  # '~>' EOD
                    break
                if b == 0x7A:  # 'z' = four zero bytes, only between groups
                    if group:
                        return None
                    out += b"\x00\x00\x00\x00"
                    i += 1
                    continue
                if not 0x21 <= b <= 0x75:
                    return None
                group.append(b - 0x21)
                if len(group) == 5:
                    v = 0
                    for g in group:
                        v = v * 85 + g
                    if v > 0xFFFFFFFF:
                        return None
                    out += v.to_bytes(4, "big")
                    group = []
                if len(out) > _MAX_INFLATE:
                    return None
                i += 1
            else:
                return None  # EOD never arrived
            if len(group) == 1:
                return None  # a 1-char final group is invalid
            if group:
                k = len(group)
                v = 0
                for g in group + [84] * (5 - k):  # pad with 'u'
                    v = v * 85 + g
                if v > 0xFFFFFFFF:
                    return None
                out += v.to_bytes(4, "big")[: k - 1]
            return bytes(out)
        return None  # DCT/CCITT/JBIG2/JPX/Crypt: honest seam


def _scan(buf: bytes) -> _PdfDoc:
    doc = _PdfDoc(buf)
    for m in _OBJ_RE.finditer(buf):
        # guard against matches inside streams: require the match to
        # start at a token boundary
        if m.start() > 0 and buf[m.start() - 1] not in _WS:
            continue
        try:
            val, i = _parse_value(buf, m.end())
        except ValueError:
            continue
        stream_start = None
        j = _skip_ws(buf, i)
        if isinstance(val, dict) and buf[j : j + 6] == b"stream":
            j += 6
            if buf[j : j + 2] == b"\r\n":
                j += 2
            elif buf[j : j + 1] == b"\n":
                j += 1
            stream_start = j
        doc.objs[int(m.group(1))] = (val, stream_start)
    # unpack compressed object streams (/Type /ObjStm) — but NOT for
    # encrypted documents: their ObjStm bytes are ciphertext until
    # _setup_encryption arms the key, which re-runs this expansion
    # (r13; the /Encrypt dict itself is always a DIRECT object per
    # spec, so trailer detection needs no expansion)
    if not any("Encrypt" in t for t in _find_trailer_dicts(doc)):
        _expand_objstms(doc)
    return doc


def _expand_objstms(doc: "_PdfDoc") -> None:
    """Unpack /Type /ObjStm compressed object streams into the object
    table (direct objects take precedence). Runs from ``_scan`` for
    unencrypted documents and again from ``_setup_encryption`` once
    decryption is armed — the stream decodes through ``stream_bytes``
    either way, so the encrypted path decrypts transparently. Objects
    sourced from an ObjStm are recorded in ``doc.from_objstm``:
    per §7.6.2 their strings are NOT individually encrypted (the
    whole stream was), so ``decrypt_string`` must skip them."""
    for num in list(doc.objs):
        d, sstart = doc.objs[num]
        if not isinstance(d, dict) or d.get("Type") != "/ObjStm":
            continue
        if sstart is None:
            continue
        data = doc.stream_bytes(num)
        if data is None:
            continue
        n_objs = doc.resolve(d.get("N"))
        first = doc.resolve(d.get("First"))
        if not isinstance(n_objs, int) or not isinstance(first, int):
            continue
        pairs = []
        i = 0
        ok = True
        for _ in range(min(n_objs, 10000)):
            try:
                onum, i = _parse_value(data, i)
                ooff, i = _parse_value(data, i)
            except ValueError:
                ok = False
                break
            if not (isinstance(onum, int) and isinstance(ooff, int)):
                ok = False
                break
            pairs.append((onum, ooff))
        if not ok:
            continue
        for onum, ooff in pairs:
            if onum in doc.objs:  # direct objects take precedence
                continue
            try:
                oval, _ = _parse_value(data, first + ooff)
            except ValueError:
                continue
            doc.objs[onum] = (oval, None)
            doc.from_objstm.add(onum)


def _find_trailer_dicts(doc: _PdfDoc) -> list[dict]:
    out = []
    for m in _TRAILER_RE.finditer(doc.buf):
        try:
            val, _ = _parse_value(doc.buf, m.end())
        except ValueError:
            continue
        if isinstance(val, dict):
            out.append(val)
    # xref-stream PDFs: the /Type /XRef stream dict IS the trailer
    for num, (d, _s) in doc.objs.items():
        if isinstance(d, dict) and d.get("Type") == "/XRef":
            out.append(d)
    return out


_TEXT_SHOW = {b"Tj", b"'", b'"'}
_TEXT_NL = {b"T*", b"Td", b"TD", b"ET", b"'", b'"'}
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")

_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _parse_tounicode(data: bytes) -> dict[int, str] | None:
    """ToUnicode CMap → {2-byte code: text} (r13, the Type0/CID seam):
    ``beginbfchar``/``endbfchar`` pairs and ``beginbfrange``/
    ``endbfrange`` runs (both the dstStart-offset and the explicit
    destination-array forms), destinations decoded as UTF-16BE per PDF
    32000 §9.10.3. Only the sections matter — codespace/usecmap are
    skipped (Identity-H codes are always 2 bytes here). None when no
    mapping parses — the caller's cue that the font's text is
    unrecoverable (honest: no glyph-id guessing)."""
    cmap: dict[int, str] = {}

    def dst_text(h: bytes) -> str:
        raw = bytes.fromhex(h.decode("ascii"))
        return raw.decode("utf-16-be", "replace")

    i = 0
    while True:
        b = data.find(b"beginbfchar", i)
        if b < 0:
            break
        e = data.find(b"endbfchar", b)
        if e < 0:
            return None  # torn section: never half-trust a cmap
        toks = _HEXSTR_RE.findall(data[b + 11 : e])
        if len(toks) % 2:
            return None
        for src, dst in zip(toks[::2], toks[1::2]):
            src_h = b"".join(src.split())
            dst_h = b"".join(dst.split())
            if len(src_h) != 4 or len(dst_h) % 4:
                return None
            cmap[int(src_h, 16)] = dst_text(dst_h)
        i = e + 9
    i = 0
    while True:
        b = data.find(b"beginbfrange", i)
        if b < 0:
            break
        e = data.find(b"endbfrange", b)
        if e < 0:
            return None
        body = data[b + 12 : e]
        j = 0
        while True:
            m1 = _HEXSTR_RE.search(body, j)
            if m1 is None:
                break
            m2 = _HEXSTR_RE.search(body, m1.end())
            if m2 is None:
                return None
            lo = int(b"".join(m1.group(1).split()), 16)
            hi = int(b"".join(m2.group(1).split()), 16)
            if hi < lo or hi - lo > 0xFFFF:
                return None
            j = _skip_ws(body, m2.end())
            if j < len(body) and body[j] == 0x5B:  # explicit dst array
                end = body.find(b"]", j)
                if end < 0:
                    return None
                dsts = _HEXSTR_RE.findall(body[j : end + 1])
                if len(dsts) != hi - lo + 1:
                    return None
                for k, dst in enumerate(dsts):
                    cmap[lo + k] = dst_text(b"".join(dst.split()))
                j = end + 1
            else:
                m3 = _HEXSTR_RE.search(body, j)
                if m3 is None:
                    return None
                start_h = b"".join(m3.group(1).split())
                if len(start_h) % 4 or not start_h:
                    return None
                # PDF 32000 §9.10.3: the destination is a UTF-16BE
                # string and only its LAST code unit is incremented
                # across the range — non-BMP surrogate-pair and
                # multi-char ligature destinations must not be
                # treated as one big integer (chr() of which throws).
                start_b = bytes.fromhex(start_h.decode("ascii"))
                head, last0 = start_b[:-2], int.from_bytes(
                    start_b[-2:], "big"
                )
                for k in range(hi - lo + 1):
                    last = last0 + k
                    if last > 0xFFFF:
                        break  # malformed overflow: stop, keep rest
                    txt = (head + last.to_bytes(2, "big")).decode(
                        "utf-16-be", "replace"
                    )
                    cmap[lo + k] = txt
                j = m3.end()
        i = e + 8
    return cmap or None


# Adobe Glyph List subset: the names a /Differences array actually
# uses for running text (ASCII + the common typographic extras).
# Unlisted names fall back to the code byte's latin-1 value.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "fi": "ﬁ", "fl": "ﬂ", "dotlessi": "ı",
    **{c: c for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"},
    **{c: c for c in "abcdefghijklmnopqrstuvwxyz"},
}


def _parse_differences(diffs: list) -> dict[int, str] | None:
    """/Encoding /Differences array → {code byte: text} (PDF 32000-1
    §9.6.6.1): integers set the next code, names consume successive
    codes. Unknown glyph names map through latin-1 of their code (the
    reasonable floor — never dropped silently)."""
    out: dict[int, str] = {}
    code = None
    for item in diffs:
        if isinstance(item, int):
            if not 0 <= item <= 255:
                return None
            code = item
        elif isinstance(item, str) and item.startswith("/"):
            if code is None or code > 255:
                return None
            out[code] = _AGL.get(item[1:], chr(code))
            code += 1
        else:
            return None
    return out


def _page_fonts(doc: "_PdfDoc", page: dict) -> dict[str, tuple]:
    """Per-page font table for the content tokenizer: resource name →
    ``('cid', cmap)`` for 2-byte Type0/Identity-H fonts (ToUnicode
    cmap; {} when absent — codes are glyph ids, so show strings yield
    no text rather than guessed glyph ids; the reference's fitz reads
    the embedded font's own cmap instead, data_ingestion.py:122) or
    ``('simple', diffmap_or_None)`` for 1-byte fonts — latin-1 with a
    /Differences override map (r13) when the font's /Encoding carries
    one."""
    return _resource_fonts(doc, doc.resolve(page.get("Resources")))


def _resource_fonts(doc: "_PdfDoc", res) -> dict[str, tuple]:
    """``_page_fonts`` body over an already-resolved /Resources dict —
    shared with Form XObjects (r14), whose own /Resources carry their
    own /Font table."""
    fonts: dict[str, tuple] = {}
    if not isinstance(res, dict):
        return fonts
    fdict = doc.resolve(res.get("Font"))
    if not isinstance(fdict, dict):
        return fonts
    for name, ref in fdict.items():
        fd = doc.resolve(ref)
        if not isinstance(fd, dict):
            continue
        if doc.resolve(fd.get("Subtype")) != "/Type0":
            enc = doc.resolve(fd.get("Encoding"))
            diffmap = None
            if isinstance(enc, dict):
                diffs = doc.resolve(enc.get("Differences"))
                if isinstance(diffs, list):
                    diffmap = _parse_differences(
                        [doc.resolve(x) for x in diffs]
                    )
            fonts[name] = ("simple", diffmap)
            continue
        enc = doc.resolve(fd.get("Encoding"))
        if enc not in ("/Identity-H", "/Identity-V"):
            fonts[name] = ("cid", {})  # exotic CMaps: unrecoverable
            continue
        tu = fd.get("ToUnicode")
        cmap = None
        if isinstance(tu, _Ref):
            data = doc.stream_bytes(tu.num)
            if data is not None:
                cmap = _parse_tounicode(data)
        fonts[name] = ("cid", cmap if cmap is not None else {})
    return fonts


def _page_forms(doc: "_PdfDoc", page: dict) -> dict:
    """Form-XObject table for the content tokenizer (r14): resource
    name → lazy thunk yielding ``(content_bytes, fonts, forms)`` for
    /Subtype /Form XObjects — the nesting real writers use for headers,
    stamps, and n-up imposition, whose text was previously invisible.
    A form WITHOUT its own /Resources inherits the caller's (the
    common subset-writer shape). Thunks are lazy so unused forms cost
    nothing; recursion is bounded by ``_page_text``'s depth guard."""
    return _resource_forms(doc, doc.resolve(page.get("Resources")))


def _resource_forms(doc: "_PdfDoc", res) -> dict:
    out: dict = {}
    if not isinstance(res, dict):
        return out
    xobjs = doc.resolve(res.get("XObject"))
    if not isinstance(xobjs, dict):
        return out
    for name, ref in xobjs.items():
        if not isinstance(ref, _Ref):
            continue
        got = doc.objs.get(ref.num)
        if got is None or not isinstance(got[0], dict):
            continue
        d = got[0]
        if doc.resolve(d.get("Subtype")) != "/Form":
            continue

        def thunk(num=ref.num, fd=d):
            data = doc.stream_bytes(num)
            if data is None:
                return None
            fres = doc.resolve(fd.get("Resources"))
            if not isinstance(fres, dict):
                fres = res  # inherit the caller's resources
            return (
                data,
                _resource_fonts(doc, fres),
                _resource_forms(doc, fres),
            )

        out[name] = thunk
    return out


def _page_text(
    content: bytes,
    fonts: dict[str, tuple] | None = None,
    forms: dict | None = None,
    depth: int = 0,
) -> str:
    """Deterministic text from a content stream: show strings in
    stream order; T*/Td/TD/'/\" and ET insert one newline. ``fonts``
    (from ``_page_fonts``) drives per-font decoding: simple fonts
    decode latin-1 with a /Differences override map when present
    (r13); Type0/Identity-H fonts split show strings into 2-byte
    big-endian codes mapped through their ToUnicode cmap (unmapped
    codes → U+FFFD, so a partial cmap is visible rather than silently
    dropped; a Type0 font with NO cmap contributes nothing). ``Do`` on
    a /Form XObject (r14) executes the form's content inline with the
    form's own fonts/resources — its lines flush into the page at the
    paint position in stream order; recursion depth-bounded at 8 so a
    self-referential form terminates."""
    out: list[str] = []
    line: list[str] = []
    i = 0
    n = len(content)
    cur: tuple | None = None  # active font's ('simple'|'cid', map)

    def newline():
        if line:
            out.append("".join(line))
            line.clear()

    def show(s: bytes) -> None:
        if cur is None or cur[0] == "simple":
            diff = cur[1] if cur is not None else None
            if diff:
                line.append(
                    "".join(diff.get(b, chr(b)) for b in s)
                )
            else:
                line.append(s.decode("latin-1"))
            return
        cmap = cur[1]
        if not cmap:
            return  # Type0 without ToUnicode: unrecoverable
        for k in range(0, len(s) - 1, 2):
            code = (s[k] << 8) | s[k + 1]
            line.append(cmap.get(code, "�"))

    pending: list[bytes] = []  # operand strings since last operator
    last_name: str | None = None
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c == 0x28:
            s, i = _parse_string(content, i + 1)
            pending.append(s)
        elif c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:
            s, i = _parse_hex_string(content, i + 1)
            pending.append(s)
        elif c == 0x3C:  # inline dict (e.g. BDC properties): parse, drop
            try:
                _, i = _parse_value(content, i)
            except ValueError:
                i += 2
            pending.clear()
        elif c == 0x5B:  # array operand (TJ): keep its strings in order
            try:
                arr, i = _parse_value(content, i)
            except ValueError:
                break
            pending = [x for x in arr if isinstance(x, bytes)]
        elif c == 0x2F:
            last_name, i = _parse_name(content, i + 1)
        else:
            m = _OP_RE.match(content, i)
            if m:
                op = m.group()
                i = m.end()
                if op == b"Tf" and fonts is not None:
                    # /Name size Tf — the name operand selects the
                    # font (resource-dict keys parse slash-less, as
                    # does the content tokenizer's name operand)
                    cur = fonts.get(last_name or "")
                if op in _TEXT_NL:
                    newline()
                if op in _TEXT_SHOW or op == b"TJ":
                    for s in pending:
                        show(s)
                pending.clear()
                if op == b"Do" and forms is not None and depth < 8:
                    thunk = forms.get(last_name or "")
                    if thunk is not None:
                        got = thunk()
                        if got is not None:
                            sub_c, sub_f, sub_x = got
                            sub = _page_text(
                                sub_c, sub_f, sub_x, depth + 1
                            )
                            if sub:
                                newline()
                                out.extend(sub.split("\n"))
                if op == b"BI":  # inline image: exact span skip (r14)
                    i = _skip_inline_image(content, i)
            else:
                m = _NUM_RE.match(content, i)
                i = m.end() if m else i + 1
    newline()
    return "\n".join(out)


_INLINE_KEY = {
    "W": "Width", "H": "Height", "BPC": "BitsPerComponent",
    "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
    "IM": "ImageMask", "D": "Decode", "I": "Interpolate", "L": "Length",
}
_INLINE_FILTER = {
    "/AHx": "/ASCIIHexDecode", "/A85": "/ASCII85Decode",
    "/LZW": "/LZWDecode", "/Fl": "/FlateDecode",
    "/RL": "/RunLengthDecode", "/CCF": "/CCITTFaxDecode",
    "/DCT": "/DCTDecode",
}
_INLINE_CS = {
    "/G": "/DeviceGray", "/RGB": "/DeviceRGB", "/CMYK": "/DeviceCMYK",
    "/I": "/Indexed",
}
_CS_CHANNELS = {"/DeviceGray": 1, "/DeviceRGB": 3, "/DeviceCMYK": 4}


def _inline_dict(content: bytes, i: int) -> tuple[dict, int] | None:
    """Parse the BI key/value run of an inline image (PDF 32000
    §8.9.7) from just after the ``BI`` token through the ``ID`` token,
    expanding abbreviated keys and filter/colorspace names. Returns
    (dict, index_of_first_data_byte) — ID is followed by exactly ONE
    whitespace byte per spec — or None on malformed syntax."""
    d: dict = {}
    n = len(content)
    while True:
        i = _skip_ws(content, i)
        if i >= n:
            return None
        if content[i] == 0x2F:
            key, i = _parse_name(content, i + 1)
            try:
                val, i = _parse_value(content, i)
            except ValueError:
                return None
            d[_INLINE_KEY.get(key, key)] = val
            continue
        m = _OP_RE.match(content, i)
        if m is not None and m.group() == b"ID":
            i = m.end()
            break
        return None
    if i >= n or content[i] not in _WS:
        return None
    filt = d.get("Filter")
    filts = [] if filt is None else (
        filt if isinstance(filt, list) else [filt]
    )
    d["Filter"] = [
        _INLINE_FILTER.get(f, f) for f in filts if isinstance(f, str)
    ]
    cs = d.get("ColorSpace")
    if isinstance(cs, str):
        d["ColorSpace"] = _INLINE_CS.get(cs, cs)
    return d, i + 1


def _inline_raw_len(d: dict) -> int | None:
    """Exact byte length of an inline image's UNFILTERED data (rows
    are byte-aligned per spec), or None when geometry is missing."""
    w, h, bpc = d.get("Width"), d.get("Height"), d.get("BitsPerComponent")
    if d.get("ImageMask") is True:
        bpc, ch = 1, 1
    else:
        ch = _CS_CHANNELS.get(d.get("ColorSpace"))
        if not isinstance(bpc, int) or ch is None:
            return None
    if not (isinstance(w, int) and isinstance(h, int)) or w <= 0 or h <= 0:
        return None
    return h * ((w * bpc * ch + 7) // 8)


def _ei_candidates(content: bytes, ds: int):
    """Yield (data_end, resume_index) pairs for whitespace-delimited
    ``EI`` tokens after ``ds`` — the only shape the spec allows, so an
    ``EI`` byte pair INSIDE binary data is skipped unless it sits on
    token boundaries (the classic naive-scan corruption)."""
    n = len(content)
    j = ds
    while True:
        e = content.find(b"EI", j)
        if e < 0:
            return
        j = e + 2
        if (
            e > ds
            and content[e - 1] in _WS
            and (j >= n or content[j] in _WS or content[j] in _DELIM)
        ):
            yield e - 1, j


def _skip_inline_image(content: bytes, i: int) -> int:
    """Tokenizer-side span skip for ``BI … ID <data> EI`` (used by
    ``_page_text``): exact for unfiltered data (computed length),
    boundary-aware EI scan for filtered data — never mis-tokenizes on
    an ``EI`` byte pair inside raster bytes of an unfiltered image."""
    n = len(content)
    got = _inline_dict(content, i)
    if got is None:
        end = content.find(b"EI", i)
        return n if end < 0 else end + 2
    d, ds = got
    if not d["Filter"]:
        need = _inline_raw_len(d)
        if need is not None and ds + need <= n:
            j = _skip_ws(content, ds + need)
            if content[j : j + 2] == b"EI":
                return j + 2
    for _de, resume in _ei_candidates(content, ds):
        return resume
    return n


def _decode_inline_image(
    doc: "_PdfDoc", content: bytes, i: int
) -> tuple[tuple[int, int, str, bytes] | None, int]:
    """Decode one inline image starting just after its ``BI`` token
    (r14, VERDICT task #2 — the scanned-fax shape: one inline CCITT or
    gray raster per page). Returns ``((w, h, kind, data) | None,
    resume_index)``; None-image means the span was consumed but the
    image is honestly unsupported (non-gray raw, JBIG2-style seams).
    ``kind``/data contract matches ``image_stream``: 'jpeg' = complete
    JPEG file (terminal /DCT), 'gray8' = decoded fax raster, 'raw' =
    fully-defiltered samples. Filtered data ends are found by
    boundary-aware EI scan with DECODE VERIFICATION — a candidate
    split only wins if the whole filter chain succeeds."""
    n = len(content)
    got = _inline_dict(content, i)
    if got is None:
        end = content.find(b"EI", i)
        return None, (n if end < 0 else end + 2)
    d, ds = got
    w, h = d.get("Width"), d.get("Height")
    if not (isinstance(w, int) and isinstance(h, int)) or w <= 0 or h <= 0:
        return None, _skip_inline_image(content, i)
    filts = d["Filter"]
    parms = d.get("DecodeParms")
    if not isinstance(parms, list):
        parms = [parms] * len(filts)
    if len(parms) != len(filts):
        return None, _skip_inline_image(content, i)

    def chain(raw: bytes) -> tuple[str, bytes] | None:
        for k, (f, dp) in enumerate(zip(filts, parms)):
            f = doc.resolve(f)
            dp = doc.resolve(dp)
            if f == "/DCTDecode":
                return ("jpeg", raw) if k == len(filts) - 1 else None
            if f == "/CCITTFaxDecode":
                if k != len(filts) - 1:
                    return None
                rdp = dp or {}
                if not isinstance(rdp, dict):
                    return None
                kk = doc.resolve(rdp.get("K", 0))
                if not isinstance(kk, int):
                    return None
                cols = doc.resolve(rdp.get("Columns", 1728))
                rows = doc.resolve(rdp.get("Rows", h))
                if not isinstance(cols, int) or not isinstance(rows, int):
                    return None
                from data_ingestion_py_spark.sources.ccitt import (
                    g3_1d_decode,
                    g3_2d_decode,
                    g4_decode,
                )

                if kk < 0:
                    if doc.resolve(rdp.get("EncodedByteAlign")) is True:
                        return None
                    arr = g4_decode(raw, cols, rows)
                elif kk > 0:  # mixed 2D Group 3 (r15)
                    arr = g3_2d_decode(raw, cols, rows)
                else:
                    arr = g3_1d_decode(
                        raw, cols, rows,
                        byte_align=doc.resolve(
                            rdp.get("EncodedByteAlign")
                        ) is True,
                    )
                if arr is None:
                    return None
                return ("gray8", arr.tobytes())
            raw = doc._apply_filter(f, dp, raw)
            if raw is None:
                return None
        return ("raw", raw)

    if not filts:
        need = _inline_raw_len(d)
        if need is None or ds + need > n:
            return None, _skip_inline_image(content, i)
        j = _skip_ws(content, ds + need)
        if content[j : j + 2] != b"EI":
            return None, _skip_inline_image(content, i)
        resume = j + 2
        if d.get("ColorSpace") == "/DeviceGray" and (
            d.get("BitsPerComponent") == 8
        ):
            return (w, h, "raw", content[ds : ds + need]), resume
        return None, resume  # non-gray8 raw: honest skip, span consumed
    for de, resume in _ei_candidates(content, ds):
        got2 = chain(content[ds:de])
        if got2 is None:
            continue
        kind, data = got2
        if kind == "gray8" and len(data) != w * h:
            continue
        if kind == "raw":
            if d.get("ColorSpace") != "/DeviceGray" or (
                d.get("BitsPerComponent") != 8
            ):
                return None, resume  # decoded but non-gray: skip
            if len(data) < w * h:
                continue
            data = data[: w * h]
        return (w, h, kind, data), resume
    end = content.find(b"EI", ds)
    return None, (n if end < 0 else end + 2)


def _inline_images(
    doc: "_PdfDoc", content: bytes
) -> list[tuple[int, int, str, bytes]]:
    """All decodable inline images of one page's content stream, in
    stream order: the same operator-boundary tokenizer walk as
    ``_page_text`` (strings/arrays/dicts never mis-read a BI inside an
    operand), decoding each ``BI…ID…EI`` via ``_decode_inline_image``."""
    out: list[tuple[int, int, str, bytes]] = []
    i, n = 0, len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c == 0x28:
            _s, i = _parse_string(content, i + 1)
        elif c == 0x3C:
            try:
                _v, i = _parse_value(content, i)
            except ValueError:
                i += 2
        elif c == 0x5B:
            try:
                _v, i = _parse_value(content, i)
            except ValueError:
                break
        elif c == 0x2F:
            _nm, i = _parse_name(content, i + 1)
        else:
            m = _OP_RE.match(content, i)
            if m:
                i = m.end()
                if m.group() == b"BI":
                    img, i = _decode_inline_image(doc, content, i)
                    if img is not None:
                        out.append(img)
            else:
                m = _NUM_RE.match(content, i)
                i = m.end() if m else i + 1
    return out


def _setup_encryption(
    doc: _PdfDoc, trailers: list[dict], password: bytes = b""
) -> bool:
    """Arm the document's standard-security decryption (r13 RC4, r14
    AESV2/V3, r15 caller-supplied passwords): V1/V2 R2/R3, V4 AESV2,
    and V5 R5/R6 AESV3, verifying the USER password — empty by
    default (the owner-locked-but-readable shape most encrypted PDFs
    in the wild have) or the caller's ``password`` bytes. Returns
    False (caller refuses, honest) for any other handler, a missing
    /ID, or a password that fails /U verification."""
    enc_ref = None
    id0 = None
    for t in trailers:
        if "Encrypt" in t:
            enc_ref = t["Encrypt"]
            fid = t.get("ID")
            if (
                isinstance(fid, list)
                and fid
                and isinstance(fid[0], bytes)
            ):
                id0 = fid[0]
            break
    if enc_ref is None:
        return True  # unencrypted
    enc = doc.resolve(enc_ref)
    if not isinstance(enc, dict):
        return False
    if enc.get("Filter") != "/Standard":
        return False
    if enc.get("V") == 5:
        # AESV3 / AES-256 (r14, VERDICT task #5): R5 (AEL3) and R6
        # (PDF 2.0). No /ID in the key schedule; the file key comes
        # from /U + /UE via SHA-2 (Algorithm 2.B for R6) and is used
        # DIRECTLY for every object (no per-object derivation).
        cf = doc.resolve(enc.get("CF"))
        stdcf = doc.resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        if (
            not isinstance(stdcf, dict)
            or doc.resolve(stdcf.get("CFM")) != "/AESV3"
            or enc.get("StmF") != "/StdCF"
            or enc.get("StrF") != "/StdCF"
        ):
            return False
        key = _aesv3_file_key(enc, doc.resolve, password)
        if key is None:
            return False
        doc.enc_key = key
        doc.enc_aes = True
        doc.enc_v5 = True
        doc.enc_num = enc_ref.num if isinstance(enc_ref, _Ref) else None
        _expand_objstms(doc)
        return True
    if id0 is None:
        return False
    aes = False
    if enc.get("V") == 4:
        # V4 routes through named crypt filters: only the ubiquitous
        # /StdCF /AESV2 shape with both stream AND string filters
        # pointed at it is supported — anything else refuses
        cf = doc.resolve(enc.get("CF"))
        stdcf = doc.resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        if (
            not isinstance(stdcf, dict)
            or doc.resolve(stdcf.get("CFM")) != "/AESV2"
            or enc.get("StmF") != "/StdCF"
            or enc.get("StrF") != "/StdCF"
        ):
            return False
        aes = True
    key = _std_security_key(enc, id0, password)
    if key is None:
        return False
    doc.enc_key = key
    doc.enc_aes = aes
    doc.enc_num = enc_ref.num if isinstance(enc_ref, _Ref) else None
    # the scan deferred ObjStm expansion for encrypted docs (their
    # stream bytes were ciphertext); expand now that decryption works
    _expand_objstms(doc)
    return True


def _walk_pages(
    doc: _PdfDoc, password: bytes = b""
) -> list[dict] | None:
    """Page objects in document order (shared by the text and image
    extractors), or None when no catalog/page tree parses. Encrypted
    documents arm decryption when the standard handler verifies the
    USER password — empty by default, caller-supplied via
    ``password`` (r15); otherwise honest None."""
    trailers = _find_trailer_dicts(doc)
    if not _setup_encryption(doc, trailers, password):
        return None  # unsupported handler or wrong password: honest
    root = None
    for t in trailers:
        r = t.get("Root")
        if isinstance(r, _Ref):
            root = doc.resolve(r)
            if isinstance(root, dict):
                break
    if not isinstance(root, dict):  # fall back: scan for the Catalog
        for _num, (d, _s) in doc.objs.items():
            if isinstance(d, dict) and d.get("Type") == "/Catalog":
                root = d
                break
    if not isinstance(root, dict):
        return None
    page_objs: list[dict] = []

    def walk(node, depth: int = 0):
        node = doc.resolve(node)
        if not isinstance(node, dict) or depth > 32:
            return
        if node.get("Type") == "/Page":
            page_objs.append(node)
            return
        kids = doc.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for k in kids[:10000]:
                walk(k, depth + 1)

    walk(root.get("Pages"))
    return page_objs or None


def extract_page_images(
    content: bytes, password: bytes = b""
) -> list[tuple[int, int, str, int, int, int, str, bytes]] | None:
    """Image XObjects per page — the scanned-PDF entry point the
    reference feeds to OCR (data_ingestion.py:136-168), extras-free:
    ``[(page_number, image_index, name, width, height,
    bits_per_component, kind, data), ...]`` where ``kind`` is

    - ``'jpeg'``: the stream's terminal filter is /DCTDecode; ``data``
      is the complete JPEG file (any armor/compression filters IN
      FRONT of it already applied) — decodable in-container by
      ``sources/multimodal.decode_jpeg_array`` (r12 kernel);
    - ``'raw'``: the full filter chain applied (or no filter);
      ``data`` is the raster samples as stored (8-bit /DeviceGray =
      one byte per pixel row-major).

    Terminal /CCITTFaxDecode streams decode through the fax kernel to
    8-bit gray (r13), /DecodeParms predictors on Flate/LZW invert via
    ``_unpredict`` (r14), and inline ``BI…ID…EI`` images in content
    streams — the classic scanned-fax shape — are emitted after the
    page's XObjects in stream order with names ``BI0``, ``BI1``, …
    (r14). Honest skips: non-image XObjects, images behind filters the
    chain can't finish, and non-gray raw color spaces are
    NOT emitted — never guessed at. None = not a parseable unencrypted
    PDF (same contract as ``parse_pdf_text``)."""
    if not content.startswith(b"%PDF-"):
        return None
    doc = _scan(content)
    if not doc.objs:
        return None
    pages = _walk_pages(doc, password)
    if pages is None:
        return None
    out: list[tuple[int, int, str, int, int, int, str, bytes]] = []
    for pno, p in enumerate(pages, start=1):
        res = doc.resolve(p.get("Resources"))
        xobjs = (
            doc.resolve(res.get("XObject"))
            if isinstance(res, dict)
            else None
        )
        if not isinstance(xobjs, dict):
            xobjs = {}
        idx = 0
        for name in sorted(xobjs):
            ref = xobjs[name]
            if not isinstance(ref, _Ref):
                continue
            got = doc.objs.get(ref.num)
            if got is None or not isinstance(got[0], dict):
                continue
            d = got[0]
            if doc.resolve(d.get("Subtype")) != "/Image":
                continue
            w = doc.resolve(d.get("Width"))
            h = doc.resolve(d.get("Height"))
            bpc = doc.resolve(d.get("BitsPerComponent"))
            if not (isinstance(w, int) and isinstance(h, int)):
                continue
            kind_data = doc.image_stream(ref.num)
            if kind_data is None:
                continue
            kind, data = kind_data
            if kind == "gray8":
                # already a decoded raster (CCITT G4): ships as 'raw'
                kind = "raw"
                if len(data) != w * h:
                    continue
            elif kind == "raw":
                cs = doc.resolve(d.get("ColorSpace"))
                if cs != "/DeviceGray" or bpc != 8:
                    continue  # raw non-gray8: honest skip, never guess
                if len(data) < w * h:
                    continue
                data = data[: w * h]
            out.append(
                (pno, idx, name, w, h, bpc if isinstance(bpc, int) else 0,
                 kind, data)
            )
            idx += 1
        # inline BI/ID/EI images, after XObjects, in stream order (r14)
        contents = p.get("Contents")
        cdata = bytearray()
        for x in (
            contents if isinstance(contents, list) else [contents]
        ):
            if isinstance(x, _Ref):
                got = doc.stream_bytes(x.num)
                if got is not None:
                    cdata += got
                    cdata += b"\n"
        if cdata:
            for bi_n, (w, h, kind, data) in enumerate(
                _inline_images(doc, bytes(cdata))
            ):
                if kind == "gray8":
                    kind = "raw"
                out.append(
                    (pno, idx, f"BI{bi_n}", w, h, 8, kind, data)
                )
                idx += 1
    return out


def parse_pdf_text(
    content: bytes, password: bytes = b""
) -> tuple[list[str], dict] | None:
    """(per-page text, metadata) via the pure-byte parse, or None when
    the payload is not a parseable PDF (encrypted documents decrypt
    when the empty or caller-supplied USER ``password`` verifies)."""
    if not content.startswith(b"%PDF-"):
        return None
    doc = _scan(content)
    if not doc.objs:
        return None
    trailers = _find_trailer_dicts(doc)
    page_objs = _walk_pages(doc, password)
    if page_objs is None:
        return None
    pages: list[str] = []
    for p in page_objs:
        contents = p.get("Contents")
        refs: list[_Ref] = []
        for x in (contents if isinstance(contents, list) else [contents]):
            if isinstance(x, _Ref):
                refs.append(x)
        data = bytearray()
        for r in refs:
            got = doc.stream_bytes(r.num)
            if got is not None:
                data += got
                data += b"\n"
        pages.append(
            _page_text(
                bytes(data), _page_fonts(doc, p), _page_forms(doc, p)
            )
        )
    meta: dict[str, str] = {}
    for t in trailers:
        iref = t.get("Info")
        info = doc.resolve(iref)
        if isinstance(info, dict):
            for k in ("Title", "Author", "Subject", "Producer",
                      "CreationDate"):
                v = doc.resolve(info.get(k))
                if isinstance(v, bytes):
                    if doc.enc_key is not None and isinstance(iref, _Ref):
                        # strings in an encrypted doc's object graph
                        # are RC4'd with their OWNER object's key
                        v = doc.decrypt_string(iref.num, v)
                    if v[:2] == b"\xfe\xff":
                        meta[k] = v[2:].decode("utf-16-be", "replace")
                    else:
                        meta[k] = v.decode("latin-1")
    return pages, meta


def _pdf_text_string(v: bytes) -> str:
    """PDF text-string decoding (§7.9.2.2): UTF-16BE when BOM'd,
    PDFDocEncoding ≈ latin-1 otherwise."""
    if v[:2] == b"\xfe\xff":
        return v[2:].decode("utf-16-be", "replace")
    return v.decode("latin-1")


def extract_annotations(
    content: bytes, password: bytes = b""
) -> list[tuple[int, int, str, str]] | None:
    """Per-page annotation text (r14) — the markup layer real PDFs
    carry OUTSIDE content streams (review comments, sticky notes,
    free-text boxes, link alt text): walk each page's /Annots array
    and emit ``(page_number, annot_index, subtype, contents)`` for
    every annotation dict with a string /Contents (UTF-16BE or
    PDFDocEncoding, decrypted with the owner object's key in
    encrypted documents). Annotation APPEARANCE streams are
    deliberately not rendered — /Contents IS the text per spec;
    widget fields without /Contents contribute nothing. None = not a
    parseable unencrypted-or-empty-password PDF (same contract as
    ``parse_pdf_text``)."""
    if not content.startswith(b"%PDF-"):
        return None
    doc = _scan(content)
    if not doc.objs:
        return None
    pages = _walk_pages(doc, password)
    if pages is None:
        return None
    out: list[tuple[int, int, str, str]] = []
    for pno, p in enumerate(pages, start=1):
        annots = doc.resolve(p.get("Annots"))
        if not isinstance(annots, list):
            continue
        idx = 0
        for ref in annots[:10000]:
            a = doc.resolve(ref)
            if not isinstance(a, dict):
                continue
            sub = doc.resolve(a.get("Subtype"))
            v = a.get("Contents")
            # Strings are encrypted under the number of the indirect
            # object that CONTAINS them: an indirect /Contents under
            # its own number, a direct /Contents under the annot
            # ref's. A direct annot dict inside the page object of an
            # encrypted doc has no owning number here — skip it
            # (r15 advice: an honest omission beats mojibake).
            owner = ref.num if isinstance(ref, _Ref) else None
            if isinstance(v, _Ref):
                owner = v.num
                v = doc.resolve(v)
            if not isinstance(v, bytes):
                continue
            if doc.enc_key is not None:
                if owner is None:
                    continue
                v = doc.decrypt_string(owner, v)
            out.append(
                (
                    pno,
                    idx,
                    sub.lstrip("/") if isinstance(sub, str) else "",
                    _pdf_text_string(v),
                )
            )
            idx += 1
    return out
