"""PDF standard security handler (ISO 32000-1 §7.6.3) — RC4-40/128 and
AESV2 (AES-128-CBC) with the empty-user-password derivation.

A meaningful slice of crawl PDFs is "encrypted" with an owner password
only — the user password is EMPTY, so every reader can open them, and a
pipeline that error-rows them loses real documents (VERDICT r7 #2). This
module implements the standard handler's key derivation (Algorithm 2),
the O/U computations the builder twin needs (Algorithms 3-5), per-object
keys (7.6.2 Algorithm 1, including the AES salt bytes), and the two
ciphers natively: RC4 (the 1987 stream cipher, public since 1994) and
AES-128 (FIPS-197) with CBC mode and the 16-byte random-IV prefix layout
the spec mandates.

AES tables are DERIVED at import from the GF(2^8) field law (0x11B
reduction polynomial, generator 3 log/antilog, §5.1.1 affine map) rather
than transcribed — the same derive-don't-copy house rule as webp.py's
distance map. The cipher hot path works on 32-bit column words with
4x256 T-tables (enc) / inverse T-tables (dec), one table lookup + xor
per byte per round — the standard software shape, fast enough that a
fixture-sized stream decrypts in tens of microseconds.

Contract: malformed /Encrypt structure or a non-empty user password
raises PdfCryptError (a PdfFormatError subclass via pdf.py's wrapping)
so encrypted-beyond-reach files stay errors-as-data rows.
"""

from __future__ import annotations

import hashlib
import struct


class PdfCryptError(ValueError):
    """Unsupported/malformed encryption — becomes a decode_error row."""


# --- RC4 ----------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA). Symmetric: encrypt == decrypt."""
    if not key:
        raise PdfCryptError("empty RC4 key")
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --- AES-128 (FIPS-197), tables derived from the field law ---------------------

_EXP = [0] * 512          # antilog base 3 (3 is a generator of GF(2^8)*)
_LOG = [0] * 256


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B            # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return r


def _build_tables():
    x = 1
    for i in range(255):
        _EXP[i] = x
        _LOG[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 512):
        _EXP[i] = _EXP[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else _EXP[255 - _LOG[a]]

    sbox = [0] * 256
    for a in range(256):
        v = inv(a)
        # §5.1.1 affine map: b ^= rot(b, 1..4) ^ 0x63 over bits
        r = v
        for sh in (1, 2, 3, 4):
            r ^= ((v << sh) | (v >> (8 - sh))) & 0xFF
        sbox[a] = r ^ 0x63
    inv_sbox = [0] * 256
    for a, v in enumerate(sbox):
        inv_sbox[v] = a

    # encryption T-table: column word [2 1 1 3]-mixed through the S-box
    t0 = []
    for a in range(256):
        s = sbox[a]
        t0.append((_gf_mul(s, 2) << 24) | (s << 16) | (s << 8)
                  | _gf_mul(s, 3))
    # decryption T-table: InvMixColumns of the inverse S-box output
    d0 = []
    for a in range(256):
        s = inv_sbox[a]
        d0.append((_gf_mul(s, 14) << 24) | (_gf_mul(s, 9) << 16)
                  | (_gf_mul(s, 13) << 8) | _gf_mul(s, 11))
    return sbox, inv_sbox, t0, d0


_SBOX, _INV_SBOX, _T0, _D0 = _build_tables()
_MASK = 0xFFFFFFFF


def _rotr8(w: int) -> int:
    return ((w >> 8) | (w << 24)) & _MASK


def _expand_key(key: bytes) -> list[int]:
    """128-bit key schedule: 44 round-key words (§5.2)."""
    if len(key) != 16:
        raise PdfCryptError(f"AES key must be 16 bytes, got {len(key)}")
    w = list(struct.unpack(">4I", key))
    rcon = 1
    for i in range(4, 44):
        t = w[i - 1]
        if i % 4 == 0:
            t = ((t << 8) | (t >> 24)) & _MASK          # RotWord
            t = ((_SBOX[(t >> 24) & 0xFF] << 24)
                 | (_SBOX[(t >> 16) & 0xFF] << 16)
                 | (_SBOX[(t >> 8) & 0xFF] << 8)
                 | _SBOX[t & 0xFF])                     # SubWord
            t ^= rcon << 24
            rcon = _gf_mul(rcon, 2)
        w.append(w[i - 4] ^ t)
    return w


def _enc_block(w: list[int], block: bytes) -> bytes:
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    s0 ^= w[0]; s1 ^= w[1]; s2 ^= w[2]; s3 ^= w[3]
    t0 = _T0
    for rnd in range(1, 10):
        k = 4 * rnd
        n0 = (t0[(s0 >> 24) & 0xFF] ^ _rotr8(t0[(s1 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(t0[(s2 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(t0[s3 & 0xFF]))) ^ w[k])
        n1 = (t0[(s1 >> 24) & 0xFF] ^ _rotr8(t0[(s2 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(t0[(s3 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(t0[s0 & 0xFF]))) ^ w[k + 1])
        n2 = (t0[(s2 >> 24) & 0xFF] ^ _rotr8(t0[(s3 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(t0[(s0 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(t0[s1 & 0xFF]))) ^ w[k + 2])
        n3 = (t0[(s3 >> 24) & 0xFF] ^ _rotr8(t0[(s0 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(t0[(s1 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(t0[s2 & 0xFF]))) ^ w[k + 3])
        s0, s1, s2, s3 = n0, n1, n2, n3
    sb = _SBOX
    out = []
    for a, b, c, d, kk in ((s0, s1, s2, s3, w[40]),
                           (s1, s2, s3, s0, w[41]),
                           (s2, s3, s0, s1, w[42]),
                           (s3, s0, s1, s2, w[43])):
        out.append(((sb[(a >> 24) & 0xFF] << 24) | (sb[(b >> 16) & 0xFF] << 16)
                    | (sb[(c >> 8) & 0xFF] << 8) | sb[d & 0xFF]) ^ kk)
    return struct.pack(">4I", *out)


def _dec_block(w: list[int], block: bytes) -> bytes:
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    s0 ^= w[40]; s1 ^= w[41]; s2 ^= w[42]; s3 ^= w[43]
    d0 = _D0

    def mixkey(rnd: int) -> tuple[int, int, int, int]:
        # the equivalent inverse cipher (§5.3.5) wants InvMixColumns of
        # the round key; express it through the same D-table via S-box
        k = 4 * rnd
        out = []
        for kw in w[k:k + 4]:
            out.append(d0[_SBOX[(kw >> 24) & 0xFF]]
                       ^ _rotr8(d0[_SBOX[(kw >> 16) & 0xFF]])
                       ^ _rotr8(_rotr8(d0[_SBOX[(kw >> 8) & 0xFF]]))
                       ^ _rotr8(_rotr8(_rotr8(d0[_SBOX[kw & 0xFF]]))))
        return tuple(out)

    for rnd in range(9, 0, -1):
        k0, k1, k2, k3 = mixkey(rnd)
        n0 = (d0[(s0 >> 24) & 0xFF] ^ _rotr8(d0[(s3 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(d0[(s2 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(d0[s1 & 0xFF]))) ^ k0)
        n1 = (d0[(s1 >> 24) & 0xFF] ^ _rotr8(d0[(s0 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(d0[(s3 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(d0[s2 & 0xFF]))) ^ k1)
        n2 = (d0[(s2 >> 24) & 0xFF] ^ _rotr8(d0[(s1 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(d0[(s0 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(d0[s3 & 0xFF]))) ^ k2)
        n3 = (d0[(s3 >> 24) & 0xFF] ^ _rotr8(d0[(s2 >> 16) & 0xFF])
              ^ _rotr8(_rotr8(d0[(s1 >> 8) & 0xFF]))
              ^ _rotr8(_rotr8(_rotr8(d0[s0 & 0xFF]))) ^ k3)
        s0, s1, s2, s3 = n0, n1, n2, n3
    isb = _INV_SBOX
    out = []
    for a, b, c, d, kk in ((s0, s3, s2, s1, w[0]),
                           (s1, s0, s3, s2, w[1]),
                           (s2, s1, s0, s3, w[2]),
                           (s3, s2, s1, s0, w[3])):
        out.append(((isb[(a >> 24) & 0xFF] << 24)
                    | (isb[(b >> 16) & 0xFF] << 16)
                    | (isb[(c >> 8) & 0xFF] << 8) | isb[d & 0xFF]) ^ kk)
    return struct.pack(">4I", *out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC with PKCS#5 padding, IV prepended (the 7.6.2 stream
    layout). The builder passes a DETERMINISTIC iv so fixtures are
    reproducible — fixture tooling, not a security product."""
    if len(iv) != 16:
        raise PdfCryptError("AES IV must be 16 bytes")
    w = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = _enc_block(w, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of aes_cbc_encrypt: leading 16 bytes are the IV; PKCS#5
    padding is validated and stripped."""
    if len(data) < 32 or len(data) % 16:
        raise PdfCryptError("bad AES-CBC payload length")
    w = _expand_key(key)
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i:i + 16]
        out += bytes(x ^ y for x, y in zip(_dec_block(w, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise PdfCryptError("bad AES padding")
    return bytes(out[:-pad])


# --- standard security handler (7.6.3) ------------------------------------------

# Algorithm 2's 32-byte password pad — spec constant, quoted verbatim
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def file_key(o: bytes, p: int, id0: bytes, r: int, nbytes: int,
             user_pw: bytes = b"",
             encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (as SIGNED 32-bit little-endian), and the first
    document ID string. R>=3 re-hashes 50 times over the first n
    bytes."""
    if len(o) < 32:
        raise PdfCryptError("/O must be 32 bytes")
    h = hashlib.md5(_pad_password(user_pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int,
              nbytes: int) -> bytes:
    """Algorithm 3: the /O value. R2: one RC4 of the padded user
    password; R>=3: 50x MD5 key derivation then 20 RC4 passes with
    index-XORed keys."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:nbytes]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R>=3): the /U value. R>=3 output is 16
    significant bytes + 16 bytes of arbitrary padding (zeros here)."""
    if r == 2:
        return rc4(key, _PAD)
    u = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)


def check_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithm 6 for the empty user password: recompute U with the
    derived key; R>=3 compares the first 16 bytes only."""
    want = compute_u(key, id0, r)
    if r == 2:
        return u[:32] == want
    return u[:16] == want[:16]


def object_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key: file key + 3 low bytes of the object
    number + 2 of the generation (+ the AES salt 'sAlT'), MD5, truncated
    to min(n+5, 16)."""
    h = hashlib.md5(fkey + num.to_bytes(4, "little")[:3]
                    + gen.to_bytes(4, "little")[:2])
    if aes:
        h.update(b"\x73\x41\x6c\x54")
    return h.digest()[:min(len(fkey) + 5, 16)]


def decrypt_object_bytes(fkey: bytes, num: int, gen: int, data: bytes,
                         aes: bool) -> bytes:
    k = object_key(fkey, num, gen, aes)
    if aes:
        return aes_cbc_decrypt(k, data)
    return rc4(k, data)


def encrypt_object_bytes(fkey: bytes, num: int, gen: int, data: bytes,
                         aes: bool) -> bytes:
    k = object_key(fkey, num, gen, aes)
    if aes:
        # deterministic per-object IV for reproducible fixtures
        iv = hashlib.md5(b"iv" + num.to_bytes(4, "little")
                         + gen.to_bytes(4, "little")).digest()
        return aes_cbc_encrypt(k, iv, data)
    return rc4(k, data)
