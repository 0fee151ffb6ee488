"""PDF standard security handler: RC4 / AES-128 stream decryption.

The reference reads encrypted PDFs through PyMuPDF, which links MuPDF's
crypto (kg_text_to_ttl/text_to_turtle_runner.py:131-141 ``get_pdf_content``
— fitz opens password-less encrypted files transparently). This engine is
dependency-free, so the *standard security handler* (PDF 32000-1 §7.6.3)
is implemented directly for the overwhelmingly common case: documents
encrypted with an **empty user password** (owner-restricted files —
print/copy-locked reports, invoices, datasheets — which any viewer opens
without prompting).

Supported: /Filter /Standard with

- V 1/2, R 2/3 — RC4, 40..128-bit keys (Algorithms 2, 4),
- V 4, R 4 — crypt filters /V2 (RC4) and /AESV2 (AES-128-CBC,
  per-object key salted with ``sAlT``, first 16 bytes of the payload
  are the IV).

NOT supported (PdfParseError): non-empty user passwords (no password
input channel in a batch pipeline), V 5 / R 6 AES-256, public-key
(/Adobe.PubSec) handlers, and /Identity metadata-only oddities beyond
pass-through.

Pure stdlib: MD5 via hashlib; RC4 and AES-128 (decrypt-only inverse
cipher, FIPS-197 tables) implemented here. Both are per-document tail
paths — an encrypted PDF costs a few extra milliseconds per stream,
which disappears inside the per-row parse cost the extract stage
already budgets for.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["PdfCryptError", "StandardSecurityHandler", "rc4", "aes128_cbc_decrypt"]


class PdfCryptError(Exception):
    pass


_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


# ------------------------------------------------------------------- RC4

def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt). Inherently sequential; the
    KSA/PRGA run on small per-object payloads only."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------- AES-128 (decrypt)

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _expand_key_128(key: bytes) -> list[list[int]]:
    """11 round keys of 16 bytes each (FIPS-197 §5.2)."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _inv_block(block: bytes, rks: list[list[int]]) -> bytes:
    """Decrypt one 16-byte block (FIPS-197 inverse cipher, column-major
    state as a flat 16-list indexed [4*c + r])."""
    s = [b ^ k for b, k in zip(block, rks[10])]
    for rnd in range(9, 0, -1):
        # InvShiftRows: row r rotates right by r
        s = [s[(((c - r) % 4) * 4) + r] for c in range(4) for r in range(4)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rks[rnd])]
        # InvMixColumns
        ns = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = (_gmul(a0, 14) ^ _gmul(a1, 11)
                             ^ _gmul(a2, 13) ^ _gmul(a3, 9))
            ns[4 * c + 1] = (_gmul(a0, 9) ^ _gmul(a1, 14)
                             ^ _gmul(a2, 11) ^ _gmul(a3, 13))
            ns[4 * c + 2] = (_gmul(a0, 13) ^ _gmul(a1, 9)
                             ^ _gmul(a2, 14) ^ _gmul(a3, 11))
            ns[4 * c + 3] = (_gmul(a0, 11) ^ _gmul(a1, 13)
                             ^ _gmul(a2, 9) ^ _gmul(a3, 14))
        s = ns
    s = [s[(((c - r) % 4) * 4) + r] for c in range(4) for r in range(4)]
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, rks[0])]
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC per PDF §7.6.2: data = IV ‖ ciphertext, PKCS#5 padding
    stripped when well-formed (tolerant otherwise — a clipped stream should
    degrade, not crash the document)."""
    if len(key) != 16:
        raise PdfCryptError(f"AESV2 needs a 16-byte key, got {len(key)}")
    if len(data) < 16:
        return b""
    iv, ct = data[:16], data[16 : 16 + (len(data) - 16) // 16 * 16]
    rks = _expand_key_128(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        block = ct[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_inv_block(block, rks), prev))
        prev = block
    pad = out[-1] if out else 0
    if 1 <= pad <= 16 and len(out) >= pad and all(
            b == pad for b in out[-pad:]):
        del out[-pad:]
    return bytes(out)


# --------------------------------------------- standard security handler

class StandardSecurityHandler:
    """Per-document decryptor for /Filter /Standard, empty user password.

    Construction validates the password against /U (Algorithms 4/5); a
    mismatch means the file genuinely needs a password and raises.
    ``decrypt(num, gen, data)`` then decrypts one object's stream/string
    payload (Algorithm 1).
    """

    def __init__(self, enc: dict, id0: bytes):
        if enc.get("Filter") not in ("/Standard", None):
            raise PdfCryptError(f"Unsupported security handler {enc.get('Filter')}")
        v = int(enc.get("V", 0) or 0)
        r = int(enc.get("R", 2) or 2)
        if v not in (1, 2, 4) or r not in (2, 3, 4):
            raise PdfCryptError(f"Unsupported encryption V={v} R={r} "
                                "(AES-256 / public-key handlers not implemented)")
        o_entry = _as_bytes(enc.get("O"))
        u_entry = _as_bytes(enc.get("U"))
        if len(o_entry) < 32 or len(u_entry) < 32:
            raise PdfCryptError("Malformed /O or /U entry")
        p = int(enc.get("P", -1))
        nbits = int(enc.get("Length", 40) or 40) if v != 1 else 40
        if nbits % 8 or not (40 <= nbits <= 128):
            raise PdfCryptError(f"Bad key length {nbits}")
        self.r = r
        self.keylen = nbits // 8
        self.encrypt_metadata = bool(enc.get("EncryptMetadata", True))

        # crypt-filter method for V4 (V1/V2 are implicitly RC4)
        self.method = "rc4"
        if v == 4:
            cf = enc.get("CF") or {}
            stmf = str(enc.get("StmF", "/Identity"))
            if stmf == "/Identity":
                self.method = "identity"
            else:
                spec = cf.get(stmf.lstrip("/")) or {}
                cfm = spec.get("CFM", "/V2")
                if cfm == "/V2":
                    self.method = "rc4"
                elif cfm == "/AESV2":
                    self.method = "aes"
                    self.keylen = 16
                else:
                    raise PdfCryptError(f"Unsupported crypt filter {cfm}")

        # Algorithm 2: file encryption key from the (empty) user password
        h = hashlib.md5()
        h.update(_PAD)
        h.update(o_entry[:32])
        # /P is defined as a signed 32-bit value but many producers store
        # it unsigned (e.g. 4294963392 == -3904): normalize before packing
        h.update(struct.pack("<i", p - (1 << 32) if p > 0x7FFFFFFF else p))
        h.update(id0)
        if r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[: self.keylen]).digest()
        self.key = key[: self.keylen]

        # Algorithm 6: validate the empty user password against /U
        if r == 2:
            ok = rc4(self.key, _PAD) == u_entry[:32]
        else:
            digest = hashlib.md5(_PAD + id0).digest()
            enc16 = rc4(self.key, digest)
            for i in range(1, 20):
                enc16 = rc4(bytes(b ^ i for b in self.key), enc16)
            ok = enc16 == u_entry[:16]
        if not ok:
            raise PdfCryptError(
                "Password-protected PDF (non-empty user password)")

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        """Algorithm 1: per-object key = MD5(file key ‖ objnum[3] ‖
        gen[2] [‖ 'sAlT']) truncated to min(keylen+5, 16)."""
        if not data or self.method == "identity":
            return data
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num & 0xFFFFFF)[:3])
        h.update(struct.pack("<I", gen & 0xFFFF)[:2])
        if self.method == "aes":
            h.update(b"sAlT")
        obj_key = h.digest()[: min(self.keylen + 5, 16)]
        if self.method == "aes":
            return aes128_cbc_decrypt(obj_key, data)
        return rc4(obj_key, data)


def _as_bytes(v) -> bytes:
    """Parser strings arrive latin-1-decoded; /O and /U are raw bytes."""
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", "replace")
    return b""
