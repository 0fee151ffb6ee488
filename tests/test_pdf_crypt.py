"""Encrypted-PDF support: standard security handler, empty user password.

The fixture encryptor below implements the *forward* direction of the
PDF 32000-1 §7.6.3 algorithms independently in the test (Algorithm 3 for
/O, Algorithm 4/5 for /U, per-object RC4/AES-CBC encryption), so the
round trip exercises the real key-derivation path rather than mirroring
the implementation. The crypto primitives themselves are pinned to
published vectors (FIPS-197 C.1, NIST SP800-38A F.2, classic RC4)."""

import hashlib
import struct
import zlib

import pytest

from cmc_knowledge_graph_text2ttl_ray.functions import pdf_crypt as pc

# ------------------------------------------------------------ primitives


def test_published_vectors():
    # FIPS-197 Appendix C.1 (AES-128 single block, via the inverse cipher)
    key = bytes(range(16))
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert pc._inv_block(ct, pc._expand_key_128(key)) == pt
    # classic RC4 vectors
    assert pc.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert pc.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # NIST SP800-38A F.2.5 CBC-AES128 decrypt, first block
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct1 = bytes.fromhex("7649abac8119b246cee98e9b12e9197d")
    pt1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    dec = pc.aes128_cbc_decrypt(k, iv + ct1)
    assert dec == pt1 or pt1.startswith(dec)  # lone block: no PKCS5 pad


# ----------------------------------------------- forward AES for fixtures


def _aes_fwd_block(block: bytes, rks) -> bytes:
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, 10):
        s = [pc._SBOX[b] for b in s]
        s = [s[4 * ((c + r) % 4) + r] for c in range(4) for r in range(4)]
        ns = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = pc._gmul(a0, 2) ^ pc._gmul(a1, 3) ^ a2 ^ a3
            ns[4 * c + 1] = a0 ^ pc._gmul(a1, 2) ^ pc._gmul(a2, 3) ^ a3
            ns[4 * c + 2] = a0 ^ a1 ^ pc._gmul(a2, 2) ^ pc._gmul(a3, 3)
            ns[4 * c + 3] = pc._gmul(a0, 3) ^ a1 ^ a2 ^ pc._gmul(a3, 2)
        s = [b ^ k for b, k in zip(ns, rks[rnd])]
    s = [pc._SBOX[b] for b in s]
    s = [s[4 * ((c + r) % 4) + r] for c in range(4) for r in range(4)]
    return bytes(b ^ k for b, k in zip(s, rks[10]))


def test_fixture_forward_aes_matches_fips():
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _aes_fwd_block(pt, pc._expand_key_128(key)).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"


def _aes_cbc_encrypt(key16: bytes, data: bytes) -> bytes:
    rks = pc._expand_key_128(key16)
    iv = bytes(range(16))
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    out, prev = [iv], iv
    for i in range(0, len(data), 16):
        prev = _aes_fwd_block(
            bytes(a ^ b for a, b in zip(data[i : i + 16], prev)), rks)
        out.append(prev)
    return b"".join(out)


# --------------------------------------------------- fixture PDF encryptor

_ID0 = bytes(range(16))
_P = -44


def _derive(o_entry: bytes, r: int, keylen: int) -> bytes:
    h = hashlib.md5()
    h.update(pc._PAD)
    h.update(o_entry[:32])
    h.update(struct.pack("<i", _P))
    h.update(_ID0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def make_encrypted_pdf(stream: bytes, method: str = "rc4", nbits: int = 128,
                       r: int = 3) -> bytes:
    """One-page PDF (FlateDecode content) encrypted per §7.6.3 with empty
    user AND owner passwords."""
    keylen = 16 if method == "aes" else nbits // 8
    # Algorithm 3: /O from the (empty) owner password
    h = hashlib.md5(pc._PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:keylen]
    o_entry = pc.rc4(okey, pc._PAD)
    if r >= 3:
        for i in range(1, 20):
            o_entry = pc.rc4(bytes(b ^ i for b in okey), o_entry)
    key = _derive(o_entry, r, keylen)
    # Algorithm 4/5: /U
    if r == 2:
        u_entry = pc.rc4(key, pc._PAD)
    else:
        u16 = pc.rc4(key, hashlib.md5(pc._PAD + _ID0).digest())
        for i in range(1, 20):
            u16 = pc.rc4(bytes(b ^ i for b in key), u16)
        u_entry = u16 + b"\x00" * 16

    def obj_key(num: int, gen: int = 0) -> bytes:
        m = hashlib.md5()
        m.update(key)
        m.update(struct.pack("<I", num)[:3])
        m.update(struct.pack("<I", gen)[:2])
        if method == "aes":
            m.update(b"sAlT")
        return m.digest()[: min(keylen + 5, 16)]

    def enc(num: int, data: bytes) -> bytes:
        return (_aes_cbc_encrypt(obj_key(num), data) if method == "aes"
                else pc.rc4(obj_key(num), data))

    payload = enc(5, zlib.compress(stream))
    if method == "aes":
        encdict = (b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                   b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                   b" /StmF /StdCF /StrF /StdCF")
    else:
        v = 1 if nbits == 40 else 2
        encdict = (f"<< /Filter /Standard /V {v} /R {r}"
                   f" /Length {nbits}").encode()
    encdict += (b" /O <" + o_entry.hex().encode() + b">"
                b" /U <" + u_entry.hex().encode() + b">"
                + f" /P {_P} >>".encode())
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: (b"<< /Filter /FlateDecode /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream"),
        9: encdict,
    }
    out = [b"%PDF-1.6\n"]
    for num in sorted(objs):
        out.append(f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n")
    out.append(b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R /ID [<"
               + _ID0.hex().encode() + b"> <" + _ID0.hex().encode()
               + b">] >>\n%%EOF\n")
    return b"".join(out)


_STREAM = (b"BT /F1 12 Tf 100 730 Td (Classified totals) Tj ET\n"
           b"BT /F1 10 Tf 100 700 Td (Amount 1234) Tj ET\n")


@pytest.mark.parametrize("method,nbits,r", [
    ("rc4", 40, 2),    # V1 R2
    ("rc4", 128, 3),   # V2 R3
    ("aes", 128, 4),   # V4 R4 AESV2
])
def test_encrypted_pdf_roundtrip(method, nbits, r):
    from cmc_knowledge_graph_text2ttl_ray.functions.pdf import pdf_to_xhtml

    xhtml = pdf_to_xhtml(make_encrypted_pdf(_STREAM, method, nbits, r))
    assert "Classified totals" in xhtml
    assert "Amount 1234" in xhtml


def test_wrong_password_raises():
    from cmc_knowledge_graph_text2ttl_ray.functions.pdf import (
        PdfParseError,
        pdf_to_xhtml,
    )

    pdf = make_encrypted_pdf(_STREAM)
    # corrupt /U → the empty-password check must fail loudly, not emit noise
    u_pos = pdf.index(b"/U <") + 4
    bad = pdf[:u_pos] + (b"00" * 32) + pdf[u_pos + 64 :]
    with pytest.raises(PdfParseError, match="[Pp]assword"):
        pdf_to_xhtml(bad)


def test_aes256_unsupported_raises():
    from cmc_knowledge_graph_text2ttl_ray.functions.pdf import (
        PdfParseError,
        pdf_to_xhtml,
    )

    pdf = make_encrypted_pdf(_STREAM, "rc4", 128, 3)
    bad = pdf.replace(b"/V 2 /R 3 /Length 128", b"/V 5 /R 6 /Length 256")
    with pytest.raises(PdfParseError, match="V=5|Unsupported|Bad key"):
        pdf_to_xhtml(bad)


def test_unencrypted_fast_path_unaffected():
    from cmc_knowledge_graph_text2ttl_ray.functions.pdf import pdf_to_xhtml
    from tests.test_pdf import TABLE_STREAM, make_pdf

    assert "Quarterly" in pdf_to_xhtml(make_pdf([TABLE_STREAM]))


# ----------------------------------------------------- property tests


def test_rc4_aes_property_roundtrip():
    """RC4 is its own inverse; AES-CBC decrypt inverts the fixture's
    forward encryptor for random keys/payloads (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=1, max_size=64), st.binary(min_size=0, max_size=300))
    def rc4_roundtrip(key, payload):
        assert pc.rc4(key, pc.rc4(key, payload)) == payload

    @settings(max_examples=25, deadline=None)
    @given(st.binary(min_size=16, max_size=16), st.binary(min_size=0, max_size=200))
    def aes_roundtrip(key, payload):
        assert pc.aes128_cbc_decrypt(key, _aes_cbc_encrypt(key, payload)) == payload

    rc4_roundtrip()
    aes_roundtrip()


def test_encrypted_pdf_unsigned_p_entry():
    """Producers that store /P as unsigned 32-bit (e.g. 4294963392 ==
    -3904) must still decrypt (round-3 review: struct.error crash)."""
    from cmc_knowledge_graph_text2ttl_ray.functions.pdf import pdf_to_xhtml

    pdf = make_encrypted_pdf(_STREAM)
    assert b"/P -44 >>" in pdf
    unsigned = str((-44) & 0xFFFFFFFF)
    # the encryption key hashes the SIGNED packing either way, so only the
    # textual representation changes and decryption must still succeed
    bad = pdf.replace(b"/P -44 >>", b"/P " + unsigned.encode() + b" >>")
    assert "Classified totals" in pdf_to_xhtml(bad)
