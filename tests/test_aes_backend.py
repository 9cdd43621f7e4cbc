"""Cross-backend differential: the OpenSSL fast path (round-6
optimization of the AES/RC4 mode functions) must agree bit-for-bit with
the from-scratch reference implementation on random sizes, keys and IVs.
If the ``cryptography`` package is absent the public functions ARE the
pure path and the test degenerates to a self-check — still valid."""
import random

from cc_extract.extractors import aes
from cc_extract.extractors.pdf import _rc4


def _rc4_py(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def test_cbc_backends_agree():
    rng = random.Random(6)
    for klen in (16, 24, 32):
        for nblocks in (1, 4, 7, 128):
            key = bytes(rng.randrange(256) for _ in range(klen))
            iv = bytes(rng.randrange(256) for _ in range(16))
            pt = bytes(rng.randrange(256) for _ in range(16 * nblocks))
            ct = aes.cbc_encrypt(key, iv, pt)
            assert ct == aes._cbc_encrypt_py(key, iv, pt)
            assert aes.cbc_decrypt(key, iv, ct) == pt
            assert aes._cbc_decrypt_py(key, iv, ct) == pt


def test_ecb_backends_agree():
    rng = random.Random(7)
    for klen in (16, 32):
        key = bytes(rng.randrange(256) for _ in range(klen))
        pt = bytes(rng.randrange(256) for _ in range(16 * 9))
        a = aes.AES(key)
        ref = b"".join(a.encrypt_block(pt[i:i + 16])
                       for i in range(0, len(pt), 16))
        assert aes.ecb_encrypt(key, pt) == ref
        assert aes.ecb_decrypt(key, ref) == pt


def test_rc4_backends_agree():
    rng = random.Random(8)
    for klen in (5, 6, 7, 10, 16):  # 6/7/10 bytes fall back to the pure loop
        key = bytes(rng.randrange(256) for _ in range(klen))
        data = bytes(rng.randrange(256) for _ in range(777))
        assert _rc4(key, data) == _rc4_py(key, data)
