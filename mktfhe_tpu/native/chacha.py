"""ChaCha20 CSPRNG: ctypes binding to csrc/chacha20.c with a Python fallback.

The reference draws every secret from a ChaCha20 CSPRNG
(/root/reference/src/ring/sampler.jl via ChaChaCiphers); jax.random's
threefry is a statistical PRNG, not a CSPRNG.  Production keygen should
seed from `ChaCha20Stream(os.urandom(32))` and feed the resulting words to
the samplers (or derive jax PRNG keys from them for bulk on-device noise,
which is the default wiring in `secure_seed`).

The shared object is compiled on first use into the package directory; the
pure-Python fallback is bit-identical (RFC 7539) but ~100x slower.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_HERE, "..", "..", "csrc", "chacha20.c")
_SO = os.path.join(_HERE, "_chacha20.so")

_lib = None


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_CSRC):
        return _SO
    cc = os.environ.get("CC", "cc")
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_HERE, delete=False
        ) as tmp:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp.name, _CSRC],
                check=True,
                capture_output=True,
            )
            os.replace(tmp.name, _SO)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(so)
    lib.chacha20_stream.restype = ctypes.c_uint32
    lib.chacha20_stream.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
    ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return bool(_load())


def _rotl(v, c):
    return ((v << c) | (v >> (32 - c))) & 0xFFFFFFFF


def _block_py(key_words, nonce_words, counter):
    sigma = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
    x = list(sigma) + list(key_words) + [counter] + list(nonce_words)
    s = x[:]

    def qr(a, b, c, d):
        s[a] = (s[a] + s[b]) & 0xFFFFFFFF; s[d] = _rotl(s[d] ^ s[a], 16)
        s[c] = (s[c] + s[d]) & 0xFFFFFFFF; s[b] = _rotl(s[b] ^ s[c], 12)
        s[a] = (s[a] + s[b]) & 0xFFFFFFFF; s[d] = _rotl(s[d] ^ s[a], 8)
        s[c] = (s[c] + s[d]) & 0xFFFFFFFF; s[b] = _rotl(s[b] ^ s[c], 7)

    for _ in range(10):
        qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15)
        qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14)
    return [(a + b) & 0xFFFFFFFF for a, b in zip(s, x)]


def chacha20_words(key: bytes, nonce: bytes, counter: int, nwords: int) -> np.ndarray:
    """nwords uint32 keystream words from block `counter` (RFC 7539)."""
    assert len(key) == 32 and len(nonce) == 12
    lib = _load()
    if lib:
        out = np.empty(nwords, dtype=np.uint32)
        lib.chacha20_stream(
            key,
            nonce,
            ctypes.c_uint32(counter),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            nwords,
        )
        return out
    kw = struct.unpack("<8I", key)
    nw = struct.unpack("<3I", nonce)
    words = []
    while len(words) < nwords:
        words.extend(_block_py(kw, nw, counter))
        counter += 1
    return np.array(words[:nwords], dtype=np.uint32)


class ChaCha20Stream:
    """Stateful keystream, mirroring the reference's ChaCha20Stream usage."""

    def __init__(self, key: bytes | None = None, nonce: bytes = b"\x00" * 12):
        self.key = key if key is not None else os.urandom(32)
        self.nonce = nonce
        self.counter = 0

    def words(self, nwords: int) -> np.ndarray:
        out = chacha20_words(self.key, self.nonce, self.counter, nwords)
        self.counter += (nwords + 15) // 16
        return out

    def secure_seed(self) -> int:
        """64-bit seed for deriving a jax PRNG key from CSPRNG output."""
        w = self.words(2).astype(np.uint64)
        return int(w[0] | (w[1] << np.uint64(32)))


def secure_key(stream: "ChaCha20Stream | None" = None):
    """A single jax PRNG key seeded from ChaCha20 CSPRNG output.

    One threefry key carries only 64 bits; key *generation* must use
    `secure_streams` so every top-level sampling stream gets its own fresh
    64 bits of ChaCha output (>= 256 bits per keygen, matching the
    reference's everything-from-ChaCha stance,
    /root/reference/src/ring/sampler.jl:1-34).  This single-key form is
    for non-secret uses (benchmark message sampling)."""
    import jax

    s = stream if stream is not None else ChaCha20Stream()
    # np scalar: jax.random.key rejects python ints >= 2^63
    return jax.random.key(np.uint64(s.secure_seed()))


def secure_streams(n: int, stream: "ChaCha20Stream | None" = None):
    """[n] independent jax PRNG keys, each from 2 fresh ChaCha words.

    Feed to a keygen's `rng` argument (ring/sampler.py:rng_streams): the
    keygen then consumes 64*n bits of CSPRNG entropy -- n >= 4 for every
    scheme, so each keygen draws >= 256 bits of ChaCha output instead of
    funnelling everything through one 64-bit threefry seed."""
    import jax

    s = stream if stream is not None else ChaCha20Stream()
    data = s.words(2 * n).reshape(n, 2)
    return jax.random.wrap_key_data(data, impl="threefry2x32")
