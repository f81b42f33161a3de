"""NumPy-vectorized port of Spark's ``xxhash64`` expression
(catalyst ``XXH64``), bit-exact by construction and pinned by tests
against the JVM on longs, ints, strings, and multi-argument chains.

Why this exists: the two dominant per-row costs of the corpus
projection — the 32-seed MinHash fold and the language-marker
counting — are at the *expression-form* floor (round-14 record:
rejected A/Bs 1–2).  Guide §4.2: the next level is handing whole
Arrow batches to vectorized native code.  That requires recomputing
``xxhash64`` outside the JVM with identical bits, which this module
provides:

* ``hash_long(x, seed)`` — Spark's ``XXH64.hashLong`` over a uint64
  ndarray (vectorized).
* ``hash_int(i, seed)`` — Spark's ``XXH64.hashInt`` where ``seed`` is
  an ndarray (one scalar int hashed under many running seeds).
* ``hash_bytes(b, seed)`` — Spark's ``XXH64.hashUnsafeBytes`` for a
  single Python ``bytes`` (used only for small constant lexicons —
  pure Python, not vectorized).

Spark semantics reproduced exactly:

* ``xxhash64(a, b, ...)`` chains: ``h = 42`` then per argument
  ``h = hash_<type>(arg, h)``; NULL arguments are skipped.
* longs hash via the 8-byte path, ints via the 4-byte path, strings
  via UTF-8 bytes.

All arithmetic is uint64 with wraparound (NumPy's native unsigned
behavior); results are reinterpreted as int64 at the boundary to match
Spark's signed longs.
"""

from __future__ import annotations

import numpy as np

PRIME64_1 = np.uint64(0x9E3779B185EBCA87)
PRIME64_2 = np.uint64(0xC2B2AE3D27D4EB4F)
PRIME64_3 = np.uint64(0x165667B19E3779F9)
PRIME64_4 = np.uint64(0x85EBCA77C2B2AE63)
PRIME64_5 = np.uint64(0x27D4EB2F165667C5)

DEFAULT_SEED = np.uint64(42)

_U64 = np.uint64
_M64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * PRIME64_2
    h = h ^ (h >> _U64(29))
    h = h * PRIME64_3
    h = h ^ (h >> _U64(32))
    return h


def hash_long(x: np.ndarray, seed) -> np.ndarray:
    """``XXH64.hashLong`` — ``x`` uint64 ndarray, ``seed`` scalar or
    ndarray broadcastable to ``x``."""
    h = _U64(seed) + PRIME64_5 + _U64(8) if np.isscalar(seed) else (
        seed + PRIME64_5 + _U64(8)
    )
    h = h ^ (_rotl(x * PRIME64_2, 31) * PRIME64_1)
    h = _rotl(h, 27) * PRIME64_1 + PRIME64_4
    return _fmix(h)


def hash_int(i: int, seed: np.ndarray) -> np.ndarray:
    """``XXH64.hashInt`` for one scalar 32-bit value under an ndarray
    of running seeds (the MinHash per-seed chain shape)."""
    h = seed + PRIME64_5 + _U64(4)
    h = h ^ (_U64(i & 0xFFFFFFFF) * PRIME64_1)
    h = _rotl(h, 23) * PRIME64_2 + PRIME64_3
    return _fmix(h)


def minhash_over_segments(
    h0: np.ndarray, seg_starts: np.ndarray, num_hashes: int
) -> np.ndarray:
    """(n_segments, num_hashes) int64 MinHash matrix:
    ``sig[s, i] = min over segment s of hashInt(i, h0)`` — the
    vectorized twin of ``dedup.minhash_signature`` run over
    pre-chained per-shingle seeds ``h0 = hashLong(shingle, 42)``.

    The per-seed chain is evaluated with preallocated buffers and
    in-place ufuncs: the naive expression form allocates ~8 temporaries
    per seed over the whole flat array (measured 165 ms/600k-element
    batch for 16 seeds; this loop runs the same math in ~1/3 the
    time).  Segments must be non-empty."""
    n = len(seg_starts)
    sig = np.empty((n, num_hashes), dtype=np.int64)
    if n == 0:
        return sig
    t = np.empty_like(h0)
    u = np.empty_like(h0)
    base = h0 + (PRIME64_5 + _U64(4))
    for i in range(num_hashes):
        # xor constant: (i & 0xFFFFFFFF) * PRIME64_1 mod 2^64
        np.bitwise_xor(
            base, _U64(i & 0xFFFFFFFF) * PRIME64_1, out=t
        )
        # rotl(t, 23)
        np.left_shift(t, _U64(23), out=u)
        np.right_shift(t, _U64(41), out=t)
        np.bitwise_or(u, t, out=t)
        np.multiply(t, PRIME64_2, out=t)
        np.add(t, PRIME64_3, out=t)
        # fmix
        np.right_shift(t, _U64(33), out=u)
        np.bitwise_xor(t, u, out=t)
        np.multiply(t, PRIME64_2, out=t)
        np.right_shift(t, _U64(29), out=u)
        np.bitwise_xor(t, u, out=t)
        np.multiply(t, PRIME64_3, out=t)
        np.right_shift(t, _U64(32), out=u)
        np.bitwise_xor(t, u, out=t)
        sig[:, i] = np.minimum.reduceat(t.view(np.int64), seg_starts)
    return sig


def _rotl_s(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix_s(h: int) -> int:
    h ^= h >> 33
    h = (h * int(PRIME64_2)) & _M64
    h ^= h >> 29
    h = (h * int(PRIME64_3)) & _M64
    h ^= h >> 32
    return h


def hash_bytes(b: bytes, seed: int = 42) -> int:
    """``XXH64.hashUnsafeBytes`` for one Python ``bytes`` — the exact
    Spark tail ordering (8-byte words, then one 4-byte word, then
    single bytes).  Returns the uint64 value; scalar pure Python, for
    constant lexicons only."""
    p1, p2, p3, p4, p5 = (
        int(PRIME64_1), int(PRIME64_2), int(PRIME64_3),
        int(PRIME64_4), int(PRIME64_5),
    )
    n = len(b)
    off = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & _M64
        v2 = (seed + p2) & _M64
        v3 = seed & _M64
        v4 = (seed - p1) & _M64
        while n - off >= 32:
            w = int.from_bytes(b[off:off + 8], "little")
            v1 = (_rotl_s((v1 + w * p2) & _M64, 31) * p1) & _M64
            w = int.from_bytes(b[off + 8:off + 16], "little")
            v2 = (_rotl_s((v2 + w * p2) & _M64, 31) * p1) & _M64
            w = int.from_bytes(b[off + 16:off + 24], "little")
            v3 = (_rotl_s((v3 + w * p2) & _M64, 31) * p1) & _M64
            w = int.from_bytes(b[off + 24:off + 32], "little")
            v4 = (_rotl_s((v4 + w * p2) & _M64, 31) * p1) & _M64
            off += 32
        h = (
            _rotl_s(v1, 1) + _rotl_s(v2, 7) + _rotl_s(v3, 12)
            + _rotl_s(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl_s((v * p2) & _M64, 31) * p1) & _M64
            h = ((h * p1) + p4) & _M64
    else:
        h = (seed + p5) & _M64
    h = (h + n) & _M64
    while n - off >= 8:
        w = int.from_bytes(b[off:off + 8], "little")
        h ^= (_rotl_s((w * p2) & _M64, 31) * p1) & _M64
        h = (_rotl_s(h, 27) * p1 + p4) & _M64
        off += 8
    if n - off >= 4:
        w = int.from_bytes(b[off:off + 4], "little")
        h ^= (w * p1) & _M64
        h = (_rotl_s(h, 23) * p2 + p3) & _M64
        off += 4
    while off < n:
        h ^= ((b[off] & 0xFF) * p5) & _M64
        h = (_rotl_s(h, 11) * p1) & _M64
        off += 1
    return _fmix_s(h)


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark's ``xxhash64(string_col)`` for one Python string — signed
    int64, matching the JVM output bit for bit."""
    v = hash_bytes(s.encode("utf-8"), seed)
    return v - (1 << 64) if v >= (1 << 63) else v
