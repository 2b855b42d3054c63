"""NumPy replica of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(c1, c2, ...)`` chains XXH64 over the children with
seed 42: ``h = 42; for child: h = XXH64(child, seed=h)`` where longs use
the single-long shortcut, ints the single-int shortcut, and strings hash
their UTF-8 bytes (little-endian word reads).  This module reproduces that
bit-for-bit (``tests/test_xxh64.py`` proves it against ``F.xxhash64``
directly), vectorized over uint64 numpy arrays — it is what lets the SQL
UDTF surface (``sources/tpch_udtf.py``) generate the *identical* rows as
the distributed Column-expression generators (``sources/tpch_gen.py``)
without a JVM in the loop.

Algorithm constants and structure follow the public XXH64 specification
(github.com/Cyan4973/xxHash) as instantiated by Spark
(``sql/catalyst .. XXH64.java``); the reference repo itself relies on the
same derivation-hash idea through tpchgen's seeded RNG.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SEED = np.uint64(42)

_U64 = np.uint64
_err = np.seterr(over="ignore")  # uint64 arithmetic is modular by design


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def hash_long(value, seed) -> np.ndarray:
    """XXH64 single-long shortcut — Spark's hash step for LongType.
    ``value``/``seed`` may be scalars or uint64 arrays (broadcast)."""
    v = np.asarray(value).astype(np.uint64)
    h = np.asarray(seed).astype(np.uint64) + _P5 + _U64(8)
    k1 = _rotl(v * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value, seed) -> np.ndarray:
    """XXH64 single-int shortcut — Spark's hash step for IntegerType /
    DateType.  The int is zero-extended to a long (``i & 0xFFFFFFFF``)."""
    v = np.asarray(value).astype(np.int64).astype(np.uint64) & _U64(0xFFFFFFFF)
    h = np.asarray(seed).astype(np.uint64) + _P5 + _U64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def hash_bytes(data: bytes, seed) -> np.ndarray:
    """XXH64 over a byte buffer (Spark's hash step for StringType: UTF-8
    bytes, little-endian word reads).  ``seed`` may be an array; the byte
    content is a scalar constant (column tags), so the word stream is
    precomputed and only the seed-dependent mixing vectorizes."""
    seed = np.asarray(seed).astype(np.uint64)
    n = len(data)
    if n >= 32:
        v1 = seed + _P1 + _P2
        v2 = seed + _P2
        v3 = seed.copy() if isinstance(seed, np.ndarray) else seed
        v4 = seed - _P1
        off = 0
        while off + 32 <= n:
            w = np.frombuffer(data[off : off + 32], dtype="<u8")
            v1 = _rotl(v1 + _U64(w[0]) * _P2, 31) * _P1
            v2 = _rotl(v2 + _U64(w[1]) * _P2, 31) * _P1
            v3 = _rotl(v3 + _U64(w[2]) * _P2, 31) * _P1
            v4 = _rotl(v4 + _U64(w[3]) * _P2, 31) * _P1
            off += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = h ^ (_rotl(v * _P2, 31) * _P1)
            h = h * _P1 + _P4
    else:
        h = seed + _P5
        off = 0
    h = h + _U64(n)
    while off + 8 <= n:
        k1 = _U64(np.frombuffer(data[off : off + 8], dtype="<u8")[0])
        h = h ^ (_rotl(k1 * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        off += 8
    if off + 4 <= n:
        k1 = _U64(np.frombuffer(data[off : off + 4], dtype="<u4")[0])
        h = h ^ (k1 * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        off += 4
    while off < n:
        h = h ^ (_U64(data[off]) * _P5)
        h = _rotl(h, 11) * _P1
        off += 1
    return _fmix(h)


def xxhash64(*children, seed=SEED) -> np.ndarray:
    """Replica of ``F.xxhash64(*children)``: chain the per-type hash steps,
    each child's hash seeding the next.

    Children are ``("str", b"...")``, ``("long", array_like)`` or
    ``("int", array_like)`` — matching the Spark child types exactly is the
    caller's job (a long column hashed as int diverges).  Returns **signed**
    int64, like the Spark expression.
    """
    h = np.asarray(seed).astype(np.uint64)
    for kind, value in children:
        if kind == "str":
            h = hash_bytes(value if isinstance(value, bytes) else value.encode(), h)
        elif kind == "long":
            h = hash_long(value, h)
        elif kind == "int":
            h = hash_int(value, h)
        else:
            raise ValueError(f"unsupported child kind {kind!r}")
    return h.astype(np.int64)


def pmod(h: np.ndarray, n: int) -> np.ndarray:
    """Spark ``pmod(h, n)`` for signed int64 ``h`` and positive ``n`` —
    numpy's floored mod already yields the non-negative representative."""
    return np.mod(h, np.int64(n))
