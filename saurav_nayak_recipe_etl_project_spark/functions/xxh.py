"""Pure-Python replica of Spark's `xxhash64` for INT inputs.

Spark's XxHash64 expression (seed 42) hashes each child in sequence,
using the running hash as the seed for the next child; a 4-byte INT
child goes through XXH64's hashInt specialization. Replicating it on
the driver lets DATA-INDEPENDENT hash derivations (the LSH hyperplane
sign matrix in operators/similarity.py) be evaluated ONCE at plan-build
time and embedded as literals, instead of re-hashing the same
(plane, dim) pair once per row per plane per table in the interpreted
HOF evaluator — the values are bit-identical by construction and
pinned by tests/test_round14_opt.py against F.xxhash64.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt: the 4-byte specialization Spark uses for INT
    children (value taken as its unsigned 32-bit pattern)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def spark_xxhash64_ints(*values: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed 64-bit result of Spark's xxhash64(int, int, ...)."""
    h = seed
    for v in values:
        h = _hash_int(v, h)
    return h - (1 << 64) if h >= (1 << 63) else h
