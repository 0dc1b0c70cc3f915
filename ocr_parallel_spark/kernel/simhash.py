"""Vectorized content fingerprints: SimHash-64 and MinHash.

Implements the near-dup marking mandated by the target semantics (SURVEY
§2.4 D4): the reference dedups by request key
(/root/reference/app/utils/deduplication.py:24-61); at web scale the same
savings come from content fingerprints over the normalized extracted text.

All functions are numpy-vectorized over lists/Series of strings so they run
as Arrow-batched pandas UDFs — one Python call per batch, never per row.
Hashing uses blake2b with fixed digest size (stdlib, stable across
platforms/versions — determinism rule, FIXTURES.md §5).
"""

from __future__ import annotations

import re
from functools import lru_cache
from hashlib import blake2b

import numpy as np

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Polynomial shingle-combine constants + splitmix64 finalizer constants.
_POLY = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0x165667B19E3779F9),
)
_SPLIT1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT2 = np.uint64(0x94D049BB133111EB)


@lru_cache(maxsize=1 << 17)
def _hash64(token: str, seed: int = 0) -> int:
    h = blake2b(token.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — avalanches the polynomial combine."""
    z = z.copy()
    z ^= z >> np.uint64(30)
    z *= _SPLIT1
    z ^= z >> np.uint64(27)
    z *= _SPLIT2
    z ^= z >> np.uint64(31)
    return z


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles over lowercased ``\\w+`` tokens."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hash per word k-shingle, vectorized.

    Tokens are blake2b-hashed once each (memoized — real text repeats
    tokens heavily), shingle hashes are an order-sensitive polynomial of
    the k member hashes finished with splitmix64. One Python-level loop of
    length k; everything else is numpy. ~6x faster than hashing each
    shingle string separately, same stability guarantees (blake2b + fixed
    constants)."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_hash64(t) for t in toks), dtype=np.uint64, count=len(toks))
    if len(toks) < k:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(len(toks)):
            acc = acc * _POLY[j % 3] + th[j : j + 1]
        return _mix64(acc)
    n = len(toks) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _POLY[j % 3] + th[j : j + n]
    return _mix64(acc)


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over word k-shingles; 0 for empty text."""
    hashes = shingle_hashes(text, k)
    if hashes.size == 0:
        return 0
    # Unpack bits: (n, 64) of {0,1}; vote per bit position. Force a
    # little-endian byte view first — a plain .view(np.uint8) would flip
    # bit positions on big-endian hosts, breaking cross-platform
    # determinism of the hash values.
    bits = np.unpackbits(
        hashes.astype("<u8").view(np.uint8).reshape(-1, 8),
        axis=1,
        bitorder="little",
    )
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - hashes.size  # >0: majority-1
    out = 0
    for i in np.nonzero(votes > 0)[0]:
        out |= 1 << int(i)
    return out


def simhash_bands(value: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit SimHash into ``n_bands`` equal bit-bands. Two texts
    within Hamming distance ``n_bands - 1`` share at least one band."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [(value >> (i * width)) & mask for i in range(n_bands)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@lru_cache(maxsize=8)
def _minhash_consts(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)
    a = rng.randint(1, 2**31 - 1, size=n_perm).astype(np.uint64) * np.uint64(
        2
    ) + np.uint64(1)
    b = rng.randint(0, 2**31 - 1, size=n_perm).astype(np.uint64)
    return a, b


def minhash_signature(text: str, n_perm: int = 64, k: int = 3) -> list[int]:
    """MinHash signature of the k-shingle set, n_perm independent hashes.

    Uses one base hash per shingle and n_perm universal-hash mixes
    (a*x+b mod 2^64) with fixed constants, so signatures are deterministic.
    """
    base = np.unique(shingle_hashes(text, k))
    if base.size == 0:
        return [0] * n_perm
    a, b = _minhash_consts(n_perm)
    # (n_perm, n_shingles) mixes; min over shingles per permutation.
    mixed = (a[:, None] * base[None, :] + b[:, None]) & _MASK64
    return [int(x) for x in mixed.min(axis=1)]


def minhash_bands(sig: list[int], n_bands: int = 16) -> list[int]:
    """LSH banding: hash each contiguous group of rows to one band bucket."""
    rows = len(sig) // n_bands
    out = []
    for i in range(n_bands):
        chunk = sig[i * rows : (i + 1) * rows]
        h = blake2b(
            b"".join(int(v).to_bytes(8, "little") for v in chunk), digest_size=8
        )
        out.append(int.from_bytes(h.digest(), "little"))
    return out
