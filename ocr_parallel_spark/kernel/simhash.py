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
from hashlib import blake2b

import numpy as np

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64(token: str, seed: int = 0) -> int:
    h = blake2b(token.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles over lowercased ``\\w+`` tokens."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over word k-shingles; 0 for empty text."""
    sh = shingles(text, k)
    if not sh:
        return 0
    hashes = np.fromiter((_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))
    # Unpack bits: (n, 64) of {0,1}; vote per bit position.
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - len(sh)  # >0 means majority-1
    out = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_bands(value: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit SimHash into ``n_bands`` equal bit-bands. Two texts
    within Hamming distance ``n_bands - 1`` share at least one band."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [(value >> (i * width)) & mask for i in range(n_bands)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def minhash_signature(text: str, n_perm: int = 64, k: int = 3) -> list[int]:
    """MinHash signature of the k-shingle set, n_perm independent hashes.

    Uses one base hash per shingle and n_perm universal-hash mixes
    (a*x+b mod p) with fixed constants, so signatures are deterministic.
    """
    sh = set(shingles(text, k))
    if not sh:
        return [0] * n_perm
    base = np.fromiter((_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))
    rng = np.random.RandomState(42)
    a = rng.randint(1, 2**31 - 1, size=n_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**31 - 1, size=n_perm).astype(np.uint64)
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
