"""Stable hash primitives shared by the dedup/similarity operators and
their pure-Python test oracles. Everything is deterministic (fixed seeds,
no wall clock) and numpy-vectorized where it runs on the executor path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MASK64 = (1 << 64) - 1


def token_hash64(token: str) -> int:
    """Stable unsigned 64-bit hash of a token (first 8 bytes of sha256)."""
    return struct.unpack(">Q", hashlib.sha256(token.encode("utf-8")).digest()[:8])[0]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraparound intended)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def minhash_signature(shingle_hashes: np.ndarray, k: int = 64) -> np.ndarray:
    """k-permutation MinHash signature of a set of uint64 shingle hashes.

    Permutation i is splitmix64(x ^ seed_i); the signature entry is the
    minimum over the set. Empty input -> all MAX_UINT64.
    """
    if len(shingle_hashes) == 0:
        return np.full(k, _MASK64, dtype=np.uint64)
    h = np.asarray(shingle_hashes, dtype=np.uint64)
    seeds = splitmix64(np.arange(1, k + 1, dtype=np.uint64))
    # (k, n) matrix of permuted hashes; min along n
    return splitmix64(h[None, :] ^ seeds[:, None]).min(axis=1)


def band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH banding: split the signature into ``bands`` equal bands and hash
    each band to a 63-bit bucket key (signed-long friendly)."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        band = sig[b * rows : (b + 1) * rows]
        acc = np.uint64(1469598103934665603)  # FNV offset basis
        with np.errstate(over="ignore"):
            for v in band:
                acc = (acc ^ np.uint64(v)) * np.uint64(1099511628211)
            acc = splitmix64(np.array([acc ^ np.uint64(b)], dtype=np.uint64))[0]
        keys.append(int(acc & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return keys


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash: weighted bit votes over token hashes."""
    if len(token_hashes) == 0:
        return 0
    h = np.asarray(token_hashes, dtype=np.uint64)
    if weights is None:
        weights = np.ones(len(h))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = ((bits * 2 - 1) * weights[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))  # signed-long friendly


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Distinct word n-gram shingles, document order of first occurrence
    irrelevant (sets)."""
    w = text.split(" ")
    if len(w) < n:
        return [" ".join(w)] if w and w != [""] else []
    return sorted({" ".join(w[i : i + n]) for i in range(len(w) - n + 1)})
