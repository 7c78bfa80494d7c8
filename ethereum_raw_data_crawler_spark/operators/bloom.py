"""Partitioned Bloom prefilter for the URL-seen set.

The reference dedups with a MongoDB unique index plus a
find-before-insert (reference: mongodb.go:86-92,111-115;
crawler_service.go:433-457 — a read-modify-write race tolerated via
duplicate-key-is-success). Set-based recast: new candidates are
anti-joined against the ``seen`` table BEFORE fetch. At 10^10 URLs that
anti-join shuffles every candidate against a 10^10-row build side each
round; the Bloom bitmap kills the common case (candidate definitely
unseen) map-side with zero shuffle — only maybe-seen candidates reach
the exact anti-join backstop, so the filter is correctness-neutral
(no false negatives by construction; FPR only costs extra join work).

Vectorized numpy throughout (Arrow batches in mapInPandas — no per-row
Python). The bitmap is maintained incrementally per round (OR-in the
new hashes) and persisted beside the snapshot manifest so resume doesn't
rescan ``seen``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd


def _mix(h: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 — k independent hash functions via
    salting. All arithmetic is intentionally mod 2^64 (vectorized, wraparound
    is the algorithm, so overflow warnings are suppressed)."""
    offset = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        z = (h + offset).astype(np.uint64)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


class BloomFilter:
    """Plain bit-array Bloom filter over int64 keys (numpy-vectorized).

    Sized to the expected seen-set cardinality (``sized_for``), with the
    engine growing/rebuilding it when ``should_grow`` trips — a fixed
    bitmap saturates (FPR -> 1) past its design point and the prefilter
    silently stops helping while still costing a broadcast."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 5) -> None:
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def sized_for(cls, expected_keys: int, fpr: float = 0.01) -> "BloomFilter":
        """Optimal-size constructor: n_bits = -n*ln(p)/ln(2)^2, k = m/n*ln2."""
        import math

        n = max(int(expected_keys), 1024)
        m = int(-n * math.log(fpr) / (math.log(2) ** 2))
        m = ((m + 63) // 64) * 64
        k = max(1, round(m / n * math.log(2)))
        return cls(n_bits=m, k=k)

    @property
    def capacity(self) -> int:
        """Keys at which the set-bit fraction reaches ~0.5 (the classic
        design point: FPR ≈ 0.5^k there)."""
        import math

        return int(self.n_bits * math.log(2) / self.k)

    def saturation(self) -> float:
        """Fraction of set bits — the live FPR estimate is saturation^k."""
        set_bits = int(_POPCOUNT8[self.words.view(np.uint8)].sum(dtype=np.int64))
        return set_bits / self.n_bits

    def should_grow(self) -> bool:
        return self.n_added > self.capacity

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.int64).view(np.uint64)
        return np.stack(
            [_mix(h, i + 1) % np.uint64(self.n_bits) for i in range(self.k)]
        )

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(
            self.words, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        )
        self.n_added += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: True = maybe present, False = definitely absent."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        hit = (
            self.words[pos >> np.uint64(6)] >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    # -- persistence beside the snapshot manifest ---------------------------
    def save(self, path: str) -> None:
        np.savez(
            path, words=self.words, n_bits=self.n_bits, k=self.k, n_added=self.n_added
        )

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        z = np.load(path)
        bf = cls(int(z["n_bits"]), int(z["k"]))
        bf.words = z["words"]
        bf.n_added = int(z["n_added"]) if "n_added" in z else 0
        return bf


def split_by_bloom(df, key_col: str, bloom: BloomFilter, spark, scratch=None):
    """Split candidates into (definitely_new, maybe_seen) using a broadcast
    bitmap — mapInPandas, zero shuffle. Only maybe_seen needs the exact
    anti-join backstop.

    The tagged intermediate is CACHED (owned by ``scratch``): both
    returned branches read it, and without the cache each branch would
    re-execute the full upstream candidate pipeline."""
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(bloom)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_maybe_seen", T.BooleanType(), False)]
    )

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mask = bc.value.contains_many(pdf[key_col].to_numpy(dtype=np.int64))
            yield pdf.assign(_maybe_seen=mask)

    tagged = df.mapInPandas(tag, schema).cache()
    if scratch is not None:
        scratch.append(tagged)
    return (
        tagged.where(~tagged["_maybe_seen"]).drop("_maybe_seen"),
        tagged.where(tagged["_maybe_seen"]).drop("_maybe_seen"),
    )
