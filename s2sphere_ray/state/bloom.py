"""Vectorized Bloom filter over int64/uint64 keys.

Broadcast state for semi-join pushdown: when the region key set is too
large to ship exactly (the shuffle join's ``keys_ref`` array is 8 B/key),
a Bloom filter bounds the broadcast at ~1.2 bytes/key for a 1 % false
positive rate. False positives only cost shuffle volume — the in-bucket
sort-merge matches on exact keys, so correctness is unaffected.

Membership tests are fully vectorized (double hashing: two multiplicative
mixes, k probes each one AND over the word array).
"""

from __future__ import annotations

import math

import numpy as np

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (splitmix64-style finalizer)."""
    z = x.astype(np.uint64) + _MIX1
    z = (z ^ (z >> np.uint64(30))) * _MIX2
    z = (z ^ (z >> np.uint64(27))) * _MIX3
    h1 = z ^ (z >> np.uint64(31))
    w = h1 * _MIX1 + _MIX2
    w = (w ^ (w >> np.uint64(29))) * _MIX3
    h2 = (w ^ (w >> np.uint64(32))) | np.uint64(1)  # odd step
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom filter; build once, broadcast via ``ray.put``.

    Driver-side build for key sets that are ALREADY gathered (the
    shuffle-join semi-join pushdown).  For corpus-scale reference sets
    that must never touch the driver, use the distributed build in
    ``functions.dedup.bloom_build`` (slice-bucketed bitmap assembly).
    """

    __slots__ = ("bits", "n_bits", "k")

    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits
        self.n_bits = n_bits
        self.k = k

    @classmethod
    def build(cls, values: np.ndarray, fp_rate: float = 0.01) -> "BloomFilter":
        n = max(1, len(values))
        n_bits = max(64, int(-n * math.log(fp_rate) / (math.log(2) ** 2)))
        n_bits = ((n_bits + 63) // 64) * 64
        k = max(1, round(n_bits / n * math.log(2)))
        bits = np.zeros(n_bits // 64, dtype=np.uint64)
        if len(values):
            h1, h2 = _mix(np.asarray(values))
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(
                    bits, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        return cls(bits, n_bits, k)

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership (no false negatives)."""
        if not len(values):
            return np.zeros(0, dtype=bool)
        h1, h2 = _mix(np.asarray(values))
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def nbytes(self) -> int:
        return self.bits.nbytes
