"""Deterministic, serializable membership filters for the URL-seen set.

Per the north-star design: each seen-set shard holds a **counting Bloom
filter** (cheap negative test, supports deletion) in front of a **cuckoo
filter** (compact fingerprints, the authoritative probabilistic set).
Sizes and hash seeds are FIXED at construction and recorded in the
snapshot, so replaying the same insertion sequence reproduces the filter
state bit-for-bit — that is what makes crawl order reproducible across
parallelism levels and across kill/resume (checkpoints serialize these
arrays verbatim).

All hashes derive from blake2b with explicit seeds — no PYTHONHASHSEED
dependence, no per-process salt.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def _h64(value: int, seed: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(struct.pack("<QQ", value & 0xFFFFFFFFFFFFFFFF, seed),
                        digest_size=8).digest(), "little")


class CountingBloom:
    """Counting Bloom filter over uint64 keys (uint8 counters, saturating)."""

    def __init__(self, m_bits: int = 1 << 20, k: int = 4, seed: int = 0x5EED):
        self.m = int(m_bits)
        self.k = int(k)
        self.seed = int(seed)
        self.counts = np.zeros(self.m, dtype=np.uint8)
        self.n_added = 0

    def _slots(self, key: int) -> Tuple[int, ...]:
        # double hashing: h1 + i*h2 (standard Kirsch–Mitzenmacher)
        h1 = _h64(key, self.seed)
        h2 = _h64(key, self.seed ^ 0xA5A5A5A5) | 1
        return tuple((h1 + i * h2) % self.m for i in range(self.k))

    def add(self, key: int) -> None:
        for s in self._slots(key):
            if self.counts[s] < 255:
                self.counts[s] += 1
        self.n_added += 1

    def remove(self, key: int) -> None:
        for s in self._slots(key):
            if 0 < self.counts[s] < 255:  # saturated counters stay put
                self.counts[s] -= 1
        self.n_added -= 1

    def might_contain(self, key: int) -> bool:
        return all(self.counts[s] > 0 for s in self._slots(key))

    # -- snapshot ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<QQQQ", self.m, self.k, self.seed, self.n_added)
        return head + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloom":
        m, k, seed, n = struct.unpack_from("<QQQQ", blob)
        f = cls(m, k, seed)
        f.counts = np.frombuffer(blob[32:32 + m], dtype=np.uint8).copy()
        f.n_added = n
        return f


class CuckooFilter:
    """Cuckoo filter: 4-slot buckets of uint16 fingerprints.

    Deterministic: eviction choice cycles through slots by insertion
    counter, so the same insertion sequence always produces the same
    table. Fingerprint 0 is reserved for 'empty'.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, seed: int = 0xC0C0):
        self.n_buckets = int(n_buckets)
        self.seed = int(seed)
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_added = 0
        self.n_failed = 0

    def _fp_and_index(self, key: int) -> Tuple[int, int]:
        h = _h64(key, self.seed)
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        return fp, (h & 0xFFFFFFFFFF) % self.n_buckets

    def _alt_index(self, index: int, fp: int) -> int:
        return (index ^ _h64(fp, self.seed ^ 0x0FF5E7)) % self.n_buckets

    def _bucket_insert(self, index: int, fp: int) -> bool:
        row = self.table[index]
        for s in range(self.SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.n_added += 1
            return True
        # deterministic eviction: start bucket + victim slot from counter
        index = i1 if (self.n_added % 2 == 0) else i2
        cur = fp
        for kick in range(self.MAX_KICKS):
            slot = (self.n_added + kick) % self.SLOTS
            cur, self.table[index][slot] = int(self.table[index][slot]), cur
            index = self._alt_index(index, cur)
            if self._bucket_insert(index, cur):
                self.n_added += 1
                return True
        self.n_failed += 1  # table full: caller should have sized larger
        return False

    def contains(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def remove(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        for idx in (i1, self._alt_index(i1, fp)):
            row = self.table[idx]
            hits = np.nonzero(row == fp)[0]
            if len(hits):
                row[hits[0]] = 0
                self.n_added -= 1
                return True
        return False

    # -- snapshot ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<QQQQ", self.n_buckets, self.seed,
                           self.n_added, self.n_failed)
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n_buckets, seed, n_added, n_failed = struct.unpack_from("<QQQQ", blob)
        f = cls(n_buckets, seed)
        f.table = np.frombuffer(
            blob[32:32 + n_buckets * cls.SLOTS * 2], dtype=np.uint16
        ).reshape(n_buckets, cls.SLOTS).copy()
        f.n_added = n_added
        f.n_failed = n_failed
        return f


@dataclass
class SeenSet:
    """One seen-set shard: counting bloom prefilter + cuckoo filter.

    ``add_if_new`` is the frontier's only operation: True -> first sight
    (schedule it), False -> already seen (drop). Deterministic given the
    insertion sequence; snapshot round-trips exactly.
    """

    bloom: CountingBloom
    cuckoo: CuckooFilter

    @classmethod
    def create(cls, expected_items: int = 1 << 16, seed: int = 7) -> "SeenSet":
        m_bits = max(1 << 14, expected_items * 10)
        n_buckets = max(1 << 10, expected_items // 2)
        # round buckets up to a power of two for stable modulo behavior
        n_buckets = 1 << (int(n_buckets) - 1).bit_length()
        return cls(bloom=CountingBloom(m_bits=m_bits, seed=seed),
                   cuckoo=CuckooFilter(n_buckets=n_buckets, seed=seed ^ 0xBEEF))

    def add_if_new(self, key: int) -> bool:
        if self.bloom.might_contain(key) and self.cuckoo.contains(key):
            return False
        self.bloom.add(key)
        self.cuckoo.add(key)
        return True

    def __contains__(self, key: int) -> bool:
        return self.bloom.might_contain(key) and self.cuckoo.contains(key)

    def to_bytes(self) -> bytes:
        b = self.bloom.to_bytes()
        c = self.cuckoo.to_bytes()
        return struct.pack("<QQ", len(b), len(c)) + b + c

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SeenSet":
        lb, lc = struct.unpack_from("<QQ", blob)
        return cls(bloom=CountingBloom.from_bytes(blob[16:16 + lb]),
                   cuckoo=CuckooFilter.from_bytes(blob[16 + lb:16 + lb + lc]))
