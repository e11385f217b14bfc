"""Deterministic Bloom filter — the 10^12-scale membership set for the
scorer (PLANS.md: the exact frozenset is bounded by corpus vocabulary;
beyond ~10^8 words the broadcast becomes a Bloom filter with a documented
false-positive rate and NO false negatives).

Hashes are md5-derived (salted per hash index), so the filter is
bit-identical across processes, platforms, and engines — a Spark job and
the single-node oracle build the same bits.
"""
from __future__ import annotations

import hashlib
import math


class BloomFilter:
    def __init__(self, m_bits: int, k: int, bits: bytearray | None = None):
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else bytearray((m_bits + 7) // 8)

    @staticmethod
    def positions(word: str, m_bits: int, k: int) -> list[int]:
        out = []
        for i in range(k):
            h = hashlib.md5(f"{word}#{i}".encode()).digest()
            out.append(int.from_bytes(h[:8], "big") % m_bits)
        return out

    def add(self, word: str) -> None:
        for p in self.positions(word, self.m, self.k):
            self.bits[p >> 3] |= 1 << (p & 7)

    def set_positions(self, positions) -> None:
        for p in positions:
            self.bits[p >> 3] |= 1 << (p & 7)

    def __contains__(self, word: str) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self.positions(word, self.m, self.k))

    @classmethod
    def from_words(cls, words, n_expected: int | None = None, fpp: float = 0.001, k: int | None = None):
        words = list(words)
        n = n_expected or max(1, len(words))
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = k or max(1, round(m / n * math.log(2)))
        bf = cls(m, k)
        for w in words:
            bf.add(w)
        return bf
