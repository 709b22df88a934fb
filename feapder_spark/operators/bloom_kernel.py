"""Vectorized k-slice Bloom filter kernel (numpy bitset).

Reproduces the *contract and capacity math* of the reference's BloomFilter
(/root/reference/feapder/dedup/bloomfilter.py:88-94): k = ⌈log2(1/P)⌉ slices,
m = ⌈n·|ln P| / (k·ln²2)⌉ bits per slice, "full" when popcount > 50% of bits
(bloomfilter.py:142-162).  The hashing scheme is our own: one md5 per key
split into two 64-bit halves h1/h2, slice-i position = (h1 + i·h2) mod m
(Kirsch–Mitzenmacher double hashing, public technique) — vectorized with
numpy so a 10k-key batch is a handful of array ops, not 10k×k hash calls
like the reference's sha-salt chain (bloomfilter.py:22-62).

The same kernel backs both the in-process MemoryFilter replacement and the
per-bucket blobs of the distributed Spark seen-set (each bucket's bit array
serializes to one ``bytes`` blob stored in a binary column).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomKernel:
    def __init__(self, capacity: int, error_rate: float = 1e-5, bits: np.ndarray | None = None):
        if not (0 < error_rate < 1):
            raise ValueError("error_rate must be in (0,1)")
        if capacity <= 0:
            raise ValueError("capacity must be > 0")
        self.capacity = capacity
        self.error_rate = error_rate
        # capacity math identical to reference bloomfilter.py:88-94
        self.num_slices = int(math.ceil(math.log(1.0 / error_rate, 2)))
        self.bits_per_slice = int(
            math.ceil((capacity * abs(math.log(error_rate))) / (self.num_slices * (math.log(2) ** 2)))
        )
        self.num_bits = self.num_slices * self.bits_per_slice
        nbytes = (self.num_bits + 7) // 8
        if bits is None:
            self.bits = np.zeros(nbytes, dtype=np.uint8)
        else:
            assert len(bits) == nbytes, f"blob size {len(bits)} != expected {nbytes}"
            self.bits = np.frombuffer(bytes(bits), dtype=np.uint8).copy()

    # -- hashing -------------------------------------------------------------
    def positions(self, keys: list[str]) -> np.ndarray:
        """(len(keys), num_slices) absolute bit positions."""
        n = len(keys)
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        for i, key in enumerate(keys):
            d = hashlib.md5(key.encode("utf-8") if isinstance(key, str) else str(key).encode()).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little")
        slices = np.arange(self.num_slices, dtype=np.uint64)
        m = np.uint64(self.bits_per_slice)
        # (n, k): (h1 + i*h2) % m + i*m  — uint64 wrap-around is part of the scheme
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + slices[None, :] * h2[:, None]) % m + slices[None, :] * m
        return pos

    # -- bit ops ---------------------------------------------------------------
    def _get_bits(self, pos: np.ndarray) -> np.ndarray:
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit_idx = (pos & np.uint64(7)).astype(np.uint8)
        return (self.bits[byte_idx] >> bit_idx) & 1

    def contains(self, keys: list[str]) -> np.ndarray:
        """bool array: all k slice-bits set."""
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = self.positions(keys)
        return self._get_bits(pos).all(axis=1)

    def add(self, keys: list[str]) -> np.ndarray:
        """Set bits; True where key was newly added (some bit was 0 before).

        Computes positions/byte-indices once and shares them between the
        exists-check and the bit-set (hashing is the dominant cost)."""
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = self.positions(keys)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit_mask = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        existed = ((self.bits[byte_idx] & bit_mask) != 0).all(axis=1)
        # ufunc .at handles repeated byte indices correctly
        np.bitwise_or.at(self.bits, byte_idx.ravel(), bit_mask.ravel())
        return ~existed

    # -- capacity ----------------------------------------------------------------
    def fill_ratio(self) -> float:
        ones = int(np.unpackbits(self.bits).sum())
        return ones / self.num_bits

    def is_at_capacity(self) -> bool:
        """Reference contract: full when >50% of bits set (bloomfilter.py:142-162)."""
        return self.fill_ratio() > 0.5

    # -- (de)serialization for the Spark blob column ------------------------------
    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, capacity: int, error_rate: float = 1e-5) -> "BloomKernel":
        return cls(capacity, error_rate, bits=np.frombuffer(blob, dtype=np.uint8))
