"""Dedup engines — the URL-seen set (SURVEY.md §1.5, §2.2 F1/F2/F7).

Contract (reference /root/reference/feapder/dedup/basefilter.py:14-41 and the
golden vectors in tests/test_dedup.py:23-104):

- ``add(keys)`` → 1 where the key was *newly added*, else 0
- ``get(keys)`` → 1 where the key *exists*, else 0
- **in-batch duplicates count as existing after their first occurrence** in
  both get and add (litefilter.py:57-68; bloomfilter.py:296-335)
- scalar in → scalar out; list in → list out
- ``Dedup(to_md5=True)`` pre-hashes each datum with md5(str(datum))
  (dedup/__init__.py:96-105)
- ``filter_exist_data`` mutates the list in place keeping only unseen
  (dedup/__init__.py:133-183)

Local engines (LiteFilter, ScalableMemoryBloom) serve driver-side/UDF-side
use and the conformance vectors.  Distributed seen-set logic lives in
:mod:`feapder_spark.operators.seen_set` as pure DataFrame→DataFrame ops.
"""

from __future__ import annotations

from typing import Any

from feapder_spark.operators.bloom_kernel import BloomKernel
from feapder_spark.urlnorm import get_md5


class LiteFilter:
    """Plain-set filter (reference dedup/litefilter.py:15-70 contract)."""

    def __init__(self):
        self.datas: set[str] = set()

    def add(self, keys, skip_check: bool = False):
        is_list = isinstance(keys, list)
        out = []
        for key in keys if is_list else [keys]:
            if key in self.datas:
                out.append(0)
            else:
                self.datas.add(key)
                out.append(1)
        return out if is_list else out[0]

    def get(self, keys):
        is_list = isinstance(keys, list)
        seen_in_batch: set[str] = set()
        out = []
        for key in keys if is_list else [keys]:
            if key in self.datas or key in seen_in_batch:
                out.append(1)
            else:
                out.append(0)
                seen_in_batch.add(key)
        return out if is_list else out[0]


class ScalableMemoryBloom:
    """Chained Bloom filters with 50%-fill rotation.

    Same growth contract as the reference ScalableBloomFilter
    (bloomfilter.py:194-379): ``get`` consults every generation newest→oldest,
    ``add`` inserts only into the newest, a new generation is appended when
    the newest passes 50% fill.  In-batch duplicate semantics match the
    golden vectors.  Kernel is numpy-vectorized (bloom_kernel.py).
    """

    def __init__(self, initial_capacity: int = 100_000_000, error_rate: float = 1e-5):
        self.initial_capacity = initial_capacity
        self.error_rate = error_rate
        self.filters: list[BloomKernel] = [BloomKernel(initial_capacity, error_rate)]

    def _rotate_if_full(self):
        if self.filters[-1].is_at_capacity():
            self.filters.append(BloomKernel(self.initial_capacity, self.error_rate))

    def _exists_any(self, keys: list[str]):
        import numpy as np

        exists = np.zeros(len(keys), dtype=bool)
        for f in reversed(self.filters):
            pending_idx = [i for i in range(len(keys)) if not exists[i]]
            if not pending_idx:
                break
            hit = f.contains([keys[i] for i in pending_idx])
            for i, h in zip(pending_idx, hit):
                exists[i] = h
        return exists

    def get(self, keys):
        is_list = isinstance(keys, list)
        key_list = keys if is_list else [keys]
        uniq = list(dict.fromkeys(key_list))
        exists = dict(zip(uniq, self._exists_any(uniq)))
        seen_in_batch: set[str] = set()
        out = []
        for k in key_list:
            if exists[k] or k in seen_in_batch:
                out.append(1)
            else:
                out.append(0)
                seen_in_batch.add(k)
        return out if is_list else out[0]

    def add(self, keys, skip_check: bool = False):
        self._rotate_if_full()
        is_list = isinstance(keys, list)
        key_list = keys if is_list else [keys]
        if skip_check:
            added = self.filters[-1].add(key_list)
            out = [int(a) for a in added]
            return out if is_list else out[0]
        uniq = list(dict.fromkeys(key_list))
        all_unique = len(uniq) == len(key_list)
        if len(self.filters) == 1:
            # fast path: single generation — fused check+set (one hash pass)
            added = self.filters[0].add(uniq)
            if all_unique:  # no in-batch dups → vectorized straight through
                out = added.astype(int).tolist()
                return out if is_list else out[0]
            exists = dict(zip(uniq, (~added).tolist()))
        else:
            exists_arr = self._exists_any(uniq)
            new_keys = [k for k, e in zip(uniq, exists_arr) if not e]
            if new_keys:
                self.filters[-1].add(new_keys)
            if all_unique:
                out = (~exists_arr).astype(int).tolist()
                return out if is_list else out[0]
            exists = dict(zip(uniq, exists_arr.tolist()))
        claimed: set[str] = set()
        out = []
        for k in key_list:
            if exists[k] or k in claimed:
                out.append(0)
            else:
                out.append(1)
                claimed.add(k)
        return out if is_list else out[0]

    @property
    def capacity(self) -> int:
        return sum(f.capacity for f in self.filters)


class Dedup:
    """Facade matching the reference API (dedup/__init__.py:20-131).

    Engines: ``Dedup.LiteFilter`` (plain set), ``Dedup.MemoryFilter``
    (scalable numpy Bloom).  The reference's Redis-backed BloomFilter and
    ExpireFilter are replaced at scale by the distributed Spark seen-set
    (operators/seen_set.py) — there is deliberately no Redis here.
    """

    BloomFilter = 1  # accepted as alias of MemoryFilter (no Redis in this engine)
    MemoryFilter = 2
    ExpireFilter = 3  # alias of LiteFilter at local scope (TTL pruning is a table op at scale)
    LiteFilter = 4

    def __init__(self, filter_type: int = MemoryFilter, to_md5: bool = True, **kwargs):
        if filter_type in (Dedup.LiteFilter, Dedup.ExpireFilter):
            self.dedup: Any = LiteFilter()
        else:
            self.dedup = ScalableMemoryBloom(
                initial_capacity=kwargs.get("initial_capacity", 100_000_000),
                error_rate=kwargs.get("error_rate", 1e-5),
            )
        self._to_md5 = to_md5

    def _deal_datas(self, datas):
        if self._to_md5:
            return [get_md5(d) for d in datas] if isinstance(datas, list) else get_md5(datas)
        return list(datas) if isinstance(datas, list) else datas

    def add(self, datas, skip_check: bool = False):
        return self.dedup.add(self._deal_datas(datas), skip_check)

    def get(self, datas):
        return self.dedup.get(self._deal_datas(datas))

    def filter_exist_data(self, datas: list, *, datas_fingerprints: list | None = None, callback=None):
        """In-place filter keeping only unseen (dedup/__init__.py:133-183)."""
        is_exists = self.get(datas_fingerprints or datas)
        kept, kept_fps = [], []
        for i, is_exist in enumerate(is_exists):
            if not is_exist:
                kept.append(datas[i])
                if datas_fingerprints:
                    kept_fps.append(datas_fingerprints[i])
            elif callback:
                callback(datas[i])
        datas[:] = kept
        if datas_fingerprints is not None:
            datas_fingerprints[:] = kept_fps
            return datas, datas_fingerprints
        return datas
