"""Sharded on-disk dataset records (LMDB/pyarrow replacement).

The reference stores preprocessed windows in LMDB via the long-removed
``pyarrow.serialize`` (scripts/data_loader/lmdb_data_loader.py:96-101) — a
format modern toolchains cannot read.  We use a self-describing directory of
memory-mapped ``.npy`` shards instead: zero-copy reads, trivially
host-shardable for multi-process data parallelism, no extra deps.

Layout:
    root/meta.json                     {"fields": {...}, "shards": [...]}
    root/shard_00000/<field>.npy       one array per field, N rows each
    root/shard_00000/<field>.json      per-row python objects (e.g. text)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["ShardWriter", "ShardedDataset"]


class ShardWriter:
    """Accumulate rows and flush fixed-size shards."""

    def __init__(self, root: str, shard_size: int = 4096):
        self.root = root
        self.shard_size = shard_size
        self._buf: Dict[str, List[Any]] = {}
        self._json_fields: set = set()
        self._shards: List[Dict[str, Any]] = []
        os.makedirs(root, exist_ok=True)

    def add(self, **fields) -> None:
        for k, v in fields.items():
            self._buf.setdefault(k, []).append(v)
            if isinstance(v, str) or isinstance(v, dict) or isinstance(v, list):
                self._json_fields.add(k)
        n = len(next(iter(self._buf.values())))
        if n >= self.shard_size:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        idx = len(self._shards)
        d = os.path.join(self.root, f"shard_{idx:05d}")
        os.makedirs(d, exist_ok=True)
        count = len(next(iter(self._buf.values())))
        for k, vals in self._buf.items():
            if k in self._json_fields:
                with open(os.path.join(d, f"{k}.json"), "w") as f:
                    json.dump(vals, f)
            else:
                np.save(os.path.join(d, f"{k}.npy"), np.stack(vals))
        self._shards.append({"name": f"shard_{idx:05d}", "count": count})
        self._buf = {}

    def finish(self, extra_meta: Optional[Dict[str, Any]] = None) -> None:
        self._flush()
        meta = {
            "shards": self._shards,
            "json_fields": sorted(self._json_fields),
        }
        if extra_meta:
            meta.update(extra_meta)
        with open(os.path.join(self.root, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


class ShardedDataset:
    """Random-access view over a record directory (mmap per shard)."""

    def __init__(self, root: str, fields: Optional[Sequence[str]] = None):
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.shard_names = [s["name"] for s in self.meta["shards"]]
        self.counts = np.array([s["count"] for s in self.meta["shards"]])
        self.offsets = np.concatenate([[0], np.cumsum(self.counts)])
        self.json_fields = set(self.meta.get("json_fields", []))
        self._cache: Dict[str, Dict[str, Any]] = {}
        if fields is None:
            d = os.path.join(root, self.shard_names[0])
            fields = sorted(
                f.rsplit(".", 1)[0]
                for f in os.listdir(d)
                if f.endswith((".npy", ".json"))
            )
        self.fields = list(fields)

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def _shard(self, si: int) -> Dict[str, Any]:
        name = self.shard_names[si]
        if name not in self._cache:
            d = os.path.join(self.root, name)
            data = {}
            for f in self.fields:
                npy = os.path.join(d, f"{f}.npy")
                if os.path.exists(npy):
                    data[f] = np.load(npy, mmap_mode="r")
                else:
                    with open(os.path.join(d, f"{f}.json")) as fh:
                        data[f] = json.load(fh)
            self._cache[name] = data
        return self._cache[name]

    def __getitem__(self, i: int) -> Dict[str, Any]:
        si = int(np.searchsorted(self.offsets, i, side="right") - 1)
        li = i - int(self.offsets[si])
        shard = self._shard(si)
        return {f: shard[f][li] for f in self.fields}

    def batch(self, indices: Sequence[int]) -> Dict[str, Any]:
        """Assemble a batch. Array fields go through the native gather
        (C++ memcpy loop, data/native.py) per shard; JSON fields stay
        Python lists."""
        from .native import gather_rows

        idx = np.asarray(indices, np.int64)
        si = np.searchsorted(self.offsets, idx, side="right") - 1
        local = idx - self.offsets[si]
        out: Dict[str, Any] = {}
        order = np.argsort(si, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))

        for f in self.fields:
            if f in self.json_fields:
                out[f] = [self._shard(int(s))[f][int(l)]
                          for s, l in zip(si, local)]
                continue
            chunks = []
            pos = 0
            while pos < len(order):
                s = si[order[pos]]
                end = pos
                while end < len(order) and si[order[end]] == s:
                    end += 1
                rows = local[order[pos:end]]
                arr = self._shard(int(s))[f]
                chunks.append(gather_rows(arr, rows))
                pos = end
            stacked = np.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
            out[f] = stacked[inv]
        return out

    def iter_shards(self) -> Iterator[Dict[str, Any]]:
        for si in range(len(self.shard_names)):
            yield self._shard(si)
