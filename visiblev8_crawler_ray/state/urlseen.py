"""Sharded URL-seen membership index (bloom front + exact set).

The reference implements URL-seen as a unique-key lookup on the Postgres
``submissions`` table before every enqueue (``endpoints/tasks.py:148-156``).
At a 10^10-URL frontier that is the hot shared-mutable state the Dataset
API can't express, so it becomes the one raw-actor component
(SURVEY.md T5): ``n_shards`` actors, each owning the keys whose 64-bit
hash routes to it.

Each shard keeps
- a bloom bitmap front (numpy, ``bloom_bits`` per shard) — O(1) negative
  checks with zero per-key Python cost on the miss path at scale, and
- an exact set of md5-hex keys — bloom false positives never drop a URL
  (SURVEY.md §7.3: "never drop a URL on bloom alone").

Determinism: ``contains`` (read) and ``add`` (write) are SEPARATE phases
invoked by the wave loop — all membership checks of wave k see exactly
the state committed through wave k-1, so actor-call interleaving cannot
change results.  Shards snapshot/restore their key sets to the store for
kill-and-resume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class SeenShard:
    def __init__(self, bloom_bits: int):
        self.bloom_bits = bloom_bits
        self.bloom = np.zeros(bloom_bits // 8 + 1, dtype=np.uint8)
        self.exact: set[str] = set()

    def _positions(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # two bloom probes derived from the 64-bit key hash
        h1 = hashes % np.uint64(self.bloom_bits)
        h2 = (hashes >> np.uint64(17)) % np.uint64(self.bloom_bits)
        return h1, h2

    def contains(self, keys: list[str], hashes: np.ndarray) -> np.ndarray:
        """Membership mask for a batch of md5-hex keys."""
        h1, h2 = self._positions(hashes)
        maybe = (
            (self.bloom[h1 >> np.uint64(3)] >> (h1 & np.uint64(7)) & 1).astype(bool)
            & (self.bloom[h2 >> np.uint64(3)] >> (h2 & np.uint64(7)) & 1).astype(bool)
        )
        out = np.zeros(len(keys), dtype=bool)
        for i in np.flatnonzero(maybe):
            out[i] = keys[i] in self.exact
        return out

    def add(self, keys: list[str], hashes: np.ndarray) -> int:
        h1, h2 = self._positions(hashes)
        np.bitwise_or.at(self.bloom, h1 >> np.uint64(3),
                         np.left_shift(np.uint8(1), (h1 & np.uint64(7)).astype(np.uint8)))
        np.bitwise_or.at(self.bloom, h2 >> np.uint64(3),
                         np.left_shift(np.uint8(1), (h2 & np.uint64(7)).astype(np.uint8)))
        self.exact.update(keys)
        return len(self.exact)

    def reset(self) -> bool:
        self.bloom[:] = 0
        self.exact.clear()
        return True

    def snapshot(self) -> list[str]:
        return sorted(self.exact)

    def restore(self, keys: list[str], hashes: np.ndarray) -> int:
        return self.add(keys, hashes)

    def size(self) -> int:
        return len(self.exact)


class SeenIndex:
    """Driver-side handle bundle over the shard actors."""

    def __init__(self, n_shards: int, bloom_bits: int):
        self.n_shards = n_shards
        self.shards = [
            SeenShard.remote(bloom_bits) for _ in range(n_shards)
        ]

    def _route(self, keys: list[str]) -> tuple[list[list[str]], list[np.ndarray], np.ndarray]:
        hashes = np.array([int(k[:16], 16) for k in keys], dtype=np.uint64)
        sid = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        per_keys = [[] for _ in range(self.n_shards)]
        per_idx = [[] for _ in range(self.n_shards)]
        for i, (k, s) in enumerate(zip(keys, sid)):
            per_keys[s].append(k)
            per_idx[s].append(i)
        per_h = [hashes[np.array(ix, dtype=np.int64)] if ix else np.array([], dtype=np.uint64)
                 for ix in per_idx]
        return per_keys, per_h, per_idx

    def contains(self, keys: list[str]) -> np.ndarray:
        if not keys:
            return np.zeros(0, dtype=bool)
        per_keys, per_h, per_idx = self._route(keys)
        futs = [
            self.shards[s].contains.remote(per_keys[s], per_h[s])
            for s in range(self.n_shards)
            if per_keys[s]
        ]
        live = [s for s in range(self.n_shards) if per_keys[s]]
        out = np.zeros(len(keys), dtype=bool)
        for s, mask in zip(live, ray.get(futs)):
            out[np.array(per_idx[s], dtype=np.int64)] = mask
        return out

    def add(self, keys: list[str]) -> None:
        if not keys:
            return
        per_keys, per_h, _ = self._route(keys)
        ray.get(
            [
                self.shards[s].add.remote(per_keys[s], per_h[s])
                for s in range(self.n_shards)
                if per_keys[s]
            ]
        )

    def snapshot(self) -> pa.Table:
        all_keys: list[str] = []
        for part in ray.get([s.snapshot.remote() for s in self.shards]):
            all_keys.extend(part)
        return pa.table({"url_key": pa.array(sorted(all_keys), type=pa.string())})

    def restore(self, keys: list[str]) -> None:
        self.add(keys)

    def reset(self) -> None:
        ray.get([s.reset.remote() for s in self.shards])

    def alive(self) -> bool:
        try:
            ray.get([s.size.remote() for s in self.shards], timeout=10)
            return True
        except Exception:
            return False

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


# One shard pool per (n_shards, bloom_bits) per driver session — crawls
# run sequentially, so reusing the actors (with a reset between runs)
# avoids per-run actor churn.  Not safe for concurrent crawls in one
# session.
_POOL: dict[tuple[int, int], SeenIndex] = {}


def get_seen_index(n_shards: int, bloom_bits: int) -> SeenIndex:
    key = (n_shards, bloom_bits)
    idx = _POOL.get(key)
    if idx is None or not idx.alive():
        idx = SeenIndex(n_shards, bloom_bits)
        _POOL[key] = idx
    else:
        idx.reset()
    return idx
