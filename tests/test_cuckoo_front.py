"""Cuckoo-filter seen-front: no false negatives ever (incl. under kick
overflow -> stash and stash pressure -> rebuild), sane false-positive
rate, and SeenShard parity between the bloom and cuckoo fronts."""

import hashlib
import sys

import numpy as np
import pytest
import ray

sys.path.insert(0, "/root/repo")
from visiblev8_crawler_ray.state.urlseen import (  # noqa: E402
    SeenShard, _CuckooFront, as_key_array, routing_hash)


def _hashes(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_cuckoo_no_false_negatives_low_load():
    f = _CuckooFront(1 << 14)
    h = _hashes(10_000, 1)
    f.add(h)
    assert f.maybe(h).all()
    assert len(f.stash) == 0  # ~15% load: kicks never overflow


def test_cuckoo_false_positive_rate():
    f = _CuckooFront(1 << 14)
    f.add(_hashes(10_000, 2))
    other = _hashes(20_000, 3)
    fp_rate = f.maybe(other).mean()
    assert fp_rate < 0.02, fp_rate


def test_cuckoo_overload_stash_keeps_contract():
    # 4096 slots, 6000 inserts: the kick loop must overflow into the
    # stash, and membership must STILL have no false negatives.
    f = _CuckooFront(64)  # -> 1024 buckets x 4 slots
    h = _hashes(6_000, 4)
    pressure = f.add(h)
    assert len(f.stash) > 0
    assert pressure  # >= STASH_REBUILD homeless at this overload
    assert f.maybe(h).all()


def test_cuckoo_incremental_waves_no_false_negatives():
    f = _CuckooFront(1 << 12)
    seen = []
    for wave in range(8):
        h = _hashes(1_500, 100 + wave)
        f.add(h)
        seen.append(h)
        assert f.maybe(np.concatenate(seen)).all()


def _keys(ids) -> np.ndarray:
    return as_key_array(
        [hashlib.md5(f"url{i}".encode()).hexdigest() for i in ids])


@pytest.mark.parametrize("front", ["bloom", "cuckoo"])
def test_seen_shard_front_parity(ray_session, front):
    shard = SeenShard.remote(1 << 16, front)
    k1 = _keys(range(0, 500))
    k2 = _keys(range(500, 1000))
    ray.get(shard.add.remote(k1, routing_hash(k1)))
    m1 = ray.get(shard.contains.remote(k1, routing_hash(k1)))
    m2 = ray.get(shard.contains.remote(k2, routing_hash(k2)))
    assert m1.all()
    assert not m2.any()  # exact tier kills every front false positive
    ray.kill(shard)


def test_seen_shard_cuckoo_rebuild_under_pressure(ray_session):
    # tiny front budget: 6k keys overload the 4096-slot table, the
    # shard must rebuild the front from its exact tier and stay exact
    shard = SeenShard.remote(1 << 10, "cuckoo")
    k = _keys(range(6_000))
    ray.get(shard.add.remote(k, routing_hash(k)))
    assert ray.get(shard.contains.remote(k, routing_hash(k))).all()
    other = _keys(range(6_000, 7_000))
    assert not ray.get(
        shard.contains.remote(other, routing_hash(other))).any()
    ray.kill(shard)


def test_stage_idempotent_under_task_retry():
    """A Ray task retry re-stages the same sub-batch under the same
    content-derived task_key; flush must yield the batch exactly once
    (crawl.py's at-least-once push barrier depends on this)."""
    import pyarrow as pa
    import ray

    from visiblev8_crawler_ray.state.urlseen import SeenShard

    sh = SeenShard.remote(bloom_bits=1 << 12)
    tbl = pa.table({
        "url_key": pa.array([f"{i:032x}" for i in range(5)]),
        "sortkey": pa.array(list(range(5)), type=pa.int64()),
        "url": pa.array([f"https://h/{i}" for i in range(5)]),
    })
    ray.get(sh.stage.remote(0, b"task-A", tbl))
    ray.get(sh.stage.remote(0, b"task-A", tbl))  # retry of the same task
    ray.get(sh.stage.remote(0, b"task-B", tbl.slice(0, 2)))  # same keys
    out = ray.get(sh.flush_fresh.remote(0))
    # first-wins min per key: duplicates collapse, nothing double-counts
    assert out.num_rows == 5
    assert ray.get(sh.last_flush_count.remote()) == 5
    assert sorted(out["url_key"].to_pylist()) == \
        sorted(tbl["url_key"].to_pylist())
    # a later wave's stage resets the buffer; stale-wave flush is empty
    ray.get(sh.stage.remote(1, b"task-C", tbl.slice(0, 1)))
    assert ray.get(sh.flush_fresh.remote(0)).num_rows == 0
