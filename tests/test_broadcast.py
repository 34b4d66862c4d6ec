"""Worker-local broadcast cache (functions/broadcast.py)."""

import numpy as np
import ray

from raydedup.functions import broadcast
from raydedup.functions.broadcast import bcast_get


def test_cache_hit_returns_same_object(ray_session):
    arr = np.arange(16, dtype=np.int64)
    ref = ray.put(arr)
    a = bcast_get(ref)
    b = bcast_get(ref)
    assert a is b                       # second call is the cached value
    np.testing.assert_array_equal(a, arr)


def test_capacity_eviction_stays_correct(ray_session):
    refs = [ray.put(np.full(4, i, dtype=np.int64)) for i in range(12)]
    for i, ref in enumerate(refs):      # > _CAP distinct refs
        np.testing.assert_array_equal(bcast_get(ref), np.full(4, i))
    assert len(broadcast._CACHE) <= broadcast._CAP
    # values remain correct after the eviction wipe
    for i, ref in enumerate(refs):
        np.testing.assert_array_equal(bcast_get(ref), np.full(4, i))


def test_none_value_is_cacheable(ray_session):
    ref = ray.put(None)
    assert bcast_get(ref) is None
    assert bcast_get(ref) is None       # second call hits the cache
