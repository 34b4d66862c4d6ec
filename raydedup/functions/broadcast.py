"""Worker-local cache for small broadcast objects shipped into
map-batch chunks via ``ray.put`` + ``ray.get``.

``ray.get`` on an owned plasma object is cheap, but it still
re-deserializes the buffers on EVERY call — a per-chunk tax for
map_batches functions that close over a broadcast ref (decontam packs,
Bloom filters, candidate hash sets, boilerplate line sets, PMI word
lists...).  Caching the deserialized value per worker process makes the
per-chunk cost a dict lookup.

Bounded: at most ``_CAP`` live entries per worker, keyed by object-ref
hex, so stale refs from finished queries age out on the first miss past
capacity.  All call sites broadcast provably-small objects (each
documents its bound), so worst-case residency is a few small arrays.
"""

from __future__ import annotations

_CACHE: dict = {}
_CAP = 8
_MISS = object()


def bcast_get(ref):
    """``ray.get(ref)`` with a per-worker deserialized-value cache."""
    key = ref.hex()
    hit = _CACHE.get(key, _MISS)
    if hit is _MISS:
        import ray
        if len(_CACHE) >= _CAP:
            _CACHE.clear()
        hit = ray.get(ref)
        _CACHE[key] = hit
    return hit
