"""Bounded LRU memo for compiled-program caches.

The per-config program memos (train/segmentation._EPOCH_PROGRAMS,
train/alternating._SWEEP_PROGRAMS, .._TX_CACHE) exist to keep alternations
and grid repeats from re-tracing identical epoch/sweep programs. A plain dict
grows monotonically in a long-lived sweep or serving process; this LRU bounds
them while keeping the hot entries. Values may hold strong references (e.g.
the optax tx an id()-key refers to), which also guarantees a live id() can
never alias a collected object while its entry is cached.
"""

from __future__ import annotations

from collections import OrderedDict


class BoundedCache:
    """Tiny LRU: get/put with eviction of the least-recently-used entry."""

    def __init__(self, maxsize: int = 16):
        assert maxsize > 0
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()

    def get(self, key, default=None):
        try:
            self._d.move_to_end(key)
            return self._d[key]
        except KeyError:
            return default

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)

    def __contains__(self, key):
        return key in self._d

    def clear(self):
        self._d.clear()
