"""Host-side decoded-frame cache.

JPEG decode is ~30% of a stage-1 sample's host cost (2 decodes of ~1.6 ms
in an ~11 ms sample at Penn frame sizes; docs/PERF.md "Host input
pipeline"). Training redraws frames uniformly at random across epochs
(reference data/image_pair_dataloader.py:52-56), so a byte-budgeted LRU of
decoded RGB frames converts repeat visits into an `Image.fromarray` —
numerically EXACT: the cache stores the post-`convert("RGB")` pixels, and
every augmentation step (rotate -> resize -> crop -> flip -> filter) runs
on identical input either way.

Thread-safe: the pipeline's worker threads share one cache; all map
mutations happen under a lock (lookups copy nothing — PIL wraps the stored
read-only array).
"""

from __future__ import annotations

import threading
from collections import OrderedDict

import numpy as np
from PIL import Image


class FrameCache:
    """Byte-budgeted LRU of decoded frames keyed by (video, frame_idx)."""

    def __init__(self, budget_mb: float):
        self.budget = int(budget_mb * 2**20)
        self._map: OrderedDict[tuple, np.ndarray] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: tuple, decode) -> Image.Image:
        """Return the decoded frame for `key`, calling `decode() ->
        PIL.Image` (already RGB) on a miss. Decode runs OUTSIDE the lock so
        concurrent misses on different frames overlap."""
        with self._lock:
            arr = self._map.get(key)
            if arr is not None:
                self._map.move_to_end(key)
                self.hits += 1
                return Image.fromarray(arr)
            self.misses += 1
        im = decode()
        arr = np.asarray(im, dtype=np.uint8)
        arr.flags.writeable = False
        with self._lock:
            if key not in self._map:
                self._map[key] = arr
                self._bytes += arr.nbytes
                while self._bytes > self.budget and len(self._map) > 1:
                    _, old = self._map.popitem(last=False)
                    self._bytes -= old.nbytes
        return im

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._map),
                "bytes": self._bytes,
                "hits": self.hits,
                "misses": self.misses,
            }
