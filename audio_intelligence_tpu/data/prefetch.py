"""Host-side pipeline overlap utilities.

``background_batches`` is the torch ``DataLoader(prefetch_factor=N)``
analogue for this framework's generator-based loaders: the wrapped
iterator runs in a daemon thread feeding a bounded queue, so host data
prep (file IO, PCM decode — which release the GIL via the native
extension) overlaps the device step instead of serializing with it.
Exceptions propagate to the consumer; iteration order is unchanged.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def background_batches(it: Iterable, depth: int = 2) -> Iterator:
    """Yield items of ``it`` produced by a background thread, at most
    ``depth`` batches ahead of the consumer."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))

    def run():
        try:
            for item in it:
                q.put(item)
            q.put(_SENTINEL)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=run, daemon=True, name="batch-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
