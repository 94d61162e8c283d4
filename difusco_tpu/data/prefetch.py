"""Background-thread batch prefetching (input-pipeline overlap).

The reference overlaps host-side batch assembly with device compute through
torch DataLoader worker processes (``--num_workers``, pl_meta_model.py:
186-192). The TPU-native equivalent: the jitted train step is async-dispatch,
so a single producer thread + bounded queue hides host batch prep (kNN
builds, fixed-degree padding, stacking) behind the device step — no process
forking, no serialization. ``threads`` > 1 additionally parallelizes
per-example prep inside the producer (numpy releases the GIL for the heavy
ops).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator


class _Sentinel:
    pass


def prefetch(iterator: Iterator, depth: int = 3) -> Iterator:
    """Run ``iterator`` in a daemon thread, yielding through a bounded
    queue. Exceptions in the producer propagate to the consumer."""
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    done = _Sentinel()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into the consuming thread
            q.put(e)
        finally:
            q.put(done)

    threading.Thread(target=worker, daemon=True, name="batch-prefetch").start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def parallel_examples(dataset, idxs, pool: ThreadPoolExecutor):
    """Fetch dataset examples concurrently (order-preserving)."""
    return list(pool.map(lambda i: dataset.get(int(i)), idxs))
