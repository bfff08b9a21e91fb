"""Host→device prefetch: overlap batch preparation with device compute.

Reference behavior: torch DataLoader worker processes + pinned-memory
transfer (SURVEY.md §4.3). TPU-native equivalent: a background thread builds
numpy batches while the device runs the previous step; ``jax.device_put``
(optionally with a Sharding for multi-chip) stages the next batch so the
step never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

_SENTINEL = object()


def device_prefetch(
    batches: Iterable[dict],
    size: int = 2,
    sharding=None,
    device_keys: Optional[set] = None,
) -> Iterator[dict]:
    """Wrap a host batch iterator with a prefetch queue + device_put.

    ``device_keys``: which dict entries go to device (default: every
    numpy-array value; host-side entries like ``utt_ids`` pass through).
    """
    q: queue.Queue = queue.Queue(maxsize=size)

    multihost = jax.process_count() > 1

    def put(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if hasattr(v, "dtype") and (device_keys is None or k in device_keys):
                if sharding is not None and multihost:
                    # per-host local shard → global array over the full mesh
                    out[k] = jax.make_array_from_process_local_data(sharding, v)
                elif sharding is not None:
                    out[k] = jax.device_put(v, sharding)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out

    err: list = []

    def worker():
        try:
            for b in batches:
                q.put(put(b))
        except Exception as e:  # surface loader errors on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
