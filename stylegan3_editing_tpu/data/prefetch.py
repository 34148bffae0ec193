"""Device prefetcher: keep the input pipeline ahead of the train step.

The reference hides host-side input latency behind torch DataLoader worker
processes (setgan/training_loop.py DataLoader + InfiniteSampler,
torch_utils/misc.py:113-147). The TPU-native analogue is transfer overlap:
a daemon thread stays `depth` batches ahead of the consumer, running both
the host-side batch assembly (next(it)) and the host→device placement
(device_put / make_array_from_process_local_data) while the current step
executes on the chip — the step dispatch then never waits on input DMA.

Asynchronous dispatch makes this effective on TPU: `place_fn` enqueues the
transfer and returns immediately; by the time the next step needs the
arrays they are already resident.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a batch iterator; apply `place_fn` up to `depth` batches ahead.

    Exceptions in the producer (including from `place_fn`) re-raise at the
    consumer's next `__next__`. Exhaustion propagates as StopIteration.
    `close()` (or garbage collection of the consumer loop) stops the thread.
    """

    def __init__(self, it: Iterator[T], place_fn: Callable[[T], T],
                 depth: int = 2):
        assert depth >= 1
        self._it = iter(it)
        self._place = place_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for item in self._it:
                placed = self._place(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(placed, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        # Drain so a blocked producer can observe the stop flag.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def maybe_prefetch(it: Iterator[T], place_fn: Callable[[T], T],
                   depth: Optional[int]) -> Iterator[T]:
    """`depth` ≥ 1 → DevicePrefetcher; 0/None → place inline (no thread)."""
    if depth:
        return DevicePrefetcher(it, place_fn, depth=depth)
    return (place_fn(b) for b in it)
