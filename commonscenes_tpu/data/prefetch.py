"""Host-side batch prefetching: overlap data I/O with device compute.

The reference hides h5/pkl/json reads behind torch DataLoader worker
processes (scripts/train_3dfront.py:197-204). The TPU-native equivalent is
a background thread that builds the next GraphBatches while the chip runs
the current step — on TPU the step is dispatched asynchronously, so a
single producer thread with a small queue fully hides the 64³ h5 reads.

Bad batches are skipped inside the producer (the reference's try/except
guard, train_3dfront.py:276-283) so a corrupt scene never kills a long run.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class BatchPrefetcher:
    """Runs ``make_batch(step_idx)`` in a daemon thread, ``depth`` ahead."""

    def __init__(self, make_batch: Callable[[int], object], num_steps: int,
                 depth: int = 2, on_error: Optional[Callable] = None):
        self._make = make_batch
        self._num = num_steps
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._on_error = on_error
        self.skipped = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        # a failed batch consumes its step (same as the synchronous guard,
        # reference train_3dfront.py:276-283) — a persistently-failing
        # dataset ends the epoch instead of hanging the queue forever
        for i in range(self._num):
            try:
                b = self._make(i)
            except Exception as e:  # noqa: BLE001 — data errors only
                self.skipped += 1
                if self._on_error is not None:
                    self._on_error(i, e)
                continue
            self._q.put(b)
        self._q.put(None)  # sentinel

    def __iter__(self):
        while True:
            b = self._q.get()
            if b is None:
                return
            yield b
