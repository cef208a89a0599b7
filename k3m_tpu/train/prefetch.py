"""Background batch staging: encode + H2D on a producer thread.

The trainers' staging work per batch is (a) the host-side wire encode
(train/wire.py int8 rint/clip over ~30 MB of image features — pure numpy,
GIL-releasing) and (b) the `jax.device_put` dispatch. Before r5 both ran
inside the consumer generator, i.e. on the step loop's critical path
between `train_step` dispatches (ADVICE r4): the device could sit idle
while the host quantized the next batch. Here a daemon thread stages up to
`depth` batches ahead into a bounded queue, so encode(N+1) and the H2D
copy of N+1 overlap the device compute of N — the TPU-side analogue of
the reference's pinned-memory `.cuda(non_blocking=True)` feed
(train_concap_struc.py:472-475) plus its dataloader worker processes.

`jax.device_put` is thread-safe and asynchronous; the queue holds device
arrays whose transfers are already in flight when the consumer sees them.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_DONE = object()


def staged_prefetch(loader: Iterable, stage: Callable,
                    depth: Optional[int] = None) -> Iterator:
    """Yield `stage(batch)` for each batch of `loader`, staging up to
    `depth` batches ahead on a background thread (default 2;
    K3M_PREFETCH_DEPTH overrides — 4 buys ~1% more on a tunneled link at
    ~100 MB extra HBM for the staged batches).

    Exceptions raised by the loader or by `stage` surface in the consumer;
    abandoning the generator (close/GC) stops the producer promptly instead
    of leaving it blocked on a full queue holding device buffers.
    """
    if depth is None:
        depth = max(1, int(os.environ.get("K3M_PREFETCH_DEPTH", "2")))
        # depth < 1 would deadlock a zero-capacity queue
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for batch in loader:
                if not _put(stage(batch)):
                    return
        except BaseException as e:  # surfaced to the consumer below
            err.append(e)
        finally:
            _put(_DONE)

    t = threading.Thread(target=produce, daemon=True, name="k3m-stage")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
