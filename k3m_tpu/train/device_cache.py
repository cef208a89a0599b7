"""Device-resident epoch cache: beat the host->chip link instead of
measuring it.

The e2e fit() ceiling in this environment is wire bandwidth — the chip
sits behind a network tunnel, and even the int8 codec's 13.45 MB/batch
rides it every step of every epoch, because the reference (and our
streaming path) re-ships every batch every epoch
(concept_cap_dataset_struc.py:344-367). For any corpus whose ENCODED
epoch fits in spare HBM — the bundled sample and every bench corpus do
(~13.45 MB x 22 batches ~ 300 MB; a v5e has 16 GB) — that is pure waste:
stage each batch once, keep the staged (wire-encoded, int8-in-HBM) arrays
resident, and iterate on-device thereafter. e2e throughput becomes the
staged rate regardless of link state. The lever is real in production
too: per-host dataset shards recycle across epochs, so epoch 2+ of any
fits-in-HBM shard pays zero input wire traffic.

Semantics trade-off, stated plainly: the host pipeline draws fresh MLM /
pv / region masks and caption negatives per epoch; a cached epoch replays
epoch-one's draws (batch ORDER is still re-permuted per epoch). That is
exactly classic static masking — BERT's original pretraining fixed its
masks per dupe_factor copy (Devlin et al. 2019, create_pretraining_data)
— a documented, accepted regime, but not the reference's dynamic-masking
default. Hence opt-in: `--device_cache` / K3M_DEVICE_CACHE=1.

HBM accounting: staged bytes are metered against a budget (default: 70%
of the device's currently-free HBM via memory_stats(), overridable with
K3M_DEVICE_CACHE_MB). If an epoch doesn't fit, the cache disables itself
mid-build with a warning, drops what it held, and every epoch streams
through the normal prefetch path — graceful fallback, never an OOM.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)


def staged_nbytes(batch) -> int:
    """Total device bytes of one staged batch (nested dicts of arrays)."""
    import jax
    return int(sum(getattr(x, "nbytes", 0) for x in jax.tree.leaves(batch)))


def hbm_budget_bytes() -> int:
    """Cache byte budget: K3M_DEVICE_CACHE_MB if set, else 70% of the
    first device's currently-free HBM (memory_stats is a TPU/GPU API —
    absent on the CPU backend, where a conservative 2 GB default keeps
    virtual-device tests honest)."""
    env = os.environ.get("K3M_DEVICE_CACHE_MB")
    if env:
        return int(float(env) * 1e6)
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
            if free > 0:
                return int(0.7 * free)
    except Exception:
        pass
    return 2_000_000_000


class DeviceEpochCache:
    """Iterable: first full pass stages batches via `stage` and retains
    the device arrays; later passes yield the cached arrays (per-epoch
    re-permuted order, zero H2D). Set `.epoch` before each pass (the
    trainers' fit() already does) to key the permutation.

    Drop-in where a loader is expected: the trainers wrap it in
    prefetch_to_device, whose producer thread drives this iterator — so
    first-pass staging runs off the consumer step loop, and cached passes
    flow through the same (now no-op) pipeline.
    """

    def __init__(self, loader: Iterable, stage: Callable, *,
                 max_bytes: Optional[int] = None, reshuffle: bool = True,
                 seed: int = 0):
        self._loader = loader
        self._stage = stage
        self._max_bytes = max_bytes
        self._reshuffle = reshuffle
        self._seed = seed
        self._cache = None          # list of staged batches, once complete
        self._disabled = False      # budget exceeded -> stream forever
        self.bytes = 0
        self._epoch = 0

    @property
    def epoch(self) -> int:
        return self._epoch

    @epoch.setter
    def epoch(self, value: int) -> None:
        self._epoch = int(value)
        if hasattr(self._loader, "epoch"):
            # keep the source loader's shuffle key honest for the build
            # pass and for fallback streaming
            self._loader.epoch = value

    @property
    def cached(self) -> bool:
        return self._cache is not None

    def __iter__(self):
        if self._cache is not None:
            order = np.arange(len(self._cache))
            if self._reshuffle:
                order = np.random.default_rng(
                    [self._seed, self._epoch]).permutation(order)
            for i in order:
                yield self._cache[i]
            return
        if self._max_bytes is None:
            self._max_bytes = hbm_budget_bytes()
        building = [] if not self._disabled else None
        n = 0
        for batch in self._loader:
            sb = self._stage(batch)
            n += 1
            if building is not None:
                building.append(sb)
                self.bytes += staged_nbytes(sb)
                if self.bytes > self._max_bytes:
                    logger.warning(
                        "device_cache: epoch exceeds HBM budget after %d "
                        "batches (%.0f MB > %.0f MB) — falling back to "
                        "streaming (every epoch re-ships over the wire)",
                        n, self.bytes / 1e6, self._max_bytes / 1e6)
                    building = None
                    self._disabled = True
                    self.bytes = 0
            yield sb
        if building is not None and n > 0:
            self._cache = building
            logger.info("device_cache: %d batches resident (%.0f MB HBM) — "
                        "subsequent epochs run at staged rate", n,
                        self.bytes / 1e6)
