"""RoI-extraction throughput: per-image path vs batched extractor.

Usage: python exp/roi_bench.py [n_images] [batch_size]
Random weights (compute cost is weight-independent); 800x600-ish images
like the reference's product photos.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

from k3m_tpu.vision.frcnn import (BatchedExtractor, _build_model_params,
                                  extract_rois)

rng = np.random.default_rng(0)
sizes = [(600, 800), (480, 640), (600, 800), (533, 800)]
images = [(rng.random(sizes[i % len(sizes)] + (3,)) * 255).astype(np.uint8)
          for i in range(N)]

model, params = _build_model_params(None)

# batched
bx = BatchedExtractor(model, params, batch_size=B)
t0 = time.perf_counter()
out = bx.extract_many(images[:B])     # warmup/compile per bucket
print(f"batched warmup+compile: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
out = bx.extract_many(images)
dt = time.perf_counter() - t0
print(f"batched(B={B}): {N/dt:.2f} img/s ({dt:.1f}s for {N})")

# per-image
t0 = time.perf_counter()
extract_rois(model, params, images[0])
print(f"per-image warmup+compile: {time.perf_counter()-t0:.1f}s")
M = min(N, 8)
t0 = time.perf_counter()
for im in images[:M]:
    extract_rois(model, params, im)
dt = time.perf_counter() - t0
print(f"per-image: {M/dt:.2f} img/s ({dt:.1f}s for {M})")
