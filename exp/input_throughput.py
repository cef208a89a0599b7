"""Measure input-pipeline throughput: can the producers feed the chip?

The train step runs at ~154 samples/s/chip on v5e (bench.py). This script
measures, on realistic full-size records (36 boxes x 2048-d features +
1601-way cls_prob, real product titles/pv strings, reference shapes
50/256/30/36), the samples/sec of:

  k3mr    PretrainLoader (single-threaded python producer + prefetch thread)
  grain0  GrainPretrainLoader, worker_count=0 (in-process)
  grainN  GrainPretrainLoader, worker_count=N (multiprocess)

Usage: python exp/input_throughput.py [n_records] [workers...]
No TPU use — pure host-side measurement.
"""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from k3m_tpu.data.pipeline import PretrainLoader
from k3m_tpu.data.prepare import parse_raw_tsv
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.tokenization import get_tokenizer

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"
BATCH = 96
SHAPES = ShapeSpec(max_seq_len=50, max_seq_len_pv=256, max_num_pv=30,
                   max_region_len=36)


def make_records(path_k3mr, path_ar, n=1024):
    """Full-size records: real text from the bundled corpus, synthetic
    36-box RoI features at the reference's extraction dims."""
    from k3m_tpu.data.grain_pipeline import write_array_records
    from k3m_tpu.data.records import write_records

    raw = list(itertools.islice(parse_raw_tsv(SAMPLE), 400))
    rng = np.random.default_rng(0)

    def gen():
        for i in range(n):
            item = raw[i % len(raw)]
            boxes = rng.random((36, 4), dtype=np.float32) * 400
            boxes[:, 2:] += boxes[:, :2]
            yield dict(item_id=f"{item['item_id']}_{i}", title=item["title"],
                       pv=item["pv"], category=item["category"],
                       image_h=600, image_w=800, num_boxes=36,
                       boxes=boxes,
                       features=rng.random((36, 2048), dtype=np.float32),
                       cls_prob=rng.random((36, 1601), dtype=np.float32))

    # materialize ONCE: both files must hold the same records in the same
    # order (the r5 Grain native-hybrid reads the K3MR sibling by the
    # ArrayRecord sampler's record index)
    recs = list(gen())
    write_records(path_k3mr, iter(recs))
    write_array_records(path_ar, iter(recs))


def timed(loader, label, n_batches):
    it = iter(loader)
    next(it)  # warmup (spawns workers / opens readers)
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += b["input_ids"].shape[0]
        if n >= n_batches * BATCH:
            break
    dt = time.perf_counter() - t0
    rate = n / dt
    print(json.dumps({"loader": label, "samples_per_s": round(rate, 1),
                      "batches": n // BATCH}))
    return rate


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    WORKERS = [int(w) for w in sys.argv[2:]] or [0, 2, 4]
    base = "/tmp/k3m_input_bench"
    os.makedirs(base, exist_ok=True)
    k3mr = os.path.join(base, f"feat_{N}.k3mr")
    ar = os.path.join(base, f"feat_{N}.array_record")
    if not (os.path.exists(k3mr) and os.path.exists(ar)):
        make_records(k3mr, ar, N)

    tok = get_tokenizer()
    n_batches = max(N // BATCH - 1, 1)

    timed(PretrainLoader(k3mr, tok, SHAPES, batch_size=BATCH, shuffle=True,
                         seed=0), "k3mr", n_batches)
    from k3m_tpu.data.grain_pipeline import GrainPretrainLoader
    for w in WORKERS:
        # native_preprocess=False: keep the pure per-record path measured
        # under its historical label (the K3MR sibling in this dir would
        # otherwise silently upgrade it to the hybrid)
        timed(GrainPretrainLoader(ar, tok, SHAPES, batch_size=BATCH,
                                  shuffle=True, seed=0, num_epochs=8,
                                  num_workers=w, native_preprocess=False),
              f"grain{w}", n_batches)
    # r5 native-hybrid: Grain sampler order -> C++ batch producer on the
    # K3MR sibling (bit-identical batches, tests/test_grain_pipeline.py)
    hybrid = GrainPretrainLoader(ar, tok, SHAPES, batch_size=BATCH,
                                 shuffle=True, seed=0, num_epochs=8)
    if hybrid._native is not None:
        timed(hybrid, "grain_native", n_batches)
    else:
        print(json.dumps({"loader": "grain_native",
                          "error": "native producer unavailable"}))


if __name__ == "__main__":
    main()
