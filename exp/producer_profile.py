"""cProfile breakdown of the single-threaded PretrainLoader producer.

Where do the microseconds per sample go? (tokenize / mask / IoU / image
padding / record decode / collate). Drives the native (C++) preprocessing
work: the producer shares this host's one core with the dispatch loop, so
every cycle saved here is e2e samples/s.

Usage: python exp/producer_profile.py [n_samples]
No TPU use.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.data.pipeline import PretrainLoader, collate_pretrain
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.tokenization import get_tokenizer
from exp.input_throughput import make_records

BATCH = 96
SHAPES = ShapeSpec(max_seq_len=50, max_seq_len_pv=256, max_num_pv=30,
                   max_region_len=36)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    base = "/tmp/k3m_input_bench"
    os.makedirs(base, exist_ok=True)
    k3mr = os.path.join(base, f"feat_{n}.k3mr")
    ar = os.path.join(base, f"feat_{n}.array_record")
    if not (os.path.exists(k3mr) and os.path.exists(ar)):
        make_records(k3mr, ar, n)

    tok = get_tokenizer()
    loader = PretrainLoader(k3mr, tok, SHAPES, batch_size=BATCH,
                            shuffle=True, seed=0)

    # run the map+collate path inline (no thread) under cProfile
    idx = loader._indices()[: n]
    # warmup one batch
    batch = [loader._map(int(i)) for i in idx[:BATCH]]
    collate_pretrain(batch)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    batch = []
    done = 0
    for i in idx:
        batch.append(loader._map(int(i)))
        if len(batch) == BATCH:
            collate_pretrain(batch)
            batch = []
            done += BATCH
    prof.disable()
    dt = time.perf_counter() - t0
    print(f"inline python producer: {done / dt:.1f} samples/s ({dt:.2f}s / {done})")
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())

    if loader.native is not None:
        t0 = time.perf_counter()
        done = 0
        for k in range(0, len(idx) - BATCH + 1, BATCH):
            loader.native.batch(idx[k:k + BATCH], loader.seed, loader.epoch)
            done += BATCH
        dt = time.perf_counter() - t0
        print(f"native (C++) producer: {done / dt:.1f} samples/s "
              f"({dt:.2f}s / {done})")


if __name__ == "__main__":
    main()
