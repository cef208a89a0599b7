"""End-to-end fit() throughput on the real chip: real loader, not a staged
batch (VERDICT r1 item 4 closure).

Feeds the batch-96 bench-configuration train step from PretrainLoader over
full-size records (36 boxes x 2048-d + 1601-way cls_prob, real product
titles/pv), timing steps INCLUDING host-side production + H2D over the
tunnel. Compare against bench.py's staged-batch rate (154 samples/s/chip).

Usage: python exp/e2e_throughput.py [n_records] [k3mr|grainN]
  k3mr   (default) single-threaded python producer + prefetch thread
  grainN GrainPretrainLoader with N multiprocess workers (production in
         separate processes -> no GIL coupling with the dispatch loop)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax

from exp.input_throughput import BATCH, SHAPES, make_records
from k3m_tpu.config import K3MConfig
from k3m_tpu.data.pipeline import PretrainLoader
from k3m_tpu.tokenization import get_tokenizer
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "k3mr"


def main():
    base = "/tmp/k3m_input_bench"
    os.makedirs(base, exist_ok=True)
    k3mr = os.path.join(base, f"feat_{N}.k3mr")
    ar = os.path.join(base, f"feat_{N}.array_record")
    if not os.path.exists(k3mr):
        make_records(k3mr, ar, N)

    tok = get_tokenizer()
    if BACKEND.startswith("grain"):
        from k3m_tpu.data.grain_pipeline import GrainPretrainLoader
        loader = GrainPretrainLoader(
            ar, tok, SHAPES, batch_size=BATCH, shuffle=True, seed=0,
            drop_last=True, num_workers=int(BACKEND[5:] or 0))
    else:
        loader = PretrainLoader(k3mr, tok, SHAPES, batch_size=BATCH,
                                shuffle=True, seed=0, drop_last=True)
    micro = int(os.environ.get("K3M_BENCH_MICRO", "3"))
    cfg = K3MConfig().replace(dtype="bfloat16", remat=(micro <= 1))
    sample = next(iter(loader))
    trainer = PretrainTrainer(
        cfg, learning_rate=1e-4, warmup_steps=10, total_steps=1000,
        sample_batch=sample, micro_steps=micro,
        mesh=mesh_lib.make_mesh(n_model=1))

    # warmup: compile + spin the loader's prefetch thread up
    # (sync via device_get, NOT block_until_ready — the latter can return
    # before remote completion over this environment's tunneled chip and
    # fabricate impossible rates; see README perf notes / bench.py)
    m = trainer.train_step(sample)
    jax.device_get(m["loss"])

    depth = int(os.environ.get("K3M_PREFETCH_DEPTH", "2"))
    it = trainer.prefetch_to_device(iter(loader), depth=depth)
    m = trainer.train_step(next(it))
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 0
    t_feed = t_disp = 0.0
    while True:
        ta = time.perf_counter()
        batch = next(it, None)
        tb = time.perf_counter()
        t_feed += tb - ta
        if batch is None:
            break
        m = trainer.train_step(batch)
        t_disp += time.perf_counter() - tb
        n += batch["input_ids"].shape[0]
    jax.device_get(m["loss"])
    dt = time.perf_counter() - t0
    rate = n / dt
    print(json.dumps({
        "metric": "e2e_fit_samples_per_sec_per_chip",
        "backend": BACKEND,
        "value": round(rate, 1), "samples": n,
        "seconds": round(dt, 1),
        "feed_wait_s": round(t_feed, 2),     # blocked on producer+staging
        "dispatch_s": round(t_disp, 2)}))    # train_step call (async dispatch)


if __name__ == "__main__":
    main()
