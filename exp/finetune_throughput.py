"""Item-alignment finetune + inference throughput on the real chip.

Measures, at the reference finetune configuration (batch 32,
run_finetune_item_alignment.sh:17-43) over full-size pair records
(36 boxes x 2048-d features + 1601-way cls_prob per item, real product
text), fed end-to-end from AlignmentLoader (native C++ pair batches):

  train    twin-tower train step (fwd+bwd+AdamW), pairs/sec
  eval     deterministic twin-tower forward (the --do_eval / --do_pred
           serving path), pairs/sec

Timing syncs via jax.device_get (NOT block_until_ready — see README perf
notes: the latter can return early over this environment's tunneled chip).

Usage: python exp/finetune_throughput.py [n_pairs] [loss_type] [micro_steps]

micro_steps > 1 slices the batch inside the jitted step (grad averaging)
and turns per-layer remat OFF — the same lever that won the pretrain bench
(README perf notes): live activations cap at one microbatch, so the
recompute tax goes away while still fitting 16 GB HBM.
"""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np

from k3m_tpu.config import K3MConfig
from k3m_tpu.data.pipeline import AlignmentLoader
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.data.prepare import parse_raw_tsv
from k3m_tpu.data.records import write_records
from k3m_tpu.tokenization import get_tokenizer
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.alignment_loop import AlignmentTrainer

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"
BATCH = 32  # ref run_finetune_item_alignment.sh:20
SHAPES = ShapeSpec(max_seq_len=50, max_seq_len_pv=256, max_num_pv=30,
                   max_region_len=36)

def _cli_args():
    # parsed inside main(), not at import: bench.py imports this module
    # for make_pairs/SHAPES and must not trip over its own argv
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    loss_type = sys.argv[2] if len(sys.argv) > 2 else "ce"
    micro = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    return n, loss_type, micro


def make_pairs(path, n):
    raw = list(itertools.islice(parse_raw_tsv(SAMPLE), 200))
    rng = np.random.default_rng(0)

    def item(i):
        it = raw[i % len(raw)]
        return dict(
            item_id=f"{it['item_id']}_{i}", title=it["title"], pv=it["pv"],
            image_h=800, image_w=800, num_boxes=36,
            boxes=(rng.random((36, 4), dtype=np.float32) * 400
                   + np.array([0, 0, 200, 200], np.float32)),
            features=rng.random((36, 2048), dtype=np.float32),
            cls_prob=rng.random((36, 1601), dtype=np.float32))

    write_records(path, (dict(label=float(i % 2), item1=item(2 * i),
                              item2=item(2 * i + 1)) for i in range(n)))


def timed(fn, it, sync):
    t0 = time.perf_counter()
    n, last = 0, None
    for batch in it:
        last = fn(batch)
        n += len(batch["label"])
    jax.device_get(sync(last))
    return n / (time.perf_counter() - t0)


def main():
    N, LOSS_TYPE, MICRO = _cli_args()
    base = "/tmp/k3m_ft_bench"
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"pairs_{N}.k3mr")
    if not os.path.exists(path):
        make_pairs(path, N)

    tok = get_tokenizer()
    loader = AlignmentLoader(path, tok, SHAPES, batch_size=BATCH,
                             shuffle=True, seed=0, drop_last=True)
    # micro_steps=1: remat=True — the twin tower runs the tri-pass trunk
    # TWICE per step; batch-32 bwd without remat overflows the 16 GB HBM.
    # micro_steps>1: remat can turn off (live activations = one microbatch).
    cfg = K3MConfig().replace(dtype="bfloat16", loss_type=LOSS_TYPE,
                              remat=(MICRO == 1))
    sample = next(iter(loader))
    trainer = AlignmentTrainer(cfg, learning_rate=5e-5, warmup_steps=10,
                               total_steps=1000, sample_batch=sample,
                               micro_steps=MICRO,
                               mesh=mesh_lib.make_mesh(n_model=1))

    # compile both steps
    loss, _ = trainer.train_step(sample)
    jax.device_get(loss)
    jax.device_get(trainer.eval_step(sample)[3])

    # device rate: loop the train step on ONE pre-staged batch (the bench.py
    # pattern) — isolates the TPU step from this environment's tunneled-link
    # H2D, which dominates the e2e loop below (README finetune perf notes)
    db = trainer._shard(sample)
    iters = 12
    t0 = time.perf_counter()
    for _ in range(iters):
        lo, _ = trainer.train_step(db)
    jax.device_get(lo)
    r_staged = BATCH * iters / (time.perf_counter() - t0)

    # what fit() runs: staged batches via prefetch_to_device (H2D of
    # batch N+1 overlaps compute of batch N)
    r_train = timed(lambda b: trainer.train_step(b),
                    trainer.prefetch_to_device(iter(loader)), lambda o: o[0])
    r_eval = timed(lambda b: trainer._eval_step(
                       trainer.state.params, *(lambda d: (d["label"],
                       d["item1"], d["item2"]))(trainer._shard(b))),
                   iter(loader), lambda o: o[3])
    print(json.dumps({
        "metric": "finetune_pairs_per_sec_per_chip", "loss_type": LOSS_TYPE,
        "batch": BATCH, "micro_steps": MICRO, "remat": MICRO == 1,
        "train_staged": round(r_staged, 1), "train": round(r_train, 1),
        "eval_predict": round(r_eval, 1), "pairs": N}))


if __name__ == "__main__":
    main()
