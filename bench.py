#!/usr/bin/env python
"""K3M pretrain throughput benchmark.

Measures samples/sec/chip of the full pretraining train step (fwd+bwd+AdamW)
at the reference's measured configuration (run_pretrain.sh:16-46: batch 96,
seq 50/256, 30 pvs, 36 regions, mixed precision) on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline: ratio to the torch reference's per-chip rate. The reference
cannot run here (its tensorpack/LMDB/apex deps are not installed and there is
no GPU), so the baseline comes from BENCH_BASELINE.json if present —
{"reference_samples_per_sec_per_chip": N} — else a torch-CPU proxy of the
reference model is attempted; if neither works, vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("K3M_BENCH_BATCH", 96))
SEQ_T = 50
SEQ_PV = 256
NUM_PV = 30
REGIONS = 36
WARMUP = 3
ITERS = 10


def make_batch(cfg, B):
    from __graft_entry__ import _make_batch
    return _make_batch(cfg, B=B, L=SEQ_T, Lpv=SEQ_PV, R=REGIONS, P=NUM_PV)


# Peak bf16 matmul throughput per chip, by device_kind prefix. Used only
# for the reported MFU estimate; unknown kinds report mfu=null.
PEAK_BF16_FLOPS = [
    ("TPU v6", 918e12),      # v6e (Trillium)
    ("TPU v5p", 459e12),
    ("TPU v5 lite", 197e12),  # v5e
    ("TPU v5e", 197e12),
    ("TPU v4", 275e12),
]


def peak_flops(device) -> "float | None":
    kind = getattr(device, "device_kind", "")
    for prefix, peak in PEAK_BF16_FLOPS:
        if kind.startswith(prefix):
            return peak
    return None


def bench_jax() -> dict:
    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    # Fastest semantically-faithful configuration: in-step microbatching
    # (the reference's own gradient-accumulation normalization,
    # train_concap_struc.py:561-575) lets per-layer remat turn off within
    # 16 GB HBM — measured 154 vs 136 samples/s/chip at batch 96 on v5e;
    # micro_steps=4 measured 155.6 vs 151.1 at micro_steps=3 (r2 sweep).
    micro = int(os.environ.get("K3M_BENCH_MICRO", "4"))
    # shared_prefix: the first 6 text layers see no co-attention in any of
    # the three passes, so each stream's prefix runs ONCE instead of twice
    # (mathematically identical in deterministic mode, golden-tested in
    # tests/test_shared_prefix.py; in training the two consumers share one
    # dropout draw — still unbiased dropout). Measured r2: 182.0 vs 155.6
    # samples/s/chip at micro_steps=4 (49.1 vs 58.7 TF/step).
    cfg = K3MConfig().replace(
        dtype="bfloat16",
        remat=(micro <= 1),
        shared_prefix=bool(int(os.environ.get("K3M_BENCH_SP", "1"))),
        use_pallas=bool(int(os.environ.get("K3M_BENCH_PALLAS", "0"))))
    n_chips = len(jax.devices())
    batch = make_batch(cfg, BATCH * n_chips)
    trainer = PretrainTrainer(
        cfg, learning_rate=1e-4, warmup_steps=10, total_steps=1000,
        sample_batch=batch, micro_steps=micro,
        mesh=mesh_lib.make_mesh(n_model=1))
    # stage the batch on device ONCE: this measures the train step itself.
    # (In training, per-step H2D overlaps with compute via async dispatch;
    # in this environment the chip sits behind a network tunnel, so an
    # unstaged feed would measure tunnel bandwidth, not the TPU.)
    from k3m_tpu.train.pretrain_loop import device_batch
    db = mesh_lib.shard_batch(device_batch(batch), trainer.mesh)
    for _ in range(WARMUP):
        m = trainer.train_step(db)
    # device_get, NOT block_until_ready: over the axon tunnel the latter
    # intermittently returns before remote completion (phantom ~10ms steps)
    jax.device_get(m["loss"])
    # median of 3 windows — the tunneled chip shows run-to-run variance
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            m = trainer.train_step(db)
        jax.device_get(m["loss"])
        dt = time.perf_counter() - t0
        rates.append((BATCH * n_chips * ITERS) / dt / n_chips)
    value = sorted(rates)[1]

    # MFU: XLA's own flop count for the compiled step (fwd+bwd+AdamW over
    # batch*n_chips samples) against the chip's peak bf16 rate.
    # CAVEAT, verified empirically on this stack: cost_analysis counts a
    # lax.scan (the micro-step loop) body ONCE, not trip-count times — a
    # standalone micro_steps=1 step at microbatch 24 reports 14.24 TF while
    # the 4-iteration scan over the same body reports 14.68 TF. Scale by
    # `micro` to report the true executed flops (the optimizer update, ~6 GF,
    # is triple-counted by this; negligible).
    flops_per_step = mfu = None
    try:
        cost = (trainer._train_step.lower(trainer.state, db)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
        if flops_per_step and micro > 1:
            flops_per_step *= micro
        peak = peak_flops(jax.devices()[0])
        if flops_per_step and peak:
            steps_per_sec_per_chip = value / (BATCH)
            mfu = (flops_per_step / n_chips) * steps_per_sec_per_chip / peak
    except Exception as e:  # cost analysis is best-effort diagnostics
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)
    return {"value": value, "flops_per_step": flops_per_step, "mfu": mfu}


def measure_torch_reference_cpu() -> "float | None":
    """samples/sec of the torch reference's full train step (fwd+bwd+AdamW,
    same batch/shapes) on this host's CPU — the only hardware the reference
    can run on here (no GPU, no apex). Result is cached to
    BENCH_BASELINE.json with baseline_kind=torch_cpu_reference."""
    try:
        import types

        import torch

        sys.path.insert(0, "/root/reference")
        boto3 = types.ModuleType("boto3")
        boto3.resource = lambda *a, **k: None
        sys.modules.setdefault("boto3", boto3)
        botocore = types.ModuleType("botocore")
        exc = types.ModuleType("botocore.exceptions")
        exc.ClientError = type("ClientError", (Exception,), {})
        botocore.exceptions = exc
        sys.modules.setdefault("botocore", botocore)
        sys.modules.setdefault("botocore.exceptions", exc)
        six = types.ModuleType("torch._six")
        six.inf = float("inf")
        sys.modules.setdefault("torch._six", six)
        import vilbert_k3m.vilbert_k3m as ref
    except Exception as e:
        print(f"# torch reference unavailable: {e}", file=sys.stderr)
        return None

    with open(os.path.join(
            REPO, "k3m_tpu/configs/bert_base_6layer_6conect.json")) as f:
        cfg_dict = json.load(f)
    cfg_dict.update(
        visual_target=0, fast_mode=False, fixed_v_layer=0, fixed_t_layer=0,
        in_batch_pairs=False, fusion_method="mul", dynamic_attention=False,
        with_coattention=True, objective=0, num_negative_image=128,
        num_negative_pv=4, margin=1.0, task_specific_tokens=False,
        visualization=False, use_image=True, if_pre_sampling=1)
    cfg = ref.BertConfig.from_dict(cfg_dict)
    torch.manual_seed(0)
    model = ref.BertForMultiModalPreTraining_tri_stru(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

    # batch 4, not 96: this host has ONE CPU core (a batch-96 torch step
    # takes ~18 min; per-sample rate is ~batch-independent when
    # compute-bound). Hard-capped with SIGALRM so bench never stalls.
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("torch baseline exceeded its time cap")

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(1800)
    base_batch = 4
    from k3m_tpu.config import K3MConfig
    nb = make_batch(K3MConfig(), base_batch)
    tt = {k: torch.tensor(np.asarray(v, np.int64)
                          if v.dtype in (np.int32, np.int64) else v)
          for k, v in nb.items()}

    def step():
        opt.zero_grad()
        out = model(
            tt["input_ids"], tt["image_feat"], tt["image_loc"],
            tt["segment_ids"], tt["input_mask"], tt["image_mask"],
            tt["lm_label_ids"], tt["image_label"], tt["image_target"],
            tt["is_next"], False,
            input_ids_pv=tt["input_ids_pv"],
            token_type_ids_pv=tt["segment_ids_pv"],
            attention_mask_pv=tt["input_mask_pv"],
            masked_lm_labels_pv=tt["lm_label_ids_pv"],
            next_sentence_label_pv_v=tt["is_next_pv_v"],
            next_sentence_label_pv_t=tt["is_next_pv_t"],
            index_p=tt["index_p"], index_v=tt["index_v"], device="cpu")
        # train_concap_struc.py:531-533
        loss = out[0] + out[1] * 1.0 + out[3] + out[9]
        loss.backward()
        opt.step()

    try:
        step()                   # warmup
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            step()
        dt = time.perf_counter() - t0
    except TimeoutError as e:
        print(f"# torch baseline skipped: {e}", file=sys.stderr)
        return None
    finally:
        signal.alarm(0)
    return base_batch * iters / dt


def load_baseline() -> float | None:
    path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(path):
        with open(path) as f:
            v = json.load(f).get("reference_samples_per_sec_per_chip")
            if v:
                return float(v)
    return None


def main():
    from k3m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    res = bench_jax()
    value = res["value"]
    baseline = load_baseline()
    baseline_kind = "file"
    if baseline is None and not os.environ.get("K3M_BENCH_SKIP_TORCH"):
        baseline = measure_torch_reference_cpu()
        baseline_kind = "torch_cpu_reference"
        if baseline:
            with open(os.path.join(REPO, "BENCH_BASELINE.json"), "w") as f:
                json.dump({"reference_samples_per_sec_per_chip": baseline,
                           "baseline_kind": baseline_kind,
                           "note": "torch reference full train step on this "
                                   "host's CPU (no GPU in this environment); "
                                   "ours runs on 1x v5e"}, f)
    out = {
        "metric": "k3m_pretrain_samples_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "flops_per_step": res["flops_per_step"],
        "mfu": round(res["mfu"], 4) if res["mfu"] else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
