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


def _spread(rates) -> dict:
    """ONE estimator policy for every number this file publishes: the
    median over >=3 timing windows, with the min/max spread carried in the
    JSON so a noisy link (the chip sits behind a network tunnel here) is
    visible in the artifact instead of silently inflating or deflating the
    headline (round-3 lesson: a single-window e2e measured 104.6 while the
    typical value was ~160). `per_window` keeps chronological order so a
    recurring first-window stall (r2-r4 finetune artifacts) is attributable
    from the artifact alone."""
    vals = [float(r) for r in rates]
    rs = sorted(vals)
    return {"median": rs[len(rs) // 2], "min": rs[0], "max": rs[-1],
            "windows": len(rs), "per_window": [round(v, 2) for v in vals]}


# Below this H2D bandwidth the tunnel is considered degraded: the int8
# e2e path ships 13.45 MB/batch at ~1.9 batches/s ~= 25 MB/s of wire when
# healthy; r4's healthy captures sustained >= 50 MB/s equivalents while
# the driver-captured 64%-of-staged artifact implies ~20 MB/s. Override
# with K3M_HEALTHY_LINK_MBPS.
HEALTHY_LINK_MBPS = float(os.environ.get("K3M_HEALTHY_LINK_MBPS", "40"))


def measure_link_mbps(mb: int = 64) -> float:
    """In-situ H2D link probe: time one fixed-size jax.device_put to
    residency. Published per e2e window so the artifact itself can
    distinguish 'bad link day' from 'regression' (r4 verdict item 1 —
    BENCH_r04 recorded e2e at 64% of staged with no way to attribute it).
    The trailing 1-element fetch guards against the tunnel's
    block_until_ready returning before remote completion (r3 finding)."""
    import jax
    buf = np.ones(mb * 1024 * 1024, np.uint8)
    t0 = time.perf_counter()
    x = jax.device_put(buf)
    x.block_until_ready()
    np.asarray(x[:1])
    dt = time.perf_counter() - t0
    del x
    return mb / dt


def stable_windows(run_window, windows: int = 3, max_extra: int = 2,
                   ratio: float = 2.0) -> dict:
    """Run >= `windows` timing windows; if the spread is implausible
    (max/min > `ratio` — the shared-pool chip can stall mid-window for
    minutes, r4 observed a 27.6 pairs/s window against a 75.9 median),
    run up to `max_extra` additional windows so the median is taken over
    mostly-healthy samples. Every window stays in the reported spread —
    nothing is discarded, the artifact keeps its error bars."""
    rates = [run_window() for _ in range(windows)]
    extra = 0
    while extra < max_extra and max(rates) > ratio * max(min(rates), 1e-9):
        rates.append(run_window())
        extra += 1
    return _spread(rates)


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


def bench_jax(n_data: "int | None" = None, n_model: int = 1,
              shared_prefix: "bool | None" = None, windows: int = 3) -> dict:
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
    if shared_prefix is None:
        shared_prefix = bool(int(os.environ.get("K3M_BENCH_SP", "1")))
    cfg = K3MConfig().replace(
        dtype="bfloat16",
        remat=(micro <= 1),
        shared_prefix=shared_prefix,
        use_pallas=bool(int(os.environ.get("K3M_BENCH_PALLAS", "0"))))
    # Mesh mode (--n_data/--n_model): the day multi-chip hardware appears,
    # the pod number is one command away; bytes-over-ICI per step are
    # reported from the compiled HLO (k3m_tpu/utils/hlo.py).
    if n_data is None:
        n_data = len(jax.devices()) // n_model
    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model,
                              devices=jax.devices()[:n_data * n_model])
    n_chips = mesh.size
    batch = make_batch(cfg, BATCH * max(n_data, 1))
    trainer = PretrainTrainer(
        cfg, learning_rate=1e-4, warmup_steps=10, total_steps=1000,
        sample_batch=batch, micro_steps=micro, mesh=mesh)
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
    samples_per_step = BATCH * max(n_data, 1)

    # median of >= `windows` — the tunneled chip shows run-to-run variance
    # and can stall mid-window (stable_windows adds bounded extras)
    def run_window():
        t0 = time.perf_counter()
        m = None
        for _ in range(ITERS):
            m = trainer.train_step(db)
        jax.device_get(m["loss"])
        return samples_per_step * ITERS / (time.perf_counter() - t0) / n_chips

    spread = stable_windows(run_window, windows=windows)
    value = spread["median"]

    # MFU: XLA's own flop count for the compiled step (fwd+bwd+AdamW over
    # batch*n_chips samples) against the chip's peak bf16 rate.
    # CAVEAT, verified empirically on this stack: cost_analysis counts a
    # lax.scan (the micro-step loop) body ONCE, not trip-count times — a
    # standalone micro_steps=1 step at microbatch 24 reports 14.24 TF while
    # the 4-iteration scan over the same body reports 14.68 TF. Scale by
    # `micro` to report the true executed flops (the optimizer update, ~6 GF,
    # is triple-counted by this; negligible).
    flops_per_step = mfu = None
    ici = None
    try:
        compiled = trainer._train_step.lower(trainer.state, db).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
        if flops_per_step and micro > 1:
            flops_per_step *= micro
        peak = peak_flops(jax.devices()[0])
        if flops_per_step and peak:
            steps_per_sec_per_chip = value * n_chips / samples_per_step
            mfu = (flops_per_step / n_chips) * steps_per_sec_per_chip / peak
        if n_chips > 1:
            from k3m_tpu.utils import hlo
            ici = hlo.collective_bytes(compiled.as_text())
    except Exception as e:  # cost analysis is best-effort diagnostics
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)
    return {"value": value, "spread": spread,
            "flops_per_step": flops_per_step, "mfu": mfu,
            "mesh": f"{n_data}x{n_model}", "ici_bytes_per_step": ici}


def bench_finetune(windows: int = 3) -> "dict | None":
    """Staged-batch item-alignment train-step rate (pairs/sec/chip) at the
    reference finetune configuration (batch 32, loss_type ce,
    run_finetune_item_alignment.sh:17-43). Twin tower at batch 32 needs
    per-layer remat OR in-step microbatching; micro_steps=3 + remat-off is
    the measured-faster lever (exp/finetune_throughput.py). Median of
    `windows` like every other number here (_spread)."""
    import jax
    from __graft_entry__ import _make_batch
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train.alignment_loop import AlignmentTrainer, device_item

    micro = int(os.environ.get("K3M_BENCH_FT_MICRO", "4"))  # 32 % micro == 0
    cfg = K3MConfig().replace(dtype="bfloat16", loss_type="ce",
                              remat=(micro == 1))
    B = 32
    i1 = device_item(_make_batch(cfg, B=B, L=SEQ_T, Lpv=SEQ_PV, R=REGIONS,
                                 P=NUM_PV, seed=1))
    i2 = device_item(_make_batch(cfg, B=B, L=SEQ_T, Lpv=SEQ_PV, R=REGIONS,
                                 P=NUM_PV, seed=2))
    batch = dict(label=(np.arange(B) % 2).astype(np.int32), item1=i1,
                 item2=i2)
    trainer = AlignmentTrainer(cfg, learning_rate=5e-5, warmup_steps=10,
                               total_steps=1000, sample_batch=batch,
                               micro_steps=micro,
                               mesh=mesh_lib.make_mesh(n_model=1))
    db = trainer._shard(batch)
    loss, _ = trainer.train_step(db)   # compile
    jax.device_get(loss)
    # r2-r4 artifacts all showed a ~3x-slow FIRST window (23.7-27.6 pairs/s
    # vs ~75 median) with no warmup here — the headline pretrain bench
    # warms 3 steps, this one warmed only the compile call. Warm the same
    # way, and keep a synced per-step probe so any residual stall is
    # attributable inside the artifact (one monster step = claim/paging;
    # uniform slowness = chip/link state).
    for _ in range(WARMUP):
        loss, _ = trainer.train_step(db)
    jax.device_get(loss)
    iters = 10

    def run_window():
        t0 = time.perf_counter()
        lo = None
        for _ in range(iters):
            lo, _ = trainer.train_step(db)
        jax.device_get(lo)
        return B * iters / (time.perf_counter() - t0)

    out = stable_windows(run_window, windows=windows)
    # diagnostic synced window (not part of the spread): per-step wall
    # times with a device_get each step — slower by one RTT/step by
    # construction, but it localizes a stall to a step index
    step_ms = []
    for _ in range(iters):
        t1 = time.perf_counter()
        lo, _ = trainer.train_step(db)
        jax.device_get(lo)
        step_ms.append(round((time.perf_counter() - t1) * 1000, 1))
    out["probe_step_ms"] = step_ms
    return out


def bench_e2e(n_records: int = 2112, windows: int = 3,
              wire: "str | None" = None,
              staged_rate: "float | None" = None,
              device_cache: bool = False) -> "dict | None":
    """fit()-path rate: real loader (native C++ producer) -> prefetched H2D
    -> train step, over full-size records. The honest what-a-user-gets
    number; its gap to the staged rate is the input pipeline + tunnel.

    Each window is one full pass over the loader (n_records/BATCH - 1
    measured steps, default 21 >= 20); the reported value is the median of
    `windows` passes with the spread in the JSON — the r3 snapshot showed a
    single window on this path can land anywhere in a ~100-165 samples/s
    band depending on tunnel state.

    `wire` (default: K3M_WIRE env, else int8) selects the H2D codec —
    int8 image_feat + uint8 soft labels halve the wire again vs bf16/fp16
    (train/wire.py); K3M_WIRE=fp reproduces the r3 behavior.

    Self-diagnosing artifact (r5): every window is bracketed by an H2D
    link probe (`link_mbps` per window in the JSON) and, when the staged
    rate is known, the analytic expectations ship alongside —
      expected_e2e_serial  = 1 / (1/staged + wire_mb / link / batch)
      expected_e2e_overlap = min(staged, batch * link / wire_mb)
    (prefetch_to_device overlaps the copy with compute, so a healthy run
    sits near the overlap bound; a degraded-link run collapses toward the
    link term). Windows are re-run (bounded) when the link probe reads
    below HEALTHY_LINK_MBPS, and `link_degraded` is flagged when even the
    median probe is below it — so a 64%-of-staged number like BENCH_r04's
    carries its own explanation.

    device_cache=True measures the HBM-resident epoch replay instead
    (train/device_cache.py): one untimed build pass stages the corpus,
    then each window is a full on-device epoch — zero input wire traffic,
    link state irrelevant by construction."""
    import jax
    from exp.input_throughput import SHAPES, make_records
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.data.pipeline import PretrainLoader
    from k3m_tpu.tokenization import get_tokenizer
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train import wire as wire_lib
    from k3m_tpu.train.pretrain_loop import PretrainTrainer, device_batch

    base = "/tmp/k3m_input_bench"
    os.makedirs(base, exist_ok=True)
    k3mr = os.path.join(base, f"feat_{n_records}.k3mr")
    ar = os.path.join(base, f"feat_{n_records}.array_record")
    if not os.path.exists(k3mr):
        make_records(k3mr, ar, n_records)
    micro = int(os.environ.get("K3M_BENCH_MICRO", "4"))
    wire = wire or os.environ.get("K3M_WIRE", "int8")
    cfg = K3MConfig().replace(
        dtype="bfloat16", remat=(micro <= 1),
        shared_prefix=bool(int(os.environ.get("K3M_BENCH_SP", "1"))))
    loader = PretrainLoader(k3mr, get_tokenizer(), SHAPES, batch_size=BATCH,
                            shuffle=True, seed=0, drop_last=True)
    sample = next(iter(loader))
    trainer = PretrainTrainer(
        cfg, learning_rate=1e-4, warmup_steps=10, total_steps=1000,
        sample_batch=sample, micro_steps=micro, wire=wire,
        mesh=mesh_lib.make_mesh(n_model=1))
    m = trainer.train_step(sample)     # compile
    jax.device_get(m["loss"])
    # wire payload of one encoded batch (diagnostic, MB) — reproduce the
    # exact _stage casts per mode so the number is what actually ships
    enc = dict(device_batch(sample))
    quantize_target = not os.environ.get("K3M_EXACT_TARGETS")
    if wire == "int8":
        enc = wire_lib.encode_pretrain(enc, quantize_target=quantize_target)
    elif wire == "fp":
        import ml_dtypes
        enc["image_feat"] = np.asarray(enc["image_feat"]).astype(
            ml_dtypes.bfloat16)
        if quantize_target:
            enc["image_target"] = np.asarray(enc["image_target"]).astype(
                np.float16)
    wire_mb = wire_lib.wire_bytes(enc) / 1e6

    cache = None
    if device_cache:
        from k3m_tpu.train.device_cache import DeviceEpochCache
        cache = DeviceEpochCache(loader, trainer._stage)
        m = None
        for batch in cache:            # untimed build pass (pays the wire)
            m = trainer.train_step(batch)
        if m is not None:
            jax.device_get(m["loss"])
        if not cache.cached:
            print("# device-cache bench: corpus did not fit, streaming",
                  file=sys.stderr)

    def run_pass():
        src = iter(cache) if cache is not None else iter(loader)
        it = trainer.prefetch_to_device(src)
        m = trainer.train_step(next(it))   # warm this pass's producer
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            m = trainer.train_step(batch)
            n += BATCH
        jax.device_get(m["loss"])
        return n / (time.perf_counter() - t0)

    # window loop with in-situ link telemetry: probe, pass, probe ... —
    # bounded extra windows on either an implausible rate spread (chip
    # stall) or a degraded link probe, so the published median reflects
    # achievable state while every window stays in the artifact
    measure_link_mbps()   # warm the probe's slice compile at the real size
    rates, links = [], []

    def one_window():
        links.append(round(measure_link_mbps(), 1))
        rates.append(run_pass())

    for _ in range(windows):
        one_window()
    extra = 0
    while extra < 2 and (
            max(rates) > 2.0 * max(min(rates), 1e-9)
            # cached windows never touch the link — degraded probes are
            # context there, not grounds for re-measuring
            or (cache is None
                and sorted(links)[len(links) // 2] < HEALTHY_LINK_MBPS)):
        one_window()
        extra += 1

    out = _spread(rates)
    out["wire"] = wire
    out["wire_mb_per_batch"] = round(wire_mb, 2)
    link_med = sorted(links)[len(links) // 2]
    out["link_mbps"] = {"median": link_med, "min": min(links),
                        "max": max(links), "per_window": links}
    out["link_healthy_mbps"] = HEALTHY_LINK_MBPS
    out["link_degraded"] = link_med < HEALTHY_LINK_MBPS
    if device_cache:
        out["device_cache"] = bool(cache is not None and cache.cached)
    if staged_rate:
        serial = 1.0 / (1.0 / staged_rate + wire_mb / link_med / BATCH)
        overlap = min(staged_rate, BATCH * link_med / wire_mb)
        out["expected_e2e_serial"] = round(serial, 2)
        out["expected_e2e_overlap"] = round(overlap, 2)
    return out


def bench_finetune_e2e(n_pairs: int = 416, windows: int = 3,
                       wire: "str | None" = None) -> "dict | None":
    """Alignment fit()-path rate (pairs/sec): AlignmentLoader (native C++
    pair batches) -> prefetched H2D -> twin-tower train step. The
    least-characterized path of r3 gets a per-round artifact: median of
    `windows` full loader passes (12 measured steps each) with spread.
    Ref boundary: finetune.py:850-984 train loop feeding 29-field pair
    batches to the GPU."""
    import jax
    from exp.finetune_throughput import SHAPES, make_pairs
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.data.pipeline import AlignmentLoader
    from k3m_tpu.tokenization import get_tokenizer
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train.alignment_loop import AlignmentTrainer

    B = 32
    base = "/tmp/k3m_ft_bench"
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"pairs_{n_pairs}.k3mr")
    if not os.path.exists(path):
        make_pairs(path, n_pairs)
    micro = int(os.environ.get("K3M_BENCH_FT_MICRO", "4"))
    wire = wire or os.environ.get("K3M_WIRE", "int8")
    cfg = K3MConfig().replace(dtype="bfloat16", loss_type="ce",
                              remat=(micro == 1))
    loader = AlignmentLoader(path, get_tokenizer(), SHAPES, batch_size=B,
                             shuffle=True, seed=0, drop_last=True)
    sample = next(iter(loader))
    trainer = AlignmentTrainer(cfg, learning_rate=5e-5, warmup_steps=10,
                               total_steps=1000, sample_batch=sample,
                               micro_steps=micro, wire=wire,
                               mesh=mesh_lib.make_mesh(n_model=1))
    loss, _ = trainer.train_step(sample)   # compile
    jax.device_get(loss)

    def run_pass():
        it = trainer.prefetch_to_device(iter(loader))
        lo, _ = trainer.train_step(next(it))   # warm the producer
        jax.device_get(lo)
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            lo, _ = trainer.train_step(batch)
            n += B
        jax.device_get(lo)
        return n / (time.perf_counter() - t0)

    links = []

    def probed_pass():
        links.append(round(measure_link_mbps(), 1))
        return run_pass()

    measure_link_mbps()   # warm the probe's slice compile at the real size
    out = stable_windows(probed_pass, windows=windows)
    out["wire"] = wire
    out["link_mbps"] = {"median": sorted(links)[len(links) // 2],
                        "min": min(links), "max": max(links),
                        "per_window": links}
    return out


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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_data", type=int, default=None,
                    help="data-parallel mesh rows (default: all devices)")
    ap.add_argument("--n_model", type=int, default=1,
                    help="tensor-parallel mesh columns")
    ap.add_argument("--fast", action="store_true",
                    help="headline pretrain number only (skip bit-exact/"
                         "finetune/e2e companions)")
    args = ap.parse_args()

    from k3m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    # First device touch can queue for minutes behind another tenant of
    # the shared pool — make claim-wait visible so a slow bench artifact
    # is attributable (see k3m_tpu/tools/probe.py).
    import jax
    t0 = time.perf_counter()
    _ = jax.devices()
    claim_s = time.perf_counter() - t0
    if claim_s > 30:
        print(f"# TPU pool claim took {claim_s:.0f}s", file=sys.stderr)
    res = bench_jax(n_data=args.n_data, n_model=args.n_model)
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

    # Companion metrics (same JSON line so every BENCH_r{N}.json carries
    # them): bit-exact-to-reference pretrain rate (shared_prefix off — one
    # dropout draw per pass exactly like the reference), finetune pairs/s,
    # and the end-to-end fit() fractions of both training paths. ONE
    # estimator policy: every number is a median of >=3 windows and ships
    # with its {min, max, windows} spread (_spread). Each is best-effort:
    # a failure degrades to null, never kills the bench.
    def _round(d, nd=2):
        return {k: (round(v, nd) if isinstance(v, float) else v)
                for k, v in d.items()}

    extras = {}
    fast = args.fast or bool(int(os.environ.get("K3M_BENCH_FAST", "0")))
    if not fast and args.n_model == 1:
        try:
            extras["bit_exact_value"] = round(
                bench_jax(n_data=args.n_data, shared_prefix=False,
                          windows=3)["value"], 2)
        except Exception as e:
            print(f"# bit-exact bench failed: {e}", file=sys.stderr)
            extras["bit_exact_value"] = None
        try:
            ft = bench_finetune()
            extras["finetune_pairs_per_sec"] = round(ft["median"], 2)
            extras["finetune_spread"] = _round(ft)
        except Exception as e:
            print(f"# finetune bench failed: {e}", file=sys.stderr)
            extras["finetune_pairs_per_sec"] = None
        try:
            e2e = bench_e2e(staged_rate=value)
            extras["e2e_samples_per_sec"] = round(e2e["median"], 2)
            extras["e2e_fraction"] = round(e2e["median"] / value, 3)
            extras["e2e_spread"] = _round(e2e)
        except Exception as e:
            print(f"# e2e bench failed: {e}", file=sys.stderr)
            extras["e2e_samples_per_sec"] = extras["e2e_fraction"] = None
        try:
            e2c = bench_e2e(staged_rate=value, device_cache=True)
            extras["e2e_cached_samples_per_sec"] = round(e2c["median"], 2)
            extras["e2e_cached_fraction"] = round(e2c["median"] / value, 3)
            extras["e2e_cached_spread"] = _round(e2c)
        except Exception as e:
            print(f"# device-cache e2e bench failed: {e}", file=sys.stderr)
            extras["e2e_cached_samples_per_sec"] = None
        try:
            fte = bench_finetune_e2e()
            extras["finetune_e2e_pairs_per_sec"] = round(fte["median"], 2)
            if extras.get("finetune_pairs_per_sec"):
                extras["finetune_e2e_fraction"] = round(
                    fte["median"] / extras["finetune_pairs_per_sec"], 3)
            extras["finetune_e2e_spread"] = _round(fte)
        except Exception as e:
            print(f"# finetune e2e bench failed: {e}", file=sys.stderr)
            extras["finetune_e2e_pairs_per_sec"] = None

    out = {
        "metric": "k3m_pretrain_samples_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "samples/sec/chip",
        # ratio to the torch reference measured on this host's CPU — the
        # only hardware it can run on here. Honest apples-to-apples
        # (V100-class GPU) estimate is ~15-20x; see README Performance.
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "baseline_kind": baseline_kind,
        "spread": _round(res["spread"]),
        "flops_per_step": res["flops_per_step"],
        "mfu": round(res["mfu"], 4) if res["mfu"] else None,
        "mesh": res["mesh"],
        # pool-claim wait before the first device touch — a slow artifact
        # is attributable without the (lost) stderr stream
        "claim_s": round(claim_s, 1),
        # estimator/codec policy so cross-round artifacts aren't silently
        # incomparable (r4 switched the e2e default wire fp -> int8)
        "policy": {
            "estimator": "median of >=3 windows; bounded extra windows on "
                         "stall (max/min>2) or degraded link probe",
            "wire_default": "int8 since r4 (r3 artifacts used fp)",
            "link_probe_mb": 64,
        },
        **extras,
    }
    if res.get("ici_bytes_per_step"):
        out["ici_bytes_per_step"] = res["ici_bytes_per_step"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
