"""Trainer-level loss-trajectory parity vs the torch reference loop.

The promised SURVEY §7 (build-order config 2) artifact, and the one parity
bridge forward/1-step-gradient tests cannot provide: N optimizer steps of
the COMPLETE training composite — real pipeline batches from the bundled
499-sample corpus (masking and negatives as pipeline outputs), the
reference's optimizer grouping (decay vs no-decay,
train_concap_struc.py:352-380), AdamW betas (0.9, 0.98) with bias
correction (:436-441), WarmupLinearSchedule stepped after each update
(:444-448, :588), loss summation (:531-533) — through BOTH

  * the actual torch reference model, driven exactly like
    train_concap_struc.py:466-588, with the optimizer math transcribed
    from pytorch_transformers.optimization.AdamW (the import the
    reference uses, train_concap_struc.py:23), and
  * our PretrainTrainer (jitted step + optax chain, train/optim.py),

from converted-identical init, asserting per-step composite-loss drift
<= 1e-3 over >= 20 steps. This catches optimizer-group / schedule /
loss-plumbing divergences no model-level test can see — writing it found
the b2=0.999-vs-reference-0.98 divergence fixed in train/optim.py (r5).

Determinism bridge: dropout is configured to 0 on both sides (dropout is
the only un-replayable RNG consumer in the step; the reference's LPM
negative draws ARE replayed per batch via _replay_lpm_draws and injected
into our trainer through its INJECT_KEYS seam, pretrain_loop.py).
"""

import random as pyrandom

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402  (harness reuse)
    SEED, TSEED, _replay_lpm_draws, _shim_and_import,
)

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"
B = 4            # pipeline batch size (24 batches from 96 corpus samples)
N_STEPS = 24     # >= 20 optimizer steps (the verdict's bar)
# LR bounds the cross-framework fp32 rounding chaos, not the semantics:
# Adam's early steps are near-sign-descent, so params whose true gradient
# sits at rounding-noise level take full +/-lr steps with the SIGN decided
# by each framework's last-ulp rounding — measured drift at lr=1e-4 peaked
# 3.3e-3 (1.6e-4 relative) with ZERO drift on steps 1-2, i.e. identical
# math, accumulating noise. At 2e-5 the noise term sits well under the
# 1e-3 bar while any semantic bug (e.g. the b2=0.999-vs-0.98 divergence
# this test was built to catch) still overshoots it by >10x.
LR = 2e-5
WARMUP = 3
TOTAL = 30
WEIGHT_DECAY = 0.01
EPS = 1e-8       # reference --adam_epsilon default (train_concap_struc.py:114)
BETAS = (0.9, 0.98)


def _config_dict(vocab_size):
    """Tiny hidden geometry, REAL io dims (vocab 21128, 2048-dim features,
    1601-way targets) so the pipeline's actual outputs flow through; all
    dropout 0 for cross-framework determinism."""
    return dict(
        vocab_size=vocab_size, hidden_size=24, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=48, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64, type_vocab_size=2,
        initializer_range=0.02,
        v_feature_size=2048, v_target_size=1601, v_hidden_size=16,
        v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=16, v_attention_probs_dropout_prob=0.0,
        v_hidden_act="gelu", v_hidden_dropout_prob=0.0,
        v_initializer_range=0.02, bi_hidden_size=16,
        bi_num_attention_heads=4, v_biattention_id=[0, 1],
        t_biattention_id=[2, 3], visual_target=0, fast_mode=False,
        fixed_v_layer=0, fixed_t_layer=0, in_batch_pairs=False,
        fusion_method="mul", dynamic_attention=False, with_coattention=True,
        objective=0, num_negative_image=6, num_negative_pv=4, margin=1.0,
        model="bert", task_specific_tokens=False, visualization=False,
        use_image=True, if_pre_sampling=0,
    )


def _pipeline_batches():
    """96 bundled-corpus samples -> feature records -> PretrainLoader:
    masking, pv quirks and negatives exactly as training sees them.

    A synthetic detector stands in for the RoI extractor (no real images
    ship with the corpus): without regions the pipeline emits zero masked
    regions and the REFERENCE's unguarded masked-img denominator goes
    0/0 -> nan, so the image-loss term would drop out of the trajectory.
    The fixed seeds below give every batch >= 1 masked region (asserted —
    pipeline determinism keeps it stable)."""
    import tempfile

    from k3m_tpu.data.pipeline import PretrainLoader
    from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
    from k3m_tpu.data.preprocess import ShapeSpec
    from k3m_tpu.data.records import write_records
    from k3m_tpu.tokenization import get_tokenizer

    det_rng = np.random.default_rng(11)

    def synth_detector(item):
        n = 6
        x1 = det_rng.uniform(0, 320, n)
        y1 = det_rng.uniform(0, 240, n)
        boxes = np.stack([x1, y1, x1 + det_rng.uniform(16, 320, n),
                          y1 + det_rng.uniform(16, 240, n)], 1)
        cp = det_rng.random((n, 1601)).astype(np.float32)
        return dict(image_h=480, image_w=640, num_boxes=n,
                    boxes=boxes.astype(np.float32),
                    features=det_rng.gamma(
                        2.0, 1.0, (n, 2048)).astype(np.float32),
                    cls_prob=cp / cp.sum(-1, keepdims=True))

    tok = get_tokenizer()
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/traj.k3mr"
        write_records(path, build_feature_records(
            list(parse_raw_tsv(SAMPLE))[:B * N_STEPS],
            extractor=synth_detector, image_dir="synthetic"))
        shapes = ShapeSpec(max_seq_len=24, max_seq_len_pv=48, max_num_pv=6,
                           max_region_len=6)
        # seed 0: every batch draws >= 1 masked region/token/pv (scanned;
        # ~2% of batches at 24 regions would otherwise draw none and hit
        # the reference's 0/0)
        loader = PretrainLoader(path, tok, shapes, batch_size=B,
                                shuffle=True, seed=0)
        batches = [b for _, b in zip(range(N_STEPS), iter(loader))]
    assert len(batches) == N_STEPS
    for i, b in enumerate(batches):
        assert (np.asarray(b["image_label"]) == 1).any(), (
            f"batch {i} has no masked region — the reference's img loss "
            f"would be 0/0; pick different seeds")
    return tok, batches


def _lam(step):
    """WarmupLinearSchedule multiplier at optimizer-update index `step`
    (pytorch_transformers WarmupLinearSchedule: LambdaLR applies lambda(0)
    to the FIRST update — the scheduler is stepped after optimizer.step,
    train_concap_struc.py:588)."""
    if step < WARMUP:
        return step / WARMUP
    return max((TOTAL - step) / (TOTAL - WARMUP), 0.0)


class RefAdamW:
    """pytorch_transformers.optimization.AdamW, transcribed: eps added to
    sqrt(v) BEFORE the bias-correction scaling, decoupled weight decay
    applied AFTER the Adam update using the group's scheduled lr (not the
    bias-corrected step size). Params whose .grad is None are skipped
    entirely — including their weight decay — exactly like the original."""

    def __init__(self, groups):
        self.groups = groups        # [{params, weight_decay, base_lr}]
        self.state = {}

    @torch.no_grad()
    def step(self, lam):
        b1, b2 = BETAS
        for group in self.groups:
            lr = group["base_lr"] * lam
            for p in group["params"]:
                if p.grad is None:
                    continue
                st = self.state.setdefault(
                    id(p), dict(step=0, m=torch.zeros_like(p),
                                v=torch.zeros_like(p)))
                st["step"] += 1
                st["m"].mul_(b1).add_(p.grad, alpha=1 - b1)
                st["v"].mul_(b2).addcmul_(p.grad, p.grad, value=1 - b2)
                denom = st["v"].sqrt().add_(EPS)
                bc1 = 1 - b1 ** st["step"]
                bc2 = 1 - b2 ** st["step"]
                step_size = lr * (bc2 ** 0.5) / bc1
                p.addcdiv_(st["m"], denom, value=-step_size)
                if group["weight_decay"] > 0:
                    p.add_(p, alpha=-lr * group["weight_decay"])

    def zero_grad(self):
        for group in self.groups:
            for p in group["params"]:
                p.grad = None


def _torch_trajectory(ref, cfg_dict, batches):
    torch.manual_seed(0)
    model_t = ref.BertForMultiModalPreTraining_tri_stru(
        ref.BertConfig.from_dict(cfg_dict))
    model_t.train()
    # reference grouping, no-pretrained path (train_concap_struc.py:352-367)
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
    named = list(model_t.named_parameters())
    opt = RefAdamW([
        {"params": [p for n, p in named
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": WEIGHT_DECAY, "base_lr": LR},
        {"params": [p for n, p in named if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0, "base_lr": LR},
    ])
    sd0 = {k: v.detach().numpy().copy() for k, v in model_t.state_dict().items()}
    losses = []
    from k3m_tpu.train.pretrain_loop import device_batch
    for i, nb in enumerate(batches):
        tt = {k: torch.tensor(np.asarray(v, np.int64)
                              if np.issubdtype(np.asarray(v).dtype, np.integer)
                              else np.asarray(v))
              for k, v in device_batch(nb).items()}
        opt.zero_grad()
        pyrandom.seed(SEED)          # LPM draws replayed on our side
        torch.manual_seed(TSEED)
        out = model_t(
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
        loss = out[0] + out[1] * 1.0 + out[3] + out[9]   # ref :531-533
        loss.backward()
        opt.step(_lam(i))            # scheduler.step() after update (:588)
        losses.append(float(loss.detach()))
    return sd0, losses


@pytest.mark.slow
def test_trainer_trajectory_parity():
    ref = _shim_and_import()
    tok, batches = _pipeline_batches()
    cfg_dict = _config_dict(len(tok))

    sd0, losses_t = _torch_trajectory(ref, cfg_dict, batches)

    import jax

    from k3m_tpu.config import K3MConfig
    from k3m_tpu.train.convert import (merge_flat_into_params,
                                       reference_to_flat)
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    from tests.conftest import single_mesh

    cfg = K3MConfig.from_dict(cfg_dict)
    trainer = PretrainTrainer(
        cfg, learning_rate=LR, warmup_steps=WARMUP, total_steps=TOTAL,
        weight_decay=WEIGHT_DECAY, adam_eps=EPS, micro_steps=1,
        wire="exact", mesh=single_mesh(), sample_batch=batches[0])
    params0 = jax.device_get(trainer.state.params)
    params0, _, _ = merge_flat_into_params(params0, reference_to_flat(sd0))
    trainer.load_state(trainer.state.replace(params=params0))

    losses_j = []
    for nb in batches:
        ent, val = _replay_lpm_draws(np.asarray(nb["index_p"]),
                                     cfg_dict["num_negative_pv"])
        from k3m_tpu.train.pretrain_loop import device_batch
        jb = {k: (np.asarray(v, np.int32)
                  if np.issubdtype(np.asarray(v).dtype, np.integer)
                  else np.asarray(v))
              for k, v in device_batch(nb).items()}
        jb["neg_entity_idx"] = np.asarray(ent)
        jb["neg_value_idx"] = np.asarray(val)
        m = trainer.train_step(jb)
        losses_j.append(float(jax.device_get(m["loss"])))

    drift = [abs(a - b) for a, b in zip(losses_j, losses_t)]
    print("torch:", [round(x, 4) for x in losses_t])
    print("jax:  ", [round(x, 4) for x in losses_j])
    print("drift:", [round(x, 5) for x in drift])
    assert len(drift) >= 20
    assert max(drift) <= 1e-3, (
        f"trajectory diverged: max drift {max(drift):.2e} at step "
        f"{int(np.argmax(drift))}")
    # the trajectory genuinely trained (schedule past warmup, loss moved):
    # a frozen-lr or zero-lr bug would pass a drift-only check
    assert losses_t[0] - losses_t[-1] > 0.01, (losses_t[0], losses_t[-1])
