#!/usr/bin/env python
"""K3M pretraining CLI — flag-compatible with the reference
`train_concap_struc.py` (reference :68-138 for the flag surface; behaviour
:141-709), running on the TPU-native k3m_tpu stack.

Data: `--file_name` points at a K3MR record file inside `--data_dir`
(produced by `python -m k3m_tpu.data.prepare`); if a raw TSV with the same
stem exists instead, it is converted automatically. Validation uses the
`*valid*` sibling when present.

Unsupported/no-op reference flags (documented, accepted for compatibility):
  --fp16/--apex_fast/--loss_scale  -> use --bf16 (TPU native mixed precision)
  --local_rank/--distributed       -> scale-out is GSPMD via jax mesh; use
                                      --n_model for tensor parallelism
  --on_memory, --cache             -> the mmap record store already is
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

logging.basicConfig(
    format="%(asctime)s %(levelname)-4s [%(filename)s:%(lineno)s]  %(message)s",
    datefmt="%Y/%m/%d %H:%M:%S", level=logging.INFO)
logger = logging.getLogger(__name__)


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--file_name", required=True, type=str)
    parser.add_argument("--model_name", default="bert-base-chinese", type=str)
    parser.add_argument("--pretrained_model_path", default=None, type=str)
    parser.add_argument("--config_file", default="bert_base_6layer_6conect.json", type=str)
    parser.add_argument("--pretrained_model_weights", default="bert-base-uncased_weight_name.json", type=str)
    parser.add_argument("--file_checkpoint", default="", type=str)
    parser.add_argument("--file_state_dict", default="", type=str)
    parser.add_argument("--strict_load", action="store_true",
                        help="fail loudly if any tensor in --pretrained_model_path is not consumed (real-asset first-run guard)")
    parser.add_argument("--fix_reference_bugs", action="store_true",
                   help="fix the replicated reference bugs (inverted LPM margin, cosine-probs, stale zero-pv state, roberta position ids) instead of bit-matching them")
    parser.add_argument("--log_steps", default=1, type=int)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--cache", default=5000, type=int)
    parser.add_argument("--do_train", action="store_true")
    parser.add_argument("--do_eval", action="store_true")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--on_memory", action="store_true")
    parser.add_argument("--local_rank", default=-1, type=int)
    parser.add_argument("--train_batch_size", default=8, type=int)
    parser.add_argument("--eval_batch_size", default=8, type=int)
    parser.add_argument("--learning_rate", default=1e-4, type=float)
    parser.add_argument("--num_train_epochs", default=6.0, type=float)
    parser.add_argument("--start_epoch", default=0, type=float)
    parser.add_argument("--no_cuda", action="store_true")
    parser.add_argument("--num_workers", default=2, type=int)
    parser.add_argument("--if_pre_sampling", default=1, type=int)
    parser.add_argument("--with_coattention", action="store_true")
    parser.add_argument("--objective", default=2, type=int)
    parser.add_argument("--freeze", default=-1, type=int)
    parser.add_argument("--warmup_proportion", default=0.1, type=float)
    parser.add_argument("--gradient_accumulation_steps", default=1, type=int)
    parser.add_argument("--micro_steps", default=1, type=int,
                        help="in-step microbatches (grad accumulation inside "
                             "one jitted step)")
    parser.add_argument("--skip_nonfinite", action="store_true",
                        help="skip (don't apply) any update whose grads "
                             "contain non-finite values instead of "
                             "poisoning params")
    parser.add_argument("--device_cache", action="store_true",
                   help="keep each epoch's staged batches resident in HBM and iterate on-device from epoch 2 (static-masking semantics; zero input wire traffic; auto-falls back to streaming if the epoch exceeds the HBM budget — train/device_cache.py)")
    parser.add_argument("--wire", default=None,
                   choices=["fp", "int8", "exact"],
                   help="H2D wire codec for the big image tensors (train/wire.py): fp = bf16/fp16 casts, int8 = per-row int8 feat + uint8 soft labels with on-device dequant, exact = fp32. Default: K3M_WIRE env, else fp")
    parser.add_argument("--no_remat", action="store_true",
                        help="disable per-layer rematerialization")
    parser.add_argument("--adam_epsilon", default=1e-8, type=float)
    parser.add_argument("--loss_img_weight", default=1, type=float)
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--apex_fast", action="store_true")
    parser.add_argument("--loss_scale", default=0, type=float)
    parser.add_argument("--do_lower_case", default=True, type=bool)
    parser.add_argument("--max_seq_length", default=36, type=int)
    parser.add_argument("--max_seq_length_pv", default=128, type=int)
    parser.add_argument("--max_num_pv", default=20, type=int)
    parser.add_argument("--max_region_length", default=36, type=int)
    parser.add_argument("--dynamic_attention", action="store_true")
    parser.add_argument("--visual_target", default=0, type=int)
    parser.add_argument("--num_negative", default=255, type=int)
    # --- TPU-native extensions ---
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument("--n_model", default=1, type=int,
                        help="tensor-parallel mesh axis size")
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--shared_prefix", action="store_true",
                        help="compute the cross-free text-layer prefix once "
                             "per stream instead of once per pass (see "
                             "K3MConfig.shared_prefix)")
    parser.add_argument("--vocab_file", default=None, type=str)
    return parser


def resolve_config(args):
    from k3m_tpu.config import K3MConfig
    # config read from output_dir first (reference quirk, :184), then package
    candidates = [os.path.join(args.output_dir, args.config_file),
                  os.path.join(args.data_dir, args.config_file),
                  os.path.join(os.path.dirname(__file__), "k3m_tpu", "configs",
                               args.config_file),
                  args.config_file]
    for c in candidates:
        if os.path.exists(c):
            config = K3MConfig.from_json_file(c)
            break
    else:
        raise FileNotFoundError(f"config {args.config_file} not found")
    # flag overrides (reference :198-211, pretrain.py:1351-1372)
    overrides = dict(
        fix_reference_bugs=args.fix_reference_bugs,
        if_pre_sampling=args.if_pre_sampling,
        with_coattention=True,  # reference always trains with co-attention
        objective=args.objective,
        dynamic_attention=args.dynamic_attention,
        visual_target=args.visual_target,
        num_negative_image=args.num_negative,
        dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.use_pallas,
        shared_prefix=args.shared_prefix,
    )
    if args.visual_target != 0:
        overrides["v_target_size"] = 2048
    if "roberta" in (args.model_name or ""):
        overrides["model"] = "roberta"
    if args.freeze > -1:
        overrides["fixed_t_layer"] = args.freeze
    return config.replace(**overrides)


def find_records(args, split: str) -> str:
    from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
    from k3m_tpu.data.records import write_records
    name = args.file_name if split == "train" else args.file_name.replace(
        "train", "valid")
    path = os.path.join(args.data_dir, name)
    if path.endswith(".k3mr") and os.path.exists(path):
        return path
    if os.path.exists(path + ".k3mr"):
        return path + ".k3mr"
    if os.path.exists(path):  # raw TSV -> convert once
        out = path + ".k3mr"
        n = write_records(out, build_feature_records(parse_raw_tsv(path)))
        logger.info("converted %s -> %s (%d records)", path, out, n)
        return out
    raise FileNotFoundError(path)


def main(argv=None):
    from k3m_tpu.utils.jax_setup import maybe_init_distributed, setup_jax
    setup_jax()
    proc_id, n_procs = maybe_init_distributed()
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from k3m_tpu.data.pipeline import PretrainLoader
    from k3m_tpu.data.preprocess import ShapeSpec
    from k3m_tpu.tokenization import get_tokenizer
    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    config = resolve_config(args)
    with open(os.path.join(args.output_dir, "hyperparamter.txt"), "w") as f:
        # ref :192-196 prints args, a blank line, then the model config
        json.dump(vars(args), f, indent=2)
        f.write("\n\n")
        json.dump(config.to_dict(), f, indent=2)

    tokenizer = get_tokenizer(args.vocab_file, config.vocab_size)
    shapes = ShapeSpec(max_seq_len=args.max_seq_length,
                       max_seq_len_pv=args.max_seq_length_pv,
                       max_num_pv=args.max_num_pv,
                       max_region_len=args.max_region_length,
                       v_feature_size=config.v_feature_size,
                       v_target_size=config.v_target_size)
    if args.train_batch_size % n_procs:
        raise ValueError(f"--train_batch_size {args.train_batch_size} not "
                         f"divisible by process count {n_procs}")
    train_loader = PretrainLoader(
        find_records(args, "train"), tokenizer, shapes,
        batch_size=args.train_batch_size // n_procs, shuffle=True,
        seed=args.seed, visual_target=args.visual_target,
        num_shards=n_procs, shard_index=proc_id)
    try:
        val_loader = PretrainLoader(
            find_records(args, "valid"), tokenizer, shapes,
            batch_size=max(args.eval_batch_size // n_procs, 1), shuffle=False,
            seed=args.seed, visual_target=args.visual_target,
            num_shards=n_procs, shard_index=proc_id)
    except FileNotFoundError:
        val_loader = None

    steps_per_epoch = max(len(train_loader) // args.gradient_accumulation_steps, 1)
    total_steps = int(steps_per_epoch * args.num_train_epochs)
    sample_batch = next(iter(train_loader))

    pretrained_paths = None
    if args.pretrained_model_path:
        from k3m_tpu.train.convert import load_pretrained_bert_paths
        pretrained_paths = load_pretrained_bert_paths(args.pretrained_model_path)

    if args.no_remat:
        config = config.replace(remat=False)

    trainer = PretrainTrainer(
        config,
        learning_rate=args.learning_rate,
        warmup_steps=int(args.warmup_proportion * total_steps),
        total_steps=total_steps,
        grad_accum_steps=args.gradient_accumulation_steps,
        micro_steps=args.micro_steps,
        adam_eps=args.adam_epsilon,
        loss_img_weight=args.loss_img_weight,
        objective=args.objective,
        seed=args.seed,
        n_model=args.n_model,
        sample_batch=sample_batch,
        pretrained_paths=pretrained_paths,
        wire=args.wire,
        device_cache=args.device_cache or None,
        skip_nonfinite=args.skip_nonfinite,
    )
    if args.pretrained_model_path:
        from k3m_tpu.train.convert import load_pretrained_into_params
        trainer.state = trainer.state.replace(params=load_pretrained_into_params(
            trainer.state.params, args.pretrained_model_path,
            strict=args.strict_load,
            # HF checkpoints carry an NSP head sized for plain BERT; the
            # K3M alignment head is bi_hidden-sized and reinitializes
            allowed_unconsumed=(r"cls\.seq_relationship\.",)))
    if args.file_state_dict:
        from k3m_tpu.train.state import load_params_msgpack
        trainer.state = trainer.state.replace(params=load_params_msgpack(
            trainer.state.params, args.file_state_dict))
    start_epoch, start_step = int(args.start_epoch), 0
    if args.file_checkpoint:
        # full-state resume (model+optimizer+step), reference :263-297;
        # mid-epoch step checkpoints (save_steps / preemption) resume exactly
        import jax
        from k3m_tpu.train.state import CheckpointManager
        cm = CheckpointManager(args.file_checkpoint)
        restored = cm.restore(jax.device_get(trainer.state))
        if restored is not None:
            trainer.load_state(restored)
            meta = cm.latest() or {}
            if "in_epoch_step" in meta:
                start_epoch = int(meta["epoch"])
                start_step = int(meta["in_epoch_step"])
            else:
                start_epoch = int(meta.get("epoch", -1)) + 1
            logger.info("resumed from %s at epoch %d step %d",
                        args.file_checkpoint, start_epoch, start_step)

    if args.do_train:
        history = trainer.fit(
            train_loader, val_loader if args.do_eval else None,
            num_epochs=int(args.num_train_epochs),
            start_epoch=start_epoch, start_step=start_step,
            log_steps=args.log_steps,
            checkpoint_dir=args.output_dir)
        logger.info("training history: %s", history)
    elif args.do_eval and val_loader is not None:
        import numpy as np
        import jax
        vals = [jax.device_get(trainer.eval_step(b)) for b in val_loader]
        logger.info("eval: %s", {k: float(np.mean([v[k] for v in vals]))
                                 for k in vals[0]})


if __name__ == "__main__":
    main()
