#!/usr/bin/env python
"""K3M pretraining CLI — flag surface of the reference's modernized driver
(`pretrain.py`, CCKS-2022 generation; flags :783-870, behaviour :143-781).

Differences from the reference by design: mp.spawn+gloo DDP is replaced by a
single GSPMD program over a jax mesh (use --n_model for tensor parallelism),
torch.cuda.amp by bf16 (--fp16 maps to bf16 on TPU). `--file_name` is a
template with a `{}` placeholder for the split (e.g. `{}_feat.k3mr`),
matching run_pretrain.sh usage.
"""

from __future__ import annotations

import argparse
import logging
import os

logging.basicConfig(
    format="%(asctime)s %(levelname)-4s [%(filename)s:%(lineno)s]  %(message)s",
    datefmt="%Y/%m/%d %H:%M:%S", level=logging.INFO)
logger = logging.getLogger(__name__)


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True, type=str)
    p.add_argument("--output_dir", required=True, type=str)
    p.add_argument("--file_name", required=True, type=str,
                   help="template, e.g. '{}_feat.k3mr'")
    p.add_argument("--model_name", default="hfl/chinese-roberta-wwm-ext", type=str)
    p.add_argument("--pretrained_model_path", default=None, type=str)
    p.add_argument("--config_file", default="k3m_roberta_base.json", type=str)
    p.add_argument("--pretrained_model_weights", default=None, type=str)
    p.add_argument("--file_checkpoint", default="", type=str,
                   help="checkpoint dir to resume full state from (epoch or "
                        "mid-epoch step checkpoints; typically --output_dir)")
    p.add_argument("--file_state_dict", default="", type=str)
    p.add_argument("--strict_load", action="store_true",
                   help="fail loudly if any tensor in --pretrained_model_path is not consumed (real-asset first-run guard)")
    p.add_argument("--fix_reference_bugs", action="store_true",
                   help="fix the replicated reference bugs (inverted LPM margin, cosine-probs, stale zero-pv state, roberta position ids) instead of bit-matching them")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip (don't apply) any update whose grads contain "
                        "non-finite values instead of poisoning params")
    p.add_argument("--save_steps", default=0, type=int,
                   help="additionally checkpoint full state every N batches "
                        "(0 = per-epoch only, the reference behavior)")
    p.add_argument("--log_steps", default=10, type=int)
    p.add_argument("--cache", default=5000, type=int)
    p.add_argument("--use_image", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--no_cuda", action="store_true")
    p.add_argument("--train_batch_size", default=96, type=int)
    p.add_argument("--eval_batch_size", default=96, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--num_train_epochs", default=5.0, type=float)
    p.add_argument("--start_epoch", default=0, type=float)
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--data_backend", default="auto",
                   choices=["auto", "k3mr", "grain"],
                   help="input pipeline: k3mr = threaded single-process "
                        "reader (fastest on few-core hosts; measured 238 "
                        "samples/s vs the step's 154 on a 1-core v5e host); "
                        "grain = multiprocess ArrayRecord loader "
                        "(byte-identical batches, scales with host cores); "
                        "auto = grain for .array_record train files with "
                        "num_workers > 0, else k3mr")
    p.add_argument("--if_pre_sampling", default=1, type=int)
    p.add_argument("--with_coattention", action="store_true")
    p.add_argument("--objective", default=2, type=int)
    p.add_argument("--freeze", default=-1, type=int)
    p.add_argument("--on_memory", action="store_true")
    p.add_argument("--warmup_proportion", default=0.1, type=float)
    p.add_argument("--gradient_accumulation_steps", default=1, type=int)
    p.add_argument("--micro_steps", default=1, type=int,
                   help="in-step microbatches (lax.scan grad accumulation "
                        "inside one jitted step; pair with --no_remat for "
                        "peak throughput)")
    p.add_argument("--device_cache", action="store_true",
                   help="keep each epoch's staged batches resident in HBM and iterate on-device from epoch 2 (static-masking semantics; zero input wire traffic; auto-falls back to streaming if the epoch exceeds the HBM budget — train/device_cache.py)")
    p.add_argument("--wire", default=None,
                   choices=["fp", "int8", "exact"],
                   help="H2D wire codec for the big image tensors (train/wire.py): fp = bf16/fp16 casts, int8 = per-row int8 feat + uint8 soft labels with on-device dequant, exact = fp32. Default: K3M_WIRE env, else fp")
    p.add_argument("--no_remat", action="store_true",
                   help="disable per-layer rematerialization (needs "
                        "--micro_steps>1 to fit batch 96 in 16GB HBM)")
    p.add_argument("--adam_epsilon", default=1e-8, type=float)
    p.add_argument("--loss_img_weight", default=1.0, type=float)
    p.add_argument("--fp16", action="store_true", help="maps to bf16 on TPU")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (same effect as --fp16 here)")
    p.add_argument("--apex_fast", action="store_true")
    p.add_argument("--loss_scale", default=0, type=float)
    p.add_argument("--do_lower_case", default=True, type=bool)
    p.add_argument("--max_seq_length", default=50, type=int)
    p.add_argument("--max_seq_length_pv", default=256, type=int)
    p.add_argument("--max_num_pv", default=30, type=int)
    p.add_argument("--num_negative_pv", default=4, type=int)
    p.add_argument("--margin", default=1.0, type=float)
    p.add_argument("--max_region_length", default=36, type=int)
    p.add_argument("--dynamic_attention", action="store_true")
    p.add_argument("--visual_target", default=0, type=int)
    p.add_argument("--num_negative_image", default=255, type=int)
    # TPU-native extensions
    p.add_argument("--n_model", default=1, type=int)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--shared_prefix", action="store_true",
                   help="compute the cross-free text-layer prefix once per "
                        "stream instead of once per pass (see "
                        "K3MConfig.shared_prefix)")
    p.add_argument("--vocab_file", default=None, type=str)
    return p


def main(argv=None):
    from k3m_tpu.utils.jax_setup import maybe_init_distributed, setup_jax
    setup_jax()
    # multi-host: one process per host over a TPU pod slice
    # (replaces mp.spawn + gloo init_process_group, ref pretrain.py:59-75)
    proc_id, n_procs = maybe_init_distributed()
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from k3m_tpu.config import K3MConfig
    from k3m_tpu.data.pipeline import PretrainLoader
    from k3m_tpu.data.preprocess import ShapeSpec
    from k3m_tpu.tokenization import get_tokenizer
    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    candidates = [os.path.join(args.output_dir, args.config_file),
                  os.path.join(args.data_dir, args.config_file),
                  os.path.join(os.path.dirname(__file__), "k3m_tpu", "configs",
                               args.config_file), args.config_file]
    config = next(K3MConfig.from_json_file(c) for c in candidates
                  if os.path.exists(c))
    # flag overrides (ref pretrain.py:1351-1372)
    overrides = dict(
        if_pre_sampling=args.if_pre_sampling, objective=args.objective,
        dynamic_attention=args.dynamic_attention,
        visual_target=args.visual_target,
        num_negative_image=args.num_negative_image,
        num_negative_pv=args.num_negative_pv, margin=args.margin,
        use_image=args.use_image,
        dtype="bfloat16" if (args.fp16 or args.bf16) else "float32",
        use_pallas=args.use_pallas, shared_prefix=args.shared_prefix,
        fix_reference_bugs=args.fix_reference_bugs,
        model="roberta" if "roberta" in (args.model_name or "") else "bert")
    if args.visual_target != 0:
        overrides["v_target_size"] = config.v_feature_size
    if args.freeze > -1:
        overrides["fixed_t_layer"] = args.freeze
    config = config.replace(**overrides)

    tokenizer = get_tokenizer(args.vocab_file, config.vocab_size)
    shapes = ShapeSpec(max_seq_len=args.max_seq_length,
                       max_seq_len_pv=args.max_seq_length_pv,
                       max_num_pv=args.max_num_pv,
                       max_region_len=args.max_region_length,
                       v_feature_size=config.v_feature_size,
                       v_target_size=config.v_target_size)

    def path(split):
        name = (args.file_name.format(split) if "{}" in args.file_name
                else args.file_name)
        return os.path.join(args.data_dir, name)

    # per-host batch split + disjoint data shard (the reference divides
    # batch/workers/cache per DDP rank, pretrain.py:150-155)
    if args.train_batch_size % n_procs:
        raise ValueError(f"--train_batch_size {args.train_batch_size} not "
                         f"divisible by process count {n_procs}")
    local_bs = args.train_batch_size // n_procs
    backend = args.data_backend
    if backend == "auto":
        backend = ("grain" if path("train").endswith(".array_record")
                   and args.num_workers > 0 else "k3mr")
    if backend == "grain":
        # multi-host sharding comes from Grain's ShardByJaxProcess; batches
        # are byte-identical to PretrainLoader's (golden-tested)
        from k3m_tpu.data.grain_pipeline import GrainPretrainLoader
        train_loader = GrainPretrainLoader(
            path("train"), tokenizer, shapes, batch_size=local_bs,
            shuffle=True, seed=args.seed, visual_target=args.visual_target,
            num_workers=args.num_workers)
    else:
        train_loader = PretrainLoader(path("train"), tokenizer, shapes,
                                      batch_size=local_bs,
                                      shuffle=True, seed=args.seed,
                                      visual_target=args.visual_target,
                                      num_shards=n_procs,
                                      shard_index=proc_id)
    val_loader = None
    if args.do_eval and os.path.exists(path("valid")):
        val_loader = PretrainLoader(path("valid"), tokenizer, shapes,
                                    batch_size=max(
                                        args.eval_batch_size // n_procs, 1),
                                    shuffle=False, seed=args.seed,
                                    visual_target=args.visual_target,
                                    num_shards=n_procs, shard_index=proc_id)

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
        config, learning_rate=args.learning_rate,
        warmup_steps=int(args.warmup_proportion * total_steps),
        total_steps=total_steps,
        grad_accum_steps=args.gradient_accumulation_steps,
        micro_steps=args.micro_steps,
        loss_img_weight=args.loss_img_weight, objective=args.objective,
        adam_eps=args.adam_epsilon,
        seed=args.seed, n_model=args.n_model, sample_batch=sample_batch,
        pretrained_paths=pretrained_paths,
        wire=args.wire,
        device_cache=args.device_cache or None,
        skip_nonfinite=args.skip_nonfinite)

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
        # full-state resume (model+optimizer+step; epoch or mid-epoch
        # preemption/save_steps checkpoint) — reference pretrain.py resumes
        # via the same flag (its :286-297 equivalent)
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

    history = trainer.fit(train_loader, val_loader,
                          num_epochs=int(args.num_train_epochs),
                          start_epoch=start_epoch, start_step=start_step,
                          log_steps=args.log_steps,
                          save_steps=args.save_steps or None,
                          checkpoint_dir=args.output_dir)
    logger.info("training history: %s", history)


if __name__ == "__main__":
    main()
