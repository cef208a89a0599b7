#!/usr/bin/env python
"""K3M item-alignment finetune / eval / predict CLI — flag-compatible with
the reference `finetune.py` (flags :1223-1290; behaviour :637-1212), running
on the TPU-native k3m_tpu stack.

Data: K3MR pair record files produced by
`python -m k3m_tpu.data.prepare --pairs pairs.jsonl --features feats.k3mr`.
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
    p.add_argument("--file_train", default="train_item_alignment.k3mr", type=str)
    p.add_argument("--file_valid", default="valid_item_alignment.k3mr", type=str)
    p.add_argument("--file_test", default="test_item_alignment.k3mr", type=str)
    p.add_argument("--model_name", default="bert-base-chinese", type=str)
    p.add_argument("--config_file", default="bert_base_6layer_6conect.json", type=str)
    p.add_argument("--pretrained_model_path", default=None, type=str)
    p.add_argument("--file_state_dict", default="", type=str)
    p.add_argument("--strict_load", action="store_true",
                   help="fail loudly if any tensor in --pretrained_model_path is not consumed (real-asset first-run guard)")
    p.add_argument("--fix_reference_bugs", action="store_true",
                   help="fix the replicated reference bugs (inverted LPM margin, cosine-probs, stale zero-pv state, roberta position ids) instead of bit-matching them")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip (don't apply) any update whose grads contain "
                        "non-finite values instead of poisoning params")
    p.add_argument("--micro_steps", default=1, type=int,
                   help="in-step microbatches (grad accumulation inside one "
                        "jitted step; combine with --no_remat for the fast "
                        "configuration — see README finetune perf)")
    p.add_argument("--device_cache", action="store_true",
                   help="keep each epoch's staged batches resident in HBM and iterate on-device from epoch 2 (static-masking semantics; zero input wire traffic; auto-falls back to streaming if the epoch exceeds the HBM budget — train/device_cache.py)")
    p.add_argument("--wire", default=None,
                   choices=["fp", "int8", "exact"],
                   help="H2D wire codec for the big image tensors (train/wire.py): fp = bf16/fp16 casts, int8 = per-row int8 feat + uint8 soft labels with on-device dequant, exact = fp32. Default: K3M_WIRE env, else fp")
    p.add_argument("--no_remat", action="store_true",
                   help="disable per-layer rematerialization")
    p.add_argument("--log_steps", default=10, type=int)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_pred", action="store_true")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--train_batch_size", default=32, type=int)
    p.add_argument("--eval_batch_size", default=32, type=int)
    p.add_argument("--learning_rate", default=5e-5, type=float)
    p.add_argument("--num_train_epochs", default=10.0, type=float)
    p.add_argument("--warmup_proportion", default=0.3, type=float)
    p.add_argument("--gradient_accumulation_steps", default=1, type=int)
    p.add_argument("--if_pre_sampling", default=1, type=int)
    p.add_argument("--objective", default=2, type=int)
    # default "ce" = the reference CLI's default (finetune.py:1267); the
    # model-config default stays "inner" (vilbert_k3m.py BertConfig), but
    # every reference run through this entry point trains with CE.
    p.add_argument("--loss_type", default="ce", type=str,
                   choices=["inner", "cosine", "ce"])
    p.add_argument("--threshold", default=0.5, type=float)
    p.add_argument("--max_seq_length", default=50, type=int)
    p.add_argument("--max_seq_length_pv", default=256, type=int)
    p.add_argument("--max_num_pv", default=30, type=int)
    p.add_argument("--max_region_length", default=36, type=int)
    p.add_argument("--dynamic_attention", action="store_true")
    p.add_argument("--visual_target", default=0, type=int)
    p.add_argument("--fp16", action="store_true")
    # remaining reference flags (finetune.py:1223-1290)
    p.add_argument("--file_name", default=None, type=str,
                   help="record-name pattern, e.g. '{}_item_alignment.k3mr'"
                        " — overrides --file_train/valid/test (ref :223,240)")
    p.add_argument("--adam_epsilon", default=1e-8, type=float)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--cache", default=5000, type=int,
                   help="loader prefetch depth (ref per-rank cache :131)")
    p.add_argument("--num_workers", default=2, type=int,
                   help="accepted for CLI parity; the K3MR loader uses"
                        " threaded prefetch over mmap instead of workers")
    p.add_argument("--do_lower_case", default=True, type=bool)
    p.add_argument("--use_image", action="store_true",
                   help="enable the image stream (ref finetune.py:1247)")
    p.add_argument("--with_coattention", action="store_true",
                   help="enable co-attention (ref finetune.py:1257)")
    p.add_argument("--num_negative_image", default=128, type=int)
    p.add_argument("--loss_img_weight", default=1.0, type=float)
    p.add_argument("--loss_scale", default=0, type=float,
                   help="accepted for parity; bf16 on TPU needs no scaling")
    p.add_argument("--no_cuda", action="store_true",
                   help="accepted for parity; device selection is jax's")
    p.add_argument("--freeze", default=-1, type=int,
                   help="accepted for parity (dead in the reference too,"
                        " finetune.py:141-148)")
    p.add_argument("--file_checkpoint", default="", type=str,
                   help="full-train-state checkpoint to resume from")
    p.add_argument("--pretrained_model_weights", default=None, type=str,
                   help="accepted for parity (dead in the reference,"
                        " finetune.py:140)")
    # TPU-native extensions
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--n_model", default=1, type=int)
    p.add_argument("--shared_prefix", action="store_true",
                   help="compute the cross-free text-layer prefix once per "
                        "stream instead of once per pass (see "
                        "K3MConfig.shared_prefix)")
    p.add_argument("--vocab_file", default=None, type=str)
    return p


def main(argv=None):
    from k3m_tpu.utils.jax_setup import maybe_init_distributed, setup_jax
    setup_jax()
    proc_id, n_procs = maybe_init_distributed()
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from k3m_tpu.config import K3MConfig
    from k3m_tpu.data.pipeline import AlignmentLoader
    from k3m_tpu.data.preprocess import ShapeSpec
    from k3m_tpu.tokenization import get_tokenizer
    from k3m_tpu.train.alignment_loop import AlignmentTrainer

    candidates = [os.path.join(args.output_dir, args.config_file),
                  os.path.join(os.path.dirname(__file__), "k3m_tpu", "configs",
                               args.config_file), args.config_file]
    config = next(K3MConfig.from_json_file(c) for c in candidates
                  if os.path.exists(c))
    config = config.replace(
        fix_reference_bugs=args.fix_reference_bugs,
        if_pre_sampling=args.if_pre_sampling, loss_type=args.loss_type,
        dynamic_attention=args.dynamic_attention,
        visual_target=args.visual_target,
        use_image=args.use_image, with_coattention=args.with_coattention,
        num_negative_image=args.num_negative_image,
        dtype="bfloat16" if args.bf16 else "float32",
        remat=not args.no_remat, shared_prefix=args.shared_prefix,
        model="roberta" if "roberta" in (args.model_name or "") else "bert")

    if args.file_name:  # split pattern (ref finetune.py:223,240)
        args.file_train = args.file_name.format("train")
        args.file_valid = args.file_name.format("valid")
        args.file_test = args.file_name.format("test")

    tokenizer = get_tokenizer(args.vocab_file, config.vocab_size)
    shapes = ShapeSpec(max_seq_len=args.max_seq_length,
                       max_seq_len_pv=args.max_seq_length_pv,
                       max_num_pv=args.max_num_pv,
                       max_region_len=args.max_region_length,
                       v_feature_size=config.v_feature_size,
                       v_target_size=config.v_target_size)

    def loader(name, batch_size, shuffle, drop_last=True):
        path = os.path.join(args.data_dir, name)
        if not os.path.exists(path):
            return None
        # per-host batch split + disjoint shard (ref worker split :120-155)
        batch_size = max(batch_size // n_procs, 1)
        return AlignmentLoader(path, tokenizer, shapes, batch_size=batch_size,
                               shuffle=shuffle, seed=args.seed,
                               visual_target=args.visual_target,
                               drop_last=drop_last,
                               num_shards=n_procs, shard_index=proc_id,
                               prefetch=min(16, max(2, args.cache // max(batch_size, 1))))

    train_loader = loader(args.file_train, args.train_batch_size, True)
    # eval/pred must see EVERY pair: keep the remainder batch (one extra
    # XLA compile for the partial shape is the price of not dropping data)
    val_loader = loader(args.file_valid, args.eval_batch_size, False,
                        drop_last=False)
    test_loader = loader(args.file_test, args.eval_batch_size, False,
                         drop_last=False)

    sample_loader = train_loader or val_loader or test_loader
    if sample_loader is None:
        raise FileNotFoundError("no alignment record files found")
    sample_batch = next(iter(sample_loader))

    steps_per_epoch = max(len(sample_loader), 1)
    # ref finetune.py:315: schedule spans (num_train_epochs - start_epoch)
    total_steps = int(steps_per_epoch
                      * max(args.num_train_epochs - args.start_epoch, 1))
    trainer = AlignmentTrainer(
        config, learning_rate=args.learning_rate,
        warmup_steps=int(args.warmup_proportion * total_steps),
        total_steps=total_steps,
        grad_accum_steps=args.gradient_accumulation_steps,
        micro_steps=args.micro_steps,
        adam_eps=args.adam_epsilon,
        seed=args.seed, n_model=args.n_model, sample_batch=sample_batch,
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
    # checkpoint resume LAST so it supersedes initial weights on rerun
    if args.file_checkpoint and os.path.exists(args.file_checkpoint):
        from k3m_tpu.train.state import CheckpointManager
        ckpt = CheckpointManager(args.file_checkpoint, config)
        epoch = ckpt.latest_epoch()
        restored = ckpt.restore(trainer.state) if epoch is not None else None
        if restored is not None:
            trainer.state = restored
            args.start_epoch = max(args.start_epoch, epoch + 1)
            logger.info("resumed from %s at epoch %d", args.file_checkpoint,
                        epoch)

    if args.do_train:
        history = trainer.fit(train_loader,
                              val_loader if args.do_eval else None,
                              num_epochs=int(args.num_train_epochs),
                              start_epoch=int(args.start_epoch),
                              log_steps=args.log_steps,
                              checkpoint_dir=args.output_dir)
        logger.info("history: %s", history)
    elif args.do_eval and val_loader is not None:
        trainer.evaluate(val_loader)
    if args.do_pred and test_loader is not None:
        out = os.path.join(args.output_dir,
                           f"deepAI_result_threshold={args.threshold}.jsonl")
        trainer.predict(test_loader, out, threshold=args.threshold,
                        log_steps=args.log_steps)


if __name__ == "__main__":
    main()
