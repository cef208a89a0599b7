"""torch -> jax weight conversion.

Covers two checkpoint families:

  1. HF Chinese BERT (`bert-base-chinese` / `hfl/chinese-roberta-wwm-ext`
     pytorch_model.bin) — the reference's pretrained init
     (train_concap_struc.py:231-236, vilbert_k3m/utils.py:884-1086). Only the
     text stream exists there; the rest stays freshly initialized, matching
     the reference's partial-load behaviour.
  2. Reference K3M checkpoints (`K3M_struc_presample-*_epoch-*.bin`,
     train_concap_struc.py:691-705) — full-model load for parity testing and
     migration.

torch Linear stores [out, in]; flax Dense kernels are [in, out] (transposed).
The reference's dead parameters (q_dense*, t_pooler/v_pooler,
map_individual_to_bi — see model docstrings) are skipped.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Set, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def load_tf_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """TF-checkpoint import (reference `load_tf_weights_in_bert`,
    vilbert_k3m/vilbert_k3m.py:56-116): reads a TF1-style BERT checkpoint
    and returns a torch-layout state dict consumable by `reference_to_flat`.

    Name mapping mirrors the reference: `/` -> `.`, `layer_N` -> `layer.N`,
    `kernel` -> `weight` (transposed to torch [out, in]), `gamma`/`beta` ->
    LayerNorm `weight`/`bias`, `output_bias`/`output_weights` ->
    `bias`/`weight`; optimizer slots (adam_v/adam_m) and `global_step` are
    skipped (ref :75-80)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    sd: Dict[str, np.ndarray] = {}
    for name, _ in tf.train.list_variables(ckpt_path):
        parts = name.split("/")
        if any(p in ("adam_v", "adam_m", "AdamWeightDecayOptimizer",
                     "AdamWeightDecayOptimizer_1", "global_step")
               for p in parts):
            continue
        arr = np.asarray(reader.get_tensor(name))
        mapped = []
        transpose = False
        for p in parts:
            m = re.fullmatch(r"([A-Za-z_]+)_(\d+)", p)
            if m and m.group(1) in ("layer", "v_layer", "c_layer",
                                    "c_layer_pv_v", "c_layer_pv_t"):
                mapped.extend([m.group(1), m.group(2)])
                continue
            if p == "kernel":
                transpose = True
                mapped.append("weight")
            elif p == "gamma":
                mapped.append("weight")
            elif p in ("beta", "output_bias"):
                mapped.append("bias")
            elif p == "output_weights":
                mapped.append("weight")
            else:
                mapped.append(p)
        # trailing `*_embeddings` table -> `.weight` (ref :105-106)
        if parts[-1].endswith("_embeddings"):
            mapped.append("weight")
        if transpose and arr.ndim == 2:
            arr = arr.T
        sd[".".join(mapped)] = arr
    return sd


def is_tf_checkpoint(path: str) -> bool:
    """True for TF checkpoint prefixes (`<path>.index` exists) or direct
    `.ckpt`/`.index` paths."""
    import os
    if path.endswith(".index"):
        return True
    return os.path.exists(path + ".index")


def _strip_prefix(name: str) -> str:
    for p in ("bert.", "roberta.", "model."):
        if name.startswith(p):
            return name[len(p):]
    return name


def _linear(dst: Dict, flax_path: str, sd: Dict, torch_name: str) -> bool:
    w, b = torch_name + ".weight", torch_name + ".bias"
    if w not in sd:
        return False
    dst[flax_path + "/kernel"] = sd[w].T
    if b in sd:
        dst[flax_path + "/bias"] = sd[b]
    return True


def _layernorm(dst: Dict, flax_path: str, sd: Dict, torch_name: str) -> bool:
    w = torch_name + ".weight"
    if w not in sd:
        return False
    dst[flax_path + "/scale"] = sd[w]
    dst[flax_path + "/bias"] = sd[torch_name + ".bias"]
    return True


def reference_to_flat(sd: Dict[str, np.ndarray],
                      trunk: str = "trunk") -> Dict[str, np.ndarray]:
    """Map a reference/HF torch state dict to '/'-joined flax param paths."""
    sd = {_strip_prefix(k): v for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {}

    # ---- embeddings
    if "embeddings.word_embeddings.weight" in sd:
        out[f"{trunk}/word_embeddings"] = sd["embeddings.word_embeddings.weight"]
    for tname, fname in [("embeddings.position_embeddings.weight",
                          f"{trunk}/embeddings/position_embeddings"),
                         ("embeddings.token_type_embeddings.weight",
                          f"{trunk}/embeddings/token_type_embeddings")]:
        if tname in sd:
            out[fname] = sd[tname]
    _layernorm(out, f"{trunk}/embeddings/LayerNorm", sd, "embeddings.LayerNorm")

    # ---- image embeddings
    _linear(out, f"{trunk}/v_embeddings/image_embeddings", sd,
            "v_embeddings.image_embeddings")
    _linear(out, f"{trunk}/v_embeddings/image_location_embeddings", sd,
            "v_embeddings.image_location_embeddings")
    _layernorm(out, f"{trunk}/v_embeddings/LayerNorm", sd,
               "v_embeddings.LayerNorm")

    # ---- text layers
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        t = f"encoder.layer.{i}"
        f = f"{trunk}/encoder/layer_{i}"
        for proj in ("query", "key", "value"):
            _linear(out, f"{f}/attention/{proj}", sd, f"{t}.attention.self.{proj}")
        _linear(out, f"{f}/attention_output", sd, f"{t}.attention.output.dense")
        _layernorm(out, f"{f}/attention_LayerNorm", sd,
                   f"{t}.attention.output.LayerNorm")
        _linear(out, f"{f}/intermediate", sd, f"{t}.intermediate.dense")
        _linear(out, f"{f}/output", sd, f"{t}.output.dense")
        _layernorm(out, f"{f}/output_LayerNorm", sd, f"{t}.output.LayerNorm")
        i += 1

    # ---- image layers
    i = 0
    while f"encoder.v_layer.{i}.attention.self.query.weight" in sd:
        t = f"encoder.v_layer.{i}"
        f = f"{trunk}/encoder/v_layer_{i}"
        for proj in ("query", "key", "value"):
            _linear(out, f"{f}/attention/{proj}", sd, f"{t}.attention.self.{proj}")
        for proj in ("dyLinear_q", "dyLinear_k"):
            _linear(out, f"{f}/{proj}", sd, f"{t}.attention.self.{proj}")
        _linear(out, f"{f}/attention_output", sd, f"{t}.attention.output.dense")
        _layernorm(out, f"{f}/attention_LayerNorm", sd,
                   f"{t}.attention.output.LayerNorm")
        _linear(out, f"{f}/intermediate", sd, f"{t}.intermediate.dense")
        _linear(out, f"{f}/output", sd, f"{t}.output.dense")
        _layernorm(out, f"{f}/output_LayerNorm", sd, f"{t}.output.LayerNorm")
        i += 1

    # ---- connection layers (c_layer, c_layer_pv_v, c_layer_pv_t)
    for stack in ("c_layer", "c_layer_pv_v", "c_layer_pv_t"):
        i = 0
        while f"encoder.{stack}.{i}.biattention.query1.weight" in sd:
            t = f"encoder.{stack}.{i}"
            f = f"{trunk}/encoder/{stack}_{i}"
            for proj in ("query1", "key1", "value1", "query2", "key2", "value2"):
                _linear(out, f"{f}/biattention/{proj}", sd, f"{t}.biattention.{proj}")
            _linear(out, f"{f}/bi_dense1", sd, f"{t}.biOutput.dense1")
            _layernorm(out, f"{f}/bi_LayerNorm1", sd, f"{t}.biOutput.LayerNorm1")
            _linear(out, f"{f}/bi_dense2", sd, f"{t}.biOutput.dense2")
            _layernorm(out, f"{f}/bi_LayerNorm2", sd, f"{t}.biOutput.LayerNorm2")
            _linear(out, f"{f}/v_intermediate", sd, f"{t}.v_intermediate.dense")
            _linear(out, f"{f}/v_output", sd, f"{t}.v_output.dense")
            _layernorm(out, f"{f}/v_output_LayerNorm", sd, f"{t}.v_output.LayerNorm")
            _linear(out, f"{f}/t_intermediate", sd, f"{t}.t_intermediate.dense")
            _linear(out, f"{f}/t_output", sd, f"{t}.t_output.dense")
            _layernorm(out, f"{f}/t_output_LayerNorm", sd, f"{t}.t_output.LayerNorm")
            i += 1

    # ---- fusion scores + struct aggregator + mapping
    for mod in ("v", "t", "pv"):
        for score in ("score_self", "score_cross1", "score_cross2", "soft"):
            _linear(out, f"{trunk}/fusion/fusion_{mod}/{score}_{mod}", sd,
                    f"{score}_{mod}")
    _linear(out, f"{trunk}/fusion/map_bi_to_individual", sd, "map_bi_to_individual")
    for w in ("struc_w1", "struc_w2", "struc_w3"):
        _linear(out, f"structure/{w}", sd, w)

    # ---- pretraining heads
    _linear(out, "cls/predictions/transform_dense", sd,
            "cls.predictions.transform.dense")
    _layernorm(out, "cls/predictions/transform_LayerNorm", sd,
               "cls.predictions.transform.LayerNorm")
    if "cls.predictions.bias" in sd:
        out["cls/predictions/decoder_bias"] = sd["cls.predictions.bias"]
    _linear(out, "cls/seq_relationship", sd, "cls.seq_relationship")
    _linear(out, "cls/imagePredictions/transform_dense", sd,
            "cls.imagePredictions.transform.dense")
    _layernorm(out, "cls/imagePredictions/transform_LayerNorm", sd,
               "cls.imagePredictions.transform.LayerNorm")
    _linear(out, "cls/imagePredictions/decoder", sd, "cls.imagePredictions.decoder")

    # ---- alignment classifier
    _linear(out, "classifier/dense", sd, "classifier.dense")
    _linear(out, "classifier/out_proj", sd, "classifier.out_proj")
    return out


def _flatten(params, prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _set_path(tree: Dict, path: str, value) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def merge_flat_into_params(params, flat: Dict[str, np.ndarray]
                           ) -> Tuple[Any, Set[str], Set[str]]:
    """Copy matching flat entries into a (nested dict) param tree.
    Returns (new_params, loaded_paths, skipped_paths)."""
    import jax

    tree = jax.tree.map(lambda x: x, params)  # copy structure
    inner = tree["params"] if "params" in tree else tree
    existing = _flatten(inner)
    loaded, skipped = set(), set()
    for path, value in flat.items():
        if path in existing:
            cur = existing[path]
            if tuple(cur.shape) != tuple(value.shape):
                logger.warning("shape mismatch %s: %s vs %s", path,
                               cur.shape, value.shape)
                skipped.add(path)
                continue
            _set_path(inner, path, np.asarray(value, dtype=np.float32))
            loaded.add(path)
        else:
            skipped.add(path)
    return tree, loaded, skipped


# Source state-dict keys a strict load may leave unconsumed: the
# reference's own dead parameters (see model docstrings + PARITY.md) and
# HF-checkpoint bookkeeping. Anything else unconsumed is a silent-breakage
# risk (renamed key, layout drift) and fails loudly under strict=True.
_IGNORABLE_SOURCE_RE = re.compile(
    "|".join((
        r"(^|\.)t_pooler\.",            # computed-but-unused CLS poolers
        r"(^|\.)v_pooler\.",            #   (model/pretrain.py:6-13)
        r"(^|\.)pooler\.",              # HF BertPooler (NSP head input)
        r"q_dense\d",                   # dead BiOutput projections
        r"map_individual_to_bi",        # dead fusion projection
        r"bi_seq_relationship",         # dead twin head
        r"vis_criterion",               # loss module buffer
        r"(^|\.)position_ids$",         # HF non-param buffer
        r"cls\.predictions\.decoder\.weight$",  # tied-embedding alias
        r"cls\.seq_relationship_",      # HF NSP variants
        r"(^|\.)LayerNorm\.gamma$",     # pre-2019 HF naming (handled via
        r"(^|\.)LayerNorm\.beta$",      #   weight/bias in modern dumps)
    )))


def source_coverage(sd: Dict[str, np.ndarray],
                    loaded_flax_paths: Set[str],
                    trunk: str = "trunk") -> Tuple[Set[str], Set[str]]:
    """Partition source keys into (consumed, unconsumed-and-not-ignorable).

    Provenance comes from replaying reference_to_flat over a SYMBOLIC copy
    of the actual source keys, so it cannot drift from the real mapping."""
    sym = {k: _Sym(k) for k in sd}
    mapping = reference_to_flat(sym, trunk=trunk)   # flax path -> _Sym(src)
    consumed = {v.name for p, v in mapping.items() if p in loaded_flax_paths}
    leftovers = {
        k for k in sd
        if k not in consumed
        and _strip_prefix(k) not in consumed
        and not _IGNORABLE_SOURCE_RE.search(k)}
    return consumed, leftovers


def load_pretrained_into_params(params, torch_path: str, *,
                                strict: bool = False,
                                require_complete: bool = False,
                                allowed_unconsumed: Tuple[str, ...] = ()):
    """Load a pretrained checkpoint (torch .bin or TF checkpoint prefix —
    auto-detected, reference from_pretrained's from_tf branch) into params.

    strict=True          — fail loudly if ANY source tensor is neither
                           loaded into the flax tree nor on the documented
                           dead/bookkeeping ignore list, or if any mapped
                           tensor was dropped for a shape mismatch. This is
                           the first-real-asset-run guard (VERDICT r2 §4):
                           a renamed or missed key in a real
                           pytorch_model.bin cannot pass silently.
    require_complete=True — additionally fail if any flax param was NOT
                           written by the checkpoint (full reference K3M
                           .bin loads; partial HF text-stream loads must
                           leave this False)."""
    if is_tf_checkpoint(torch_path):
        sd = load_tf_state_dict(torch_path.replace(".index", ""))
    else:
        sd = load_torch_state_dict(torch_path)
    flat = reference_to_flat(sd)
    new_params, loaded, skipped = merge_flat_into_params(params, flat)
    logger.info("loaded %d tensors from %s (%d unmatched)", len(loaded),
                torch_path, len(skipped))
    if strict:
        # a source key is covered only if its mapped flax path was actually
        # WRITTEN — unmapped keys, missing targets, and shape-mismatch
        # drops all surface here (skipped paths are not in `loaded`)
        _, leftovers = source_coverage(sd, loaded)
        if allowed_unconsumed:
            allow = re.compile("|".join(allowed_unconsumed))
            leftovers = {k for k in leftovers if not allow.search(k)}
        if leftovers:
            raise ValueError(
                f"strict load of {torch_path}: {len(leftovers)} source "
                f"tensors not consumed (renamed key / layout drift / shape "
                f"mismatch): {sorted(leftovers)[:8]}")
    if require_complete:
        inner = new_params.get("params", new_params) \
            if isinstance(new_params, dict) else new_params
        missing = sorted(set(_flatten(inner)) - loaded)
        if missing:
            raise ValueError(
                f"checkpoint {torch_path} left {len(missing)} params "
                f"uninitialized: {missing[:8]}")
    return new_params


def load_pretrained_bert_paths(torch_path: str) -> Set[str]:
    """Param paths that came from the pretrained checkpoint -> 0.1x LR set
    (ref train_concap_struc.py:372-373)."""
    sd = load_torch_state_dict(torch_path)
    return set("params/" + p for p in reference_to_flat(sd))


def resize_word_embeddings(params, new_vocab_size: int, seed: int = 0,
                           initializer_range: float = 0.02):
    """Grow/shrink the tied word-embedding table (+ MLM decoder bias) to
    new_vocab_size — the flax counterpart of the reference's
    `_resize_token_embeddings`/`_get_resized_embeddings`
    (vilbert_k3m/utils.py:959-1010): copied rows for min(old, new), normal
    init for any new rows, bias rows zero-initialized.

    Returns a new params pytree; every other leaf is shared unchanged."""
    flat = _flatten(params)
    table_paths = [p for p in flat
                   if p.endswith("word_embeddings") and flat[p].ndim == 2]
    bias_paths = [p for p in flat if p.endswith("decoder_bias")]
    if not table_paths:
        raise ValueError("no word_embeddings table found")
    rng = np.random.default_rng(seed)
    out = dict(flat)
    for p in table_paths:
        old = np.asarray(flat[p])
        n, h = old.shape
        new = rng.normal(0.0, initializer_range,
                         (new_vocab_size, h)).astype(old.dtype)
        new[:min(n, new_vocab_size)] = old[:min(n, new_vocab_size)]
        out[p] = new
    for p in bias_paths:
        old = np.asarray(flat[p])
        new = np.zeros((new_vocab_size,), old.dtype)
        new[:min(old.shape[0], new_vocab_size)] = \
            old[:min(old.shape[0], new_vocab_size)]
        out[p] = new
    result: Dict[str, Any] = {}
    for path, value in out.items():
        node = result
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return result


# ------------------------------------------------- flax -> torch export

class _Sym:
    """Symbolic stand-in for a weight array: records its torch name and
    whether reference_to_flat transposed it."""
    __slots__ = ("name", "transposed")

    def __init__(self, name: str, transposed: bool = False):
        self.name = name
        self.transposed = transposed

    @property
    def T(self) -> "_Sym":
        return _Sym(self.name, not self.transposed)


def _torch_name_universe(max_layers: int = 48) -> list:
    """Every torch parameter name reference_to_flat can consume (with
    generous layer-count bounds; unmatched names are simply dropped when
    inverting against an actual flax tree)."""
    def lin(base):
        return [base + ".weight", base + ".bias"]

    U = ["embeddings.word_embeddings.weight",
         "embeddings.position_embeddings.weight",
         "embeddings.token_type_embeddings.weight"]
    U += lin("embeddings.LayerNorm")
    U += lin("v_embeddings.image_embeddings")
    U += lin("v_embeddings.image_location_embeddings")
    U += lin("v_embeddings.LayerNorm")
    for i in range(max_layers):
        for stack, projs in (
                (f"encoder.layer.{i}", ("query", "key", "value")),
                (f"encoder.v_layer.{i}",
                 ("query", "key", "value", "dyLinear_q", "dyLinear_k"))):
            for p in projs:
                U += lin(f"{stack}.attention.self.{p}")
            U += lin(f"{stack}.attention.output.dense")
            U += lin(f"{stack}.attention.output.LayerNorm")
            U += lin(f"{stack}.intermediate.dense")
            U += lin(f"{stack}.output.dense")
            U += lin(f"{stack}.output.LayerNorm")
        for stack in ("c_layer", "c_layer_pv_v", "c_layer_pv_t"):
            t = f"encoder.{stack}.{i}"
            for p in ("query1", "key1", "value1", "query2", "key2", "value2"):
                U += lin(f"{t}.biattention.{p}")
            U += lin(f"{t}.biOutput.dense1") + lin(f"{t}.biOutput.LayerNorm1")
            U += lin(f"{t}.biOutput.dense2") + lin(f"{t}.biOutput.LayerNorm2")
            for part in ("v_intermediate", "v_output", "t_intermediate",
                         "t_output"):
                U += lin(f"{t}.{part}.dense")
            U += lin(f"{t}.v_output.LayerNorm") + lin(f"{t}.t_output.LayerNorm")
    for mod in ("v", "t", "pv"):
        for score in ("score_self", "score_cross1", "score_cross2", "soft"):
            U += lin(f"{score}_{mod}")
    U += lin("map_bi_to_individual")
    for w in ("struc_w1", "struc_w2", "struc_w3"):
        U += lin(w)
    U += lin("cls.predictions.transform.dense")
    U += lin("cls.predictions.transform.LayerNorm")
    U += ["cls.predictions.bias"]
    U += lin("cls.seq_relationship")
    U += lin("cls.imagePredictions.transform.dense")
    U += lin("cls.imagePredictions.transform.LayerNorm")
    U += lin("cls.imagePredictions.decoder")
    U += lin("classifier.dense") + lin("classifier.out_proj")
    return U


_TRUNK_TORCH_PREFIXES = ("embeddings.", "encoder.", "v_embeddings.")


def flat_to_reference(flat: Dict[str, np.ndarray], trunk: str = "trunk",
                      bert_prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of reference_to_flat: '/'-joined flax paths -> the reference
    torch state-dict names (save_pretrained parity, vilbert_k3m/utils.py:864
    + per-epoch .bin saves, train_concap_struc.py:691-705).

    Derived by running reference_to_flat over a SYMBOLIC state dict, so the
    two mappings cannot drift apart. The reference tri model holds
    embeddings/encoder/heads as TOP-LEVEL modules (its .bin checkpoints use
    bare names), so the default prefix is "" — pass bert_prefix="bert." to
    emit HF-style names instead. Kernels are transposed back to torch
    [out, in]; the tied MLM decoder is additionally emitted under its own
    key, like torch state_dict does for tied weights."""
    sym_sd = {n: _Sym(n) for n in _torch_name_universe()}
    mapping = reference_to_flat(sym_sd, trunk=trunk)   # flax path -> _Sym
    out: Dict[str, np.ndarray] = {}
    unmapped = []
    for path, value in flat.items():
        sym = mapping.get(path)
        if sym is None:
            unmapped.append(path)
            continue
        arr = np.asarray(value, np.float32)
        if sym.transposed:
            arr = arr.T
        name = sym.name
        if name.startswith(_TRUNK_TORCH_PREFIXES):
            name = bert_prefix + name
        out[name] = arr
    if unmapped:
        logger.info("flat_to_reference: %d flax-only params not exported "
                    "(e.g. %s)", len(unmapped), unmapped[:3])
    # torch state_dict materializes the TIED MLM decoder under its own key
    # as well (tie_weights, ref :2266-2272) — emit the alias so a strict
    # load_state_dict on the reference model finds it
    emb = out.get(bert_prefix + "embeddings.word_embeddings.weight")
    if emb is not None and "cls.predictions.transform.dense.weight" in out:
        out["cls.predictions.decoder.weight"] = emb
    return out


def save_reference_checkpoint(params, path: str,
                              bert_prefix: str = "") -> int:
    """Export a flax param tree as a reference-compatible torch .bin
    (the reference's per-epoch `torch.save(model.state_dict(), ...)`,
    train_concap_struc.py:691-705). Returns the tensor count written."""
    import torch

    tree = params.get("params", params) if isinstance(params, dict) else params
    flat = _flatten(tree)
    sd = flat_to_reference(flat, bert_prefix=bert_prefix)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    logger.info("exported %d tensors -> %s", len(sd), path)
    return len(sd)


def _cli(argv=None):
    """Checkpoint conversion CLI.

    import: torch .bin / TF checkpoint -> flax msgpack params
            (needs --config to build the param template)
    export: flax msgpack params (save_params_msgpack format, raw tree)
            -> reference-compatible torch .bin
    """
    import argparse

    ap = argparse.ArgumentParser(prog="python -m k3m_tpu.train.convert")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export", help="flax msgpack -> reference torch .bin")
    ex.add_argument("--params", required=True,
                    help="msgpack file written by save_params_msgpack")
    ex.add_argument("--out", required=True, help="output pytorch_model.bin")
    ex.add_argument("--bert_prefix", default="",
                    help='"" for K3M tri-model names (default), '
                         '"bert." for HF-style')
    args = ap.parse_args(argv)

    if args.cmd == "export":
        from flax import serialization
        with open(args.params, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        n = save_reference_checkpoint(tree, args.out,
                                      bert_prefix=args.bert_prefix)
        print(f"exported {n} tensors -> {args.out}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    _cli()
