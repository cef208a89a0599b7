"""Model configuration for K3M.

Honors the exact JSON key surface of the reference config
(`config/bert_base_6layer_6conect.json`; reference `BertConfig`,
vilbert_k3m/vilbert_k3m.py:149-308) so existing config files work verbatim,
while being a frozen dataclass usable as a static argument under `jax.jit`.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple


@dataclasses.dataclass(frozen=True)
class K3MConfig:
    # --- text stream (BERT) ---
    vocab_size: int = 21128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02

    # --- visual stream ---
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 1024
    v_num_hidden_layers: int = 6
    v_num_attention_heads: int = 8
    v_intermediate_size: int = 1024
    v_attention_probs_dropout_prob: float = 0.1
    v_hidden_act: str = "gelu"
    v_hidden_dropout_prob: float = 0.1
    v_initializer_range: float = 0.2

    # --- cross-stream (co-attention) ---
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 8
    bi_intermediate_size: int = 1024
    bi_attention_type: int = 1    # dead key: shipped in the reference's
                                  # JSON (bert_base_6layer_6conect.json:22)
                                  # but read by NO reference code; accepted
                                  # for config-file compatibility only
    v_biattention_id: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    t_biattention_id: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)

    # --- behaviour switches ---
    visual_target: int = 0        # 0: KLDiv vs soft labels, 1: MSE, 2: NCE
    fast_mode: bool = False
    fixed_v_layer: int = 0
    fixed_t_layer: int = 0
    in_batch_pairs: bool = False
    fusion_method: str = "mul"    # dead in the reference too: its only
                                  # consumer is commented out
                                  # (vilbert_k3m.py:1873); kept for
                                  # config-file compatibility
    dynamic_attention: bool = False
    with_coattention: bool = True
    objective: int = 0
    num_negative_image: int = 128
    num_negative_pv: int = 4
    margin: float = 1.0
    model: str = "bert"           # "bert" | "roberta" (position-id offset)
    task_specific_tokens: bool = False
    visualization: bool = False
    use_image: bool = True
    if_pre_sampling: int = 1      # 0 mean / 1 gumbel-hard / 2 soft / 3 interactive-only
    loss_type: str = "inner"      # item-alignment: "inner" | "cosine" | "ce"

    # --- TPU-native extensions (absent in the reference) ---
    dtype: str = "float32"        # compute dtype: "float32" | "bfloat16"
    use_pallas: bool = False      # fused Pallas attention kernels on TPU
    use_pallas_ln: bool = True    # fused residual+LayerNorm Pallas kernel
                                  # (TPU backends only; XLA path elsewhere)
    fix_reference_bugs: bool = False  # fix known reference bugs (cosine-probs, LPM sign)
    remat: bool = True            # per-layer rematerialization (activation
                                  # recompute in backward; HBM >> FLOPs here)
    packed_passes: bool = False   # run the text stack ONCE over the packed
                                  # rows of all tri-pass streams (identical
                                  # math, golden-tested). Default OFF: on
                                  # v5e the per-layer slice/concat copies
                                  # outweigh the matmul-M gain (145 vs 151
                                  # samples/s/chip measured at the bench
                                  # config). Auto-bypassed for
                                  # in_batch_pairs/fast_mode.
    ce_chunk: int = 64            # sequence chunk for the masked-CE loss so
                                  # [B, L, vocab] logits never materialize
    shared_prefix: bool = False   # compute the cross-free text-layer prefix
                                  # (layers [0, t_biattention_id[0]), which
                                  # see no co-attention in ANY pass) ONCE per
                                  # stream instead of once per pass: t's
                                  # prefix feeds passes t<->v and t<->pv, pv's
                                  # feeds pv<->v and pv<->t. In deterministic
                                  # mode this is mathematically identical to
                                  # the reference's recompute (golden-tested,
                                  # tests/test_shared_prefix.py); in training
                                  # it shares one dropout draw across the two
                                  # consumers of each prefix (still unbiased
                                  # dropout — the reference draws fresh noise
                                  # per pass, vilbert_k3m.py:1154/1332/1510).
                                  # Default OFF for bit-exact training parity.
    fused_qkv: bool = False       # compute each attention site's Q/K/V (and
                                  # each co-attention stream's 3 projections)
                                  # as ONE matmul over concatenated kernels.
                                  # Identical math and param tree (kernels
                                  # concatenated at apply time; golden-tested,
                                  # tests/test_fused_qkv.py). Default OFF:
                                  # measured 153.6 vs 155.8 samples/s/chip at
                                  # the bench config (v5e, micro_steps=4) —
                                  # the per-iteration kernel concats inside
                                  # the microbatch scan add ~5 GB/step HBM
                                  # traffic, outweighing the launch savings.
                                  # Becomes the right tool for small-M
                                  # (low-batch serving) geometries.

    def __post_init__(self):
        if len(self.v_biattention_id) != len(self.t_biattention_id):
            raise ValueError("v_biattention_id and t_biattention_id must have equal length")
        if max(self.v_biattention_id) >= self.v_num_hidden_layers:
            raise ValueError("v_biattention_id out of range")
        if max(self.t_biattention_id) >= self.num_hidden_layers:
            raise ValueError("t_biattention_id out of range")
        if self.hidden_size % self.num_attention_heads:
            raise ValueError("hidden_size % num_attention_heads != 0")
        if self.v_hidden_size % self.v_num_attention_heads:
            raise ValueError("v_hidden_size % v_num_attention_heads != 0")
        if self.bi_hidden_size % self.bi_num_attention_heads:
            raise ValueError("bi_hidden_size % bi_num_attention_heads != 0")
        if self.visualization and self.use_pallas:
            raise ValueError(
                "visualization=True needs the unfused attention path: the "
                "fused Pallas kernels never materialize attention probs "
                "(set use_pallas=False to collect them)")

    # ------------------------------------------------------------------ io

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "K3MConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        clean: Dict[str, Any] = {}
        for k, v in d.items():
            if k == "vocab_size_or_config_json_file":
                k = "vocab_size"
            if k not in fields:
                continue  # ignore unknown keys, like the reference's from_dict
            if isinstance(v, list):
                v = tuple(v)
            clean[k] = v
        return cls(**clean)

    @classmethod
    def from_json_file(cls, path: str) -> "K3MConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, tuple):
                d[k] = list(v)
        return d

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"

    def replace(self, **kw) -> "K3MConfig":
        if "v_biattention_id" in kw and isinstance(kw["v_biattention_id"], list):
            kw["v_biattention_id"] = tuple(kw["v_biattention_id"])
        if "t_biattention_id" in kw and isinstance(kw["t_biattention_id"], list):
            kw["t_biattention_id"] = tuple(kw["t_biattention_id"])
        return dataclasses.replace(self, **kw)

    @property
    def num_coattention_layers(self) -> int:
        return len(self.v_biattention_id)
