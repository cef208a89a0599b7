"""Tri-stream K3M encoder.

Parity target: reference `BertEncoder` (vilbert_k3m/vilbert_k3m.py:1114-1750).

Three pairwise dual-stream passes share the same layer stacks:
  1. t <-> v   : text layers + image layers + `c_layer` co-attention
                 (calculate_for_text_img, ref :1154-1330)
  2. pv <-> v  : SAME text/image layer weights + separate `c_layer_pv_v`
                 (calculate_for_pv_img, ref :1332-1508)
  3. t <-> pv  : text layers on BOTH sides + `c_layer_pv_t` two-text
                 co-attention, schedule zips t_biattention_id with itself
                 (calculate_for_two_text, ref :1510-1684)

The interleave schedule zips `v_biattention_id` with `t_biattention_id`
(e.g. [0..5] x [6..11]): before co-attention block k, text runs layers
[t_start, t_id[k]) and image runs [v_start, v_id[k]); trailing layers run
after the final co-attention (ref :1302-1319). `fixed_t/v_layer` freeze the
first layers via stop_gradient (torch no_grad, ref :1188-1195).

In JAX, calling the same Flax submodule in all passes shares weights, and
gradients from all passes accumulate exactly like torch autograd summation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.coattention import ConnectionLayer, ConnectionLayerTwoText
from k3m_tpu.model.layers import ImageLayer, TextLayer


class TriStreamEncoder(nn.Module):
    config: K3MConfig

    def setup(self):
        cfg = self.config
        # per-layer remat: store only layer boundaries for backward,
        # recompute internals (attention probs, FFN intermediates) — the
        # tri-pass graph is HBM-bound, not FLOP-bound, on TPU
        if cfg.remat:
            # Selective: remat only where stored activations are big — the
            # text stack (it also carries the 256-token pv stream) and the
            # two pv-side co-attention sets. The image stream (37 tokens)
            # and t<->v co-attention (50/37) are cheap to store
            # (~0.9 GB total) and skip the forward recompute.
            Text = nn.remat(TextLayer, static_argnums=(3,))
            ConnPV = nn.remat(ConnectionLayer, static_argnums=(5,))
            ConnTT = nn.remat(ConnectionLayerTwoText, static_argnums=(5,))
        else:
            Text = TextLayer
            ConnPV, ConnTT = ConnectionLayer, ConnectionLayerTwoText
        self.layer = [Text(cfg, name=f"layer_{i}")
                      for i in range(cfg.num_hidden_layers)]
        if cfg.use_image:
            self.v_layer = [ImageLayer(cfg, name=f"v_layer_{i}")
                            for i in range(cfg.v_num_hidden_layers)]
            if cfg.with_coattention:
                self.c_layer = [ConnectionLayer(cfg, name=f"c_layer_{i}")
                                for i in range(cfg.num_coattention_layers)]
                self.c_layer_pv_v = [ConnPV(cfg, name=f"c_layer_pv_v_{i}")
                                     for i in range(cfg.num_coattention_layers)]
        if cfg.with_coattention:
            self.c_layer_pv_t = [ConnTT(cfg, name=f"c_layer_pv_t_{i}")
                                 for i in range(cfg.num_coattention_layers)]

    # ------------------------------------------------------------ helpers

    def _run_text(self, x, bias, start: int, end: int, deterministic: bool):
        cfg = self.config
        for idx in range(start, end):
            x = self.layer[idx](x, bias, deterministic)
            if idx < cfg.fixed_t_layer:
                x = jax.lax.stop_gradient(x)  # torch no_grad, ref :1188-1195
        return x

    def _run_image(self, x, bias, txt, txt_mask2, start: int, end: int,
                   deterministic: bool):
        cfg = self.config
        for idx in range(start, end):
            x = self.v_layer[idx](x, bias, txt, txt_mask2, deterministic)
            if idx < cfg.fixed_v_layer:
                x = jax.lax.stop_gradient(x)
        return x

    # ------------------------------------------------------------- passes

    def _pass_text_image(self, txt, img, txt_bias, txt_mask2, img_bias,
                         c_layers, deterministic: bool):
        """Shared body of calculate_for_text_img / calculate_for_pv_img;
        `c_layers` selects c_layer (t<->v) or c_layer_pv_v (pv<->v)."""
        cfg = self.config
        v_start = t_start = 0
        for count, (v_end, t_end) in enumerate(
                zip(cfg.v_biattention_id, cfg.t_biattention_id)):
            txt = self._run_text(txt, txt_bias, t_start, t_end, deterministic)
            img = self._run_image(img, img_bias, txt, txt_mask2,
                                  v_start, v_end, deterministic)
            if count == 0 and cfg.in_batch_pairs:
                b = txt.shape[0]
                img = jnp.repeat(img[None], b, axis=0).reshape((b * b,) + img.shape[1:])
                img_bias = jnp.repeat(img_bias[None], b, axis=0).reshape(
                    (b * b,) + img_bias.shape[1:])
                txt = jnp.repeat(txt[:, None], b, axis=1).reshape((b * b,) + txt.shape[1:])
                txt_bias_r = jnp.repeat(txt_bias[:, None], b, axis=1)
                txt_bias = txt_bias_r.reshape((b * b,) + txt_bias.shape[1:])
            if count == 0 and cfg.fast_mode:
                txt = jnp.broadcast_to(txt, (img.shape[0],) + txt.shape[1:])
                txt_bias = jnp.broadcast_to(
                    txt_bias, (img.shape[0],) + txt_bias.shape[1:])
            if cfg.with_coattention:
                img, txt = c_layers[count](img, img_bias, txt, txt_bias,
                                           deterministic)
            v_start, t_start = v_end, t_end
        img = self._run_image(img, img_bias, txt, txt_mask2,
                              v_start, cfg.v_num_hidden_layers, deterministic)
        txt = self._run_text(txt, txt_bias, t_start, cfg.num_hidden_layers,
                             deterministic)
        return txt, img

    def _pass_two_text(self, txt, pv, txt_bias, pv_bias, deterministic: bool):
        """calculate_for_two_text (ref :1510-1684): pv runs on the TEXT stack;
        the schedule zips t_biattention_id with itself (ref :1534)."""
        cfg = self.config
        v_start = t_start = 0
        for count, t_end in enumerate(cfg.t_biattention_id):
            txt = self._run_text(txt, txt_bias, t_start, t_end, deterministic)
            pv = self._run_text(pv, pv_bias, v_start, t_end, deterministic)
            if count == 0 and cfg.in_batch_pairs:
                b = txt.shape[0]
                pv = jnp.repeat(pv[None], b, axis=0).reshape((b * b,) + pv.shape[1:])
                pv_bias = jnp.repeat(pv_bias[None], b, axis=0).reshape(
                    (b * b,) + pv_bias.shape[1:])
                txt = jnp.repeat(txt[:, None], b, axis=1).reshape((b * b,) + txt.shape[1:])
                txt_bias = jnp.repeat(txt_bias[:, None], b, axis=1).reshape(
                    (b * b,) + txt_bias.shape[1:])
            if count == 0 and cfg.fast_mode:
                txt = jnp.broadcast_to(txt, (pv.shape[0],) + txt.shape[1:])
                txt_bias = jnp.broadcast_to(
                    txt_bias, (pv.shape[0],) + txt_bias.shape[1:])
            if cfg.with_coattention:
                pv, txt = self.c_layer_pv_t[count](pv, pv_bias, txt, txt_bias,
                                                   deterministic)
            v_start = t_start = t_end
        pv = self._run_text(pv, pv_bias, v_start, cfg.num_hidden_layers,
                            deterministic)
        txt = self._run_text(txt, txt_bias, t_start, cfg.num_hidden_layers,
                             deterministic)
        return txt, pv

    # -------------------------------------------------------------- call

    def __call__(self, txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                 pv_emb, pv_bias, pv_mask2, *, deterministic: bool = True
                 ) -> Tuple[Optional[jnp.ndarray], ...]:
        """Returns final hidden states of the three passes:
        (t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t);
        the first four are None when use_image=False (ref :1702-1734).
        """
        cfg = self.config
        if cfg.use_image:
            t_with_v, v_with_t = self._pass_text_image(
                txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                self.c_layer if cfg.with_coattention else None, deterministic)
            pv_with_v, v_with_pv = self._pass_text_image(
                pv_emb, img_emb, pv_bias, pv_mask2, img_bias,
                self.c_layer_pv_v if cfg.with_coattention else None, deterministic)
        else:
            t_with_v = v_with_t = pv_with_v = v_with_pv = None
        t_with_pv, pv_with_t = self._pass_two_text(
            txt_emb, pv_emb, txt_bias, pv_bias, deterministic)
        return t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t
