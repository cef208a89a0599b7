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
from k3m_tpu.model.layers import ImageLayer, Packed, TextLayer


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

    def _run_text_packed(self, xs, biases, start: int, end: int,
                         deterministic: bool):
        """Run text layers [start, end) over a TUPLE of streams at once —
        the streams stay row-packed (layers.Packed) across the whole segment
        so every projection/FFN/LN is one MXU matmul over all streams' rows
        and pack/unpack copies happen only at segment boundaries. Per-row
        math identical to _run_text on each stream separately."""
        cfg = self.config
        if start == end:
            return tuple(xs)
        p = Packed.pack(tuple(xs))
        for idx in range(start, end):
            p = self.layer[idx](p, tuple(biases), deterministic)
            if idx < cfg.fixed_t_layer:
                p = jax.lax.stop_gradient(p)
        return p.unpack()

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
                         c_layers, deterministic: bool, t_start: int = 0):
        """Shared body of calculate_for_text_img / calculate_for_pv_img;
        `c_layers` selects c_layer (t<->v) or c_layer_pv_v (pv<->v).
        `t_start` > 0 means `txt` already carries the output of text layers
        [0, t_start) (the shared_prefix path)."""
        cfg = self.config
        v_start = 0
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

    def _pass_two_text(self, txt, pv, txt_bias, pv_bias, deterministic: bool,
                       start: int = 0):
        """calculate_for_two_text (ref :1510-1684): pv runs on the TEXT stack;
        the schedule zips t_biattention_id with itself (ref :1534).
        `start` > 0 means both streams already carry the output of text
        layers [0, start) (the shared_prefix path)."""
        cfg = self.config
        v_start = t_start = start
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

    def _fused_passes(self, txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                      pv_emb, pv_bias, pv_mask2, deterministic: bool):
        """All three passes in one synchronized schedule.

        The three passes run the SAME text stack over four streams (t and pv
        sides) with segment boundaries zipped over the same t_biattention_id,
        and the SAME image stack over two streams of equal length. Fusing
        them packs every text-layer projection/FFN into one matmul over all
        streams' rows (layers.pack_rows) and batches the image stack 2x —
        per-row math is identical to the sequential passes; only the MXU
        utilization changes (the 50-token text matmuls run ~3x below peak
        on their own at K3M geometry)."""
        cfg = self.config
        use_img = cfg.use_image
        if use_img:
            streams = [txt_emb, pv_emb, txt_emb, pv_emb]
            biases = (txt_bias, pv_bias, txt_bias, pv_bias)
        else:
            streams = [txt_emb, pv_emb]
            biases = (txt_bias, pv_bias)
        img2 = img_bias2 = txt_cat = mask_cat = None
        if use_img:
            img2 = jnp.concatenate([img_emb, img_emb], axis=0)
            img_bias2 = jnp.concatenate([img_bias, img_bias], axis=0)

        def txt_gates():
            # dynamic_attention pools the CURRENT text state per image
            # stream (pass 1 gates on t, pass 2 on pv): pad t to pv length
            # (mask keeps the pooling exact) and concat along batch to
            # match the concatenated image stream.
            if not (use_img and cfg.dynamic_attention):
                return None, None
            L = max(streams[0].shape[1], streams[1].shape[1])

            def pad(a):
                return jnp.pad(a, ((0, 0), (0, L - a.shape[1]))
                               + ((0, 0),) * (a.ndim - 2))
            return (jnp.concatenate([pad(streams[0]), pad(streams[1])], 0),
                    jnp.concatenate([pad(txt_mask2), pad(pv_mask2)], 0))

        v_start = t_start = 0
        for count, (v_end, t_end) in enumerate(
                zip(cfg.v_biattention_id, cfg.t_biattention_id)):
            streams = list(self._run_text_packed(
                streams, biases, t_start, t_end, deterministic))
            if use_img:
                txt_cat, mask_cat = txt_gates()
                img2 = self._run_image(img2, img_bias2, txt_cat, mask_cat,
                                       v_start, v_end, deterministic)
            if cfg.with_coattention:
                if use_img:
                    img_a, img_b = jnp.split(img2, 2, axis=0)
                    img_a, streams[0] = self.c_layer[count](
                        img_a, img_bias, streams[0], txt_bias, deterministic)
                    img_b, streams[1] = self.c_layer_pv_v[count](
                        img_b, img_bias, streams[1], pv_bias, deterministic)
                    img2 = jnp.concatenate([img_a, img_b], axis=0)
                    streams[3], streams[2] = self.c_layer_pv_t[count](
                        streams[3], pv_bias, streams[2], txt_bias,
                        deterministic)
                else:
                    streams[1], streams[0] = self.c_layer_pv_t[count](
                        streams[1], pv_bias, streams[0], txt_bias,
                        deterministic)
            v_start, t_start = v_end, t_end
        streams = list(self._run_text_packed(
            streams, biases, t_start, cfg.num_hidden_layers, deterministic))
        if use_img:
            txt_cat, mask_cat = txt_gates()
            img2 = self._run_image(img2, img_bias2, txt_cat, mask_cat,
                                   v_start, cfg.v_num_hidden_layers,
                                   deterministic)
            v_with_t, v_with_pv = jnp.split(img2, 2, axis=0)
            return (streams[0], v_with_t, streams[1], v_with_pv,
                    streams[2], streams[3])
        return None, None, None, None, streams[0], streams[1]

    # -------------------------------------------------------------- call

    def __call__(self, txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                 pv_emb, pv_bias, pv_mask2, *, deterministic: bool = True
                 ) -> Tuple[Optional[jnp.ndarray], ...]:
        """Returns final hidden states of the three passes:
        (t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t);
        the first four are None when use_image=False (ref :1702-1734).
        """
        cfg = self.config
        if cfg.packed_passes and not (cfg.in_batch_pairs or cfg.fast_mode):
            return self._fused_passes(
                txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                pv_emb, pv_bias, pv_mask2, deterministic)
        # shared_prefix: text layers [0, t_biattention_id[0]) see no
        # co-attention in any pass, so each stream's prefix output is the
        # same computation in both passes that consume it — run it once.
        # (The reference recomputes it per pass; in deterministic mode the
        # results are identical, in training only dropout draws differ.)
        pre = 0
        if cfg.shared_prefix and cfg.with_coattention:
            pre = cfg.t_biattention_id[0]
            txt_emb = self._run_text(txt_emb, txt_bias, 0, pre, deterministic)
            pv_emb = self._run_text(pv_emb, pv_bias, 0, pre, deterministic)
        if cfg.use_image:
            t_with_v, v_with_t = self._pass_text_image(
                txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
                self.c_layer if cfg.with_coattention else None, deterministic,
                t_start=pre)
            pv_with_v, v_with_pv = self._pass_text_image(
                pv_emb, img_emb, pv_bias, pv_mask2, img_bias,
                self.c_layer_pv_v if cfg.with_coattention else None,
                deterministic, t_start=pre)
        else:
            t_with_v = v_with_t = pv_with_v = v_with_pv = None
        t_with_pv, pv_with_t = self._pass_two_text(
            txt_emb, pv_emb, txt_bias, pv_bias, deterministic, start=pre)
        return t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t
