"""Fused Q/K/V projections (config.fused_qkv) equal the unfused path.

With fused_qkv=True every attention site computes its three same-input
projections as ONE matmul over concatenated kernels (layers.fused_dense),
and each co-attention stream likewise (coattention.BiAttention). The param
tree is unchanged (layers.DenseParams declares nn.Dense-compatible
{kernel, bias} under the reference names), so checkpoints/converters are
unaffected; this test pins that the math is identical too.
"""

import numpy as np
import pytest

import jax

from conftest import make_pretrain_batch
from k3m_tpu.model.pretrain import K3MForPretraining

RNGS = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "lpm": jax.random.PRNGKey(2)}
APPLY_RNGS = {"gumbel": jax.random.PRNGKey(1), "lpm": jax.random.PRNGKey(2)}


def _outputs(cfg, batch, params=None):
    model = K3MForPretraining(cfg)
    if params is None:
        params = jax.jit(
            lambda: model.init(RNGS, batch, deterministic=True))()
    # jitted (not eager) apply: eager per-op dispatch dominated this
    # file's wall-clock and jitted graphs hit the persistent compile cache
    out = jax.jit(lambda p, b: model.apply(
        p, b, deterministic=True, rngs=APPLY_RNGS))(params, batch)
    return params, {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("variant", [
    {}, {"use_image": False}, {"dynamic_attention": True},
    {"packed_passes": True},
])
def test_fused_qkv_equals_unfused(tiny_config, variant):
    batch = make_pretrain_batch(tiny_config)
    params, ref = _outputs(tiny_config.replace(fused_qkv=False, **variant),
                           batch)
    fused_params, got = _outputs(
        tiny_config.replace(fused_qkv=True, **variant), batch, params)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-5, rtol=1e-5,
                                   err_msg=f"{variant} output {k}")


def test_fused_qkv_param_tree_identical(tiny_config):
    batch = make_pretrain_batch(tiny_config)
    a = K3MForPretraining(tiny_config.replace(fused_qkv=False)).init(
        RNGS, batch, deterministic=True)
    b = K3MForPretraining(tiny_config.replace(fused_qkv=True)).init(
        RNGS, batch, deterministic=True)
    fa = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {jax.tree_util.keystr(p): v.shape for p, v in
          jax.tree_util.tree_flatten_with_path(b)[0]}
    assert fa == fb
