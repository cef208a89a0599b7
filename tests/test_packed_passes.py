"""Packed tri-pass encoder (config.packed_passes) equals the sequential
passes: the text stack processes the row-packed streams of all three passes
at once (k3m_tpu/model/layers.py Packed; encoder._fused_passes) with
per-row math identical to running each pass separately.

Measured on v5e the packed form is ~4% slower at the bench geometry (see
config.py), so it defaults OFF — this test keeps the capability correct for
geometries where packing wins (long-sequence / small-batch configs).
"""

import numpy as np
import pytest

import jax

from conftest import make_pretrain_batch
from k3m_tpu.model.pretrain import K3MForPretraining

RNGS = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "lpm": jax.random.PRNGKey(2)}
APPLY_RNGS = {"gumbel": jax.random.PRNGKey(1), "lpm": jax.random.PRNGKey(2)}


def _outputs(cfg, batch):
    model = K3MForPretraining(cfg)
    params = jax.jit(lambda: model.init(RNGS, batch, deterministic=True))()
    # jitted: see test_fused_qkv._outputs note (eager dispatch dominates)
    out = jax.jit(lambda p, b: model.apply(
        p, b, deterministic=True, rngs=APPLY_RNGS))(params, batch)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("variant", [
    {}, {"use_image": False}, {"dynamic_attention": True},
    {"fixed_t_layer": 2, "fixed_v_layer": 1},
])
def test_packed_equals_sequential(tiny_config, variant):
    batch = make_pretrain_batch(tiny_config)
    ref = _outputs(tiny_config.replace(packed_passes=False, **variant), batch)
    got = _outputs(tiny_config.replace(packed_passes=True, **variant), batch)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-4, rtol=1e-4,
                                   err_msg=f"{variant} output {k}")
