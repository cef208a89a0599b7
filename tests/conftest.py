"""Test configuration: force the CPU backend with a virtual 8-device mesh
(the JAX-native way to test multi-chip sharding without hardware) and a
persistent compilation cache so repeated runs are fast."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# match production RNG (setup_jax defaults to the hardware-friendly "rbg"
# generator): tests must exercise the same PRNG the drivers run
jax.config.update("jax_default_prng_impl",
                  os.environ.get("K3M_PRNG_IMPL", "rbg"))
# home, not /tmp: /tmp is wiped between build rounds and a cold cache
# roughly triples the suite's wall-clock on this 1-core host
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/k3m_jax_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from k3m_tpu.config import K3MConfig  # noqa: E402


TINY = K3MConfig(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, v_feature_size=16,
    v_target_size=11, v_hidden_size=24, v_num_hidden_layers=2,
    v_num_attention_heads=4, v_intermediate_size=24, bi_hidden_size=24,
    bi_num_attention_heads=4, v_biattention_id=(0, 1), t_biattention_id=(2, 3),
    max_position_embeddings=64, num_negative_pv=4, if_pre_sampling=1)


# Smallest geometry that still exercises every architectural feature
# (tri-pass interleave, co-attention, fusion, structure/LPM): used by the
# compile-heavy multi-device tests so the cold-start suite stays a usable
# gate (TINY's 8-virtual-device train-step compile is minutes on this
# 1-core host; MICRO's is ~1 min).
MICRO = K3MConfig(
    vocab_size=128, hidden_size=16, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=32, v_feature_size=8,
    v_target_size=7, v_hidden_size=16, v_num_hidden_layers=1,
    v_num_attention_heads=2, v_intermediate_size=16, bi_hidden_size=16,
    bi_num_attention_heads=2, v_biattention_id=(0,), t_biattention_id=(1,),
    max_position_embeddings=32, num_negative_pv=2, if_pre_sampling=1)


def make_micro_batch(B=8, seed=0):
    return make_pretrain_batch(MICRO, B=B, L=8, Lpv=12, R=4, P=3, seed=seed)


# One-layer-per-stream variant for the most compile-expensive tests (the
# alignment twin tower compiles the tri-pass trunk TWICE): ~half of MICRO's
# cold-compile cost while still exercising co-attention + fusion +
# structure aggregation.
NANO = MICRO.replace(num_hidden_layers=1, v_num_hidden_layers=1,
                     v_biattention_id=(0,), t_biattention_id=(0,))


def make_nano_batch(B=8, seed=0):
    return make_pretrain_batch(NANO, B=B, L=8, Lpv=12, R=4, P=3, seed=seed)


def single_mesh():
    """1-device mesh for fast-tier trainer tests: trainer properties that
    are mesh-size-agnostic (optimizer guards, recompile caching, micro
    slicing) compile 2-4x faster than on the default 8-virtual-device
    mesh. Multi-device semantics are covered by test_multidevice /
    test_hlo_collectives."""
    import jax as _jax

    from k3m_tpu.train import mesh as _mesh_lib
    return _mesh_lib.make_mesh(n_data=1, n_model=1,
                               devices=_jax.devices()[:1])


@pytest.fixture(scope="session")
def tiny_config():
    return TINY


def make_pretrain_batch(cfg: K3MConfig, B=3, L=10, Lpv=16, R=5, P=4, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        input_ids=rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32),
        input_mask=np.ones((B, L), np.int32),
        segment_ids=np.zeros((B, L), np.int32),
        lm_label_ids=np.where(
            rng.random((B, L)) < 0.2,
            rng.integers(0, cfg.vocab_size, (B, L)), -1).astype(np.int32),
        is_next=np.zeros((B,), np.int32),
        input_ids_pv=rng.integers(1, cfg.vocab_size, (B, Lpv)).astype(np.int32),
        input_mask_pv=np.ones((B, Lpv), np.int32),
        segment_ids_pv=np.zeros((B, Lpv), np.int32),
        lm_label_ids_pv=np.where(
            rng.random((B, Lpv)) < 0.2,
            rng.integers(0, cfg.vocab_size, (B, Lpv)), -1).astype(np.int32),
        is_next_pv_v=np.zeros((B,), np.int32),
        is_next_pv_t=np.zeros((B,), np.int32),
        index_p=np.concatenate([
            rng.integers(1, Lpv, (B, 2, 2)), np.zeros((B, P - 2, 2), int)],
            axis=1).astype(np.int32),
        index_v=np.concatenate([
            rng.integers(1, Lpv, (B, 2, 2)), np.zeros((B, P - 2, 2), int)],
            axis=1).astype(np.int32),
        image_feat=rng.normal(size=(B, R + 1, cfg.v_feature_size)).astype(np.float32),
        image_loc=rng.normal(size=(B, R + 1, 5)).astype(np.float32),
        image_mask=np.ones((B, R + 1), np.int32),
        image_label=np.where(rng.random((B, R)) < 0.3, 1, -1).astype(np.int32),
        image_target=np.abs(rng.normal(size=(B, R, cfg.v_target_size))
                            ).astype(np.float32),
    )


@pytest.fixture()
def pretrain_batch(tiny_config):
    return make_pretrain_batch(tiny_config)
