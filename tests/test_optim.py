"""Optimizer construction tests: schedule shape, decay masking, lr scaling."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from k3m_tpu.train.optim import (
    is_no_decay, make_optimizer, warmup_linear_schedule,
)


def test_warmup_linear_schedule_shape():
    s = warmup_linear_schedule(1e-3, warmup_steps=10, total_steps=100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(55)), 1e-3 * 45 / 90, rtol=1e-6)
    assert float(s(100)) == 0.0
    assert float(s(200)) == 0.0  # clamped, never negative


def test_no_decay_paths():
    assert is_no_decay(("trunk", "encoder", "layer_0", "attention", "query",
                        "bias"))
    assert is_no_decay(("trunk", "embeddings", "LayerNorm", "scale"))
    assert not is_no_decay(("trunk", "encoder", "layer_0", "attention",
                            "query", "kernel"))


def _tiny_params():
    return {"params": {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "LayerNorm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
    }}


def test_weight_decay_only_on_kernels():
    params = _tiny_params()
    tx = make_optimizer(params, learning_rate=1.0, warmup_steps=1,
                        total_steps=10, weight_decay=0.5)
    state = tx.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, state = tx.update(zeros, state, params)
    # at step 0 lr=0 -> all updates zero regardless of decay
    assert all(float(jnp.abs(u).max()) == 0 for u in jax.tree.leaves(updates))
    # step 1: lr>0; kernel gets decay shrink, LayerNorm/bias don't
    updates, state = tx.update(zeros, state, params)
    u = updates["params"]
    assert float(jnp.abs(u["dense"]["kernel"]).max()) > 0
    assert float(jnp.abs(u["dense"]["bias"]).max()) == 0
    assert float(jnp.abs(u["LayerNorm"]["scale"]).max()) == 0


def test_pretrained_lr_scale():
    params = _tiny_params()
    pretrained = {"params/dense/kernel", "params/dense/bias"}
    tx_scaled = make_optimizer(params, learning_rate=1.0, warmup_steps=1,
                               total_steps=10, weight_decay=0.0,
                               pretrained_paths=pretrained)
    tx_plain = make_optimizer(params, learning_rate=1.0, warmup_steps=1,
                              total_steps=10, weight_decay=0.0)
    grads = jax.tree.map(jnp.ones_like, params)
    s1, s2 = tx_scaled.init(params), tx_plain.init(params)
    u1, s1 = tx_scaled.update(grads, s1, params)
    u1, s1 = tx_scaled.update(grads, s1, params)  # step 1 has lr > 0
    u2, s2 = tx_plain.update(grads, s2, params)
    u2, s2 = tx_plain.update(grads, s2, params)
    ratio = (float(u1["params"]["dense"]["kernel"][0, 0])
             / float(u2["params"]["dense"]["kernel"][0, 0]))
    np.testing.assert_allclose(ratio, 0.1, rtol=1e-5)
    ratio_ln = (float(u1["params"]["LayerNorm"]["scale"][0])
                / float(u2["params"]["LayerNorm"]["scale"][0]))
    np.testing.assert_allclose(ratio_ln, 1.0, rtol=1e-5)


def test_grad_accumulation():
    params = _tiny_params()
    tx = make_optimizer(params, learning_rate=1.0, warmup_steps=1,
                        total_steps=10, weight_decay=0.0, grad_accum_steps=2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    u1, state = tx.update(grads, state, params)
    # first micro-step: no update applied yet
    assert all(float(jnp.abs(u).max()) == 0 for u in jax.tree.leaves(u1))
    u2, state = tx.update(grads, state, params)
    assert any(float(jnp.abs(u).max()) >= 0 for u in jax.tree.leaves(u2))


def test_resize_word_embeddings():
    """Flax counterpart of the reference's _get_resized_embeddings
    (vilbert_k3m/utils.py:959-1010)."""
    import numpy as np

    from k3m_tpu.train.convert import resize_word_embeddings

    params = {"params": {
        "trunk": {"word_embeddings": np.arange(20, dtype=np.float32
                                               ).reshape(10, 2)},
        "cls": {"predictions": {"decoder_bias": np.arange(10, dtype=np.float32)}},
        "other": {"kernel": np.ones((3, 3), np.float32)},
    }}
    grown = resize_word_embeddings(params, 14)
    gt = grown["params"]["trunk"]["word_embeddings"]
    gb = grown["params"]["cls"]["predictions"]["decoder_bias"]
    assert gt.shape == (14, 2) and gb.shape == (14,)
    np.testing.assert_array_equal(gt[:10],
                                  params["params"]["trunk"]["word_embeddings"])
    np.testing.assert_array_equal(gb[:10], np.arange(10))
    assert (gb[10:] == 0).all()
    np.testing.assert_array_equal(grown["params"]["other"]["kernel"],
                                  np.ones((3, 3)))

    shrunk = resize_word_embeddings(params, 6)
    assert shrunk["params"]["trunk"]["word_embeddings"].shape == (6, 2)
    np.testing.assert_array_equal(
        shrunk["params"]["cls"]["predictions"]["decoder_bias"],
        np.arange(6))


def test_tf_checkpoint_import(tmp_path):
    """load_tf_state_dict maps TF1 BERT variable names to torch layout
    (reference load_tf_weights_in_bert, vilbert_k3m.py:56-116): kernel
    transposed, gamma/beta -> weight/bias, *_embeddings -> .weight,
    adam_m/adam_v skipped."""
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5, 4)).astype(np.float32)
    kernel = rng.normal(size=(4, 3)).astype(np.float32)
    bias = rng.normal(size=(3,)).astype(np.float32)
    gamma = rng.normal(size=(4,)).astype(np.float32)

    g = tf1.Graph()
    with g.as_default():
        tf1.get_variable("bert/embeddings/word_embeddings", initializer=emb)
        tf1.get_variable("bert/embeddings/LayerNorm/gamma", initializer=gamma)
        tf1.get_variable("bert/embeddings/LayerNorm/beta",
                         initializer=np.zeros(4, np.float32))
        tf1.get_variable("bert/encoder/layer_0/attention/self/query/kernel",
                         initializer=kernel)
        tf1.get_variable("bert/encoder/layer_0/attention/self/query/bias",
                         initializer=bias)
        tf1.get_variable("bert/encoder/layer_0/attention/self/query/adam_m",
                         initializer=kernel)
        saver = tf1.train.Saver()
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = saver.save(sess, str(tmp_path / "model.ckpt"))

    from k3m_tpu.train.convert import (is_tf_checkpoint, load_tf_state_dict,
                                       reference_to_flat)
    assert is_tf_checkpoint(prefix)
    sd = load_tf_state_dict(prefix)
    np.testing.assert_array_equal(
        sd["bert.embeddings.word_embeddings.weight"], emb)
    np.testing.assert_array_equal(sd["bert.embeddings.LayerNorm.weight"], gamma)
    # kernel transposed to torch [out, in]
    np.testing.assert_array_equal(
        sd["bert.encoder.layer.0.attention.self.query.weight"], kernel.T)
    np.testing.assert_array_equal(
        sd["bert.encoder.layer.0.attention.self.query.bias"], bias)
    assert not any("adam" in k for k in sd)
    # flows through the standard torch->flax mapping
    flat = reference_to_flat(sd)
    np.testing.assert_array_equal(flat["trunk/word_embeddings"], emb)
    np.testing.assert_array_equal(
        flat["trunk/encoder/layer_0/attention/query/kernel"], kernel)


@pytest.mark.slow
def test_flax_to_torch_export_roundtrip(tmp_path):
    """save_reference_checkpoint (save_pretrained/.bin-save parity) must
    invert reference_to_flat exactly: export -> import -> identical leaves,
    with torch-layout kernels, the bert. trunk prefix, and the tied MLM
    decoder alias present."""
    import jax

    from k3m_tpu.model.pretrain import K3MForPretraining
    from k3m_tpu.train.convert import (
        _flatten, load_torch_state_dict, reference_to_flat,
        save_reference_checkpoint)
    from tests.conftest import TINY, make_pretrain_batch

    model = K3MForPretraining(TINY)
    batch = make_pretrain_batch(TINY, B=2)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1), "lpm": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    path = str(tmp_path / "pytorch_model.bin")
    n = save_reference_checkpoint(params, path)
    assert n > 50

    sd = load_torch_state_dict(path)
    assert "embeddings.word_embeddings.weight" in sd  # bare, like the tri model
    assert "cls.predictions.decoder.weight" in sd  # tied alias
    np.testing.assert_array_equal(sd["cls.predictions.decoder.weight"],
                                  sd["embeddings.word_embeddings.weight"])
    # kernels are torch [out, in]
    q = sd["encoder.layer.0.attention.self.query.weight"]
    assert q.shape == (TINY.hidden_size, TINY.hidden_size)

    flat_orig = _flatten(params["params"])
    flat_back = reference_to_flat(sd)
    missing = [p for p in flat_back if p not in flat_orig]
    assert not missing, missing
    for p, v in flat_back.items():
        np.testing.assert_array_equal(np.asarray(flat_orig[p], np.float32),
                                      v, err_msg=p)
    # every exported leaf came back (round trip is lossless for our tree)
    assert len(flat_back) == n - 1  # minus the tied decoder alias
