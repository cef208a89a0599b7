"""Strict real-asset boundary checks (VERDICT r2 item 4).

The first run against real assets (21128-entry vocab.txt, HF
pytorch_model.bin, faster_rcnn_from_caffe.pkl) is where silent breakage
hides: a renamed key, an unexpected layout, an unfolded BN. These tests
pin that every importer FAILS LOUDLY instead of silently dropping or
random-initializing tensors.
"""

import pickle

import jax
import numpy as np
import pytest

from tests.conftest import MICRO, make_micro_batch


# --------------------------------------------------------------- vocab

def _write_vocab(tmp_path, mutate=None):
    from k3m_tpu.tokenization import build_synthetic_vocab
    vocab = build_synthetic_vocab(300)
    if mutate:
        mutate(vocab)
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    return str(p)


def test_vocab_layout_ok(tmp_path):
    from k3m_tpu.tokenization import WordPieceTokenizer
    tok = WordPieceTokenizer(vocab_file=_write_vocab(tmp_path))
    assert tok.vocab[":"] == 131 and tok.vocab[";"] == 132


def test_vocab_missing_file_raises():
    from k3m_tpu.tokenization import WordPieceTokenizer
    with pytest.raises(FileNotFoundError):
        WordPieceTokenizer(vocab_file="/nonexistent/vocab.txt")


def test_vocab_bad_delimiter_layout_raises(tmp_path):
    from k3m_tpu.tokenization import WordPieceTokenizer

    def swap(vocab):
        vocab[131], vocab[132] = vocab[132], vocab[131]  # ';' before ':'

    with pytest.raises(ValueError, match="id 131"):
        WordPieceTokenizer(vocab_file=_write_vocab(tmp_path, swap))


def test_vocab_bad_special_layout_raises(tmp_path):
    from k3m_tpu.tokenization import WordPieceTokenizer

    def drop_mask(vocab):
        vocab[103] = "[MASKED]"

    with pytest.raises(ValueError, match="id 103"):
        WordPieceTokenizer(vocab_file=_write_vocab(tmp_path, drop_mask))


def test_vocab_check_override(tmp_path, monkeypatch):
    from k3m_tpu.tokenization import WordPieceTokenizer
    monkeypatch.setenv("K3M_SKIP_VOCAB_CHECK", "1")

    def swap(vocab):
        vocab[131], vocab[132] = vocab[132], vocab[131]

    WordPieceTokenizer(vocab_file=_write_vocab(tmp_path, swap))  # no raise


# ------------------------------------------------------- torch importer

@pytest.fixture(scope="module")
def micro_params():
    from k3m_tpu.model.pretrain import K3MForPretraining
    model = K3MForPretraining(MICRO)
    batch = make_micro_batch(B=2)
    return jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, batch, deterministic=True))()


def _reference_bin(tmp_path, micro_params, mutate=None):
    import torch

    from k3m_tpu.train.convert import _flatten, flat_to_reference
    sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
          for k, v in flat_to_reference(
              _flatten(micro_params["params"])).items()}
    if mutate:
        mutate(sd)
    path = str(tmp_path / "ref.bin")
    torch.save(sd, path)
    return path


def test_strict_full_checkpoint_round_trip(tmp_path, micro_params):
    """A faithful reference .bin loads strictly AND completely."""
    from k3m_tpu.train.convert import load_pretrained_into_params
    path = _reference_bin(tmp_path, micro_params)
    load_pretrained_into_params(micro_params, path, strict=True,
                               require_complete=True)


def test_strict_renamed_key_fails(tmp_path, micro_params):
    from k3m_tpu.train.convert import load_pretrained_into_params

    def rename(sd):
        sd["embeddings.word_embedding.weight"] = sd.pop(
            "embeddings.word_embeddings.weight")

    path = _reference_bin(tmp_path, micro_params, rename)
    with pytest.raises(ValueError, match="not consumed"):
        load_pretrained_into_params(micro_params, path, strict=True)


def test_strict_rogue_extra_key_fails(tmp_path, micro_params):
    import torch

    from k3m_tpu.train.convert import load_pretrained_into_params

    def extra(sd):
        sd["encoder.layer.0.attention.self.query_v2.weight"] = \
            torch.zeros(4, 4)

    path = _reference_bin(tmp_path, micro_params, extra)
    with pytest.raises(ValueError, match="not consumed"):
        load_pretrained_into_params(micro_params, path, strict=True)


def test_strict_shape_mismatch_fails(tmp_path, micro_params):
    import torch

    from k3m_tpu.train.convert import load_pretrained_into_params

    def reshape(sd):
        sd["embeddings.word_embeddings.weight"] = torch.zeros(7, 3)

    path = _reference_bin(tmp_path, micro_params, reshape)
    with pytest.raises(ValueError, match="not consumed"):
        load_pretrained_into_params(micro_params, path, strict=True)


def test_require_complete_partial_checkpoint_fails(tmp_path, micro_params):
    """An HF text-stream-only checkpoint must fail require_complete (and
    pass plain strict: partial-load is the documented HF init path)."""
    from k3m_tpu.train.convert import load_pretrained_into_params

    def text_only(sd):
        for k in list(sd):
            if not (k.startswith("embeddings.")
                    or k.startswith("encoder.layer.")):
                del sd[k]

    path = _reference_bin(tmp_path, micro_params, text_only)
    load_pretrained_into_params(micro_params, path, strict=True)  # ok
    with pytest.raises(ValueError, match="uninitialized"):
        load_pretrained_into_params(micro_params, path, strict=True,
                                    require_complete=True)


def test_strict_dead_keys_are_ignorable(tmp_path, micro_params):
    """The reference's documented-dead params (poolers, q_dense*, tied
    decoder alias, HF buffers) must NOT trip strict mode."""
    import torch

    from k3m_tpu.train.convert import load_pretrained_into_params

    def add_dead(sd):
        sd["t_pooler.dense.weight"] = torch.zeros(4, 4)
        sd["v_pooler.dense.weight"] = torch.zeros(4, 4)
        sd["encoder.c_layer.0.biOutput.q_dense1.weight"] = torch.zeros(4, 4)
        sd["map_individual_to_bi.weight"] = torch.zeros(4, 4)
        sd["embeddings.position_ids"] = torch.arange(16)

    path = _reference_bin(tmp_path, micro_params, add_dead)
    load_pretrained_into_params(micro_params, path, strict=True)


# -------------------------------------------------------- caffe importer

def _tiny_frcnn_template():
    """Shape-only template of the FRCNN param tree (no compile)."""
    from k3m_tpu.vision.frcnn import FasterRCNN
    import jax.numpy as jnp
    model = FasterRCNN()
    img = jax.ShapeDtypeStruct((64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img,
                            (64.0, 64.0))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _synthetic_caffe_sd(template):
    """detectron2-layout state dict matching the template's shapes
    (same construction as tests/test_vision.py's round trip)."""
    rng = np.random.default_rng(7)
    p = template["params"]
    sd = {}

    def conv(src, name, bias=False):
        kh, kw, ci, co = src["kernel"].shape
        sd[f"{name}.weight"] = rng.standard_normal(
            (co, ci, kh, kw)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    def bn(src, name):
        c = src["scale"].shape[0]
        sd[f"{name}.norm.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.norm.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.norm.running_mean"] = rng.standard_normal(
            c).astype(np.float32)
        sd[f"{name}.norm.running_var"] = rng.uniform(
            0.5, 1.5, c).astype(np.float32)

    def dense(src, name):
        ci, co = src["kernel"].shape
        sd[f"{name}.weight"] = rng.standard_normal((co, ci)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    bk = p["backbone"]
    conv(bk["stem_conv1"], "backbone.stem.conv1")
    bn(bk["stem_bn1"], "backbone.stem.conv1")
    for stage, nblocks in {"res2": 3, "res3": 4, "res4": 23}.items():
        for i in range(nblocks):
            blk, base = bk[stage][f"block{i}"], f"backbone.{stage}.{i}"
            for cname in ("conv1", "conv2", "conv3"):
                conv(blk[cname], f"{base}.{cname}")
                bn(blk[f"{cname}_bn"], f"{base}.{cname}")
            if i == 0:
                conv(blk["shortcut"], f"{base}.shortcut")
                bn(blk["shortcut_bn"], f"{base}.shortcut")
    for i in range(3):
        blk, base = p["roi_head"]["res5"][f"block{i}"], f"roi_heads.res5.{i}"
        for cname in ("conv1", "conv2", "conv3"):
            conv(blk[cname], f"{base}.{cname}")
            bn(blk[f"{cname}_bn"], f"{base}.{cname}")
        if i == 0:
            conv(blk["shortcut"], f"{base}.shortcut")
            bn(blk["shortcut_bn"], f"{base}.shortcut")
    conv(p["rpn"]["conv"], "proposal_generator.rpn_head.conv", bias=True)
    conv(p["rpn"]["objectness"],
         "proposal_generator.rpn_head.objectness_logits", bias=True)
    conv(p["rpn"]["anchor_deltas"],
         "proposal_generator.rpn_head.anchor_deltas", bias=True)
    dense(p["box_predictor"]["cls_score"], "roi_heads.box_predictor.cls_score")
    dense(p["box_predictor"]["bbox_pred"], "roi_heads.box_predictor.bbox_pred")
    return sd


def test_caffe_strict_extra_key_fails():
    from k3m_tpu.vision.frcnn import convert_caffe_weights
    template = _tiny_frcnn_template()
    sd = _synthetic_caffe_sd(template)
    sd["roi_heads.mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="never consumed"):
        convert_caffe_weights(sd, template)


def test_caffe_strict_missing_key_fails():
    from k3m_tpu.vision.frcnn import convert_caffe_weights
    template = _tiny_frcnn_template()
    sd = _synthetic_caffe_sd(template)
    del sd["proposal_generator.rpn_head.conv.bias"]
    with pytest.raises((ValueError, KeyError)):
        convert_caffe_weights(sd, template)


def test_caffe_strict_ignorable_buffers_pass():
    from k3m_tpu.vision.frcnn import convert_caffe_weights
    template = _tiny_frcnn_template()
    sd = _synthetic_caffe_sd(template)
    sd["pixel_mean"] = np.zeros(3, np.float32)
    sd["backbone.stem.conv1.norm.num_batches_tracked"] = np.zeros(
        (), np.int64)
    convert_caffe_weights(sd, template)  # no raise


def test_caffe_lenient_override(monkeypatch):
    from k3m_tpu.vision.frcnn import convert_caffe_weights
    monkeypatch.setenv("K3M_CAFFE_LENIENT", "1")
    template = _tiny_frcnn_template()
    sd = _synthetic_caffe_sd(template)
    sd["roi_heads.mystery.weight"] = np.zeros((3, 3), np.float32)
    convert_caffe_weights(sd, template)  # no raise
