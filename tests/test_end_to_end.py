"""End-to-end slice on the bundled sample corpus: raw TSV -> K3MR records
-> PretrainLoader (real 21128-token vocab) -> jitted SPMD train steps.

Mirrors the reference's de-facto validation flow (SURVEY §4): smoke-train
on data/raw_multidata_of_product_preatrain.small_train."""

import numpy as np
import pytest

from k3m_tpu.config import K3MConfig
from k3m_tpu.data.pipeline import PretrainLoader
from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.data.records import write_records
from k3m_tpu.tokenization import get_tokenizer

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e") / "train.k3mr")
    write_records(out, build_feature_records(
        list(parse_raw_tsv(SAMPLE))[:24]))
    return out


@pytest.mark.slow
def test_end_to_end_pretrain_on_bundled_sample(record_file):
    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    tok = get_tokenizer()
    shapes = ShapeSpec(max_seq_len=24, max_seq_len_pv=48, max_num_pv=6,
                       max_region_len=4)
    loader = PretrainLoader(record_file, tok, shapes, batch_size=8,
                            shuffle=True, seed=7, use_native=True)
    cfg = K3MConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        v_target_size=1601, v_hidden_size=24, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=24, bi_hidden_size=24,
        bi_num_attention_heads=4, v_biattention_id=(0, 1),
        t_biattention_id=(2, 3), max_position_embeddings=64,
        num_negative_pv=4)

    batches = []
    for b in loader:
        batches.append(b)
        if len(batches) == 3:
            break
    assert batches, "loader yielded nothing"
    b0 = batches[0]
    assert b0["input_ids"].shape == (8, 24)
    assert b0["input_ids_pv"].shape == (8, 48)
    assert b0["image_feat"].shape == (8, 5, 2048)     # 4 regions + global
    # real text made it through the real tokenizer (CLS + content)
    assert (b0["input_ids"][:, 0] == tok.cls_token_id).all()
    assert (b0["input_mask"].sum(1) > 2).all()

    trainer = PretrainTrainer(
        cfg, learning_rate=5e-4, warmup_steps=2, total_steps=50,
        sample_batch=batches[0])
    losses = []
    for b in batches:
        m = trainer.train_step(b)
        losses.append(float(np.asarray(m["loss"])))
    assert all(np.isfinite(l) for l in losses), losses
    # MLM loss on a 21128 vocab starts near ln(21128) ~ 10; just require
    # motion + finiteness across the jitted steps
    assert losses[0] > 0


def test_end_to_end_epoch_determinism(record_file):
    tok = get_tokenizer()
    shapes = ShapeSpec(max_seq_len=24, max_seq_len_pv=48, max_num_pv=6,
                       max_region_len=4)

    def first_batch(seed):
        loader = PretrainLoader(record_file, tok, shapes, batch_size=8,
                                shuffle=True, seed=seed)
        return next(iter(loader))

    a, b = first_batch(5), first_batch(5)
    for k in ("input_ids", "lm_label_ids", "input_ids_pv", "image_label"):
        np.testing.assert_array_equal(a[k], b[k])
    c = first_batch(6)
    assert any(not np.array_equal(a[k], c[k])
               for k in ("input_ids", "lm_label_ids"))
