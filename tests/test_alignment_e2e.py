"""End-to-end item-alignment slice: bundled corpus -> feature records ->
pair records (jsonl join) -> AlignmentLoader -> train/eval/predict.

Covers the finetune.py capabilities (reference finetune.py --do_train /
--do_eval threshold sweep :1092-1096 / --do_pred jsonl dump :1119-1212)."""

import json

import numpy as np
import pytest

from k3m_tpu.config import K3MConfig
from k3m_tpu.data.pipeline import AlignmentLoader
from k3m_tpu.data.prepare import (build_feature_records, build_pair_records,
                                  parse_raw_tsv)
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.data.records import write_records
from k3m_tpu.tokenization import get_tokenizer

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"


@pytest.fixture(scope="module")
def pair_records(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("align")
    feats = str(tmp / "feat.k3mr")
    rows = list(parse_raw_tsv(SAMPLE))[:16]
    write_records(feats, build_feature_records(rows))
    pairs = str(tmp / "pairs.jsonl")
    rng = np.random.default_rng(0)
    with open(pairs, "w", encoding="utf-8") as f:
        for i in range(0, 16, 2):
            f.write(json.dumps({
                "src_item_id": rows[i]["item_id"],
                "tgt_item_id": rows[i + 1]["item_id"],
                "item_label": int(rng.integers(0, 2))}) + "\n")
    out = str(tmp / "pairs.k3mr")
    write_records(out, build_pair_records(pairs, feats))
    return out


@pytest.mark.slow
def test_alignment_train_eval_predict(pair_records, tmp_path):
    from k3m_tpu.train.alignment_loop import AlignmentTrainer

    tok = get_tokenizer()
    shapes = ShapeSpec(max_seq_len=16, max_seq_len_pv=32, max_num_pv=4,
                       max_region_len=2)
    loader = AlignmentLoader(pair_records, tok, shapes, batch_size=8,
                             shuffle=False, seed=0)
    batch = next(iter(loader))
    assert batch["label"].shape == (8,)
    assert batch["item1"]["input_ids"].shape == (8, 16)

    cfg = K3MConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, v_target_size=1601,
        v_hidden_size=24, v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=24, bi_hidden_size=24, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1),
        max_position_embeddings=64, loss_type="inner")
    trainer = AlignmentTrainer(cfg, learning_rate=5e-4, total_steps=20,
                               sample_batch=batch)
    loss, probs = trainer.train_step(batch)
    loss = float(np.asarray(loss))
    assert np.isfinite(loss) and loss > 0
    assert np.asarray(probs).shape == (8,)

    sweep = trainer.evaluate([batch])
    assert set(sweep) == {round(t, 1) for t in np.arange(0.1, 1.0, 0.1)}
    for stats in sweep.values():
        assert 0.0 <= stats["f1"] <= 1.0

    out = str(tmp_path / "deepAI_result_threshold=0.5.jsonl")
    trainer.predict([batch], out, threshold=0.5)
    lines = [json.loads(l) for l in open(out, encoding="utf-8")]
    assert len(lines) == 8
    row = lines[0]
    assert set(row) == {"src_item_id", "src_item_emb", "tgt_item_id",
                        "tgt_item_emb", "threshold"}
    emb = row["src_item_emb"]
    # item embedding = c_final, hidden_size-dim (ref item_embedding :3329)
    assert emb.startswith("[") and len(emb.split(",")) == cfg.hidden_size
