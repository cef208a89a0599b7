"""Tokenizer contract tests (reference behaviours it must preserve)."""

import numpy as np

from k3m_tpu.tokenization import get_tokenizer


def test_vocab_layout_pins_pv_delimiters():
    tok = get_tokenizer()
    # pv masking/indexing is keyed on raw ids 131=':' 132=';'
    # (concept_cap_dataset_struc.py:785-840)
    assert tok.convert_tokens_to_ids(":") == 131
    assert tok.convert_tokens_to_ids(";") == 132
    assert tok.pad_token_id == 0
    assert tok.cls_token_id == 101
    assert tok.sep_token_id == 102
    assert tok.mask_token_id == 103
    assert len(tok) == 21128


def test_cjk_chars_tokenize_individually():
    tok = get_tokenizer()
    ids = tok.encode("出售状态:现货")
    assert len(ids) == 7  # 4 CJK + ':' + 2 CJK
    assert ids[4] == 131
    assert all(i != tok.unk_token_id for i in ids)


def test_special_token_wrapping():
    tok = get_tokenizer()
    ids = tok.encode("上衣")
    wrapped = tok.add_special_tokens_single_sentence(ids)
    assert wrapped[0] == tok.cls_token_id and wrapped[-1] == tok.sep_token_id
    assert wrapped[1:-1] == ids


def test_ascii_and_lowercasing():
    tok = get_tokenizer()
    assert tok.encode("ABC") == tok.encode("abc")
    assert tok.convert_tokens_to_ids("0") == 121  # digits at 121..130


def test_whitespace_ignored():
    tok = get_tokenizer()
    assert tok.encode("出 售") == tok.encode("出售")


def test_roundtrip_vocab_file(tmp_path):
    tok = get_tokenizer()
    path = str(tmp_path / "vocab.txt")
    tok.save_vocab(path)
    tok2 = get_tokenizer(path)
    assert tok2.encode("出售状态:现货") == tok.encode("出售状态:现货")
