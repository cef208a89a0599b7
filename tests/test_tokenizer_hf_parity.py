"""Byte-exact tokenizer equivalence vs HuggingFace BertTokenizer.

The reference tokenizes with HF `BertTokenizer.from_pretrained(
"bert-base-chinese" / "hfl/chinese-roberta-wwm-ext")`
(reference train_concap_struc.py:222, concept_cap_dataset_struc.py:605-606).
The real 21128-entry vocab.txt is a downloadable artifact the user supplies
(this environment has no egress), so the verifiable parity property is:
given the SAME vocab file, `WordPieceTokenizer(vocab_file=...)` produces
ids identical to HF's BertTokenizer — including '##' continuation pieces,
whole-token [UNK] on WordPiece failure, CJK char splitting, accent
stripping, and punctuation splitting. This test builds a realistic vocab
(bert-base-chinese special-token layout, ':'=131/';'=132 pinned, '##'
pieces, CJK chars harvested from the bundled reference sample) and checks
equivalence over the bundled product titles/pv strings plus adversarial
cases.
"""

import os

import pytest

transformers = pytest.importorskip("transformers")

from k3m_tpu.tokenization import WordPieceTokenizer

REF_SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"


def _sample_texts(n=60):
    texts = []
    if os.path.exists(REF_SAMPLE):
        with open(REF_SAMPLE, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= n:
                    break
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 4:
                    texts.append(parts[1])                      # title
                    texts.append(parts[3].replace("#", " "))    # pv string
    return texts


ADVERSARIAL = [
    "",
    "   ",
    "abc ab ax",                          # ##-pieces, whole-token UNK
    "Cosplay女装 2020冬季 新款H42",        # mixed CJK/ASCII/digits
    "café naïve ÀÉÎ übermensch",          # accents -> strip, lowercase
    "MC-106 YM-23!!!",                    # punctuation runs
    "a" * 150,                            # > max_chars_per_word -> [UNK]
    "出售状态:现货;女装:上衣",               # the pv delimiters ids 131/132
    "foo\tbar\nbaz\rqux",                 # whitespace variants
    "　全角　空格",                 # ideographic space (Zs)
    "price:¥199.00 50%off",
    "ｈｅｌｌｏ ＡＢＣ",                     # fullwidth latin (not CJK ranges)
    "㐀㐁 extension-A 龥",                  # CJK ext-A boundary chars
    "x\x00y\ufffdz",                    # control/replacement chars dropped
    "don't it's 'quoted'",
    "ab##cd ##ab",                        # literal ## in input text
]


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    """Realistic vocab: bert-base-chinese layout + ## pieces + sample CJK.

    K3M_VOCAB_FILE=<path> reruns the whole parity grid against a REAL
    vocab.txt instead (the first-real-asset validation recipe, README
    'Real assets')."""
    real = os.environ.get("K3M_VOCAB_FILE")
    if real:
        return real
    vocab = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(1, 100)]
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "<S>", "<T>"]
    vocab += [chr(c) for c in range(0x21, 0x7F)]   # ASCII: ':'=131, ';'=132
    assert vocab.index(":") == 131 and vocab.index(";") == 132
    # English words and continuation pieces (like the real vocab has)
    vocab += ["ab", "abc", "cos", "##play", "##b", "##c", "##06", "##23",
              "##off", "##00", "cafe", "##fe", "don", "##t", "it", "##s",
              "199", "50", "2020", "mc", "ym", "price", "off", "hello",
              "##llo", "he", "new", "##w"]
    # CJK chars seen in the bundled sample (each its own token, as in the
    # real vocab) — harvest from the first lines.
    seen = set(vocab)
    cjk = []
    for t in _sample_texts(60):
        for ch in t:
            cp = ord(ch)
            if 0x3400 <= cp <= 0x9FFF and ch not in seen:
                seen.add(ch)
                cjk.append(ch)
    # leave some sample CJK OUT of the vocab so [UNK] paths are exercised
    vocab += cjk[: max(1, int(len(cjk) * 0.9))]
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def both(vocab_path):
    hf = transformers.BertTokenizer(vocab_path)
    ours = WordPieceTokenizer(vocab_file=vocab_path)
    return hf, ours


def test_vocab_loaded_hf_exact_mode(both):
    hf, ours = both
    assert ours.char_fallback is False
    assert len(ours) == len(hf.vocab)
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    assert ours.mask_token_id == hf.mask_token_id
    assert ours.convert_tokens_to_ids(":") == 131
    assert ours.convert_tokens_to_ids(";") == 132


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_strings_match_hf(both, idx):
    hf, ours = both
    text = ADVERSARIAL[idx]
    hf_tokens = hf.tokenize(text)
    our_tokens = ours.tokenize(text)
    assert our_tokens == hf_tokens, (text, our_tokens, hf_tokens)
    assert ours.encode(text) == hf.convert_tokens_to_ids(hf_tokens)


def test_bundled_sample_corpus_matches_hf(both):
    """Every title + pv string in the first 60 bundled sample rows."""
    hf, ours = both
    texts = _sample_texts(60)
    assert len(texts) >= 100, "bundled reference sample not found"
    mismatches = []
    for t in texts:
        if ours.tokenize(t) != hf.tokenize(t):
            mismatches.append(t)
    assert not mismatches, mismatches[:3]


def test_special_token_wrap_matches_reference_contract(both):
    """encode() has NO special tokens; add_special_tokens wraps [CLS]/[SEP]
    (pytorch_transformers semantics, concept_cap_dataset_struc.py:605-675)."""
    hf, ours = both
    ids = ours.encode("abc 女装")
    wrapped = ours.add_special_tokens_single_sentence(ids)
    assert wrapped == hf.build_inputs_with_special_tokens(ids)
