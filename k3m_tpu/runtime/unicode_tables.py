"""Unicode classification/transform tables for the native (C++) tokenizer.

The C++ basic tokenizer (preprocess.cc) must reproduce
k3m_tpu/tokenization.py exactly, which in turn matches HF BertTokenizer
(reference train_concap_struc.py:222). Rather than reimplementing Unicode
in C++, the Python side generates, from its own `unicodedata`:

  * a per-codepoint flag byte (whitespace/control/punctuation/CJK/drop/
    python-isspace) mirroring tokenization.py's _is_whitespace /
    _is_control / _is_punctuation / _is_cjk predicates and str.split()
    semantics, and
  * a per-codepoint transform table encoding
    strip_Mn(NFD(lower(chr(cp)))) — the lower/strip-accents step of
    _basic_tokenize — as (offset, length) runs into a flat codepoint pool,
    with length 0xFF meaning "identity".

so the native tokenizer matches the Python one by construction. (Known
divergence, documented in preprocess.cc: the table lowers U+03A3 GREEK
CAPITAL SIGMA context-freely; Python's str.lower() applies the
Final_Sigma rule. Irrelevant for the Chinese product domain, and the
golden tests over the bundled corpus would catch any real drift.)

Building the tables walks all 0x110000 codepoints (~10 s), so the result
is cached as an .npz next to this file, keyed by _VERSION and
unidata_version.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np

MAX_CP = 0x110000

F_WS = 1        # _is_whitespace: " \t\n\r" or category Zs
F_CTRL = 2      # _is_control: category C* except \t\n\r
F_PUNCT = 4     # _is_punctuation: ASCII punct ranges or category P*
F_CJK = 8       # _is_cjk ranges
F_DROP = 16     # cp == 0 or cp == 0xFFFD (dropped in _clean_text)
F_PYSPACE = 32  # str.isspace() (str.split() separators)

_VERSION = 1
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_unicode_tables.npz")

_IDENTITY = 0xFF  # trlen sentinel: transform(cp) == [cp]


def _is_cjk(cp: int) -> bool:
    # mirror of tokenization.py:_is_cjk
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def _build():
    flags = np.zeros(MAX_CP, np.uint8)
    troff = np.full(MAX_CP, -1, np.int32)
    trlen = np.full(MAX_CP, _IDENTITY, np.uint8)
    pool: list[int] = []
    cat = unicodedata.category
    nfd = unicodedata.normalize
    for cp in range(MAX_CP):
        ch = chr(cp)
        c = cat(ch)
        f = 0
        if ch in (" ", "\t", "\n", "\r") or c == "Zs":
            f |= F_WS
        if ch not in ("\t", "\n", "\r") and c[0] == "C":
            f |= F_CTRL
        if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
                or (123 <= cp <= 126) or c[0] == "P":
            f |= F_PUNCT
        if _is_cjk(cp):
            f |= F_CJK
        if cp == 0 or cp == 0xFFFD:
            f |= F_DROP
        if ch.isspace():
            f |= F_PYSPACE
        flags[cp] = f
        out = [ord(x) for x in nfd("NFD", ch.lower())
               if cat(x) != "Mn"]
        if out != [cp]:
            assert len(out) < _IDENTITY
            troff[cp] = len(pool)
            trlen[cp] = len(out)
            pool.extend(out)
    return flags, troff, trlen, np.asarray(pool, np.uint32)


def get_tables():
    """(flags[MAX_CP] u8, troff[MAX_CP] i32, trlen[MAX_CP] u8, pool u32)."""
    key = f"{_VERSION}:{unicodedata.unidata_version}"
    if os.path.exists(_CACHE):
        try:
            z = np.load(_CACHE)
            if str(z["key"]) == key:
                return z["flags"], z["troff"], z["trlen"], z["trpool"]
        except Exception:
            pass
    flags, troff, trlen, trpool = _build()
    # np.savez appends ".npz" when the name lacks it — name the tmp with
    # the suffix so the atomic-rename source actually exists
    tmp = _CACHE + f".tmp.{os.getpid()}.npz"
    try:
        np.savez_compressed(tmp, key=key, flags=flags, troff=troff,
                            trlen=trlen, trpool=trpool)
        os.replace(tmp, _CACHE)
    except OSError:
        pass  # read-only checkout: rebuild each process
    return flags, troff, trlen, trpool
