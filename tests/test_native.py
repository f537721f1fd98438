"""Native C++ WordPiece tokenizer: build, parity vs the pure-Python
implementation, fallback behavior, and bert_ops integration.

Reference equivalent: tensorflow_text's C++ BertTokenizer driven from
bert_ops.py:22-57 — here the C++ lives in openvision_tpu/native/ with the
Unicode tables generated from Python's own unicodedata (gen_tables.py).
"""

import os
import random
import string

import numpy as np
import pytest

from openvision_tpu.native import build as native_build
from openvision_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = "assets/bert_base_vocab_bos_eos.txt"


@pytest.fixture(scope="module")
def native_tok():
    if not os.path.exists(native_build.os.path.join(
            native_build.HERE, "libwordpiece.so")):
        if not native_build.build(verbose=False):
            pytest.skip("native toolchain unavailable")
    tok = WordPieceTokenizer(VOCAB)
    if tok._native is None:
        pytest.skip("native library failed its canary self-check")
    return tok


CORPUS = [
    "Hello, world!",
    "a photo of a cat sitting on a mat",
    "naïve café — ÜBER straße",
    "日本語のテキスト and English mixed 中文",
    "ΣΟΦΙΑ ΚΑΙ ΣΟΦΟΣ",  # context-sensitive sigma → routed to Python
    "emoji 🙂 and math ∑∫√ symbols",
    "punct...!!!??  --- [brackets] {braces} 'quotes'",
    "verylongwordthatdoesnotexistinthevocabulary" * 3,
    "MiXeD CaSe WoRdS",
    "\t tabs\nand\rnewlines  nbsp  emspace",
    "control\x01chars\x7fdropped",
    "ÅNGSTRÖM unit Å",
    "combining: é vs é",
    "",
    "   ",
]


def test_native_matches_python_corpus(native_tok):
    rng = random.Random(0)
    tests = list(CORPUS)
    for _ in range(300):
        n = rng.randint(1, 30)
        tests.append(" ".join(
            "".join(rng.choices(
                string.ascii_letters + string.digits + ".,!?-'", k=rng.randint(1, 12)))
            for _ in range(n)))
    for t in tests:
        assert native_tok.encode(t) == native_tok._encode_py(t), repr(t)


def test_native_matches_python_unicode_sweep(native_tok):
    # every BMP codepoint class gets exercised somewhere in this sweep
    rng = random.Random(1)
    for _ in range(60):
        s = "".join(
            chr(rng.randint(0x20, 0x2FFF)) for _ in range(rng.randint(1, 40))
        )
        if "Σ" in s:
            continue
        assert native_tok.encode(s) == native_tok._encode_py(s), repr(s)


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("OPENVISION_NO_NATIVE", "1")
    tok = WordPieceTokenizer(VOCAB)
    assert tok._native is None
    assert tok.encode("hello world") == tok._encode_py("hello world")


def test_bert_ops_identical_through_native(native_tok):
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn(
        f'my_bert_tokenize(max_len=16, output_token_len=12, '
        f'vocab_path="{VOCAB}", add_bos=True, add_eos=True, '
        f'key1="txt", key2="llava_caption")'
    )
    d = {"txt": "a photo of a naïve cat", "llava_caption": "the cat sits"}
    out = fn(dict(d), np.random.default_rng(0))
    os.environ["OPENVISION_NO_NATIVE"] = "1"
    try:
        from openvision_tpu.data import tokenizer as tok_mod

        tok_mod.get_tokenizer.cache_clear()
        out_py = fn(dict(d), np.random.default_rng(0))
    finally:
        del os.environ["OPENVISION_NO_NATIVE"]
        tok_mod.get_tokenizer.cache_clear()
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(out_py[k]))
