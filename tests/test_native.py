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


def test_native_tar_index_matches_tarfile(tmp_path):
    import tarfile

    from openvision_tpu.native import build as nb
    from openvision_tpu.native.indexer import tar_index

    if not os.path.exists(os.path.join(nb.HERE, "libindexer.so")):
        if not nb.build(verbose=False):
            pytest.skip("native toolchain unavailable")

    p = tmp_path / "shard.tar"
    rng = random.Random(0)
    with tarfile.open(p, "w") as tf:
        for i in range(20):
            name = f"sample{i:04d}.jpg" if i % 3 else (
                "a/really/deep/" + "x" * 120 + f"/long_name_{i}.txt")
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 900)))
            info = tarfile.TarInfo(name)
            info.size = len(data)
            import io as _io

            tf.addfile(info, _io.BytesIO(data))

    native = tar_index(str(p))
    assert native is not None
    with tarfile.open(p) as tf:
        ref = [(m.name, m.offset_data, m.size) for m in tf if m.isfile()]
    assert native == ref

    # and the bytes at the recorded offsets are the members
    with open(p, "rb") as f, tarfile.open(p) as tf:
        for name, off, size in native[:5]:
            f.seek(off)
            assert f.read(size) == tf.extractfile(name).read()


def test_native_tfrecord_index_matches_python(tmp_path):
    import struct

    from openvision_tpu.native import build as nb
    from openvision_tpu.native.indexer import tfrecord_index

    if not os.path.exists(os.path.join(nb.HERE, "libindexer.so")):
        if not nb.build(verbose=False):
            pytest.skip("native toolchain unavailable")

    p = tmp_path / "data.tfrecord-00000-of-00001"
    payloads = [bytes([i]) * (i * 7 + 1) for i in range(12)]
    with open(p, "wb") as f:
        for pay in payloads:
            f.write(struct.pack("<Q", len(pay)))
            f.write(b"\x00" * 4)
            f.write(pay)
            f.write(b"\x00" * 4)

    idx = tfrecord_index(str(p))
    assert idx is not None and len(idx) == 12
    with open(p, "rb") as f:
        for (off, size), pay in zip(idx, payloads):
            f.seek(off)
            assert f.read(size) == pay


def test_sources_use_native_indexer(tmp_path):
    """WebdatasetTarSource and TfdsDirectorySource still serve identical
    records with the native indexer active vs disabled."""
    import io as _io
    import tarfile

    from openvision_tpu.data import pipeline as pipe

    p = tmp_path / "w.tar"
    with tarfile.open(p, "w") as tf:
        for i in range(4):
            for ext, data in (("jpg", b"\xff\xd8IMG%d" % i),
                              ("txt", f"caption {i}".encode())):
                info = tarfile.TarInfo(f"k{i}.{ext}")
                info.size = len(data)
                tf.addfile(info, _io.BytesIO(data))

    src_native = pipe.WebdatasetTarSource([str(p)])
    os.environ["OPENVISION_NO_NATIVE"] = "1"
    try:
        import openvision_tpu.native.indexer as idx

        idx._TRIED, idx._LIB = False, None
        src_py = pipe.WebdatasetTarSource([str(p)])
    finally:
        del os.environ["OPENVISION_NO_NATIVE"]
        idx._TRIED, idx._LIB = False, None
    assert len(src_native) == len(src_py) == 4
    for i in range(4):
        a, b = src_native[i], src_py[i]
        assert a["jpg"] == b["jpg"] and a["txt"] == b["txt"]


def test_wordpiece_long_text_falls_back_to_python():
    """Texts whose id count exceeds the native output buffer must tokenize
    via the Python path, not return the native overflow sentinel (or a
    silently truncated list)."""
    from openvision_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer("assets/bert_base_vocab_bos_eos.txt")
    long_text = "hello world " * 5000  # 10000 ids > the 8192 native buffer
    ids = tok.encode(long_text)
    assert ids is not None
    assert ids == tok._encode_py(long_text)
