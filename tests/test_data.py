import numpy as np
import pytest

VOCAB = "assets/bert_base_vocab_bos_eos.txt"


@pytest.fixture(scope="module")
def tok():
    from openvision_tpu.data.tokenizer import get_tokenizer

    return get_tokenizer(VOCAB)


def test_special_token_ids(tok):
    assert tok.pad_id == 0
    assert tok.bos_id == 1
    assert tok.eos_id == 2
    assert tok.cls_id is not None and tok.unk_id is not None


def test_wordpiece_parity_with_transformers(tok):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(
        VOCAB, do_lower_case=True, cls_token="[CLS]", sep_token="[SEP]"
    )
    sentences = [
        "A photo of a cat.",
        "The quick brown fox jumps over the lazy dog!",
        "Ünïcödé crème brûlée costs $12.50, naïvely?",
        "unaffable antidisestablishmentarianism 12345",
        "CAPS and MiXeD CaSe",
        "",
        "日本語のテキスト with english",
    ]
    for s in sentences:
        ours = tok.encode(s)
        theirs = hf.encode(s, add_special_tokens=False)
        assert ours == theirs, (s, ours, theirs)


def test_decode_roundtrip(tok):
    ids = tok.encode("a photo of a dog")
    assert tok.decode(ids) == "a photo of a dog"


def test_my_bert_tokenize_semantics():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn(
        f'my_bert_tokenize(max_len=16, output_token_len=12, vocab_path="{VOCAB}", '
        'add_bos=True, add_eos=True, key1="txt", key2="cap")'
        "|get_autoreg_label(pad_token=0)"
    )
    data = fn(
        {"txt": "a photo of a cat", "cap": "A cat sits. It is fluffy! The end"},
        np.random.default_rng(0),
    )
    from openvision_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(VOCAB)
    l1 = data["labels1"]
    assert l1.shape == (16,)
    assert l1[0] == tok.bos_id
    assert l1[-1] == tok.cls_id  # CLS appended at the END
    real = [t for t in l1[:-1] if t != tok.pad_id]
    assert real[-1] == tok.eos_id

    assert data["labels2"].shape == (16,)
    lr = data["labels_for_regress"]
    assert lr.shape == (12,)
    assert lr[0] == tok.bos_id
    # autoreg labels are the shift-left of labels_for_regress
    np.testing.assert_array_equal(data["autoreg_labels"][:-1], lr[1:])
    assert data["autoreg_labels"][-1] == 0
    assert data["cap_loss_mask"].shape == (12,)
    # mask counts the predictable tokens (all but bos), shifted
    n_real = int(np.sum(lr != tok.pad_id))
    assert int(data["cap_loss_mask"].sum()) == n_real - 1


def test_my_bert_tokenize_truncation_eos():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
    from openvision_tpu.data.tokenizer import get_tokenizer

    import_pp_modules()
    tok = get_tokenizer(VOCAB)
    fn = build_pp_fn(
        f'my_bert_tokenize(max_len=8, output_token_len=6, vocab_path="{VOCAB}", '
        'add_bos=True, add_eos=True, key1="txt", key2="cap")'
    )
    long = " ".join(["words"] * 50)
    data = fn({"txt": long, "cap": long}, np.random.default_rng(0))
    l1 = data["labels1"]
    assert l1[-1] == tok.cls_id
    assert l1[-2] == tok.eos_id  # eos overwritten onto the truncated slot
    lr = data["labels_for_regress"]
    assert lr[-1] == tok.eos_id


def test_image_ops_pipeline():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn(
        'inception_crop(size=32, area_min=40, method="bilinear", antialias=True)'
        "|simclr_jitter_gray(jitter_strength=0.4)"
    )
    img = np.random.randint(0, 255, (64, 48, 3), np.uint8)
    out = fn({"image": img}, np.random.default_rng(0))
    assert out["image"].shape == (32, 32, 3)


def test_eval_image_pp():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn(
        '|resize_small(32, method="bilinear", antialias=True)|central_crop(32)|vgg_value_range'
    )
    img = np.random.randint(0, 255, (100, 60, 3), np.uint8)
    out = fn({"image": img}, np.random.default_rng(0))
    assert out["image"].shape == (32, 32, 3)
    assert out["image"].dtype == np.float32
    assert abs(out["image"].mean()) < 3


def test_general_ops():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn('keep("a")')
    assert fn({"a": 1, "b": 2}, np.random.default_rng(0)) == {"a": 1}
    fn = build_pp_fn("flatten")
    assert fn({"a": {"b": 1}}, np.random.default_rng(0)) == {"a/b": 1}


def test_determinism_same_seed():
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

    import_pp_modules()
    fn = build_pp_fn("inception_crop(size=16, area_min=40)")
    img = np.random.randint(0, 255, (64, 64, 3), np.uint8)
    a = fn({"image": img.copy()}, np.random.default_rng(7))["image"]
    b = fn({"image": img.copy()}, np.random.default_rng(7))["image"]
    np.testing.assert_array_equal(a, b)
