import numpy as np

from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

import_pp_modules()


def test_value_range():
    img = np.full((2, 2, 3), 255, np.uint8)
    out = build_pp_fn("value_range(-1, 1)")({"image": img}, np.random.default_rng(0))
    np.testing.assert_allclose(out["image"], 1.0)
    out = build_pp_fn("value_range(0, 1, clip_values=True)")(
        {"image": np.full((2, 2, 3), 300.0)}, np.random.default_rng(0)
    )
    assert out["image"].max() <= 1.0


def test_random_copy_and_copy():
    data = {"a": np.zeros(2), "b": np.ones(2)}
    out = build_pp_fn('copy("a", "c")')(dict(data), np.random.default_rng(0))
    np.testing.assert_array_equal(out["c"], data["a"])
    picks = set()
    for seed in range(10):
        out = build_pp_fn('random_copy("a", "b", "c", prob=0.5)')(
            dict(data), np.random.default_rng(seed)
        )
        picks.add(float(out["c"][0]))
    assert picks == {0.0, 1.0}  # both branches exercised


def test_onehot_multi_and_single():
    out = build_pp_fn('onehot(5, key="labels")')(
        {"labels": np.array([1, 3])}, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(out["labels"], [0, 1, 0, 1, 0])
    out = build_pp_fn('onehot(4, key="labels", multi=False)')(
        {"labels": np.array([2])}, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(out["labels"], [[0, 0, 1, 0]])


def test_pad_to_shape_and_squeeze():
    out = build_pp_fn("pad_to_shape((6,), pad_value=9)")(
        {"labels": np.array([1, 2])}, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(out["labels"], [1, 2, 9, 9, 9, 9])
    out = build_pp_fn("squeeze_last_dim")(
        {"image": np.zeros((2, 3, 1))}, np.random.default_rng(0)
    )
    assert out["image"].shape == (2, 3)


def test_concat_and_drop():
    data = {"a": np.ones((2, 1)), "b": np.zeros((2, 1))}
    out = build_pp_fn('concat(("a", "b"), "c", axis=1)|drop("a", "b")')(
        dict(data), np.random.default_rng(0)
    )
    assert out["c"].shape == (2, 2)
    assert set(out) == {"c"}


def test_clip_i1k_label_names():
    out = build_pp_fn("clip_i1k_label_names")(
        {"label": np.array(0)}, np.random.default_rng(0)
    )
    assert str(out["labels"]) == "tench"


def test_lookup_text_npz_and_sep(tmp_path):
    txt = tmp_path / "names.txt"
    txt.write_text("cat\ndog\nbird\n")
    fn = build_pp_fn(f'lookup("{txt}", inkey="name", outkey="label")')
    out = fn({"name": b"dog"}, np.random.default_rng(0))
    assert out["label"] == 1
    out = fn({"name": np.array(["bird", "cat", "zebra"])}, np.random.default_rng(0))
    np.testing.assert_array_equal(out["label"], [2, 0, -1])

    sep = tmp_path / "pairs.txt"
    sep.write_text("cat:7\ndog:3\n")
    fn = build_pp_fn(f'lookup("{sep}", sep=":", key="name")')
    assert build_pp_fn(f'lookup("{sep}", sep=":", key="name")')(
        {"name": "dog"}, np.random.default_rng(0)
    )["name"] == 3

    npz = tmp_path / "m.npz"
    np.savez(npz, fnames=np.array(["a.jpg", "b.jpg"]))
    fn = build_pp_fn(f'lookup("{npz}", key="f")')
    assert fn({"f": "b.jpg"}, np.random.default_rng(0))["f"] == 1


def test_rag_tensor():
    out = build_pp_fn('rag_tensor(key="labels")')(
        {"labels": np.arange(5)}, np.random.default_rng(0)
    )
    assert isinstance(out["labels"], list) and len(out["labels"]) == 1
    np.testing.assert_array_equal(out["labels"][0], np.arange(5))


def test_change_keys_and_new_bert_tokenize():
    fn = build_pp_fn('change_keys(inkey="caption")')
    out = fn({"caption": np.array(["hi"])}, np.random.default_rng(0))
    np.testing.assert_array_equal(out["labels"], ["hi"])

    vocab = "assets/bert_base_vocab_bos_eos.txt"
    fn = build_pp_fn(
        f'new_bert_tokenize(vocab_path="{vocab}", max_len=8, add_bos=True, '
        'add_eos=True, key1="txt", key2="cap")'
    )
    out = fn(
        {"txt": np.array(["a cat sits"]), "cap": np.array(["a dog runs. far away"])},
        np.random.default_rng(0),
    )
    assert out["labels1"].shape == (8,) and out["labels1"].dtype == np.int32
    assert out["labels2"].shape == (8,)
    assert out["cap_loss_mask"].shape == (7,)
    # labels2 samples the key2 LIST (whole caption), not [.!]-split pieces:
    # with one list element the whole two-sentence string is tokenized.
    from openvision_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(vocab)
    ids = out["labels2"].tolist()
    assert ids[0] == tok.bos_id and ids[-1] == tok.cls_id
    # mask shifts off the bos and appends 0
    assert out["cap_loss_mask"][-1] in (0.0, 1.0)
