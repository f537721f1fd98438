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
