import numpy as np
import pytest

from openvision_tpu.utils import (
    Registry,
    make_mask_trees,
    merge_params,
    parse_op_string,
    recover_tree,
    tree_flatten_with_names,
)


def test_tree_flatten_with_names():
    tree = {"img": {"Transformer": {"encoderblock_0": {"LayerNorm_0": {"scale": 1}}}, "cls": 2}, "t": 3}
    flat, _ = tree_flatten_with_names(tree)
    names = [n for n, _ in flat]
    assert "img/Transformer/encoderblock_0/LayerNorm_0/scale" in names
    assert "img/cls" in names
    assert "t" in names


def test_recover_tree_roundtrip():
    tree = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat, _ = tree_flatten_with_names(tree)
    rebuilt = recover_tree([n for n, _ in flat], [v for _, v in flat])
    assert rebuilt == tree


def test_make_mask_trees_first_match_wins():
    tree = {"img": {"kernel": 1, "bias": 2}, "txt": {"kernel": 3}}
    masks = make_mask_trees(tree, [r"img/.*", r".*kernel"])
    assert masks[0] == {"img": {"kernel": True, "bias": True}, "txt": {"kernel": False}}
    assert masks[1] == {"img": {"kernel": False, "bias": False}, "txt": {"kernel": True}}


def test_merge_params_merges_and_respects_dont_load():
    loaded = {"w": np.ones(3), "head": {"kernel": np.ones(2)}}
    inited = {"w": np.zeros(3), "head": {"kernel": np.zeros(2)}}
    out = merge_params(loaded, inited, dont_load=["head/.*"])
    assert out["w"].sum() == 3
    assert out["head"]["kernel"].sum() == 0


def test_merge_params_raises_on_mismatch():
    with pytest.raises(ValueError):
        merge_params({"a": 1}, {"b": 2})


def test_merge_params_strip_prefix():
    loaded = {"img": {"w": np.ones(3)}}
    inited = {"w": np.zeros(3)}
    out = merge_params(loaded, inited, strip_prefix="img/")
    assert out["w"].sum() == 3


def test_parse_op_string():
    name, args, kwargs = parse_op_string('resize(224, method="bilinear", antialias=True)')
    assert name == "resize"
    assert args == (224,)
    assert kwargs == {"method": "bilinear", "antialias": True}
    assert parse_op_string("flatten") == ("flatten", (), {})


def test_parse_op_string_rejects_code():
    with pytest.raises(ValueError):
        parse_op_string("__import__('os').system('true')")


def test_registry_register_lookup():
    @Registry.register("test_double")
    def _factory(k=2):
        return lambda x: x * k

    assert Registry.lookup("test_double")(3) == 6
    assert Registry.lookup("test_double(k=5)")(3) == 15


def test_mesh_creation_8dev():
    import jax

    from openvision_tpu.parallel import create_mesh

    mesh = create_mesh(data=-1, fsdp=2, tensor=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2, "seq": 1, "pipe": 1}
    assert len(jax.devices()) == 8
