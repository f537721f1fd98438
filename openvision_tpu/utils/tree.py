"""Name-aware pytree utilities.

Provides flat "a/b/c"-named views of nested param dicts, regex-mask trees used
by the optimizer (freeze / weight-decay / lr-multiplier groups), and checkpoint
reconciliation.

Capability parity with reference src/helpers/utils.py:445-806 (pytree tools)
and src/models/common.py:543-615 (merge_params), re-implemented on
jax.tree_util key-paths instead of hand-rolled recursion.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Sequence

import jax
import numpy as np


def _key_str(k: Any) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return str(k.key)
    return str(k)


def tree_flatten_with_names(tree: Any):
    """Flattens a pytree into ([("a/b/c", leaf), ...], treedef).

    Names are slash-joined dict keys / sequence indices, matching the flat
    naming convention of OpenVision checkpoints (e.g.
    "img/Transformer/encoderblock_0/LayerNorm_0/scale").
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    named = [("/".join(_key_str(k) for k in path), leaf) for path, leaf in leaves]
    return named, treedef


def tree_map_with_names(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    """Maps `fn(name, leaf)` over a pytree, preserving structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: fn("/".join(_key_str(k) for k in path), leaf), tree
    )


def recover_tree(names: Sequence[str], values: Sequence[Any]) -> Any:
    """Rebuilds a nested dict from flat slash-delimited names."""
    tree: dict = {}
    for name, value in zip(names, values):
        parts = name.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def compile_patterns(patterns) -> list[re.Pattern]:
    """Compiles a string/regex (or list thereof) into full-match regexes."""
    if isinstance(patterns, (str, re.Pattern)):
        patterns = [patterns]
    out = []
    for p in patterns:
        out.append(p if isinstance(p, re.Pattern) else re.compile(p))
    return out


def make_mask_trees(tree: Any, patterns, *, log: str | None = None):
    """For each regex pattern, returns a bool pytree marking matching params.

    Each leaf is claimed by the FIRST pattern that fullmatches its flat name
    (same first-match-wins semantics the optimizer groups rely on,
    cf. reference src/helpers/utils.py:789-806).
    """
    compiled = compile_patterns(patterns)

    def claim(name: str) -> int:
        for i, pat in enumerate(compiled):
            if pat.fullmatch(name):
                return i
        return -1

    owners = tree_map_with_names(lambda name, _: claim(name), tree)
    return [jax.tree.map(lambda o: o == i, owners) for i in range(len(compiled))]


def merge_params(loaded: Any, inited: Any, dont_load=(), strip_prefix: str | None = None):
    """Reconciles a loaded checkpoint tree against a freshly-initialized tree.

    Values come from `loaded` except for names matching a `dont_load` regex
    (those keep their init value). Mismatched names not covered by `dont_load`
    raise. `strip_prefix` (e.g. "img/") lets a two-tower checkpoint initialize
    a single tower. Mirrors the semantics of reference
    src/models/common.py:543-615.
    """
    if inited is None:
        return loaded

    dont = compile_patterns(dont_load)

    def keep_init(name: str) -> bool:
        return any(p.fullmatch(name) for p in dont)

    loaded_flat, _ = tree_flatten_with_names(loaded)
    inited_flat, _ = tree_flatten_with_names(inited)

    loaded_map = {}
    for k, v in loaded_flat:
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        loaded_map[k] = v
    inited_map = dict(inited_flat)

    merged = {}
    for name, init_val in inited_map.items():
        if name in loaded_map and not keep_init(name):
            merged[name] = loaded_map[name]
        else:
            merged[name] = init_val

    missing = {k for k in inited_map.keys() - loaded_map.keys() if not keep_init(k)}
    extra = {k for k in loaded_map.keys() - inited_map.keys() if not keep_init(k)}
    if missing or extra:
        raise ValueError(
            "Checkpoint/model mismatch.\n"
            f"  In model but not checkpoint (and not dont_load'ed): {sorted(missing)}\n"
            f"  In checkpoint but not model (and not dont_load'ed): {sorted(extra)}"
        )

    return recover_tree(list(merged.keys()), list(merged.values()))


def recover_dtype(a: Any) -> Any:
    """Numpy's `save` stores bfloat16 arrays as raw void bytes; undo that.

    (Same npz quirk the reference works around in src/helpers/utils.py:681.)
    """
    if hasattr(a, "dtype") and a.dtype == np.void:
        assert a.itemsize == 2, "Unknown dtype!"
        import jax.numpy as jnp

        return a.view(jnp.bfloat16.dtype)
    return a
