"""Checkpointing: Orbax (primary) + legacy flat-npz import/export.

Capability parity with reference src/helpers/utils.py:
- Orbax CheckpointManager, async, StandardSave/StandardRestore over
  {"params", "opt"} (utils.py:1142-1170) — the Model-Zoo `jax_orbax_weight`
  format, so published OpenVision checkpoints restore directly.
- flat-name npz save with atomic rename (utils.py:693-719) and load with
  bfloat16-as-void recovery (utils.py:126-200, 681).
- params-only restore for finetune init (`ft_from`).
"""

from __future__ import annotations

import io
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from openvision_tpu.utils import (
    recover_dtype,
    recover_tree,
    tree_flatten_with_names,
)


def create_checkpoint_manager(
    directory: str,
    *,
    save_interval_steps: int = 1,
    max_to_keep: int | None = 1,
    async_save: bool = True,
) -> ocp.CheckpointManager:
    # "keep everything" configs pass a huge sentinel (keep_ckpt=1e8, matching
    # the reference default); Orbax's native spelling for that is None, which
    # also skips its per-save GC bookkeeping over the fake retention window.
    if max_to_keep is not None and max_to_keep >= 10_000_000:
        max_to_keep = None
    options = ocp.CheckpointManagerOptions(
        create=True,
        save_interval_steps=save_interval_steps,
        max_to_keep=max_to_keep,
        enable_async_checkpointing=async_save,
    )
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=options,
        # Registering the handler up front lets a fresh manager read the tree
        # metadata of foreign checkpoints (Model-Zoo restores).
        item_handlers=ocp.StandardCheckpointHandler(),
    )


def save_train_state(
    mngr: ocp.CheckpointManager, step: int, train_state: dict
) -> bool:
    return mngr.save(step, args=ocp.args.StandardSave(train_state))


def restore_train_state(
    mngr: ocp.CheckpointManager,
    abstract_state: dict,
    step: Optional[int] = None,
) -> dict:
    step = mngr.latest_step() if step is None else step
    assert step is not None, "no checkpoint found to restore"
    return mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def restore_params(
    directory: str, abstract_params: Any, step: Optional[int] = None
) -> Any:
    """Restores only the `params` subtree from an Orbax train-state checkpoint.

    This is how the published Model-Zoo checkpoints load for finetuning or
    inference (`ft_from`, reference main_clip.py:549-575). The checkpoint may
    also carry an optimizer state we know nothing about; the abstract tree for
    those extra subtrees is reconstructed from the on-disk metadata.
    """
    mngr = create_checkpoint_manager(directory, async_save=False)
    step = mngr.latest_step() if step is None else step
    assert step is not None, f"no checkpoint found in {directory}"
    meta = mngr.item_metadata(step).tree
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta
    )
    if abstract_params is not None:
        abstract["params"] = abstract_params
    restored = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    mngr.close()
    return restored["params"]


# ---------------------------------------------------------------------------
# Legacy flat-npz format
# ---------------------------------------------------------------------------


def save_npz(path: str, tree: Any) -> None:
    """Writes a pytree as a flat-named npz, atomically."""
    flat, _ = tree_flatten_with_names(tree)
    names = [n for n, _ in flat]
    vals = [jax.device_get(v) for _, v in flat]
    buf = io.BytesIO()
    np.savez(buf, **{n: v for n, v in zip(names, vals)})
    tmp = path + "-TEMPORARY"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.rename(tmp, path)


def load_npz(path: str, tree_key: Optional[str] = None) -> Any:
    """Loads a flat-named npz back into a nested dict.

    `path` may carry a `:subtree` suffix (e.g. "ckpt.npz:img") selecting a
    subtree, mirroring the reference's `load_params(None, "f.npz:img")`.
    """
    if tree_key is None and ":" in os.path.basename(path):
        path, tree_key = path.rsplit(":", 1)
    with open(path, "rb") as f:
        data = np.load(f, allow_pickle=False)
        flat = {k: recover_dtype(data[k]) for k in data.files}
    tree = recover_tree(list(flat.keys()), list(flat.values()))
    if tree_key:
        tree = tree[tree_key]
    return tree
