"""Device mesh, logical-axis rules, and sharding helpers.

The framework runs everything — train step, evaluators, loss collectives —
on ONE named 5-axis mesh `(data, fsdp, tensor, seq, pipe)`:

- `data`:   pure data parallelism (batch split, params replicated)
- `fsdp`:   ZeRO-3-style parameter sharding along each kernel's embed dim,
            while also contributing to the batch split
- `tensor`: megatron-style tensor parallelism for mlp/heads/vocab dims
- `seq`:    ring-attention sequence parallelism (ops/ring_attention.py)
- `pipe`:   GPipe-style pipeline parallelism over encoder depth
            (ops/pipeline_parallel.py); stacked layer params shard dim 0

Model code annotates params and activations with *logical* axis names
(`embed`, `mlp`, `activation_batch`, ...); the rules table below maps those
onto mesh axes and GSPMD inserts the collectives. Capability parity with
reference src/helpers/sharding.py and src/configs/openvision.py:65-89, with
the loss's ad-hoc flattened 1-D device mesh replaced by the main mesh's named
axes (see openvision_tpu/losses.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from flax import linen as nn
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "tensor", "seq", "pipe")

# Logical axis name -> mesh axes. Same mapping the reference trains with
# (src/configs/openvision.py:74-89): batch over (data, fsdp); params' embed
# dim over fsdp (ZeRO-3); mlp/vocab/heads/norm over tensor. The `seq` axis
# (beyond reference) sequence-shards token dims for ring attention; it is
# size 1 unless config.sharding.mesh.seq > 1, in which case every per-token
# op shards over it via this rule and attention rides `ops/ring_attention`.
LOGICAL_AXIS_RULES = (
    ("activation_batch", ("data", "fsdp")),
    ("activation_heads", ("tensor",)),
    ("activation_length", ("seq",)),
    ("activation_embed", ("tensor",)),
    ("activation_mlp", ("tensor",)),
    ("activation_kv", ("tensor",)),
    ("activation_vocab", ("tensor",)),
    ("mlp", ("tensor",)),
    ("vocab", ("tensor",)),
    ("embed", ("fsdp",)),
    ("norm", ("tensor",)),
    ("heads", ("tensor",)),
    ("kv", None),
)

# Global batches are sharded across every mesh axis jointly.
BATCH_SPEC = P(("data", "fsdp", "tensor"))


def on_accelerator() -> bool:
    """True when the default backend is a real TPU (incl. the axon tunnel).

    The single source of truth for "run Pallas kernels compiled vs in
    interpret mode" and for hardware-only dispatch guards — keeps kernel
    eligibility and interpret flags from silently disagreeing if a platform
    name is ever added.
    """
    return jax.devices()[0].platform in ("tpu", "axon")


def create_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Builds the named 5-axis device mesh. `data=-1` absorbs the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor * seq * pipe) == 0, (n, fsdp, tensor, seq, pipe)
        data = n // (fsdp * tensor * seq * pipe)
    assert data * fsdp * tensor * seq * pipe == n, (
        f"mesh {data}x{fsdp}x{tensor}x{seq}x{pipe} != {n} devices"
    )
    device_array = mesh_utils.create_device_mesh(
        (data, fsdp, tensor, seq, pipe), devices=devices
    )
    return Mesh(device_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def logical_axis_rules(rules=LOGICAL_AXIS_RULES):
    """Context manager activating the logical→mesh rules for flax modules."""
    return nn.logical_axis_rules(list(rules))


def params_shardings(params_shape: Any, mesh: Mesh, rules=LOGICAL_AXIS_RULES):
    """Derives NamedShardings for a (possibly boxed) eval_shape param tree."""
    logical_specs = nn.get_partition_spec(params_shape)
    return nn.logical_to_mesh_sharding(logical_specs, mesh, list(rules))


def unbox(tree: Any) -> Any:
    """Strips flax LogicallyPartitioned boxes, leaving raw arrays."""
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, nn.Partitioned) else x,
        tree,
        is_leaf=lambda x: isinstance(x, nn.Partitioned),
    )


def reshard(tree: Any, shardings: Any) -> Any:
    """Places host-local arrays as global device arrays with `shardings`."""
    return jax.device_put(tree, shardings)


def local_batch_to_global(tree: Any, mesh: Mesh, spec: P = BATCH_SPEC) -> Any:
    """Forms a global batch array from each process's host-local shard.

    Single-process: a plain device_put. Multi-process (TPU pod): each host
    contributes its local slice of the leading batch dim via
    `jax.make_array_from_process_local_data` (the idiomatic replacement for
    reference src/helpers/sharding.py:59's per-device assembly).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


# ---------------------------------------------------------------------------
# Active-mesh registry: lets Pallas ops shard_map themselves over the batch
# axes without threading the mesh through every flax module (the reference
# passed `mesh=` into all model constructors instead — common.py:478).
# ---------------------------------------------------------------------------

import contextlib

_ACTIVE_MESH: Mesh | None = None


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Marks `mesh` active for the scope (kernels shard_map over its batch axes)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev
