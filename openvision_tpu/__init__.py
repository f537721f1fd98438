"""openvision_tpu — a TPU-native CLIP/CoCa vision-language training framework.

A from-scratch rebuild of the capabilities of zer0int/OpenVision (big_vision /
CLIPA lineage) designed TPU-first:

- jax.jit + NamedSharding over a named ``(data, fsdp, tensor)`` mesh everywhere
  (no pmap, no flattened side meshes).
- One shared attention module with three interchangeable implementations:
  plain XLA einsum, blockwise lax.scan (memory-efficient), and a custom Pallas
  flash-attention kernel for the hot path.
- Contrastive loss collectives ride ICI via shard_map on the *named* mesh axes.
- Orbax is the single checkpoint format (with an npz import shim); param tree
  names remain compatible with the published OpenVision Model Zoo
  (see reference src/convert_upload/transfer_jax2hf.py:115-453 for the name map).
"""

__version__ = "0.1.0"
