from openvision_tpu.parallel.mesh import (  # noqa: F401
    MESH_AXES,
    LOGICAL_AXIS_RULES,
    BATCH_SPEC,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    logical_axis_rules,
    params_shardings,
    unbox,
    reshard,
    local_batch_to_global,
)
