from openvision_tpu.utils.tree import (  # noqa: F401
    tree_flatten_with_names,
    tree_map_with_names,
    recover_tree,
    compile_patterns,
    make_mask_trees,
    merge_params,
    recover_dtype,
)
from openvision_tpu.utils.registry import Registry, parse_op_string  # noqa: F401
