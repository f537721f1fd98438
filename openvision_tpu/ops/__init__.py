from openvision_tpu.ops.attention import (  # noqa: F401
    xla_attention,
    blockwise_attention,
    dispatch_attention,
)
from openvision_tpu.ops.flash_attention import flash_attention  # noqa: F401
