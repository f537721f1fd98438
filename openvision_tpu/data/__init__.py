from openvision_tpu.data.pp import build_pp_fn, pp_op, inkey_outkey  # noqa: F401
