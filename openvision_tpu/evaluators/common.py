"""Evaluator framework: config → [(name, evaluator, log_steps, prefix)].

Capability parity with reference src/evaluators/common.py:26 (`from_config`):
each entry of config.evals names a type, gets the model/mesh injected, and
exposes `run(train_state) -> [(metric_name, value)]`.
"""

from __future__ import annotations

import importlib
from typing import Any, List, Tuple

_TYPES = {
    "discriminative_classifier": "openvision_tpu.evaluators.disclf",
    "proj.image_text.discriminative_classifier": "openvision_tpu.evaluators.disclf",
    "retrieval": "openvision_tpu.evaluators.retrieval",
    "proj.image_text.retrieval": "openvision_tpu.evaluators.retrieval",
    "contrastive": "openvision_tpu.evaluators.contrastive",
    "proj.image_text.contrastive": "openvision_tpu.evaluators.contrastive",
}


def from_config(
    config, model, mesh, on_error=None
) -> List[Tuple[str, Any, int, str]]:
    """Builds evaluators from config.evals. An evaluator whose data/config is
    unavailable is skipped individually (reported via `on_error(name, exc)`)
    rather than disabling the whole set."""
    evaluators = []
    for name, cfg in config.get("evals", {}).items():
        cfg = dict(cfg)
        etype = cfg.pop("type", name)
        log_steps = cfg.pop("log_steps", 1000)
        prefix = cfg.pop("prefix", f"{name}/")
        try:
            module = importlib.import_module(_TYPES.get(etype, etype))
            evaluator = module.Evaluator(model=model, mesh=mesh, **cfg)
        except Exception as e:
            if on_error is not None:
                on_error(name, e)
                continue
            raise
        evaluators.append((name, evaluator, log_steps, prefix))
    return evaluators


def device_norm_fn(spec: str):
    """Device-side image normalization for evaluators.

    Returns f(image)->image for a spec of "" (identity — pp already
    normalized on the host), "vgg" (ImageNet mean/std, the trainer's
    cpu_unit8 prologue, reference main_clip.py:413-418) or
    "value_range(lo,hi)" (linear map from 0..255). Using it lets eval
    batches cross host->device as uint8: 4x less transfer than f32.
    """
    import re

    import jax.numpy as jnp

    if not spec:
        return lambda image: image
    if spec == "vgg":
        from openvision_tpu.train.step import normalize_uint8

        return normalize_uint8
    m = re.fullmatch(
        r"value_range\(\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*\)", spec
    )
    if not m:
        raise ValueError(f"unknown device_norm: {spec!r}")
    lo, hi = float(m.group(1)), float(m.group(2))
    return lambda image: image.astype(jnp.float32) * ((hi - lo) / 255.0) + lo
