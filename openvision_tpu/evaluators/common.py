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
