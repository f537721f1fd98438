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


def from_config(config, model, mesh) -> List[Tuple[str, Any, int, str]]:
    evaluators = []
    for name, cfg in config.get("evals", {}).items():
        cfg = dict(cfg)
        etype = cfg.pop("type", name)
        module = importlib.import_module(_TYPES.get(etype, etype))
        log_steps = cfg.pop("log_steps", 1000)
        prefix = cfg.pop("prefix", f"{name}/")
        evaluator = module.Evaluator(model=model, mesh=mesh, **cfg)
        evaluators.append((name, evaluator, log_steps, prefix))
    return evaluators
