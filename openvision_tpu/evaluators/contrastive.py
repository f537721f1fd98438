"""Contrastive-loss health monitor.

Capability parity with reference src/evaluators/proj/image_text/
contrastive.py (explicitly "training health monitoring only"): evaluates the
minibatch bidirectional contrastive loss + ncorrect on held-out batches,
on jit + NamedSharding (the reference's legacy pmap path dropped).
"""

from __future__ import annotations

import jax
import numpy as np

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
from openvision_tpu import losses
from openvision_tpu.parallel import local_batch_to_global


class Evaluator:
    def __init__(self, model, mesh, *, pp="", batch_size: int = 256,
                 num_batches: int = 4, source=None, **unused):
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_batches = num_batches
        import_pp_modules()
        self.pp = build_pp_fn(pp) if pp else None
        self.source = source

        def eval_loss(params, image, text):
            zimg, ztxt, out = model.apply({"params": params}, image, text, train=False)
            l, extras = losses.bidirectional_contrastive_loss(
                zimg, ztxt, out["t"], mode="global"
            )
            return l, extras["ncorrect"]

        self._eval_loss = jax.jit(eval_loss)

    def run(self, train_state):
        if self.source is None:
            return []
        params = train_state["params"]
        rng = np.random.default_rng(0)
        losses_, ncorrect_ = [], []
        it = pipe.make_for_inference(self.source, "", self.batch_size)()
        for i, batch in enumerate(it):
            if i >= self.num_batches:
                break
            data = batch
            if self.pp is not None:
                data = self.pp(dict(batch), rng)
            dev = local_batch_to_global(
                {"image": np.asarray(data["image"], np.float32),
                 "labels": np.asarray(data["labels"], np.int32)},
                self.mesh,
            )
            l, nc = self._eval_loss(params, dev["image"], dev["labels"])
            losses_.append(float(jax.device_get(l)))
            ncorrect_.append(float(jax.device_get(nc)))
        if not losses_:
            return []
        return [("loss", float(np.mean(losses_))),
                ("ncorrect", float(np.mean(ncorrect_)))]
