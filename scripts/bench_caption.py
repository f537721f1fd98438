"""Caption-path throughput bench: the /v1/caption compute ceiling.

Measures the jitted one-pass caption program the daemon's CaptionService
dispatches (image tower + CoCa decoder forward + greedy readout — the
whole caption from ONE forward, `models/decoder.py:generate` semantics) at
serving batch sizes on the live device. HTTP/PIL are skipped on purpose:
this is the device ceiling the dynamic batcher coalesces toward
(docs/SERVING.md "Caption route"). Weights are random-init — throughput
only; quality comes from a trained checkpoint.

Usage:
  python scripts/bench_caption.py [--config "res=224,img=L/14,..."]
      [--batches 16,32,64] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config",
                   default="res=224,img=L/14,txt_name=L,txt_decoder_name=L")
    p.add_argument("--batches", default="16,32,64")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--vocab", default="assets/bert_base_vocab_bos_eos.txt")
    args = p.parse_args(argv)

    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.data.tokenizer import get_tokenizer
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import step as step_mod

    config = cfg_mod.get_config(args.config)
    model = step_mod.build_model(config)
    res = int(config.init_shapes[0][1])
    token_len = int(config.input.txt_token_length)
    tok = get_tokenizer(args.vocab)
    bos = tok.bos_id if tok.bos_id is not None else tok.cls_id
    eos = tok.eos_id if tok.eos_id is not None else tok.sep_id

    t0 = time.perf_counter()
    params = unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
        jnp.zeros((1, token_len), jnp.int32), train=False)["params"])
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"init: {n_params/1e6:.0f}M params in {time.perf_counter()-t0:.1f}s")

    def caption_ids(params, images):
        b = images.shape[0]
        text = jnp.full((b, token_len), tok.pad_id, jnp.int32)
        text = text.at[:, 0].set(bos)
        _, _, out = model.apply({"params": params}, images, text, train=False)
        ids = jnp.argmax(out["logits"], axis=-1)
        is_eos = (ids == eos).astype(jnp.int32)
        seen = jnp.cumsum(is_eos, axis=1) - is_eos
        return jnp.where(seen > 0, tok.pad_id, ids)

    # The TPU is reached through a relay with ~30ms host RTT and an async
    # dispatch whose block_until_ready does not sync reliably, so chain the
    # iterations inside ONE jit (scaling the input each step so XLA can't
    # hoist the loop-invariant forward) and fetch a scalar once — the same
    # idiom bench.py uses.
    iters = int(args.iters)

    @jax.jit
    def caption_many(params, images):
        def body(i, acc):
            x = images * (1.0 + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(caption_ids(params, x))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

    params = jax.device_put(params)
    for b in (int(x) for x in args.batches.split(",")):
        images = jax.device_put(
            np.random.default_rng(0)
            .standard_normal((b, res, res, 3))
            .astype(np.float32))
        float(caption_many(params, images))  # compile + first run
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(caption_many(params, images))
            reps.append((time.perf_counter() - t0) / iters)
        best = min(reps)
        print(f"batch {b:4d}: {best*1e3:8.1f} ms/batch best-of-3 "
              f"-> {b/best:7.1f} img/s")


if __name__ == "__main__":
    main()
