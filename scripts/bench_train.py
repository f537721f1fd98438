"""Training-step throughput ladder: ViT-L/14@224 CoCa, bs32, remat=minimal.

Measures img/s/chip for a full CoCa train step (two text views + caption
decoder, Adam mu=bf16) per attn_impl on the attached TPU chip. Matches the
docs/PERF_NOTES.md "Training-step ladder" methodology: N steps chained inside
ONE jit via lax.fori_loop threading the train state (the relay's deferred
execution means a scalar must be fetched to force the run), best-of-3.

Usage: python scripts/bench_train.py [fused_t fused xla ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_impl(attn_impl: str, steps: int = 3, batch: int = 32,
               res: int = 224, remat: str = "minimal",
               dec_attn: str = "auto", accum: int = 1,
               dec_fusion: str = "concat") -> float:
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.parallel import create_mesh
    from openvision_tpu.train import step as step_mod

    mesh = create_mesh(data=jax.device_count())

    c = cfg_mod.get_config(
        f"res={res},img=L/14,txt_name=B,txt_decoder_name=B,token_len=80,"
        f"output_token_len=128,remat={remat},attn_impl={attn_impl},"
        f"dec_attn_impl={dec_attn},dec_fusion={dec_fusion},"
        f"dtype=bfloat16,param_dtype=bfloat16"
    )
    c.input.batch_size = batch
    c.init_shapes = [(batch, res, res, 3), (2 * batch, 80)]
    c.grad_accum = accum
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]

    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=1000
    )
    update_fn = step_mod.make_update_fn(c, model, tx, mesh)

    r = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(
            r.randint(0, 255, (batch, res, res, 3)).astype(np.uint8)),
        "labels1": jnp.asarray(r.randint(0, 30522, (batch, 80)), jnp.int32),
        "labels2": jnp.asarray(r.randint(0, 30522, (batch, 80)), jnp.int32),
        "autoreg_labels": jnp.asarray(
            r.randint(0, 30522, (batch, 128)), jnp.int32),
        "cap_loss_mask": jnp.ones((batch, 128), jnp.float32),
    }
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run_steps(state, batch, rng):
        def body(i, carry):
            st, acc = carry
            st2, meas = update_fn(st, batch, jax.random.fold_in(rng, i))
            return st2, acc + meas["training_loss"]

        _, acc = jax.lax.fori_loop(
            0, steps, body, (state, jnp.float32(0)))
        return acc

    float(run_steps(state, batch_data, rng))  # compile + warmup
    dt = min(
        _timed(run_steps, state, batch_data, rng) for _ in range(3)
    )
    return batch * steps / dt


def _timed(fn, *args) -> float:
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


if __name__ == "__main__":
    # entries: "impl[:res[:batch[:remat[:dec_attn[:accum[:dec_fusion]]]]]]",
    # e.g. "flash:336:16:full", "fused:224:128:none:auto:4" (grad accum),
    # or "fused:224:32:none:auto:1:cross_attn" (decoder fusion A/B)
    impls = sys.argv[1:] or ["fused_t", "fused"]
    for entry in impls:
        parts = entry.split(":")
        impl = parts[0]
        res = int(parts[1]) if len(parts) > 1 else 224
        batch = int(parts[2]) if len(parts) > 2 else 32
        remat = parts[3] if len(parts) > 3 else "minimal"
        dec_attn = parts[4] if len(parts) > 4 else "auto"
        accum = int(parts[5]) if len(parts) > 5 else 1
        dec_fusion = parts[6] if len(parts) > 6 else "concat"
        ips = bench_impl(impl, res=res, batch=batch, remat=remat,
                         dec_attn=dec_attn, accum=accum, dec_fusion=dec_fusion)
        print(f"{entry}: {ips:.1f} img/s/chip", flush=True)
