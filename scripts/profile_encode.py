"""Encode roofline accounting: where do the last µs/img go? (VERDICT r4 #8)

bench.py reports the flagship fused_t ViT-L/14-224 encode vs the bf16
matmul roofline. This script ATTRIBUTES the gap with the same
relay-immune methodology (iterations chained inside one jit, best-of-3):

1. times the REAL production model at depth 6/12/24 and fits
   t(d) = fixed + per_block * d — the linear term is the 24 encoder
   blocks, the intercept is everything else (stem conv, posemb, to/from
   transposed-stream layout, final LN + pool + head, program overhead);
2. times the two Pallas kernels (_mhsa_t, _mlp_t) in isolation at the
   same shapes, splitting the per-block cost;
3. compares each piece against ITS OWN flop-ideal time at peak bf16,
   so the output says which stage is below MXU speed-of-light and by
   how much, instead of one opaque percentage.

Usage: python scripts/profile_encode.py [--batch 512] [--iters 8]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D, MLP, HEADS, PATCH, RES = 1024, 4096, 16, 14, 224
L = (RES // PATCH) ** 2 + 1  # 257
PEAK = 197e12  # v5e bf16


def _best_of(f, n=3):
    return min(_timed(f) for _ in range(n))


def _timed(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def time_model_at_depth(depth, batch, iters, image):
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    model = vit_mod.Model(
        num_classes=768, variant="L/14", depth=depth, posemb="sincos2d",
        pool_type="gap", emb_head_bias=False, head_zeroinit=False,
        dtype="bfloat16", param_dtype="bfloat16", attn_impl="fused_t",
        fast_gelu=True, nomax_softmax=True,
    )
    params = unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3), jnp.bfloat16)
    )["params"])

    @jax.jit
    def chain(params, image):
        def body(i, acc):
            out = model.apply(
                {"params": params},
                image * (1.0 + i.astype(jnp.bfloat16) * 1e-6),
            )
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chain(params, image))  # compile
    dt = _best_of(lambda: chain(params, image))
    return dt / (batch * iters)  # seconds per image


def time_mlp_kernel(batch, iters):
    """The _mlp_t Pallas kernel iterated in-jit at L/14 shapes (the MHSA
    share is derived as per_block - mlp; the cls-row XLA side ops are
    ~0.4% of block FLOPs)."""
    from openvision_tpu.ops import fused_encoder as fe

    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    lpat = L - 1  # 256 patch lanes
    xT = jax.random.normal(ks[0], (batch, D, lpat), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (D, MLP), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[2], (MLP, D), jnp.bfloat16) * 0.02
    ones = jnp.ones((D,), jnp.float32)
    zeros = jnp.zeros((D,), jnp.float32)
    # vecT columns as _tblock_impl packs them: [ln2s, ln2b, b2, 0, 0...]
    vecT = jnp.stack([ones, zeros, zeros, zeros] + [zeros] * 4,
                     axis=1).astype(jnp.float32)
    b1T = jnp.zeros((MLP, 1), jnp.float32)

    @jax.jit
    def chain(xT):
        def body(i, x):
            return fe._mlp_t(
                x * (1.0 + i.astype(jnp.bfloat16) * 1e-6),
                w1, w2, vecT, b1T, 1e-6, False)
        x = jax.lax.fori_loop(0, iters, body, xT)
        return jnp.sum(x.astype(jnp.float32))

    try:
        float(chain(xT))
    except Exception:
        return None
    dt = _best_of(lambda: chain(xT))
    return dt / (batch * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    image = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, RES, RES, 3), jnp.bfloat16)

    # flop-ideal times (µs/img at peak bf16)
    mac_qkvo = 4 * L * D * D
    mac_attn = 2 * L * L * D
    mac_mlp = 2 * L * D * MLP
    mac_block = mac_qkvo + mac_attn + mac_mlp
    mac_stem = L * D * (3 * PATCH * PATCH)
    us = lambda macs: 2.0 * macs / PEAK * 1e6

    depths = [6, 12, 24]
    t = {d: time_model_at_depth(d, args.batch, args.iters, image) * 1e6
         for d in depths}
    # least-squares t(d) = fixed + per_block * d
    A = np.stack([np.ones(len(depths)), np.array(depths)], axis=1)
    y = np.array([t[d] for d in depths])
    (fixed, per_block), *_ = np.linalg.lstsq(A, y, rcond=None)

    t_mlp = time_mlp_kernel(args.batch, args.iters)
    mlp_us = None if t_mlp is None else t_mlp * 1e6
    mhsa_us = None if mlp_us is None else float(per_block) - mlp_us

    out = {
        "us_per_img_depth": {str(d): round(t[d], 1) for d in depths},
        "per_block_us": round(float(per_block), 2),
        "per_block_ideal_us": round(us(mac_block), 2),
        "per_block_eff_pct": round(100 * us(mac_block) / per_block, 1),
        "fixed_us": round(float(fixed), 2),
        "fixed_ideal_us": round(us(mac_stem), 2),
        "mlp_us": None if mlp_us is None else round(mlp_us, 2),
        "mlp_ideal_us": round(us(mac_mlp), 2),
        "mhsa_derived_us": None if mhsa_us is None else round(mhsa_us, 2),
        "mhsa_ideal_us": round(us(mac_qkvo + mac_attn), 2),
        "full_img_per_s": round(1e6 / t[24], 1),
        "roofline_img_per_s": round(PEAK / (2.0 * (24 * mac_block + mac_stem)), 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
