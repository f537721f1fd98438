"""Headline benchmark: ViT-L/14-224 image encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "vit_l14_224_encode", "value": <img/s/chip>, "unit": "images/sec/chip",
   "vs_baseline": <value / (0.8 * bf16 roofline)>}

"Baseline" is the driver's north-star target (BASELINE.json): ≥80% of the
bf16 matmul roofline for the encode. Roofline = peak_flops / model_flops:
ViT-L/14 at 224px is ~161.7 GFLOP/image forward (80.85 GMACs: 24 blocks of
qkvo 4·L·D² + attn 2·L²·D + mlp 16·L·D² MACs at L=257, D=1024, + patch embed),
and TPU v5e peaks at 197 bf16 TFLOP/s → roofline ≈ 1218 img/s/chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def vit_l14_flops_per_image(res: int = 224) -> float:
    l = (res // 14) ** 2 + 1
    d, depth, mlp = 1024, 24, 4096
    per_block = 4 * l * d * d + 2 * l * l * d + 2 * l * d * mlp
    stem = l * d * (3 * 14 * 14)
    return 2.0 * (depth * per_block + stem)  # MACs → FLOPs


PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e bf16
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
}


def _timed(fn, *args) -> float:
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main():
    from openvision_tpu.models import vit as vit_mod

    dev = jax.devices()[0]
    peak = next(
        (v for k, v in PEAK_FLOPS.items() if k in str(dev.device_kind)), 197e12
    )

    # 512 amortizes the per-program fixed costs slightly better than 256
    # (1024.9 vs 1012.7 img/s measured back-to-back, round 3)
    batch = 512
    iters = 10

    def build(attn_impl):
        model = vit_mod.Model(
            num_classes=768,
            variant="L/14",
            posemb="sincos2d",
            pool_type="gap",
            output_tokens=False,
            emb_head_bias=False,
            head_zeroinit=False,
            dtype="bfloat16",
            param_dtype="bfloat16",
            attn_impl=attn_impl,
            fast_gelu=True,  # ≤5e-6 cosine deviation, measured +17%
            # exact softmax w/o max-subtraction (clamp 80; CLIP logits < 60):
            # measured 4e-6 output cosine deviation, +2.7%
            nomax_softmax=True,
        )
        from openvision_tpu.parallel import unbox

        params = unbox(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16))[
                "params"
            ]
        )

        # The TPU is reached through a relay with ~30ms host RTT, so chain the
        # iterations inside ONE jit (scaling the input each step to prevent
        # XLA hoisting the loop-invariant encode) and fetch a scalar once.
        @jax.jit
        def encode_many(params, image):
            def body(i, acc):
                out = model.apply(
                    {"params": params}, image * (1.0 + i.astype(jnp.bfloat16) * 1e-6)
                )
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return params, encode_many

    image = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)

    # transposed-stream fused encoder > natural-layout fused block > XLA
    for impl in ("fused_t", "fused", "xla"):
        try:
            params, encode_many = build(impl)
            float(encode_many(params, image))  # warmup/compile
            break
        except Exception:
            continue

    # best-of-3: the relay-attached chip shows ~5% run-to-run variance
    dt = min(
        _timed(encode_many, params, image) for _ in range(3)
    )

    imgs_per_sec = batch * iters / dt
    roofline = peak / vit_l14_flops_per_image(224)
    target = 0.8 * roofline
    print(
        json.dumps(
            {
                "metric": "vit_l14_224_encode",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
