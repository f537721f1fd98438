"""Calibrate the numeric drift between k scanned steps and k dispatches.

The scanned multi-step program (`step.jit_multi_update_fn`) compiles the
single-step `update_fn` inside a `lax.scan`; XLA fuses/reorders float32
reductions differently there than in the standalone per-step program, so the
two are equivalent only to compile-variance resolution, NOT bitwise
(ADVICE r3, VERDICT r3 Weak #1). This script measures that drift over many
seeds and chunk lengths so `tests/test_multi_dispatch.py` can assert a
*calibrated* bound instead of an aspirational one.

Leaves are split into two classes:
- `key/bias` — the attention KEY projection bias has MATHEMATICALLY zero
  gradient (softmax is shift-invariant: q·(k+b) adds a per-query constant
  across keys), so its computed "gradient" is pure rounding noise, which
  Adam's m/(sqrt(v)+eps) normalizes into O(lr)-magnitude updates in
  compile-dependent directions. Pointwise drift there is unbounded noise on
  a parameter whose value is immaterial; only its MAGNITUDE (≲ lr·k) is
  asserted.
- everything else — real gradients; drift is reduction-order noise and
  stays tiny. The measured max here calibrates the test tolerance.

Run: PYTHONPATH=. python scripts/calibrate_multi_dispatch.py
Writes a summary line per (seed, k) and a final max to stdout.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from openvision_tpu.configs import openvision as cfg_mod  # noqa: E402
from openvision_tpu.parallel import (  # noqa: E402
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from openvision_tpu.train import step as step_mod  # noqa: E402


def _tiny_config():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none"
    )
    c.input.batch_size = 16
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    return c


def _fake_batch(c, rng):
    r = np.random.RandomState(rng)
    b = c.input.batch_size
    return {
        "image": r.randint(0, 255, (b, 32, 32, 3)).astype(np.uint8),
        "labels1": r.randint(0, 64, (b, 16)).astype(np.int32),
        "labels2": r.randint(0, 64, (b, 16)).astype(np.int32),
        "autoreg_labels": r.randint(0, 64, (b, 8)).astype(np.int32),
        "cap_loss_mask": np.ones((b, 8), np.float32),
    }


def main():
    c = _tiny_config()
    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    model = step_mod.build_model(c)
    max_abs = 0.0
    max_rel = 0.0
    for seed in range(6):
        rng = jax.random.PRNGKey(seed)
        state, sharding, tx, _ = step_mod.init_train_state(
            c, model, mesh, rng, total_steps=20
        )
        raw = step_mod.make_update_fn(c, model, tx, mesh)
        update = step_mod.jit_update_fn(raw, sharding, mesh)
        multi = step_mod.jit_multi_update_fn(raw, sharding, mesh)
        for k in (3, 6):
            batches = [
                jax.device_put(
                    _fake_batch(c, 1000 * seed + i), batch_sharding(mesh)
                )
                for i in range(k)
            ]
            rng_loop = jax.device_put(
                jax.random.PRNGKey(seed + 1), replicated_sharding(mesh)
            )
            state_seq = jax.tree.map(jnp.copy, state)
            for b in batches:
                state_seq, _ = update(state_seq, b, rng_loop)
            state_multi, _ = multi(
                jax.tree.map(jnp.copy, state), tuple(batches), rng_loop
            )
            k_abs = k_rel = kb_mag = 0.0
            for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(state_seq["params"]),
                jax.tree_util.tree_leaves_with_path(state_multi["params"]),
                strict=True,
            ):
                path = jax.tree_util.keystr(pa)
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                if "'key']['bias'" in path:
                    kb_mag = max(
                        kb_mag, float(np.abs(a).max()), float(np.abs(b).max())
                    )
                    continue
                d = np.abs(a - b)
                k_abs = max(k_abs, float(d.max()))
                denom = np.maximum(np.abs(a), 1e-12)
                k_rel = max(k_rel, float((d / denom).max()))
            print(
                f"seed={seed} k={k} max_abs={k_abs:.3e} max_rel={k_rel:.3e}"
                f" keybias_mag={kb_mag:.3e} (lr*k={c.lr * k:.1e})"
            )
            max_abs = max(max_abs, k_abs)
            max_rel = max(max_rel, k_rel)
    print(f"OVERALL (excl key/bias) max_abs={max_abs:.3e} max_rel={max_rel:.3e}")


if __name__ == "__main__":
    main()
