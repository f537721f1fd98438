"""Train-state construction and the jitted update step.

The whole optimization step — device-side uint8 normalize, two-tower forward,
contrastive all_gather loss + caption CE, backward, optax update, and norm
telemetry — compiles to ONE XLA program with donated train_state (capability
parity with reference src/main_clip.py:399-493).

Init follows the GSPMD-idiomatic recipe: eval_shape under logical axis rules →
logical-to-mesh shardings → jit(init, out_shardings=...) so params are sharded
at birth and never materialize replicated (main_clip.py:320-393).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openvision_tpu import losses, optim
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import (
    batch_sharding,
    logical_axis_rules,
    params_shardings,
    replicated_sharding,
    unbox,
)

# ImageNet mean/std ×255 — the device-side uint8 prologue (cpu_unit8 path,
# reference main_clip.py:413-418 / configs vgg_value_range).
IMAGENET_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def _l2_norm(leaves) -> jax.Array:
    """Global l2 over a list of arrays with forced f32 accumulation.

    `jnp.vdot(g, g)` on bf16 leaves accumulates partial sums in bf16, making
    the reference-parity telemetry ~1% sensitive to mesh layout / reduction
    order (measured, tests/test_fused_tp.py). Casting inside the reduction
    fuses to a single read of the bf16 buffer with an f32 accumulator — no
    extra bandwidth, layout-stable to f32 resolution.
    """
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def normalize_uint8(images: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN)[None, None, None, :]
    std = jnp.asarray(IMAGENET_STD)[None, None, None, :]
    return (images.astype(jnp.float32) - mean) / std


def build_model(config) -> nn.Module:
    return clip_mod.Model(
        out_dim=tuple(config.model.out_dim)
        if isinstance(config.model.out_dim, (list, tuple))
        else config.model.out_dim,
        image=dict(config.model.image),
        text=dict(config.model.text),
        text_decoder=config.model.get("text_decoder", "text_decoder"),
        text_decoder_config=dict(config.model.get("text_decoder_config") or {}),
        temperature_init=config.model.get("temperature_init", 10.0),
        init_logit_bias=config.model.get("init_logit_bias"),
    )


def init_train_state(
    config,
    model: nn.Module,
    mesh: Mesh,
    rng: jax.Array,
    *,
    total_steps: int,
    data_size: int | None = None,
):
    """Returns (train_state, state_sharding, tx, sched_fns)."""
    image_shape, text_shape = config.init_shapes

    def init(rng):
        image = jnp.zeros(image_shape, jnp.float32)
        text = jnp.zeros(text_shape, jnp.int32)
        return model.init(rng, image, text, train=True)["params"]

    with logical_axis_rules():
        params_shape = jax.eval_shape(init, rng)
    p_shardings = params_shardings(params_shape, mesh)
    params_shape_unboxed = unbox(params_shape)

    tx, sched_fns = optim.make(
        config,
        params_shape_unboxed,
        sched_kw=dict(
            total_steps=total_steps,
            batch_size=config.input.batch_size,
            data_size=data_size,
        ),
    )

    with logical_axis_rules():
        opt_shape = jax.eval_shape(tx.init, params_shape)
    o_shardings = params_shardings(opt_shape, mesh)

    params = jax.jit(init, out_shardings=p_shardings)(rng)
    opt = jax.jit(tx.init, out_shardings=o_shardings)(params)

    train_state = {"params": unbox(params), "opt": unbox(opt)}
    state_sharding = {"params": p_shardings, "opt": o_shardings}
    return train_state, state_sharding, tx, sched_fns


def _microbatch(x: jax.Array, accum: int) -> jax.Array:
    """Split the batch dim into (accum, B/accum) with a STRIDED assignment.

    Microbatch i gets rows x[i::accum]. Written as reshape(B -> (m, accum))
    + swapaxes so that, with dim 0 batch-sharded, both ops are device-local
    (each device's contiguous B/s rows form whole (m/s, accum) blocks) — no
    collective is inserted, unlike the contiguous split x[i*m:(i+1)*m] whose
    slices straddle shard boundaries. Rows are i.i.d. samples, so the
    assignment is free to choose; losses are permutation-invariant.
    """
    m = x.shape[0] // accum
    return x.reshape(m, accum, *x.shape[1:]).swapaxes(0, 1)


def make_update_fn(
    config, model: nn.Module, tx: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """Builds the jitted train step (donates train_state).

    With config.grad_accum > 1 the step microbatches the forward/backward
    while keeping the loss EXACT to the big-batch step (see
    _make_update_fn_accum).
    """
    if int(config.get("grad_accum", 1) or 1) > 1:
        return _make_update_fn_accum(
            config, model, tx, mesh, int(config.grad_accum)
        )
    loss_type = config.get("loss_type", "coca")
    loss_mode = "local" if config.get("local_loss", True) else "global"
    clip_w = config.get("clip_loss_weight", 1.0)
    cap_w = config.get("coca_caption_loss_weight", 2.0)
    cap_chunk = config.get("cap_xent_chunk", 16)
    cpu_uint8 = config.get("cpu_unit8", False)

    def update_fn(train_state, batch, rng):
        # Tiny non-image fields (token ids, masks) arrive 8-way batch-sharded
        # (BATCH_SPEC in_shardings) but are consumed by (data, fsdp)-batch
        # activations; reshard them HERE, directly on the input leaves, so the
        # transition is a clean same-dim coarsening. Left to propagation,
        # Shardy manufactures a token-dim-sharded intermediate and the
        # partitioner falls back to involuntary full rematerialization.
        batch = {
            k: (
                v
                if k == "image"
                else jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, P(("data", "fsdp")))
                )
            )
            for k, v in batch.items()
        }
        images = batch["image"]
        if cpu_uint8:
            images = normalize_uint8(images)

        labels = jnp.concatenate([batch["labels1"], batch["labels2"]], axis=0)

        step_count = optim.get_count(train_state["opt"], jittable=True)
        rng = jax.random.fold_in(rng, step_count)

        def loss_fn(params):
            zimg, ztxt, out = model.apply(
                {"params": params},
                images,
                labels,
                train=True,
                rngs={"dropout": rng, "drop_path": rng, "random_mask": rng},
            )
            half = ztxt.shape[0] // 2
            views = [ztxt[:half], ztxt[half:]]

            if loss_type == "siglip":
                assert "b" in out, "siglip needs model.init_logit_bias"
                per_view = [
                    losses.siglip_loss(
                        zimg, v, out["t"], out["b"], mesh=mesh, mode=loss_mode
                    )[0]
                    for v in views
                ]
                l = sum(per_view) / len(per_view)
                l_extras = {}
            elif loss_type == "clip":
                l, l_extras = losses.bidirectional_contrastive_loss(
                    zimg, views, out["t"], mode=loss_mode, mesh=mesh
                )
            elif loss_type == "coca":
                l, l_extras = losses.bidirectional_contrastive_loss(
                    zimg, views, out["t"], mode=loss_mode, mesh=mesh
                )
                if out.get("cap_prelogits") is not None:
                    # head-fused path: decoder returned prelogits; fuse the
                    # vocab-head matmul into a chunked xent so the (B, L, V)
                    # f32 logits temp never exists (losses.py docstring).
                    # Cap the per-chunk temp at ~32Mi f32 elements (128 MB)
                    # so large per-chip batches (e.g. 256 at 84px, the
                    # pretrain recipe) shrink the chunk automatically. The
                    # temp's batch dim is sharded over (data, fsdp), so size
                    # the cap on per-chip rows, not the global batch.
                    kernel = params["txt_decoder"]["head"]["kernel"]
                    n_batch_shards = mesh.shape.get("data", 1) * mesh.shape.get(
                        "fsdp", 1
                    )
                    b = -(-batch["autoreg_labels"].shape[0] // n_batch_shards)
                    chunk = max(
                        1, min(cap_chunk, (32 << 20) // (b * kernel.shape[1]))
                    )
                    cap_l = losses.linear_softmax_xent(
                        prelogits=out["cap_prelogits"],
                        kernel=kernel,
                        labels=batch["autoreg_labels"],
                        mask=batch["cap_loss_mask"],
                        chunk=chunk,
                    )
                else:
                    cap_l = losses.softmax_xent(
                        logits=out["logits"],
                        labels=batch["autoreg_labels"],
                        mask=batch["cap_loss_mask"],
                        reduction=True,
                    )
                l_extras = dict(l_extras, clip_loss=l, caption_loss=cap_l)
                l = clip_w * l + cap_w * cap_l
            else:
                raise ValueError(f"Unknown loss_type: {loss_type!r}")

            return l, {
                "t": out["t"],
                "t/parameter": out["t/parameter"],
                "nimg": jnp.mean(out["img/norm"]),
                "ntxt": jnp.mean(out["txt/norm"]),
                **l_extras,
            }

        params, opt = train_state["params"], train_state["opt"]
        (l, measurements), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)

        measurements["training_loss"] = l
        live_grads = jax.tree.leaves(
            optim.replace_frozen(config.get("schedule"), grads, 0.0)
        )
        measurements["l2_grads"] = _l2_norm(live_grads)
        measurements["l2_params"] = _l2_norm(jax.tree.leaves(params))
        measurements["l2_updates"] = _l2_norm(jax.tree.leaves(updates))
        return {"params": params, "opt": opt}, measurements

    return update_fn


def _make_update_fn_accum(
    config,
    model: nn.Module,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    accum: int,
) -> Callable:
    """Gradient accumulation that is EXACT to the big-batch step.

    Plain microbatch-and-average is wrong for contrastive losses: the
    softmax normalizes over the whole batch's negatives, so per-microbatch
    CLIP losses are a different (weaker) objective. This implements the
    embedding-gradient-caching construction (GradCache, arXiv:2101.06983)
    as two lax.scan passes, beyond the reference (which can only reach its
    32k batch recipe with 128-way data parallelism, train.sh:18-29):

      pass 1  scan microbatches, forward ONLY the towers (the decoder is
              dead code here and XLA eliminates it), stack the normalized
              embeddings — activations for one microbatch live at a time.
      bridge  full-batch contrastive loss ON THE EMBEDDINGS (a BxB matmul,
              tiny) + jax.grad of it wrt the stacked embeddings and the
              temperature/bias params.
      pass 2  scan microbatches again; per microbatch, jax.vjp of the
              forward (towers + decoder + sum-form caption xent) with the
              embedding cotangents from the bridge and the caption
              cotangent cap_w / global_mask_sum; accumulate param grads
              in f32.

    Gradients equal the accum=1 step to float32 resolution (the caption
    sum splits exactly; the contrastive term factors through the cached
    embeddings by the chain rule). Cost: one extra tower forward per
    microbatch (~+30% step time), memory: one microbatch of activations.

    RNG: dropout/drop-path/masking keys fold in the microbatch index, so
    stochastic-layer patterns differ from the accum=1 step (same
    distribution); with the recipe's rate-0 defaults the steps are
    identical.
    """
    loss_type = config.get("loss_type", "coca")
    if loss_type not in ("coca", "clip", "siglip"):
        raise ValueError(f"Unknown loss_type: {loss_type!r}")
    loss_mode = "local" if config.get("local_loss", True) else "global"
    clip_w = config.get("clip_loss_weight", 1.0)
    cap_w = config.get("coca_caption_loss_weight", 2.0)
    cap_chunk = config.get("cap_xent_chunk", 16)
    cpu_uint8 = config.get("cpu_unit8", False)
    coca = loss_type == "coca"
    w_clip = clip_w if coca else 1.0

    def update_fn(train_state, batch, rng):
        # Same input resharding rationale as the accum=1 step.
        batch = {
            k: (
                v
                if k == "image"
                else jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, P(("data", "fsdp")))
                )
            )
            for k, v in batch.items()
        }
        params, opt = train_state["params"], train_state["opt"]
        step_count = optim.get_count(train_state["opt"], jittable=True)
        rng = jax.random.fold_in(rng, step_count)

        b_global = batch["image"].shape[0]
        assert b_global % accum == 0, (
            f"grad_accum={accum} must divide the global batch {b_global}"
        )
        m = b_global // accum

        keys = ["image", "labels1", "labels2"]
        if coca:
            keys += ["autoreg_labels", "cap_loss_mask"]
        mb_spec = {
            "image": NamedSharding(mesh, P(None, ("data", "fsdp", "tensor"))),
        }
        mbs = {
            k: jax.lax.with_sharding_constraint(
                _microbatch(batch[k], accum),
                mb_spec.get(k, NamedSharding(mesh, P(None, ("data", "fsdp")))),
            )
            for k in keys
        }

        def fwd_core(p, mb, i):
            r = jax.random.fold_in(rng, i)
            imgs = mb["image"]
            if cpu_uint8:
                imgs = normalize_uint8(imgs)
            labels = jnp.concatenate([mb["labels1"], mb["labels2"]], axis=0)
            zimg, ztxt, out = model.apply(
                {"params": p},
                imgs,
                labels,
                train=True,
                rngs={"dropout": r, "drop_path": r, "random_mask": r},
            )
            aux = {
                "t": out["t"],
                "t/parameter": out["t/parameter"],
                "nimg": jnp.mean(out["img/norm"]),
                "ntxt": jnp.mean(out["txt/norm"]),
            }
            return zimg, ztxt, out, aux

        def cap_sum_fn(p, out, mb):
            """Sum-form caption xent (divided by the GLOBAL mask sum later)."""
            if out.get("cap_prelogits") is not None:
                kernel = p["txt_decoder"]["head"]["kernel"]
                n_batch_shards = mesh.shape.get("data", 1) * mesh.shape.get(
                    "fsdp", 1
                )
                rows = -(-mb["autoreg_labels"].shape[0] // n_batch_shards)
                chunk = max(
                    1, min(cap_chunk, (32 << 20) // (rows * kernel.shape[1]))
                )
                return losses.linear_softmax_xent(
                    prelogits=out["cap_prelogits"],
                    kernel=kernel,
                    labels=mb["autoreg_labels"],
                    mask=mb["cap_loss_mask"],
                    chunk=chunk,
                    normalize=False,
                )
            if out.get("logits") is not None:
                nll = losses.softmax_xent(
                    logits=out["logits"],
                    labels=mb["autoreg_labels"],
                    reduction=False,
                )
                return jnp.sum(nll * mb["cap_loss_mask"])
            return jnp.float32(0)

        # ---- pass 1: cache embeddings (decoder output unused -> DCE'd) ----
        def p1_body(_, xs):
            mb, i = xs
            zimg, ztxt, _out, aux = fwd_core(params, mb, i)
            return None, (zimg, ztxt, aux)

        _, (zimgs, ztxts, auxs) = jax.lax.scan(
            p1_body, None, (mbs, jnp.arange(accum))
        )
        measurements = jax.tree.map(lambda x: jnp.mean(x, axis=0), auxs)

        # ---- bridge: full-batch loss over the cached embeddings ----
        flat_spec = NamedSharding(mesh, P(("data", "fsdp"), None))
        zflat = jax.lax.with_sharding_constraint(
            zimgs.reshape(b_global, -1), flat_spec
        )
        v1 = jax.lax.with_sharding_constraint(
            ztxts[:, :m, :].reshape(b_global, -1), flat_spec
        )
        v2 = jax.lax.with_sharding_constraint(
            ztxts[:, m:, :].reshape(b_global, -1), flat_spec
        )

        def emb_loss(zi, za, zb, t_param, b_param):
            t = jnp.exp(t_param)  # the model's out["t"]
            if loss_type == "siglip":
                per_view = [
                    losses.siglip_loss(
                        zi, v, t, b_param, mesh=mesh, mode=loss_mode
                    )[0]
                    for v in (za, zb)
                ]
                return sum(per_view) / 2, {}
            return losses.bidirectional_contrastive_loss(
                zi, [za, zb], t, mode=loss_mode, mesh=mesh
            )

        if loss_type == "siglip":
            # fail at trace time like the accum=1 path, not silently b=0
            assert "b" in params, "siglip needs model.init_logit_bias"
        b_param = params.get("b", jnp.zeros((1,), jnp.float32))
        (l_clip, l_extras), (g_zi, g_v1, g_v2, g_t, g_b) = jax.value_and_grad(
            emb_loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(zflat, v1, v2, params["t"], b_param)

        g_zimgs = g_zi.reshape(accum, m, -1)
        g_ztxts = jnp.concatenate(
            [g_v1.reshape(accum, m, -1), g_v2.reshape(accum, m, -1)], axis=1
        )

        mask_sum = (
            jnp.sum(batch["cap_loss_mask"]) + 1e-8 if coca else jnp.float32(1)
        )
        cap_cot = jnp.float32(cap_w) / mask_sum if coca else jnp.float32(0)

        # ---- pass 2: per-microbatch VJP with embedding cotangents ----
        def p2_body(gacc, xs):
            mb, i, gz, gt = xs

            def f(p):
                zimg, ztxt, out, _aux = fwd_core(p, mb, i)
                cap = cap_sum_fn(p, out, mb) if coca else jnp.float32(0)
                return zimg, ztxt, cap

            (_, _, cap_sum), vjp_fn = jax.vjp(f, params)
            (gp,) = vjp_fn(
                (w_clip * gz, w_clip * gt, cap_cot.astype(cap_sum.dtype))
            )
            # accumulate in f32 regardless of param dtype: bf16 partial sums
            # would drift from the big-batch single-backward gradient.
            return (
                jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), gacc, gp
                ),
                cap_sum,
            )

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        grads, cap_sums = jax.lax.scan(
            p2_body, zero_grads, (mbs, jnp.arange(accum), g_zimgs, g_ztxts)
        )
        # temperature/bias grads flow through the bridge, not the towers.
        grads["t"] = grads["t"] + w_clip * g_t
        if "b" in grads:
            grads["b"] = grads["b"] + w_clip * g_b
        # back to param dtype for the optimizer (apply_updates must not
        # silently promote bf16 params to f32).
        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)

        if coca:
            cap_l = jnp.sum(cap_sums) / mask_sum
            measurements.update(
                l_extras, clip_loss=l_clip, caption_loss=cap_l
            )
            l = clip_w * l_clip + cap_w * cap_l
        else:
            measurements.update(l_extras)
            l = l_clip

        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)

        measurements["training_loss"] = l
        live_grads = jax.tree.leaves(
            optim.replace_frozen(config.get("schedule"), grads, 0.0)
        )
        measurements["l2_grads"] = _l2_norm(live_grads)
        measurements["l2_params"] = _l2_norm(jax.tree.leaves(params))
        measurements["l2_updates"] = _l2_norm(jax.tree.leaves(updates))
        return {"params": params, "opt": opt}, measurements

    return update_fn


def jit_update_fn(update_fn, state_sharding, mesh: Mesh):
    """Wraps the step in jit with donated, explicitly-sharded arguments.

    Tracing runs under `use_mesh(mesh)` so Pallas-fused ops shard_map
    themselves over the batch axes instead of being gathered by GSPMD.
    """
    from openvision_tpu.parallel import use_mesh

    def traced(train_state, batch, rng):
        # logical_axis_rules must be active during TRACING too: without it
        # every nn.with_logical_constraint in the model resolves to a no-op,
        # GSPMD is left to propagate activation shardings from the params
        # alone, and the mismatches surface as involuntary-full-remat
        # warnings (and extra collectives) in the multi-chip step.
        with use_mesh(mesh), logical_axis_rules():
            return update_fn(train_state, batch, rng)

    data_sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    return jax.jit(
        traced,
        donate_argnums=(0,),
        in_shardings=(state_sharding, data_sh, repl),
        out_shardings=(state_sharding, repl),
    )


def jit_multi_update_fn(update_fn, state_sharding, mesh: Mesh):
    """k optimizer steps in ONE XLA program (`config.steps_per_dispatch`).

    `lax.scan` over the k batches amortizes per-step dispatch latency —
    the measured gap between the chained and per-step training ladders
    (docs/PERF_NOTES.md: 117.9 → 147.9 img/s L/14@224) is pure enqueue
    overhead, which dominates when steps are short (small models, large
    pods, or a remote runtime). The scan body IS the single-step
    `update_fn`, whose RNG already folds in the optimizer count, so k
    scanned steps match k separate dispatches over the same batches to
    float32 compile-variance resolution: XLA fuses/reorders reductions
    differently inside the scanned program, so the equivalence is NOT
    bitwise — measured drift after 3-6 steps is <=3.3e-6 abs / <=4.1e-4
    rel on the tiny probe model (scripts/calibrate_multi_dispatch.py;
    tests/test_multi_dispatch.py asserts the calibrated bound).

    Takes the k batches as a TUPLE of per-step batch trees and stacks
    them inside the jitted program, which avoids holding an eager
    host-side `jnp.stack` copy alive in the caller across the dispatch
    (ADVICE r3). The batch tuple is NOT donated: a probe on real TPU
    shows XLA cannot alias the per-step (B, ...) buffers into the
    (k, B, ...) stacked intermediate ("donated buffers were not usable"
    fires for every leaf), so donating them bought no memory and only
    emitted warnings on each multi-step dispatch (ADVICE r4). Only the
    train state (arg 0) is donated, where aliasing is exact.

    Returns the LAST step's telemetry — the trainer only chunks across
    steps with no logging/checkpoint/eval events, so interior telemetry
    is never observed anyway.
    """
    from openvision_tpu.parallel import use_mesh

    def traced(train_state, batches, rng):
        with use_mesh(mesh), logical_axis_rules():
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

            def body(state, batch):
                new_state, m = update_fn(state, batch, rng)
                return new_state, m

            state, ms = jax.lax.scan(body, train_state, stacked)
        return state, jax.tree.map(lambda x: x[-1], ms)

    data_sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    return jax.jit(
        traced,
        donate_argnums=(0,),
        in_shardings=(state_sharding, data_sh, repl),
        out_shardings=(state_sharding, repl),
    )
