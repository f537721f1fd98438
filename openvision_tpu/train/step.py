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


def make_update_fn(
    config, model: nn.Module, tx: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """Builds the jitted train step (donates train_state)."""
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
        measurements["l2_grads"] = jnp.sqrt(
            sum(jnp.vdot(g, g) for g in live_grads)
        )
        measurements["l2_params"] = jnp.sqrt(
            sum(jnp.vdot(p, p) for p in jax.tree.leaves(params))
        )
        measurements["l2_updates"] = jnp.sqrt(
            sum(jnp.vdot(u, u) for u in jax.tree.leaves(updates))
        )
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
