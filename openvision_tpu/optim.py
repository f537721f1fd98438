"""Optimizer builder: masked optax chain with per-regex schedules.

Capability parity with reference src/optim/build_optax.py: duration parsing
(steps/examples/epochs/percent), warmup+cosine/linear/rsqrt/stair schedules,
regex-grouped schedules with freeze-by-None, decoupled weight decay with regex
multipliers, lr multipliers, layer-wise lr decay (lwd), Adam with bfloat16
first moment, global-norm clipping, and step-count extraction from the chain.
"""

from __future__ import annotations

import operator
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from openvision_tpu.utils import make_mask_trees


def steps(
    prefix: str,
    config,
    data_size: Optional[int] = None,
    batch_size: Optional[int] = None,
    total_steps: Optional[int] = None,
    default=ValueError,
) -> int:
    """Resolves `<prefix>_{steps,examples,epochs,percent}` from config to steps."""
    get = config.get if hasattr(config, "get") else lambda k, d=None: getattr(config, k, d)
    found = [s for s in ("steps", "examples", "epochs", "percent") if get(f"{prefix}_{s}") is not None]
    assert len(found) <= 1, f"Only one duration unit for {prefix!r}, got {found}"

    if get(f"{prefix}_steps") is not None:
        return get(f"{prefix}_steps")
    if batch_size and get(f"{prefix}_examples") is not None:
        return max(round(get(f"{prefix}_examples") / batch_size), 1)
    if batch_size and data_size and get(f"{prefix}_epochs") is not None:
        return max(round(get(f"{prefix}_epochs") * data_size / batch_size), 1)
    if total_steps and get(f"{prefix}_percent") is not None:
        pct = get(f"{prefix}_percent")
        assert 0.0 <= pct <= 1.0, f"{prefix}_percent must be in [0,1], got {pct}"
        return max(round(pct * total_steps), 1)
    if default is ValueError:
        raise ValueError(f"Cannot resolve duration {prefix!r} to steps")
    return default


def create_learning_rate_schedule(
    total_steps: int,
    batch_size: Optional[int] = None,
    data_size: Optional[int] = None,
    base: float = 1.0,
    decay_type: str = "cosine",
    scale_with_batchsize: bool = False,
    **kw,
) -> Callable[[jax.Array], jax.Array]:
    """Builds lr(step): warmup → {linear,cosine,rsqrt,stair} → cooldown."""
    warmup = steps("warmup", kw, data_size, batch_size, total_steps, default=0)
    cooldown = steps("cooldown", kw, data_size, batch_size, total_steps, default=0)
    assert total_steps <= 1 or warmup < total_steps, "warmup >= total_steps"

    def sched(step):
        lr = base
        if scale_with_batchsize:
            lr = lr * batch_size / 256.0
        progress = jnp.clip(
            (step - warmup) / float(max(total_steps - warmup, 1)), 0.0, 1.0
        )
        if decay_type in ("linear", "polynomial"):
            power = kw.get("power", 1)
            end = kw.get("end", kw.get("linear_end", 0))
            lr = end + (lr - end) * (1.0 - progress) ** power
        elif decay_type == "cosine":
            if kw.get("min_lr"):
                floor = kw["min_lr"] / kw["max_lr"]
                lr = floor + (lr - floor) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
            else:
                lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        elif decay_type == "rsqrt":
            timescale = kw.get("timescale", 10_000)
            shift = timescale - warmup
            lr = jnp.where(
                warmup < step, lr / jnp.sqrt((step + shift) / timescale), lr
            )
        elif decay_type == "stair":
            i = jnp.searchsorted(jnp.asarray(kw.get("steps", [])), step + 1)
            lr = lr * jnp.take(jnp.asarray([1.0] + list(kw.get("mults", []))), i)
        else:
            raise ValueError(f"Unknown decay_type: {decay_type!r}")
        if warmup:
            lr = lr * jnp.minimum(1.0, step / warmup)
        if cooldown:
            lr = lr * jnp.minimum(1.0, (total_steps - step) / cooldown)
        return jnp.asarray(lr, jnp.float32)

    return sched


def _mask_trees(params, patterns_values: Sequence):
    patterns = [p for p, _ in patterns_values]
    values = [v for _, v in patterns_values]
    return make_mask_trees(params, patterns), values


def _split_frozen(masks, scheds):
    """Schedules set to None freeze their params; every param must be covered."""
    uncovered = jax.tree.map(lambda *bools: not any(bools), *masks)
    if any(jax.tree.leaves(uncovered)):
        names, vals = _names_and(uncovered)
        bad = [n for n, v in zip(names, vals) if v]
        raise AssertionError(
            f"params not covered by config.schedule (use None to freeze): {bad}"
        )
    frozen_masks = [m for m, s in zip(masks, scheds) if s is None]
    frozen = jax.tree.map(
        lambda *bools: any(bools), *frozen_masks, uncovered
    )
    live = [(m, s) for m, s in zip(masks, scheds) if s is not None]
    masks, scheds = zip(*live) if live else ((), ())
    return frozen, list(masks), list(scheds)


def _names_and(tree):  # pragma: no cover - debug helper
    from openvision_tpu.utils import tree_flatten_with_names

    flat, _ = tree_flatten_with_names(tree)
    return [n for n, _ in flat], [v for _, v in flat]


def replace_frozen(schedule, pytree, replacement):
    """Replaces leaves of frozen (schedule=None) params with `replacement`."""
    if not isinstance(schedule, (list, tuple)):
        return pytree
    masks, scheds = _mask_trees(pytree, schedule)
    frozen, _, _ = _split_frozen(masks, scheds)
    return jax.tree.map(lambda v, f: replacement if f else v, pytree, frozen)


def find_states(opt_state, cls):
    leaves = jax.tree.leaves(opt_state, is_leaf=lambda n: isinstance(n, cls))
    return [l for l in leaves if isinstance(l, cls)]


def get_count(opt_state, jittable: bool = False):
    """Extracts the step count from the first ScaleByScheduleState."""
    counts = [s.count for s in find_states(opt_state, optax.ScaleByScheduleState)]
    if jittable:
        return counts[0]
    unique = {int(c) for c in counts}
    assert len(unique) == 1, f"Expected one unique count, got {unique}"
    return next(iter(unique))


def make(config, params, *, sched_kw: dict):
    """Builds (optax.GradientTransformation, [schedule_fns]) from config.

    config fields used: schedule (list of (regex, sched-dict|None)), lr,
    optax_name, optax (kwargs), grad_clip_norm?, lr_mults?, lwd?, wd, wd_mults?.
    """
    get = config.get if hasattr(config, "get") else lambda k, d=None: getattr(config, k, d)

    schedule = get("schedule")
    if not isinstance(schedule, (tuple, list)):
        schedule = [(".*", schedule)]
    masks, scheds = _mask_trees(params, schedule)
    frozen_mask, masks, scheds = _split_frozen(masks, scheds)
    not_frozen = jax.tree.map(operator.not_, frozen_mask)

    sched_fns = [
        create_learning_rate_schedule(base=s.get("mult", 1.0), **sched_kw,
                                      **{k: v for k, v in s.items() if k != "mult"})
        for s in scheds
    ]
    schedule_txs = [
        optax.masked(optax.scale_by_schedule(fn), mask)
        for fn, mask in zip(sched_fns, masks)
    ] + [optax.masked(optax.set_to_zero(), frozen_mask)]

    clip_tx = (
        optax.masked(optax.clip_by_global_norm(get("grad_clip_norm")), not_frozen)
        if get("grad_clip_norm")
        else optax.identity()
    )

    opt_fn = operator.attrgetter(get("optax_name", "scale_by_adam"))(optax)
    optax_kw = dict(get("optax", {}))
    if isinstance(optax_kw.get("mu_dtype"), str):
        optax_kw["mu_dtype"] = jnp.dtype(optax_kw["mu_dtype"])
    opt_tx = optax.masked(opt_fn(**optax_kw), not_frozen)

    lr_txs = [optax.scale(get("lr", 1.0))]
    if get("lr_mults"):
        m, v = _mask_trees(params, get("lr_mults"))
        assert all(mult > 0 for mult in v), "freeze with schedule=None, not lr_mults"
        lr_txs += [optax.masked(optax.scale(mult), mask) for mult, mask in zip(v, m)]

    if get("lwd"):
        # Layer-wise lr decay over encoder blocks (deeper layers get larger lr).
        depth = get("lwd_depth")
        assert depth, "config.lwd needs config.lwd_depth (encoder depth)"
        lwd = get("lwd")
        lwd_mults = [
            (f".*encoderblock_{i}/.*", lwd ** (depth - i)) for i in range(depth)
        ]
        lwd_mults += [
            ("head.*", 1.0),
            ("encoder_norm.*", 1.0),
            ("embedding.*", lwd ** (depth + 1)),
            ("pos_embedding.*", lwd ** (depth + 1)),
            ("cls.*", lwd ** (depth + 1)),
        ]
        m, v = _mask_trees(params, lwd_mults)
        lr_txs += [optax.masked(optax.scale(mult), mask) for mult, mask in zip(v, m)]

    wd_txs = []
    if get("wd", 0.0):
        wd_mults = get("wd_mults", [(r".*/kernel$", 1.0)])
        m, v = _mask_trees(params, wd_mults)
        wd_txs = [
            optax.add_decayed_weights(get("wd") * mult, mask)
            for mult, mask in zip(v, m)
        ]

    tx = optax.chain(
        clip_tx, opt_tx, *wd_txs, *lr_txs, *schedule_txs, optax.scale(-1.0)
    )
    return tx, sched_fns
