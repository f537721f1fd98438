"""The training application: config → mesh → data → train loop → evals.

Capability parity with reference src/main_clip.py:78-783, restructured as a
library function `train(config, workdir)` plus a CLI. One jitted update step
(train/step.py), grain input (data/pipeline.py), Orbax checkpoints
(train/checkpoint.py), Chrono/MetricWriter telemetry, evaluator hooks, and
the init decision chain: resume own workdir > ft_from > train from scratch.

CLI:
  python -m openvision_tpu.train.trainer \
      --config openvision_tpu/configs/openvision.py:res=84,img=L/14 \
      --workdir /tmp/run1
"""

from __future__ import annotations

import importlib
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu import optim
from openvision_tpu.data import pipeline as input_pipeline
from openvision_tpu.parallel import create_mesh, replicated_sharding
from openvision_tpu.train import checkpoint as ckpt_lib
from openvision_tpu.train import step as step_mod
from openvision_tpu.train.chrono import chrono
from openvision_tpu.train.metrics import MetricWriter


def steps(name, config, data_size, batch_size, total_steps=None, default=ValueError):
    return optim.steps(name, config, data_size, batch_size, total_steps, default)


def _should(step: int, every: Optional[int], total: int) -> bool:
    if not every:
        return False
    return step % every == 0 or step == total


def _token_range_checker(config):
    """First-batch hook: validates token ids against the embed sizes.

    A vocab_size smaller than what the tokenizer emits (e.g. vocab_size=64
    with the real 30522-line WordPiece vocab) turns the caption loss into
    silent NaNs — out-of-range one-hot targets zero out log-probs. One cheap
    numpy max on the first batch catches it before the first step runs.
    Runs as DeviceIterator's on_first_batch hook (a generator wrapper would
    hide the grain iterator's get_state from the data-resume path).
    """
    def _cfg_get(section, key, default=None):
        sub = config.model.get(section)
        return sub.get(key, default) if hasattr(sub, "get") else default

    txt_vocab = _cfg_get("text", "vocab_size")
    limits = {
        "labels1": txt_vocab,
        "labels2": txt_vocab,
        "autoreg_labels": _cfg_get(
            "text_decoder_config", "num_classes", txt_vocab),
    }

    def check(first):
        for key, limit in limits.items():
            if limit and key in first:
                mx = int(np.max(first[key]))
                if mx >= limit:
                    raise ValueError(
                        f"batch[{key!r}] contains token id {mx} but the "
                        f"model's vocab/num_classes is {limit} — the "
                        "tokenizer vocab and config vocab_size disagree "
                        "(this would train on NaNs)"
                    )

    return check


def maybe_distributed_init():
    """jax.distributed.initialize() when running under a multi-host launcher."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    ) > 1:
        jax.distributed.initialize()


def sync(name: str):
    """Multihost barrier (reference main_clip.py:673-779): all processes
    rendezvous at `name`d points — data loading, reporting, checkpoint, eval,
    final — which doubles as hang detection on pods (a wedged worker turns
    into a visible barrier timeout instead of a silent divergence).
    No-op single-process so single-chip runs pay nothing.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _load_transform(config, init_params, params_sharding):
    """Restores a checkpoint trained at a different geometry, adapting
    patch-embedding (bilinear kernel resize) and position embeddings."""
    import jax.numpy as jnp

    from openvision_tpu.models.vit import resample_posemb

    loaded = ckpt_lib.restore_params(config.load_transform, None)
    params_host = jax.device_get(jax.tree.map(lambda x: x, init_params))

    img = dict(loaded.get("img", {}))
    if "embedding" in img and "embedding" in params_host.get("img", {}):
        old_k = np.asarray(img["embedding"]["kernel"])
        new_shape = params_host["img"]["embedding"]["kernel"].shape
        if old_k.shape != new_shape:
            img["embedding"] = dict(img["embedding"])
            img["embedding"]["kernel"] = np.asarray(
                jax.image.resize(jnp.asarray(old_k), new_shape, method="bilinear")
            )
    if "pos_embedding" in img and "pos_embedding" in params_host.get("img", {}):
        img["pos_embedding"] = np.asarray(
            resample_posemb(
                jnp.asarray(img["pos_embedding"]),
                params_host["img"]["pos_embedding"].shape[1],
            )
        )
    loaded = dict(loaded, img=img)

    from openvision_tpu.utils import merge_params

    merged = merge_params(loaded, params_host, dont_load=config.get("dont_load", ()))
    return jax.device_put(merged, params_sharding)


def build_evaluators(config, model, mesh, writer, note=print):
    from openvision_tpu.evaluators import common as eval_common

    def on_error(name, e):
        # Multi-process: a per-process skip would desync the evaluator sets
        # (the eval barrier + the evaluators' jitted collectives are driven by
        # each process's local list — divergence turns a skipped evaluator
        # into a multihost hang). Fail loud instead.
        if jax.process_count() > 1:
            raise RuntimeError(
                f"evaluator {name!r} failed to construct on process "
                f"{jax.process_index()}; fatal under multi-process to keep "
                f"evaluator sets identical across hosts"
            ) from e
        note(f"evaluator {name!r} disabled: {e}")

    return eval_common.from_config(config, model, mesh, on_error=on_error)


def _install_preemption_flag():
    """SIGTERM sets a flag checked at step boundaries (single-process path).

    Spot/preemptible TPU VMs get a SIGTERM grace window before shutdown; the
    reference's only defense is resume-from-workdir after losing the steps
    since the last periodic checkpoint (main_clip.py:502-547 + the spot
    create-retry loop). Multi-process coordination instead rides Orbax's
    `reached_preemption` (the JAX coordination service agrees on a sync
    point), so every host saves the SAME step.
    """
    import signal

    flag = {"hit": False}

    def _handler(signum, frame):
        flag["hit"] = True

    try:
        signal.signal(signal.SIGTERM, _handler)
    except ValueError:
        pass  # not the main thread (e.g. under a test runner)
    return flag


def train(config, workdir: Optional[str] = None):
    # Persistent XLA compilation cache (beyond reference): repeat launches —
    # resume after preemption, curriculum stages, eval_only sweeps — skip the
    # multi-minute compile of the donated train step.
    cache_dir = config.get("compilation_cache_dir") or os.environ.get(
        "OPENVISION_COMPILATION_CACHE"
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    rng = jax.random.PRNGKey(config.get("seed", 0))
    writer = MetricWriter(workdir, config)

    def note(msg):
        if jax.process_index() == 0:
            print(f"NOTE: {msg}", flush=True)

    # ----- mesh -----
    mesh_cfg = config.sharding.get("mesh", {})
    mesh = create_mesh(
        data=mesh_cfg.get("data", -1),
        fsdp=mesh_cfg.get("fsdp", 1),
        tensor=mesh_cfg.get("tensor", 1),
        seq=mesh_cfg.get("seq", 1),
        pipe=mesh_cfg.get("pipe", 1),
    )
    note(f"mesh: {dict(mesh.shape)}")

    # ----- data -----
    batch_size = config.input.batch_size
    assert batch_size % jax.device_count() == 0, (batch_size, jax.device_count())
    loader, ntrain = input_pipeline.training(
        config.input, seed=config.get("seed", 0),
        num_workers=config.input.get("num_workers", 0),
    )
    total_steps = steps("total", config, ntrain, batch_size)
    note(f"{total_steps} steps, {total_steps * batch_size / max(ntrain,1):.1f} epochs")
    chrono.inform(
        total_steps=total_steps, global_bs=batch_size,
        steps_per_epoch=ntrain / batch_size,
    )

    # ----- model / optimizer / state -----
    model = step_mod.build_model(config)
    rng, rng_init = jax.random.split(rng)
    train_state, state_sharding, tx, sched_fns = step_mod.init_train_state(
        config, model, mesh, rng_init, total_steps=total_steps, data_size=ntrain
    )
    if jax.process_index() == 0:
        n_params = sum(p.size for p in jax.tree.leaves(train_state["params"]))
        writer.measure("num_params", n_params)
        note(f"{n_params/1e6:.1f}M params")

    raw_update_fn = step_mod.make_update_fn(config, model, tx, mesh)
    update_fn = step_mod.jit_update_fn(raw_update_fn, state_sharding, mesh)
    # steps_per_dispatch > 1: scan k steps inside one XLA program to amortize
    # per-step enqueue latency (exact — see step.jit_multi_update_fn). The
    # loop below only chunks across event-free steps, so logging/ckpt/eval
    # cadences are honored exactly; cadences that are multiples of k keep
    # the compile count at two programs (sizes k and 1).
    steps_per_dispatch = int(config.get("steps_per_dispatch", 1) or 1)
    multi_update_fn = (
        step_mod.jit_multi_update_fn(raw_update_fn, state_sharding, mesh)
        if steps_per_dispatch > 1
        else None
    )

    # ----- checkpoint decision chain (reference main_clip.py:502-608) -----
    ckpt_mngr = None
    first_step = 0
    if workdir and config.get("save_ckpt", True):
        ckpt_mngr = ckpt_lib.create_checkpoint_manager(
            os.path.join(workdir, "checkpoints"),
            save_interval_steps=1,
            max_to_keep=config.get("keep_ckpt", 1),
        )

    chrono_path = os.path.join(workdir, "chrono.json") if workdir else None

    def _data_state_path(step):
        # grain iterator state is per-process: each host checkpoints its own
        # shard position next to the Orbax step dirs.
        return os.path.join(
            workdir, "checkpoints",
            f"data_state-{step}-p{jax.process_index()}.bin",
        )

    data_state = None
    if ckpt_mngr and ckpt_mngr.latest_step() is not None:
        note(f"resuming from step {ckpt_mngr.latest_step()}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            train_state,
        )
        train_state = ckpt_lib.restore_train_state(ckpt_mngr, abstract)
        first_step = optim.get_count(train_state["opt"])
        # exact-batch data resume (beyond reference, which re-reads data from
        # the start): restore the grain iterator position saved with this
        # step's checkpoint, when present.
        if os.path.exists(_data_state_path(first_step)):
            with open(_data_state_path(first_step), "rb") as f:
                data_state = f.read()
            note(f"resuming data iterator at step {first_step} (exact batch)")
        else:
            note("no data-iterator state for this step: data restarts")
        # keep core-hours accounting across preemptions (the reference's
        # chrono.npz sidecar, main_clip.py:540-546).
        if chrono_path and os.path.exists(chrono_path):
            import json as _json

            chrono.load(_json.load(open(chrono_path)))
    elif config.get("ft_from"):
        note(f"finetuning from {config.ft_from}")
        abstract_params = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            train_state["params"],
        )
        params = ckpt_lib.restore_params(config.ft_from, abstract_params)
        train_state = {"params": params, "opt": train_state["opt"]}
    elif config.get("load_transform"):
        # Re-init under a different model geometry: restore a foreign
        # checkpoint, bilinearly resize its patch embedding and resample its
        # posemb to this model's shapes (reference main_clip.py:231-316).
        note(f"load_transform from {config.load_transform}")
        train_state["params"] = _load_transform(
            config, train_state["params"], state_sharding["params"]
        )
    elif config.get("masked_init"):
        from openvision_tpu.utils import merge_params

        note(f"masked init from {config.masked_init}")
        loaded = ckpt_lib.load_npz(config.masked_init)
        params_host = jax.device_get(train_state["params"])
        merged = merge_params(
            loaded, params_host, dont_load=config.get("dont_load", ())
        )
        train_state["params"] = jax.device_put(
            merged, state_sharding["params"]
        )

    # Created after the checkpoint decision chain so a restored data-iterator
    # state can seed it; DeviceIterator starts lazily on first __next__.
    train_iter = input_pipeline.start_input_pipeline(
        loader, mesh, prefetch=1, state=data_state,
        on_first_batch=_token_range_checker(config),
    )

    # ----- evaluators -----
    evaluators = []
    if config.get("evals"):
        evaluators = build_evaluators(config, model, mesh, writer, note=note)

    def run_evals(step, final=False):
        for name, evaluator, log_steps, prefix in evaluators:
            if final or _should(step, log_steps, total_steps):
                chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
                t0 = time.monotonic()
                for metric_name, value in evaluator.run(train_state):
                    writer.measure(f"{prefix}{metric_name}", value)
                writer.measure(f"z/secs/eval/{name}", time.monotonic() - t0)
                chrono.resume()

    if config.get("eval_only", False):
        writer.step_start(first_step)
        run_evals(first_step, final=True)
        writer.close()
        return train_state

    # ----- train loop -----
    rng, rng_loop = jax.random.split(rng)
    rng_loop = jax.device_put(rng_loop, replicated_sharding(mesh))
    log_every = config.get("log_training_steps", 50)
    ckpt_every = config.get("ckpt_steps", 1000)

    # Real profiler wiring (the reference left this as a TODO stub,
    # utils.py:818-831): trace steps [profile_start, profile_stop) to workdir.
    prof_start = config.get("profile_start_step", 0)
    prof_stop = config.get("profile_stop_step", 0)

    preempt = _install_preemption_flag()

    def _save_now(step):
        chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
        sync("save_ckpt")
        ckpt_lib.save_train_state(ckpt_mngr, step, train_state)
        ds = train_iter.get_state()
        if workdir and ds is not None:
            # atomic rename like the npz writer; the state describes the
            # position right after this step's batch, so resume continues
            # with batch step+1 exactly.
            path = _data_state_path(step)
            with open(path + "-TEMPORARY", "wb") as f:
                f.write(ds)
            os.replace(path + "-TEMPORARY", path)
            import glob as _glob

            keep = {step} | set(ckpt_mngr.all_steps())
            pat = os.path.join(
                os.path.dirname(path),
                f"data_state-*-p{jax.process_index()}.bin",
            )
            for old in _glob.glob(pat):
                s = os.path.basename(old).split("-")[1]
                if s.isdigit() and int(s) not in keep:
                    os.remove(old)
        if chrono_path and jax.process_index() == 0:
            import json as _json

            with open(chrono_path, "w") as f:
                _json.dump(
                    {k: float(v) for k, v in chrono.save().items()}, f
                )
        chrono.resume()

    def _has_event(s):
        """Steps whose post-update handling forbids running PAST them inside
        one multi-step dispatch (they may still END a chunk)."""
        if _should(s, log_every, total_steps):
            return True
        if ckpt_mngr and _should(s, ckpt_every, total_steps):
            return True
        if any(_should(s, ls, total_steps) for _, _, ls, _ in evaluators):
            return True
        # profiling: the trace must start BEFORE step prof_start (so
        # prof_start must open a chunk) and stop AFTER prof_stop.
        if prof_stop and (s == prof_stop or s + 1 == prof_start):
            return True
        return False

    note("starting training loop")
    step = first_step
    while step < total_steps:
        s0 = step + 1
        chunk = 1
        if steps_per_dispatch > 1 and s0 + steps_per_dispatch - 1 <= total_steps:
            if not any(
                _has_event(s) for s in range(s0, s0 + steps_per_dispatch - 1)
            ):
                chunk = steps_per_dispatch
        if preempt["hit"]:
            # SIGTERM already observed: don't open a k-step chunk — the
            # preemption check below only runs at chunk boundaries, so a
            # large steps_per_dispatch would multiply the response latency
            # and could overrun the spot-VM grace window (ADVICE r3).
            chunk = 1
        # Fetch one batch at a time so a finite dataset that ends mid-chunk
        # still trains on the batches already fetched (a short final chunk)
        # instead of discarding them (ADVICE r3).
        batches = []
        for _ in range(chunk):
            try:
                batches.append(next(train_iter))
            except StopIteration:
                break
        if not batches:
            break
        chunk = len(batches)
        step = s0 + chunk - 1
        if s0 == first_step + 1:
            # one rendezvous when every host has its first batch; per-step
            # barriers add host latency with no correctness benefit (the
            # step's collectives already synchronize devices) — the
            # reference also only syncs at coarse points.
            sync("data_loading")
        writer.step_start(step)
        if workdir and prof_stop and s0 == prof_start and jax.process_index() == 0:
            jax.profiler.start_trace(os.path.join(workdir, "profile"))
        with jax.profiler.StepTraceAnnotation("train_step", step_num=step):
            if chunk == 1:
                train_state, measurements = update_fn(
                    train_state, batches[0], rng_loop
                )
            else:
                # The multi-step program stacks the batches inside jit —
                # no eager host-side stack held alive across the dispatch.
                train_state, measurements = multi_update_fn(
                    train_state, tuple(batches), rng_loop
                )
        if workdir and prof_stop and step == prof_stop and jax.process_index() == 0:
            jax.block_until_ready(measurements)
            jax.profiler.stop_trace()

        if _should(step, log_every, total_steps):
            for name, value in measurements.items():
                writer.measure(name, value)
            chrono.tick(step, writer.measure, note)
            if jax.process_index() == 0:
                loss = float(jax.device_get(measurements["training_loss"]))
                note(f"step {step}/{total_steps} loss={loss:.4f}")
            sync("reporting")

        if ckpt_mngr and _should(step, ckpt_every, total_steps):
            _save_now(step)

        # Preemption (SIGTERM grace window): checkpoint THIS step and exit
        # cleanly so the resume path loses zero work. The local signal flag
        # is single-process ONLY — on pods, hosts can observe SIGTERM at
        # different step boundaries, and acting on the local flag would save
        # divergent steps / desync the barriers. Multi-process agreement
        # comes exclusively from Orbax's reached_preemption, whose
        # coordination-service sync point makes every host answer the same
        # way at the same step.
        preempted = (jax.process_count() == 1 and preempt["hit"]) or (
            ckpt_mngr is not None
            and jax.process_count() > 1
            and ckpt_mngr.reached_preemption(step)
        )
        if preempted:
            note(f"preemption signal at step {step}: checkpointing and exiting")
            if ckpt_mngr:
                _save_now(step)
                ckpt_mngr.wait_until_finished()
            writer.close()
            return train_state

        if evaluators and any(
            _should(step, ls, total_steps) for _, _, ls, _ in evaluators
        ):
            sync("eval")
        run_evals(step)

    if ckpt_mngr:
        ckpt_mngr.wait_until_finished()
    sync("final")
    run_evals(total_steps, final=True)
    writer.close()
    return train_state


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True,
                        help="path/to/config.py[:arg1=val,flag]")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--override", action="append", default=[],
                        help="dotted config overrides: a.b.c=value")
    args = parser.parse_args(argv)

    cfg_path, _, cfg_arg = args.config.partition(":")
    spec = importlib.util.spec_from_file_location("run_config", cfg_path)
    cfg_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg_mod)
    config = cfg_mod.get_config(cfg_arg or None)

    for ov in args.override:
        key, _, val = ov.partition("=")
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        from openvision_tpu.configs.common import _autocast

        node[parts[-1]] = _autocast(val)

    maybe_distributed_init()
    train(config, args.workdir)


if __name__ == "__main__":
    main()
