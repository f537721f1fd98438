"""2-process jax.distributed tests on CPU (VERDICT r1 #5, r4 Weak #5).

Launches two real processes that form one 8-device global CPU backend
(4 virtual devices each) via jax.distributed.initialize and run a tiny
sharded train loop THROUGH the trainer (multihost sync barriers,
ShardByJaxProcess data sharding, make_array_from_process_local_data batch
assembly); both processes must agree on the trained parameters.

`test_two_process_distributed_train` is the eval-less, checkpoint-less
smoke. `test_two_process_ckpt_save_and_resume` is the DURABILITY rehearsal:
a 2-process run doing a real async Orbax save (the classic multihost
failure mode), a second 2-process run restoring it and continuing, plus an
in-loop disclf eval whose class-embedding work is split per process
(evaluators/disclf.py:201-205). Reference behavior: src/main_clip.py:80,
:673-779 (sync), :703-727 (multihost save/restore).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer

c = cfg_mod.get_config(
    "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
    "output_token_len=12,vocab_size=30522,remat=none,"
    "vocab_path=assets/bert_base_vocab_bos_eos.txt"
)
c.input.batch_size = 16
c.input.data = dict(name="synthetic", num_examples=64, res=48)
c.init_shapes = [(16, 32, 32, 3), (32, 16)]
c.model.out_dim = (32, 32)
c.total_steps = 2
c.lr = 1e-3
c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
c.log_training_steps = 1
c.ckpt_steps = 0
c.save_ckpt = False
c.evals = {}

state = trainer.train(c, None)
l2 = float(
    sum(jax.numpy.vdot(p, p) for p in jax.tree.leaves(state["params"])) ** 0.5
)
print(f"RESULT {sys.argv[2]} {l2:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_train():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=4"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, l2 = line.split()
                results[pid] = float(l2)
    assert set(results) == {"0", "1"}, outs
    assert abs(results["0"] - results["1"]) < 1e-4, results


_WORKER_CKPT = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert jax.device_count() == 8, jax.device_count()
workdir = sys.argv[3]
total_steps = int(sys.argv[4])

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer
from openvision_tpu import optim

c = cfg_mod.get_config(
    "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
    "output_token_len=12,vocab_size=30522,remat=none,"
    "vocab_path=assets/bert_base_vocab_bos_eos.txt"
)
c.input.batch_size = 16
c.input.data = dict(name="synthetic", num_examples=64, res=48)
c.init_shapes = [(16, 32, 32, 3), (32, 16)]
c.model.out_dim = (32, 32)
c.total_steps = total_steps
c.lr = 1e-3
c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
c.log_training_steps = 1
c.ckpt_steps = 2          # periodic async Orbax save at step 2
c.save_ckpt = True
c.keep_ckpt = 10
del c.evals.retrieval
c.evals.disclf.data_dir = "synthetic"
c.evals.disclf.batch_size = 8
c.evals.disclf.prompt_templates = "none"
c.evals.disclf.log_steps = total_steps  # final eval only
state = trainer.train(c, workdir)
l2 = float(
    sum(jax.numpy.vdot(p, p) for p in jax.tree.leaves(state["params"])) ** 0.5
)
print(
    f"RESULT {sys.argv[2]} {optim.get_count(state['opt'])} {l2:.6f}",
    flush=True,
)
"""


def _launch_two(worker, extra_args):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=4"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, coord, str(i)] + list(extra_args),
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"
    return outs


def _parse_results(outs):
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, count, l2 = line.split()
                results[pid] = (int(count), float(l2))
    assert set(results) == {"0", "1"}, outs
    return results


@pytest.mark.slow
def test_two_process_ckpt_save_and_resume(tmp_path):
    """2-process async Orbax save at step 2, then a second 2-process run
    restores it and continues to step 4 — the multihost durability path the
    smoke test above deliberately skips (VERDICT r4 Weak #5)."""
    import json

    workdir = str(tmp_path / "run")

    first = _parse_results(_launch_two(_WORKER_CKPT, [workdir, "2"]))
    assert first["0"][0] == 2 and first["1"][0] == 2, first
    assert abs(first["0"][1] - first["1"][1]) < 1e-4, first

    ckdir = os.path.join(workdir, "checkpoints")
    # the async save committed an Orbax step dir and per-PROCESS data states
    assert os.path.isdir(os.path.join(ckdir, "2")), os.listdir(ckdir)
    for pid in (0, 1):
        assert os.path.exists(
            os.path.join(ckdir, f"data_state-2-p{pid}.bin")
        ), os.listdir(ckdir)

    second = _parse_results(_launch_two(_WORKER_CKPT, [workdir, "4"]))
    assert second["0"][0] == 4 and second["1"][0] == 4, second
    assert abs(second["0"][1] - second["1"][1]) < 1e-4, second
    # training actually continued from the restored state
    assert second["0"][1] != first["0"][1]
    assert os.path.isdir(os.path.join(ckdir, "4")), os.listdir(ckdir)

    # the in-loop disclf eval ran under 2 processes (per-process class
    # splits inside the evaluator) and logged through process 0's writer
    rows = [
        json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))
    ]
    keys = {k for r in rows for k in r}
    assert any(k.startswith("z/0shot/") and "accuracy" in k for k in keys), (
        sorted(keys)
    )
