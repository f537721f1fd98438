"""2-process jax.distributed smoke test on CPU (VERDICT r1 #5).

Launches two real processes that form one 8-device global CPU backend
(4 virtual devices each) via jax.distributed.initialize, run a tiny sharded
train loop THROUGH the trainer (exercising the multihost sync barriers,
ShardByJaxProcess data sharding, make_array_from_process_local_data batch
assembly, and per-process disclf class splits), and must agree on the loss.
Reference behavior: src/main_clip.py:80 + sync_global_devices :673-779.
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
