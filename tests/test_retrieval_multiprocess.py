"""2-process retrieval evaluator correctness test (ADVICE r2 medium).

Regression guard: _embed_images_pipelined slices its own rows back out of the
replicated global embedding batch; with per-process source sharding those rows
were process 0's shard on every host, so zimg silently covered ~1/P of the
images on pods. The fix (`make_for_inference(..., shard=False)`) must make the
2-process metrics IDENTICAL to the single-process ground truth, not merely
consistent across hosts. Reference behavior: the retrieval evaluator embeds
the full source on every host (src/evaluators/proj/image_text/retrieval.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
nproc = int(sys.argv[3])
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=nproc,
        process_id=int(sys.argv[2]),
    )
assert jax.device_count() == 8, jax.device_count()

import numpy as np
import jax.numpy as jnp
from openvision_tpu.data import pipeline as pipe
from openvision_tpu.evaluators import retrieval
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import create_mesh, unbox

model = clip_mod.Model(
    out_dim=(32, 32),
    image=dict(variant="mu/16", posemb="sincos2d", pool_type="gap",
               output_tokens=True, emb_head_bias=False),
    text=dict(variant="Ti", pool_type="last", vocab_size=30522,
              output_tokens=True),
    text_decoder="none",
    temperature_init=1 / 0.07,
)
params = unbox(model.init(
    jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 16), jnp.int32)
)["params"])

rng = np.random.RandomState(0)
images = rng.randint(0, 255, (10, 32, 32, 3), np.uint8)
caps = np.array([f"object number {i} in a scene" for i in range(10)])
src = pipe.DictSource({"image": images, "captions": caps})

mesh = create_mesh(data=8)
ev = retrieval.Evaluator(
    model, mesh, pp_img="|vgg_value_range",
    pp_txt=('my_eval_bert_tokenize(inkey="texts", max_len=16, '
            'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
            'add_bos=True, add_eos=True)'),
    batch_size=8, source=src,
)
metrics = dict(ev.run({"params": params}))
print("RESULT " + sys.argv[2] + " " + json.dumps(metrics, sort_keys=True), flush=True)
"""


def _run(nproc: int) -> dict:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + f" --xla_force_host_platform_device_count={8 // nproc}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i), str(nproc)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
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

    import json

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, blob = line.split(" ", 2)
                results[pid] = json.loads(blob)
    assert len(results) == nproc, outs
    vals = list(results.values())
    for v in vals[1:]:
        assert v == vals[0], results
    return vals[0]


@pytest.mark.slow
def test_two_process_retrieval_matches_single():
    single = _run(1)
    double = _run(2)
    assert single == double, (single, double)
