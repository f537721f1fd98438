"""The multi-chip train step must partition without involuntary remat.

VERDICT r2 #2: GSPMD's `spmd_partitioner.cc` "Involuntary full
rematerialization" warnings mean an activation sharding transition fell back
to replicate-then-repartition — correct but paying a full gather on the
tensor. The logical-axis rules (parallel/mesh.py) + the activation
constraints (models/layers.py `logical`) are tuned so the full CoCa train
step on the 2x2x2 (data, fsdp, tensor) mesh partitions cleanly; this test
pins that by compiling the real driver dryrun in a subprocess and asserting
the partitioner stays silent.

Reference sharding rules: /root/reference/src/configs/openvision.py:74-89.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_partitions_without_involuntary_remat():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys, jax\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "g._dryrun_impl(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    bad = [
        ln for ln in proc.stderr.splitlines() if "spmd_partitioner.cc" in ln
    ]
    assert not bad, "involuntary remat reintroduced:\n" + "\n".join(bad)
