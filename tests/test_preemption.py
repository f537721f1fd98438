"""Preemption-safe training: SIGTERM checkpoints the current step and exits.

Spot TPU VMs get a SIGTERM grace window; the trainer's handler flag makes the
loop save THIS step's state and return cleanly, so resume loses zero steps
(beyond the reference, whose only recovery is resume from the last periodic
checkpoint, main_clip.py:502-547). Multi-process agreement rides Orbax's
reached_preemption sync point; these tests cover the single-process flag
path and the signal handler itself.
"""

import os
import signal

import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer


def test_sigterm_sets_flag():
    flag = trainer._install_preemption_flag()
    assert flag["hit"] is False
    os.kill(os.getpid(), signal.SIGTERM)
    assert flag["hit"] is True
    # restore default so a later real SIGTERM still kills the test runner
    signal.signal(signal.SIGTERM, signal.SIG_DFL)


def _tiny_cfg(total_steps):
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
    c.ckpt_steps = 100  # periodic checkpointing would NOT have fired
    c.evals = {}
    return c


class _FlagAtStep:
    """Stands in for the signal flag: reads False twice, then True."""

    def __init__(self, after_reads):
        self.reads = 0
        self.after = after_reads

    def __getitem__(self, key):
        assert key == "hit"
        self.reads += 1
        return self.reads > self.after


@pytest.mark.slow
def test_preemption_checkpoints_current_step_and_resumes(tmp_path, monkeypatch):
    from openvision_tpu import optim
    from openvision_tpu.train import checkpoint as ckpt_lib

    workdir = str(tmp_path / "run")

    # "preempted" during step 3 of 6
    monkeypatch.setattr(
        trainer, "_install_preemption_flag", lambda: _FlagAtStep(2)
    )
    state = trainer.train(_tiny_cfg(6), workdir)
    stopped_at = optim.get_count(state["opt"])
    assert stopped_at < 6

    mngr = ckpt_lib.create_checkpoint_manager(
        os.path.join(workdir, "checkpoints"), save_interval_steps=1
    )
    assert mngr.latest_step() == stopped_at  # saved THIS step, not an old one
    mngr.close()

    # resume finishes the remaining steps from exactly where it stopped
    monkeypatch.setattr(
        trainer, "_install_preemption_flag", lambda: {"hit": False}
    )
    state2 = trainer.train(_tiny_cfg(6), workdir)
    assert optim.get_count(state2["opt"]) == 6


@pytest.mark.slow
def test_preempted_resume_matches_uninterrupted_run(tmp_path, monkeypatch):
    """With exact-batch data resume, preempt-at-3 + resume reproduces the
    uninterrupted 6-step run's parameters (same batches 4..6, same RNG
    folding, same restored optimizer state)."""
    import jax
    import numpy as np

    from openvision_tpu import optim

    def _run(workdir, flag_factory):
        monkeypatch.setattr(trainer, "_install_preemption_flag", flag_factory)
        return trainer.train(_tiny_cfg(6), workdir)

    ref = _run(str(tmp_path / "straight"), lambda: {"hit": False})
    assert optim.get_count(ref["opt"]) == 6

    wd = str(tmp_path / "preempted")
    mid = _run(wd, lambda: _FlagAtStep(2))
    assert optim.get_count(mid["opt"]) < 6
    resumed = _run(wd, lambda: {"hit": False})
    assert optim.get_count(resumed["opt"]) == 6

    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(ref["params"]),
        jax.tree_util.tree_leaves_with_path(resumed["params"]),
    ):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(va, np.float32), np.asarray(vb, np.float32),
            rtol=1e-6, atol=1e-7, err_msg=jax.tree_util.keystr(ka),
        )
