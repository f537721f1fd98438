"""End-to-end trainer smoke: tiny model + synthetic data + checkpoints."""

import pytest
import json
import os

import numpy as np

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer


def _tiny_cfg(workdir_steps=3):
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=12,vocab_size=30522,remat=none,"
        "vocab_path=assets/bert_base_vocab_bos_eos.txt"
    )
    c.input.batch_size = 16
    c.input.data = dict(name="synthetic", num_examples=64, res=48)
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.total_steps = workdir_steps
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    c.log_training_steps = 1
    c.ckpt_steps = 2
    c.evals = {}
    return c


@pytest.mark.slow
def test_train_end_to_end_and_resume(tmp_path):
    workdir = str(tmp_path / "run")
    c = _tiny_cfg()
    state = trainer.train(c, workdir)
    from openvision_tpu import optim

    assert optim.get_count(state["opt"]) == 3

    # metrics written
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    assert any("training_loss" in r for r in rows)
    assert os.path.exists(os.path.join(workdir, "config.json"))

    # resume continues from the checkpoint
    c2 = _tiny_cfg()
    c2.total_steps = 5
    state2 = trainer.train(c2, workdir)
    assert optim.get_count(state2["opt"]) == 5


@pytest.mark.slow
def test_train_steps_per_dispatch_chunking(tmp_path):
    """Trainer-level steps_per_dispatch: the loop must mix k-step scanned
    dispatches with single steps around events (log cadence 2, 5 total
    steps -> chunks of 2, 2, 1) and land on the exact step count; the
    scanned-vs-sequential numerics are pinned by test_multi_dispatch."""
    workdir = str(tmp_path / "run")
    c = _tiny_cfg()
    c.total_steps = 5
    c.steps_per_dispatch = 2
    c.log_training_steps = 2
    c.ckpt_steps = 5
    state = trainer.train(c, workdir)
    from openvision_tpu import optim

    assert optim.get_count(state["opt"]) == 5
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    losses = {r["step"]: r["training_loss"] for r in rows if "training_loss" in r}
    # logged at the chunk-boundary steps only, all finite
    assert set(losses) == {2, 4, 5}, sorted(losses)
    assert all(np.isfinite(v) for v in losses.values())
