"""Evaluators running inside the train loop + eval_only mode."""

import pytest
import json
import os

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer


def _cfg():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=12,vocab_size=30522,remat=none,"
        "vocab_path=assets/bert_base_vocab_bos_eos.txt"
    )
    c.input.batch_size = 8
    c.input.data = dict(name="synthetic", num_examples=32, res=48)
    c.init_shapes = [(8, 32, 32, 3), (16, 16)]
    c.model.out_dim = (32, 32)
    c.total_steps = 2
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="linear"))]
    c.log_training_steps = 1
    c.ckpt_steps = 0
    c.save_ckpt = False
    # synthetic eval data, small batches, eval at the final step
    c.evals.disclf.data_dir = "synthetic"
    c.evals.disclf.batch_size = 8
    c.evals.disclf.prompt_templates = "none"
    c.evals.disclf.log_steps = 2
    c.evals.retrieval.data_dir = "synthetic"
    c.evals.retrieval.batch_size = 8
    c.evals.retrieval.log_steps = 2
    return c


@pytest.mark.slow
def test_train_loop_runs_evaluators(tmp_path):
    workdir = str(tmp_path / "run")
    trainer.train(_cfg(), workdir)
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    keys = {k for r in rows for k in r}
    assert "z/0shot/imagenet2012_accuracy" in keys
    assert any(k.startswith("retrieval/") and "recall@1" in k for k in keys)


def test_eval_only_mode(tmp_path):
    c = _cfg()
    c.eval_only = True
    workdir = str(tmp_path / "run")
    trainer.train(c, workdir)
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    keys = {k for r in rows for k in r}
    assert "z/0shot/imagenet2012_accuracy" in keys
    assert not any("training_loss" in r for r in rows)
