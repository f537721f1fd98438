"""Production-composition soak (VERDICT r4 #1): ALL the knobs at once.

Every production feature is individually green — this rehearsal composes
them in ONE staged run through the real trainer, because pairwise-untested
interactions are where trainers break in the field:

- `dec_fusion=cross_attn` (the recommended decoder, reference-layout
  DenseGeneral tree) with `grad_accum=2` microbatching and
  `steps_per_dispatch=2` scanned chunks on an fsdp×data mesh,
- an in-loop disclf eval firing MID-RUN between chunks,
- SIGTERM arriving WHILE a 2-step scanned chunk is in flight (observed at
  the chunk boundary, checkpointing that step) and an exact-batch resume
  whose trajectory must match the uninterrupted run,
- then a curriculum `load_transform` stage change (resolution bump →
  posemb resample) of the cross_attn train state.

Mirrors the reference's real usage (scripts/project/openvision/train.sh:20-33
driving src/main_clip.py:502-608) plus the TPU-idiom dispatch/accum knobs
the reference lacks. Tolerances for the trajectory match are the calibrated
multi-dispatch bounds (scripts/calibrate_multi_dispatch.py); attention KEY
biases have mathematically zero gradient, so only their Adam-noise
magnitude is bounded (tests/test_multi_dispatch.py module docstring).
"""

import json
import os

import jax
import numpy as np
import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.train import trainer

LR = 1e-3


def _cfg(steps, res=32):
    c = cfg_mod.get_config(
        f"res={res},img=mu/16,txt_name=Ti,txt_decoder_name=Ti,"
        "token_len=16,output_token_len=12,vocab_size=30522,remat=none,"
        "dec_fusion=cross_attn,fsdp_parallelism=2,"
        "vocab_path=assets/bert_base_vocab_bos_eos.txt"
    )
    c.input.batch_size = 16
    c.input.data = dict(name="synthetic", num_examples=64, res=96)
    c.init_shapes = [(16, res, res, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.model.image.posemb = "learn"  # so the stage change resamples it
    c.grad_accum = 2
    c.steps_per_dispatch = 2
    c.total_steps = steps
    c.lr = LR
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    c.log_training_steps = 3
    c.ckpt_steps = steps
    del c.evals.retrieval
    c.evals.disclf.data_dir = "synthetic"
    c.evals.disclf.batch_size = 8
    c.evals.disclf.prompt_templates = "none"
    c.evals.disclf.log_steps = 4  # fires MID-RUN (step 4) and final (8)
    return c


class _FlagAtRead:
    """Signal-flag stand-in: False for the first `after` reads, then True.

    The trainer reads the flag twice per loop iteration (the chunk-size
    guard and the post-step preemption check), so `after` selects WHERE in
    the chunk schedule the SIGTERM lands.
    """

    def __init__(self, after):
        self.reads = 0
        self.after = after

    def __getitem__(self, key):
        assert key == "hit"
        self.reads += 1
        return self.reads > self.after


def _losses(workdir):
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    return [r["training_loss"] for r in rows if "training_loss" in r]


def _eval_rows(workdir):
    rows = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    return [
        r for r in rows
        if any(k.startswith("z/0shot/") and "accuracy" in k for k in r)
    ]


@pytest.mark.slow
def test_production_soak(tmp_path, monkeypatch):
    from openvision_tpu import optim
    from openvision_tpu.models.vit import resample_posemb
    import jax.numpy as jnp

    # With log_every=3, eval at 4, total=8, steps_per_dispatch=2 the chunk
    # schedule is [1-2][3][4][5-6][7-8]: chunks both open and split around
    # events. (Asserted below via the preemption stop step.)

    # ---- uninterrupted run: the trajectory to match ----
    wd_ref = str(tmp_path / "straight")
    monkeypatch.setattr(
        trainer, "_install_preemption_flag", lambda: {"hit": False}
    )
    ref = trainer.train(_cfg(8), wd_ref)
    assert optim.get_count(ref["opt"]) == 8
    assert np.isfinite(_losses(wd_ref)).all()
    evals_ref = _eval_rows(wd_ref)
    assert len(evals_ref) == 2, evals_ref  # mid-run (step 4) + final (8)
    for r in evals_ref:
        for k, v in r.items():
            if "accuracy" in k:
                assert 0.0 <= v <= 1.0, r

    # the cross_attn decoder actually trained: reference-layout tree
    p_ref = jax.device_get(ref["params"])
    xblk = p_ref["txt_decoder"]["Transformer"]["crossattn_encoderblock_0"]
    q_kernel = xblk["MultiHeadDotProductAttention_0"]["query"]["kernel"]
    assert q_kernel.ndim == 3, q_kernel.shape  # DenseGeneral (D, H, Dh)

    # ---- preempted run: SIGTERM lands while chunk [5-6] is in flight ----
    wd_pre = str(tmp_path / "preempted")
    monkeypatch.setattr(
        trainer, "_install_preemption_flag", lambda: _FlagAtRead(7)
    )
    mid = trainer.train(_cfg(8), wd_pre)
    stopped_at = optim.get_count(mid["opt"])
    # read 7 = the chunk guard that OPENS [5-6]; read 8 = the post-chunk
    # check that observes the signal → the trainer must finish the scanned
    # chunk and checkpoint step 6, not 5 or 4.
    assert stopped_at == 6, stopped_at

    from openvision_tpu.train import checkpoint as ckpt_lib

    mngr = ckpt_lib.create_checkpoint_manager(
        os.path.join(wd_pre, "checkpoints"), save_interval_steps=1
    )
    assert mngr.latest_step() == 6
    mngr.close()
    # exact-batch data state saved alongside
    assert os.path.exists(
        os.path.join(wd_pre, "checkpoints", "data_state-6-p0.bin")
    )

    # ---- resume: finishes 7-8 and must match the uninterrupted run ----
    monkeypatch.setattr(
        trainer, "_install_preemption_flag", lambda: {"hit": False}
    )
    resumed = trainer.train(_cfg(8), wd_pre)
    assert optim.get_count(resumed["opt"]) == 8

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref["params"]),
        jax.tree_util.tree_leaves_with_path(resumed["params"]),
        strict=True,
    ):
        assert pa == pb
        path = jax.tree_util.keystr(pa)
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if "'key']['bias'" in path:
            bound = 10 * LR * 8
            assert np.abs(a).max() < bound and np.abs(b).max() < bound, path
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=path)

    # ---- curriculum stage change: load_transform the cross_attn state ----
    wd2 = str(tmp_path / "ft48")
    c2 = _cfg(2, res=48)  # posemb grid 2x2 -> 3x3
    c2.load_transform = os.path.join(wd_pre, "checkpoints")
    st2 = trainer.train(c2, wd2)
    assert optim.get_count(st2["opt"]) == 2
    assert np.isfinite(_losses(wd2)).all()
    p2 = jax.device_get(st2["params"])
    assert p2["img"]["pos_embedding"].shape[1] == 10  # 1 cls + 3x3

    # transform semantics on the cross_attn tree: same-geometry leaves load
    # verbatim, posemb is the bilinear resample of the trained one
    from openvision_tpu.parallel import create_mesh
    from openvision_tpu.train import step as step_mod

    p1 = jax.device_get(resumed["params"])
    mesh = create_mesh(data=-1, fsdp=2)
    model2 = step_mod.build_model(c2)
    fresh, sharding2, _, _ = step_mod.init_train_state(
        c2, model2, mesh, jax.random.PRNGKey(7), total_steps=2
    )
    merged = jax.device_get(
        trainer._load_transform(c2, fresh["params"], sharding2["params"])
    )
    np.testing.assert_array_equal(
        merged["txt_decoder"]["Transformer"]["crossattn_encoderblock_0"][
            "MultiHeadDotProductAttention_0"]["query"]["kernel"],
        p1["txt_decoder"]["Transformer"]["crossattn_encoderblock_0"][
            "MultiHeadDotProductAttention_0"]["query"]["kernel"],
    )
    np.testing.assert_allclose(
        merged["img"]["pos_embedding"],
        np.asarray(
            resample_posemb(jnp.asarray(p1["img"]["pos_embedding"]), 10)
        ),
        rtol=1e-6,
        atol=1e-7,
    )
