"""Reference-produced Orbax checkpoints restore directly (VERDICT r2 #5).

The Model-Zoo north star (BASELINE.md) is that checkpoints SAVED BY THE
REFERENCE CODE load into this framework unchanged. The closest offline gate:
run the reference's own flax model (imported read-only from
/root/reference — nothing is copied), save its real train_state with raw
orbax `StandardSave` through a bare `CheckpointManager` exactly as the
reference trainer does (main_clip.py:715-716, utils.py:1142-1170), then
restore through `openvision_tpu.train.checkpoint.restore_params` and prove
the repo model reproduces the reference forward bit-for-tolerance
(zimg / ztxt / caption logits), using the repo's own abstract tree — i.e.
names, shapes, AND numerics all line up.

Skipped when the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

if not os.path.isdir(os.path.join(REF_ROOT, "src", "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Tiny-but-real dims: image tower = reference mu/16 at depth 2; text tower
# and caption decoder shrunk to the same width via kw overrides (the
# reference decode_variant lets kw win, text_transformer.py:738).
SMALL = dict(width=32, depth=2, mlp_dim=64, num_heads=2)
VOCAB, TOKLEN, NTOK, OUT = 64, 16, 8, (32, 32)


def _reference_forward_and_params(use_dense_general=False,
                                  fusion_style="concat"):
    sys.path.insert(0, REF_ROOT)
    try:
        import flax
        from ml_collections import ConfigDict
        from src.models import text_decoder as ref_text_decoder
        from src.models import two_towers
    finally:
        sys.path.remove(REF_ROOT)

    if fusion_style == "cross_attn":
        # The reference's CrossAttnEncoder1DBlock reads self.scan_attn and
        # self.mlp_chunck without declaring them as module fields
        # (text_decoder.py:300-301) — the shipped cross_attn path raises
        # AttributeError as-is. Provide them as class attributes (the
        # values every reference config uses) so the published tree layout
        # can be instantiated and round-tripped.
        ref_text_decoder.CrossAttnEncoder1DBlock.scan_attn = False
        ref_text_decoder.CrossAttnEncoder1DBlock.mlp_chunck = 128

    dec_cfg = dict(
        variant="Ti", **SMALL, num_classes=VOCAB, dtype="float32",
        scan_mlp=False, scan_attn=False, use_flash_attn=False, mlp_chunck=128,
        param_dtype="float32", remat_policy="none", fusion_style=fusion_style,
        casual_mask=True, num_learnable_tokens=NTOK, drop_token=0,
    )
    img_cfg = dict(
        variant="mu/16", depth=SMALL["depth"], posemb="sincos2d",
        scan_mlp=False, scan_attn=False, mlp_chunck=128, ignore_cls=False,
        remat_policy="none", mask_ratio=0.0, use_flash_attn=False,
        emb_head_bias=False, head_zeroinit=False, dtype="float32",
        param_dtype="float32", output_tokens=True,
        use_dense_general=use_dense_general,
        pool_type="gap",
    )
    txt_cfg = dict(
        variant="Ti", **SMALL, pool_type="last", use_flash_attn=False,
        remat_policy="none", casual_mask=False, scan_mlp=False,
        scan_attn=False, mlp_chunck=128, head_zeroinit=False,
        dtype="float32", param_dtype="float32", vocab_size=VOCAB,
        embed_cls=True, output_tokens=True,
        use_dense_general=use_dense_general,
    )
    model = two_towers.Model(
        out_dim=OUT,
        image=ConfigDict(img_cfg),
        text=ConfigDict(txt_cfg),
        text_model="text_transformer",
        image_model="vit",
        text_decoder="text_decoder",
        text_decoder_config=ConfigDict(dec_cfg),
        temperature_init=1 / 0.07,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    txt = jnp.asarray(rng.randint(1, VOCAB, (2, TOKLEN)).astype(np.int32))
    params = flax.linen.meta.unbox(
        model.init(jax.random.PRNGKey(0), img, txt, train=False)["params"]
    )
    zimg, ztxt, out = model.apply({"params": params}, img, txt, train=False)
    return params, img, txt, zimg, ztxt, out["logits"], float(out["t"][0])


def _save_like_reference(directory: str, train_state: dict) -> None:
    """Mirror the reference's save call (main_clip.py:715): a bare
    CheckpointManager + StandardSave — NO repo save code involved."""
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            create=True, max_to_keep=1, save_interval_steps=1,
            enable_async_checkpointing=False,
        ),
    )
    mngr.save(17, args=ocp.args.StandardSave(train_state))
    mngr.wait_until_finished()
    mngr.close()


def _repo_model(use_dense_general=False, fusion_style="concat"):
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.train import step as step_mod

    c = cfg_mod.get_config(
        f"res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,"
        f"token_len={TOKLEN},output_token_len={NTOK},vocab_size={VOCAB},"
        f"runlocal=True,remat=none,attn_impl=xla,dec_fusion={fusion_style}"
    )
    c.model.out_dim = OUT
    for tower in (c.model.image, c.model.text, c.model.text_decoder_config):
        tower.update(SMALL)
    c.model.image.update(dict(mlp_dim=128))  # reference mu mlp_dim
    c.model.image.use_dense_general = use_dense_general
    c.model.text.use_dense_general = use_dense_general
    return step_mod.build_model(c)


@pytest.mark.parametrize(
    "use_dense_general,fusion_style",
    [(False, "concat"), (True, "concat"), (False, "cross_attn")],
)
def test_reference_orbax_checkpoint_restores_and_matches(
    tmp_path, use_dense_general, fusion_style
):
    """VERDICT r4 Weak #3: round-trips BOTH decoder fusion styles — the
    cross_attn tree (`crossattn_encoderblock_{i}`, reference
    text_decoder.py:385-398,521-555) as well as the concat default."""
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import checkpoint

    (ref_params, img, txt, zimg_r, ztxt_r, logits_r,
     t_r) = _reference_forward_and_params(use_dense_general, fusion_style)

    # A foreign optimizer state the repo knows nothing about must not break
    # the params-only restore (restore_params rebuilds its abstract tree
    # from on-disk metadata).
    opt = {
        "count": np.zeros((), np.int32),
        "mu": jax.tree.map(lambda v: np.zeros_like(v), ref_params),
    }
    _save_like_reference(str(tmp_path), {"params": ref_params, "opt": opt})

    model = _repo_model(use_dense_general, fusion_style)
    abstract = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype),
        unbox(
            jax.eval_shape(
                lambda r: model.init(r, img[:1], txt[:1], train=False),
                jax.random.PRNGKey(0),
            )["params"]
        ),
    )
    # Names+shapes gate: the repo's abstract tree IS the restore target —
    # any layout drift from the reference format fails here.
    params = checkpoint.restore_params(str(tmp_path), abstract)

    zimg, ztxt, out = model.apply({"params": params}, img, txt, train=False)

    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(zimg, zimg_r) > 1 - 1e-3
    assert cos(ztxt, ztxt_r) > 1 - 1e-3
    assert cos(out["logits"], logits_r) > 1 - 1e-3
    np.testing.assert_allclose(np.asarray(zimg), np.asarray(zimg_r),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ztxt), np.asarray(ztxt_r),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(logits_r), atol=1e-4, rtol=1e-3)
    assert abs(float(np.asarray(out["t"]).ravel()[0]) - t_r) < 1e-5


def test_reference_checkpoint_restore_without_abstract(tmp_path):
    """restore_params(directory, None) — the ft_from spelling used when the
    caller has no abstract tree yet — must also read the reference layout."""
    from openvision_tpu.train import checkpoint

    ref_params, *_ = _reference_forward_and_params()
    _save_like_reference(
        str(tmp_path), {"params": ref_params, "opt": {"count": np.int32(0)}}
    )
    restored = checkpoint.restore_params(str(tmp_path), None)
    ref_flat = jax.tree_util.tree_leaves(ref_params)
    res_flat = jax.tree_util.tree_leaves(restored)
    assert len(ref_flat) == len(res_flat)
    for a, b in zip(ref_flat, res_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
