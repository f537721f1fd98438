"""Losses: bidirectional contrastive (CLIP) + caption CE + auxiliaries.

Capability parity with reference src/losses/common.py, redesigned TPU-first:

- `local` mode runs inside shard_map over the NAMED mesh batch axes
  (("data","fsdp","tensor")), all-gathering embeddings over ICI and picking
  each shard's diagonal with a vectorized take_along_axis — replacing the
  reference's separate flattened 1-D device mesh (losses/common.py:123) and
  its per-row Python loop (:155-164).
- `global` mode materializes the full BxB logits (small-batch eval).
- `efficient` mode is the FLIP-style log-sum-exp form.

All modes support one or two text views per image (CoCa batches carry two
captions; the loss is the mean over views).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

# The loss's shard_map batch view matches the towers' activation sharding
# (batch over data+fsdp, replicated over tensor). Including `tensor` here
# makes the zimg/ztxt cotangents come back sharded over all three axes and
# forces GSPMD into involuntary full rematerialization where they meet the
# towers' (data, fsdp)-sharded activations (dryrun spmd_partitioner warnings);
# the all_gather moves the same total bytes either way.
BATCH_AXES = ("data", "fsdp")


def _pair_loss_global(zimg: jax.Array, ztxt: jax.Array, t: jax.Array):
    """Full-matrix bidirectional NLL; returns (per-example loss, logits)."""
    logits = jnp.dot(zimg, ztxt.T) * t
    l_i2t = -jnp.diag(jax.nn.log_softmax(logits, axis=1))
    l_t2i = -jnp.diag(jax.nn.log_softmax(logits, axis=0))
    return 0.5 * (l_i2t + l_t2i), logits


def bidirectional_contrastive_loss(
    zimg: jax.Array,
    ztxt: jax.Array | Sequence[jax.Array],
    t: jax.Array,
    *,
    mode: str = "local",
    mesh: Optional[Mesh] = None,
    batch_axes: Sequence[str] = BATCH_AXES,
    reduction: bool = True,
):
    """Bidirectional contrastive loss over L2-normalized embeddings.

    Args:
      zimg: (B, D) image embeddings (global batch).
      ztxt: (B, D) text embeddings, or a list of per-view (B, D) arrays.
      t: scalar temperature (already exp'd).
      mode: "local" (shard_map all_gather; requires mesh), "global", "efficient".
      mesh: the device mesh (required for mode="local").
      batch_axes: mesh axes the batch is sharded over.
      reduction: mean-reduce to a scalar.

    Returns:
      (loss, extras) — extras carries "ncorrect" where cheap to compute.
    """
    views = list(ztxt) if isinstance(ztxt, (list, tuple)) else [ztxt]

    if mode == "global":
        per_view = [_pair_loss_global(zimg, z, t) for z in views]
        l = sum(pl for pl, _ in per_view) / len(per_view)
        logits = per_view[0][1]
        ncorrect = jnp.mean(
            (jnp.argmax(logits, axis=1) == jnp.arange(logits.shape[0])).astype(
                jnp.float32
            )
        )
        return (jnp.mean(l) if reduction else l), {"ncorrect": ncorrect}

    if mode == "efficient":
        # FLIP-style: diagonal + logsumexp without forming log_softmax twice.
        def one(z):
            logits = jnp.einsum("nc,mc->nm", zimg, z) * t
            pos = jnp.einsum("nc,nc->n", zimg, z) * t
            l01 = jax.nn.logsumexp(logits, axis=-1) - pos
            l10 = jax.nn.logsumexp(logits, axis=0) - pos
            return 0.5 * (jnp.mean(l01) + jnp.mean(l10))

        l = sum(one(z) for z in views) / len(views)
        return l, {"ncorrect": jnp.zeros(())}

    if mode == "local":
        assert mesh is not None, "mode='local' needs the device mesh"
        spec = P(tuple(batch_axes), None)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec,) * (1 + len(views)),
            out_specs=P(),
            check_vma=False,
        )
        def local_loss(local_img, *local_txts):
            axis = tuple(batch_axes)
            rank = jax.lax.axis_index(axis)
            bl = local_img.shape[0]
            gimg = jax.lax.all_gather(local_img, axis, tiled=True)

            def view_loss(local_txt):
                gtxt = jax.lax.all_gather(local_txt, axis, tiled=True)
                # local rows vs global columns; positives on the shifted diagonal
                diag = rank * bl + jnp.arange(bl)
                lp_img = jax.nn.log_softmax(jnp.dot(local_img, gtxt.T) * t, axis=1)
                lp_txt = jax.nn.log_softmax(jnp.dot(local_txt, gimg.T) * t, axis=1)
                l_i2t = -jnp.take_along_axis(lp_img, diag[:, None], axis=1)[:, 0]
                l_t2i = -jnp.take_along_axis(lp_txt, diag[:, None], axis=1)[:, 0]
                return 0.5 * (l_i2t + l_t2i)

            l = sum(view_loss(z) for z in local_txts) / len(local_txts)
            return jax.lax.pmean(jnp.mean(l), axis)

        l = local_loss(zimg, *views)
        return l, {"ncorrect": jnp.zeros(())}

    raise ValueError(f"Unknown contrastive mode: {mode!r}")


def siglip_loss(
    zimg: jax.Array,
    ztxt: jax.Array,
    t: jax.Array,
    b: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    batch_axes: Sequence[str] = BATCH_AXES,
    mode: str = "local",
):
    """Pairwise sigmoid contrastive loss (SigLIP, arXiv:2303.15343).

    Extension beyond the reference (which carries the learnable logit bias
    `b` in two_towers.py:109-111 but never a sigmoid pairing loss): every
    (image, text) pair is classified matched/unmatched independently, so no
    softmax normalization over the batch is needed and the local mode only
    all_gathers the text side.
    """

    def pairwise(zi, zt, diag_offset):
        logits = jnp.dot(zi, zt.T) * t + b
        n, m = logits.shape
        labels = (
            jnp.arange(n)[:, None] + diag_offset == jnp.arange(m)[None, :]
        ).astype(logits.dtype)
        # +1 for matched pairs, -1 otherwise; stable log-sigmoid loss
        z = jnp.where(labels > 0, logits, -logits)
        return -jnp.sum(jax.nn.log_sigmoid(z)) / n

    if mode == "global" or mesh is None:
        return pairwise(zimg, ztxt, 0), {}

    spec = P(tuple(batch_axes), None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=P(),
        check_vma=False,
    )
    def local(local_img, local_txt):
        axis = tuple(batch_axes)
        rank = jax.lax.axis_index(axis)
        gtxt = jax.lax.all_gather(local_txt, axis, tiled=True)
        l = pairwise(local_img, gtxt, rank * local_img.shape[0])
        return jax.lax.pmean(l, axis)

    return local(zimg, ztxt), {}


def softmax_xent(
    *,
    logits: jax.Array,
    labels: jax.Array,
    mask: Optional[jax.Array] = None,
    reduction: bool = True,
    kl: bool = False,
    axis: int = -1,
):
    """Categorical cross-entropy over integer labels (caption loss)."""
    vocab = logits.shape[axis]
    one_hot = jax.nn.one_hot(labels, vocab)
    log_p = jax.nn.log_softmax(logits, axis=axis)
    nll = -jnp.sum(one_hot * log_p, axis=axis)
    if kl:
        nll += jnp.sum(one_hot * jnp.log(jnp.clip(one_hot, 1e-8)), axis=axis)
    if reduction:
        if mask is not None:
            return jnp.sum(nll * mask) / (jnp.sum(mask) + 1e-8)
        return jnp.mean(nll)
    return nll


def linear_softmax_xent(
    *,
    prelogits: jax.Array,
    kernel: jax.Array,
    labels: jax.Array,
    mask: Optional[jax.Array] = None,
    chunk: int = 16,
    normalize: bool = True,
):
    """Caption cross-entropy FUSED with the vocab head.

    Numerically identical to `softmax_xent(logits=Dense_f32(prelogits),
    reduction=True)` but scans the head matmul + log-softmax over sequence
    chunks, so the full (B, L, V) f32 logits tensor is never materialized —
    at B=64, L=128, V=32k that tensor is a 1 GiB HLO temp (the single
    largest allocation of the CoCa train step, measured: it OOMs bs64
    L/14@224 on a 16 GB chip). Peak becomes B×chunk×V. `jax.checkpoint`
    on the chunk body makes the backward recompute chunk logits instead of
    saving them; d(kernel) accumulates across scan iterations.

    prelogits: (B, L, D) decoder_norm output; kernel: (D, V) head kernel
    (the decoder's `head` Dense, param path unchanged for checkpoint
    parity); labels: (B, L) int; mask: (B, L).
    """
    b, l, d = prelogits.shape
    if mask is None:
        mask = jnp.ones((b, l), jnp.float32)
    pad = (-l) % chunk
    if pad:
        prelogits = jnp.pad(prelogits, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n = (l + pad) // chunk
    hs = prelogits.reshape(b, n, chunk, d).swapaxes(0, 1)
    ls = labels.reshape(b, n, chunk).swapaxes(0, 1)
    ms = mask.reshape(b, n, chunk).swapaxes(0, 1)
    kernel_f32 = kernel.astype(jnp.float32)  # Dense(dtype=f32) semantics

    @jax.checkpoint
    def body(carry, xs):
        h_c, l_c, m_c = xs
        logits = jnp.einsum(
            "bcd,dv->bcv", h_c.astype(jnp.float32), kernel_f32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, l_c[..., None], axis=-1)[..., 0]
        return carry + jnp.sum(nll * m_c), None

    total, _ = jax.lax.scan(body, jnp.float32(0), (hs, ls, ms))
    if not normalize:
        # sum form for gradient accumulation: the caller divides by the
        # GLOBAL mask sum so microbatch sums add up to the big-batch loss.
        return total
    return total / (jnp.sum(mask) + 1e-8)


def sigmoid_xent(*, logits, labels, reduction: bool = True):
    """Stable multi-label sigmoid cross-entropy."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    nll = -jnp.sum(labels * log_p + (1.0 - labels) * log_not_p, axis=-1)
    return jnp.mean(nll) if reduction else nll


def bce_logits(*, logits, labels, weight=None, reduction: bool = True):
    """Binary cross-entropy from logits (stable max-form)."""
    max_val = jnp.clip(logits, 0, None)
    loss = (
        logits
        - logits * labels
        + max_val
        + jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val))
    )
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss) if reduction else loss


def weighted_softmax_xent(
    *,
    logits: jax.Array,
    labels: jax.Array,
    reduction: bool = True,
    weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
    normalize: bool = True,
):
    """Sequence cross-entropy with per-token weights and label smoothing."""
    vocab = logits.shape[-1]
    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1)
    soft = jax.nn.one_hot(labels, vocab, on_value=confidence, off_value=low)
    loss = -jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1)
    norm = labels.shape[1]
    if weights is not None:
        loss = loss * weights
        norm = weights.sum(axis=1)
    loss = loss.sum(axis=1)
    if normalize:
        loss = loss / norm
    return loss.mean() if reduction else loss


def mae_loss(*, pred, target, mask, norm_pix_loss: bool = True):
    """Masked-autoencoder pixel reconstruction loss."""
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True) * (
            target.shape[-1] / (target.shape[-1] - 1)
        )
        target = (target - mean) / (var + 1e-6) ** 0.5
    loss = ((pred - target) ** 2).mean(axis=-1)
    return (loss * mask).sum() / mask.sum()
