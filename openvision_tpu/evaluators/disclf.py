"""Zero-shot discriminative classifier (ImageNet-style).

Capability parity with reference src/evaluators/proj/image_text/
discriminative_classifier.py: class-name × prompt-template text embeddings
averaged and normalized per class (split across processes and gathered, ref
:128-153), then top-1 accuracy of zimg·ztxtᵀ over an infinite-padded eval
stream with `_mask` counting; optional multi-label "real labels" counting
(ref :300-336). Image pp runs inside the grain pipeline (worker processes
with `num_workers>0`), not in a host loop.

Dataset injection: pass `data_dir` pointing at an npz file with
{"image": (N,H,W,3) uint8, "label": (N,)}, a TFDS-format directory
(served by TfdsDirectorySource without the tfds package), or a grain
source via `source`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.evaluators import common as eval_common
from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
from openvision_tpu.evaluators import prompts as prompt_lib
from openvision_tpu.parallel import local_batch_to_global, replicated_sharding


class Evaluator:
    def __init__(
        self,
        model,
        mesh,
        *,
        dataset_names=("imagenet2012",),
        split="validation",
        data_dir="",
        pp_img="",
        pp_txt="",
        batch_size: int = 256,
        prompt_templates: str = "clip_paper",
        canonicalize: bool = True,
        first_class_name_only: bool = False,
        source=None,
        num_workers: int = 0,
        multi_label_key: str = "",
        int8: bool = False,
        int8_calibration: int = 64,
        class_names=None,
        device_norm: str = "",
        **unused,
    ):
        self.model = model
        self.mesh = mesh
        self.dataset_name = dataset_names[0] if dataset_names else "imagenet2012"
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.multi_label_key = multi_label_key
        # int8 serving-accuracy mode: embeds IMAGES through the W8A8 path
        # (serving/quant.py) instead of the bf16 tower — static activation
        # scales calibrated on the first `int8_calibration` eval images
        # (0 = per-token dynamic). Text/classifier embedding stays bf16.
        self.int8 = int8
        self.int8_calibration = int8_calibration
        # device_norm: move image normalization OUT of the host pp and into
        # the jitted count program, so batches cross host->device as uint8
        # (4x less transfer — the trainer's cpu_unit8 prologue, reference
        # main_clip.py:413-418, applied to eval). "vgg" = ImageNet mean/std;
        # "value_range(lo,hi)" = linear map from 0..255. Leave the matching
        # normalize op OUT of pp_img when set.
        self.device_norm = device_norm
        self._apply_device_norm = eval_common.device_norm_fn(device_norm)
        import_pp_modules()
        self.pp_img_string = pp_img
        self.pp_txt = build_pp_fn(pp_txt) if pp_txt else None

        # `class_names` overrides the built-in sets for custom datasets
        # (e.g. a data/prepare.py fixture's label.labels.txt names).
        self.class_names = list(class_names) if class_names else (
            prompt_lib.get_class_names(
                self.dataset_name,
                canonicalize=canonicalize,
                first_class_name_only=first_class_name_only,
            )
        )
        self.templates = prompt_lib.get_prompt_templates(prompt_templates)

        if source is not None:
            self.source = source
        elif data_dir == "synthetic":
            rng = np.random.RandomState(0)
            self.source = pipe.DictSource({
                "image": rng.randint(0, 255, (32, 64, 64, 3), np.uint8),
                "label": rng.randint(0, 1000, (32,)),
            })
        elif data_dir and os.path.isdir(data_dir):
            self.source = pipe.TfdsDirectorySource(data_dir, split)
        elif data_dir:
            data = np.load(data_dir)
            self.source = pipe.DictSource({"image": data["image"], "label": data["label"]})
        else:
            raise ValueError("disclf evaluator needs `source` or npz `data_dir`")

        self._embed_texts = jax.jit(
            self._embed_texts_impl, out_shardings=replicated_sharding(mesh)
        )
        self._count = jax.jit(self._count_impl)

    def _embed_texts_impl(self, params, tokens):
        _, ztxt, _ = self.model.apply({"params": params}, None, tokens, train=False)
        return ztxt

    def _embed_image_impl(self, params, image):
        zimg, _, _ = self.model.apply({"params": params}, image, None, train=False)
        return zimg

    def _vit_geometry(self) -> dict:
        """Image-tower geometry for the int8 encode, from the model config
        (variant table + explicit overrides)."""
        from openvision_tpu.models import vit as vit_mod

        icfg = dict(self.model.image or {})
        geom = dict(vit_mod.decode_variant(icfg.get("variant")))
        geom.update({k: icfg[k] for k in ("depth", "num_heads", "patch_size")
                     if k in icfg})
        if icfg.get("pool_type", "gap") != "gap":
            raise ValueError("int8 disclf supports gap-pooled ViTs only")
        ps = geom["patch_size"]
        return dict(
            patch_size=ps[0] if isinstance(ps, (tuple, list)) else int(ps),
            num_heads=geom["num_heads"],
            depth=geom["depth"],
            posemb=icfg.get("posemb", "sincos2d"),
            # match the bf16 tower's GELU so the measured bf16↔int8 delta is
            # quantization error alone, not GELU-approximation error
            fast_gelu=bool(icfg.get("fast_gelu", False)),
        )

    def _int8_state(self, params, calib_images):
        from openvision_tpu.serving import quant

        geom = self._vit_geometry()
        qp = jax.jit(quant.quantize_vit_params)(params["img"])
        scales = None
        if self.int8_calibration > 0 and len(calib_images):
            if jax.process_count() > 1:
                # calib_images is this process's LOCAL slice; every host must
                # bake IDENTICAL static scales into its compiled program, so
                # gather the slices and calibrate on the same global prefix
                from jax.experimental import multihost_utils

                calib_images = multihost_utils.process_allgather(
                    np.asarray(calib_images), tiled=True
                )
            calib = self._apply_device_norm(
                jnp.asarray(calib_images[: self.int8_calibration]))
            scales = quant.calibrate_vit(qp, calib, **geom)

        # qp rides as a jit ARGUMENT: closure-captured arrays embed in the
        # program as constants, and ViT-L int8 weights exceed practical
        # program-size limits (same rule as calibrate_vit).
        def count(qp_, image, labels, mask, class_embs):
            zimg = quant.quantized_encode(
                qp_, self._apply_device_norm(image), **geom,
                act_scales=scales)
            return self._count_tail(zimg, labels, mask, class_embs)

        jitted = jax.jit(count)
        return lambda *a: jitted(qp, *a)

    def _count_impl(self, params, image, labels, mask, class_embs):
        zimg = self._embed_image_impl(params, self._apply_device_norm(image))
        return self._count_tail(zimg, labels, mask, class_embs)

    def _count_tail(self, zimg, labels, mask, class_embs):
        logits = jnp.dot(zimg, class_embs.T)
        pred = jnp.argmax(logits, axis=-1)
        if labels.ndim == 2:
            # multi-label "real labels" counting (ref :300-336): correct when
            # the prediction matches ANY valid label; rows padded with -1.
            hit = jnp.any(pred[:, None] == labels, axis=-1)
            has_any = jnp.any(labels >= 0, axis=-1)
            correct = (hit & has_any).astype(jnp.float32)
            mask = mask * has_any.astype(jnp.float32)
        else:
            correct = (pred == labels).astype(jnp.float32)
        return jnp.sum(correct * mask), jnp.sum(mask), pred

    def _build_class_embeddings(self, params) -> jax.Array:
        """Per-class prompt-averaged normalized text embeddings.

        Multi-host: each process tokenizes only its slice of the class list
        (ref discriminative_classifier.py:128-153) and contributes it as its
        local shard of the global embed batch; `_embed_texts` outputs
        replicated, so every process reconstructs the full class matrix with
        no extra collective.
        """
        n_proc = jax.process_count()
        n_t = len(self.templates)
        splits = np.array_split(np.arange(len(self.class_names)), n_proc)
        c_max = max(len(s) for s in splits)
        local_idx = list(splits[jax.process_index()])
        local_idx += [0] * (c_max - len(local_idx))  # equalize across procs

        all_tokens = []
        for ci in local_idx:
            cname = self.class_names[ci]
            for tmpl in self.templates:
                text = tmpl.format(cname) if "{}" in tmpl else f"{tmpl} {cname}"
                data = self.pp_txt({"texts": text}, np.random.default_rng(0))
                all_tokens.append(data["labels"])
        tokens = np.stack(all_tokens)  # (c_max*T, L), same count on all procs

        t_bs = 512
        per_proc: list[np.ndarray] = []
        for i in range(0, len(tokens), t_bs):
            chunk = tokens[i : i + t_bs]
            real = len(chunk)
            if real < t_bs:
                chunk = np.pad(chunk, ((0, t_bs - real), (0, 0)))
            g = local_batch_to_global(chunk, self.mesh)
            z = jax.device_get(self._embed_texts(params, g))
            # rows [p*t_bs : p*t_bs+real] belong to process p's classes
            per_proc.append(z.reshape(n_proc, t_bs, -1)[:, :real])
        zs = np.concatenate(per_proc, axis=1)  # (n_proc, c_max*T, D)
        z = np.concatenate(
            [zs[p][: len(splits[p]) * n_t] for p in range(n_proc)], axis=0
        ).reshape(len(self.class_names), n_t, -1)
        z = z.mean(axis=1)
        z = z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return jax.device_put(
            jnp.asarray(z), replicated_sharding(self.mesh)
        )

    def run(self, train_state, return_preds: bool = False):
        """Returns [(metric, value)]; with `return_preds`, also the per-image
        argmax predictions and validity mask as flat np arrays (used by
        scripts/eval_scale.py's bf16↔int8 prediction-agreement probe)."""
        if return_preds and jax.process_count() > 1:
            # per-image preds stay batch-sharded on device; device_get on a
            # non-addressable global array would raise mid-eval — fail early
            raise ValueError(
                "return_preds is a single-process probe (used by "
                "scripts/eval_scale.py); the accuracy metrics themselves are "
                "multihost-safe"
            )
        params = train_state["params"]
        class_embs = self._build_class_embeddings(params)

        it = pipe.make_for_inference(
            self.source, self.pp_img_string, self.batch_size,
            num_workers=self.num_workers,
        )()
        # accumulate ON DEVICE: no per-batch host sync (the reference's
        # async_delay early-stop pattern, discriminative_classifier.py:355)
        counts = []
        int8_count = None
        for batch in it:
            label_key = (
                self.multi_label_key
                if self.multi_label_key and self.multi_label_key in batch
                else "label"
            )
            # with device_norm, images stay uint8 across host->device (4x
            # less transfer); normalization happens inside the jitted count
            images = np.asarray(
                batch["image"],
                np.uint8 if self.device_norm else np.float32,
            )
            dev = local_batch_to_global(
                {"image": images,
                 "label": np.asarray(batch[label_key], np.int32),
                 "mask": np.asarray(batch["_mask"], np.float32)},
                self.mesh,
            )
            if self.int8:
                if int8_count is None:
                    int8_count = self._int8_state(params, images)
                counts.append(int8_count(
                    dev["image"], dev["label"], dev["mask"], class_embs
                ) + (dev["mask"],))
                continue
            counts.append(self._count(
                params, dev["image"], dev["label"], dev["mask"], class_embs
            ) + (dev["mask"],))
        ncorrect = sum(float(jax.device_get(c)) for c, _, _, _ in counts)
        ntotal = sum(float(jax.device_get(t)) for _, t, _, _ in counts)
        metrics = [(f"{self.dataset_name}_accuracy", ncorrect / max(ntotal, 1.0))]
        if return_preds:
            preds = np.concatenate(
                [np.asarray(jax.device_get(p)).ravel() for _, _, p, _ in counts])
            masks = np.concatenate(
                [np.asarray(jax.device_get(m)).ravel() for _, _, _, m in counts])
            return metrics, preds, masks
        return metrics
