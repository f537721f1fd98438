"""Zero-shot discriminative classifier (ImageNet-style).

Capability parity with reference src/evaluators/proj/image_text/
discriminative_classifier.py: class-name × prompt-template text embeddings
averaged and normalized per class, then top-1 accuracy of zimg·ztxtᵀ over an
infinite-padded eval stream with `_mask` counting.

Dataset injection: pass `data_dir` pointing at an npz file with
{"image": (N,H,W,3) uint8, "label": (N,)} or provide a grain source via
`source`. (TFDS is gated — not installed in this image.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.data import pipeline as pipe
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
        **unused,
    ):
        self.model = model
        self.mesh = mesh
        self.dataset_name = dataset_names[0] if dataset_names else "imagenet2012"
        self.batch_size = batch_size
        import_pp_modules()
        self.pp_img = build_pp_fn(pp_img) if pp_img else None
        self.pp_txt = build_pp_fn(pp_txt) if pp_txt else None

        self.class_names = prompt_lib.get_class_names(
            self.dataset_name,
            canonicalize=canonicalize,
            first_class_name_only=first_class_name_only,
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

    def _count_impl(self, params, image, labels, mask, class_embs):
        zimg = self._embed_image_impl(params, image)
        logits = jnp.dot(zimg, class_embs.T)
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return jnp.sum(correct * mask), jnp.sum(mask)

    def _build_class_embeddings(self, params) -> jax.Array:
        """Per-class prompt-averaged normalized text embeddings."""
        embs = []
        t_bs = 512
        all_tokens = []
        for cname in self.class_names:
            for tmpl in self.templates:
                text = tmpl.format(cname) if "{}" in tmpl else f"{tmpl} {cname}"
                data = self.pp_txt({"texts": text}, np.random.default_rng(0))
                all_tokens.append(data["labels"])
        tokens = np.stack(all_tokens)  # (C*T, L)
        n_t = len(self.templates)
        outs = []
        for i in range(0, len(tokens), t_bs):
            chunk = tokens[i : i + t_bs]
            pad = t_bs - len(chunk)
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            chunk = local_batch_to_global(chunk, self.mesh)
            z = jax.device_get(self._embed_texts(params, chunk))
            outs.append(z[: t_bs - pad])
        z = np.concatenate(outs).reshape(len(self.class_names), n_t, -1)
        z = z.mean(axis=1)
        z = z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return jax.device_put(
            jnp.asarray(z), replicated_sharding(self.mesh)
        )

    def run(self, train_state):
        params = train_state["params"]
        class_embs = self._build_class_embeddings(params)

        it = pipe.make_for_inference(
            self.source, "", self.batch_size
        )()
        ncorrect = ntotal = 0.0
        rng = np.random.default_rng(0)
        for batch in it:
            if self.pp_img is not None:
                imgs = np.stack(
                    [self.pp_img({"image": im}, rng)["image"] for im in batch["image"]]
                )
            else:
                imgs = batch["image"]
            dev = local_batch_to_global(
                {"image": imgs.astype(np.float32),
                 "label": batch["label"].astype(np.int32),
                 "mask": batch["_mask"].astype(np.float32)},
                self.mesh,
            )
            c, t = self._count(
                params, dev["image"], dev["label"], dev["mask"], class_embs
            )
            ncorrect += float(jax.device_get(c))
            ntotal += float(jax.device_get(t))
        return [(f"{self.dataset_name}_accuracy", ncorrect / max(ntotal, 1.0))]
