"""Image↔text retrieval evaluator (COCO / Flickr30k style).

Capability parity with reference src/evaluators/proj/image_text/retrieval.py
+ image_text_retrieval.py: captions unrolled per image with id bookkeeping,
jitted embedding fns, full similarity matrix, Recall@{1,5,10} both ways.

Dataset injection: a grain-style source yielding {"image", "captions"} where
captions is a list/array of strings, or an npz `data_dir` with object-array
captions. (TFDS coco_captions gated — not installed here.)
"""

from __future__ import annotations

import jax
import numpy as np

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
from openvision_tpu.evaluators import common as eval_common
from openvision_tpu.parallel import local_batch_to_global, replicated_sharding

RECALL_KS = (1, 5, 10)


def recall_at_k(sim: np.ndarray, txt2img: np.ndarray, ks=RECALL_KS) -> dict:
    """sim: (n_img, n_txt). Returns Recall@k for both directions."""
    n_img, n_txt = sim.shape
    out = {}
    # text→image: rank images for each text
    order = np.argsort(-sim.T, axis=1)  # (n_txt, n_img)
    correct = order == txt2img[:, None]
    for k in ks:
        out[f"txt2img_recall@{k}"] = float(correct[:, :k].any(axis=1).mean())
    # image→text: rank texts for each image
    order = np.argsort(-sim, axis=1)  # (n_img, n_txt)
    img_match = txt2img[order]  # image id of each ranked text
    hit = img_match == np.arange(n_img)[:, None]
    for k in ks:
        out[f"img2txt_recall@{k}"] = float(hit[:, :k].any(axis=1).mean())
    return out


class Evaluator:
    def __init__(
        self,
        model,
        mesh,
        *,
        dataset="coco_captions",
        split="val",
        data_dir="",
        txt_name=("captions", "text"),
        pp_img="",
        pp_txt="",
        batch_size: int = 256,
        source=None,
        device_norm: str = "",
        **unused,
    ):
        self.model = model
        self.mesh = mesh
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = unused.get("num_workers", 0)
        import_pp_modules()
        self.pp_img_string = pp_img
        self.pp_txt = build_pp_fn(pp_txt) if pp_txt else None
        # device-side normalize: ship eval images uint8 (see common.py)
        self.device_norm = device_norm
        norm = eval_common.device_norm_fn(device_norm)

        if source is not None:
            self.source = source
        elif data_dir == "synthetic":
            rng = np.random.RandomState(0)
            caps = np.array([f"a photo number {i}" for i in range(16)])
            self.source = pipe.DictSource({
                "image": rng.randint(0, 255, (16, 64, 64, 3), np.uint8),
                "captions": caps,
            })
        elif data_dir:
            data = np.load(data_dir, allow_pickle=True)
            self.source = pipe.DictSource(
                {"image": data["image"], "captions": data["captions"]}
            )
        else:
            raise ValueError("retrieval evaluator needs `source` or npz `data_dir`")

        self._embed_img = jax.jit(
            lambda p, im: self.model.apply(
                {"params": p}, norm(im), None, train=False)[0],
            out_shardings=replicated_sharding(mesh),
        )
        self._embed_txt = jax.jit(
            lambda p, tok: self.model.apply({"params": p}, None, tok, train=False)[1],
            out_shardings=replicated_sharding(mesh),
        )

    def _batched_embed(self, fn, params, arrays: np.ndarray) -> np.ndarray:
        outs = []
        bs = self.batch_size
        for i in range(0, len(arrays), bs):
            chunk = arrays[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.pad(chunk, ((0, pad),) + ((0, 0),) * (chunk.ndim - 1))
            dev = local_batch_to_global(chunk, self.mesh)
            z = jax.device_get(fn(params, dev))
            outs.append(z[: bs - pad])
        return np.concatenate(outs)

    def _embed_images_pipelined(self, params) -> np.ndarray:
        """Embeds all images with pp running in the grain eval pipeline
        (worker processes via num_workers) — no per-example host loop."""
        src = self.source

        class _ImgOnly:  # ragged caption lists can't ride the batch stacker
            def __len__(self):
                return len(src)

            def __getitem__(self, i):
                return {"image": src[i]["image"]}

        # shard=False: every host iterates the FULL source in lockstep, so
        # the rows this host slices back out of the replicated global batch
        # ([: local_bs], i.e. process 0's block == every process's identical
        # block) are exactly its records. With per-process sharding, those
        # rows would be process 0's shard on every host and recall would be
        # computed over ~1/P of the images.
        it = pipe.make_for_inference(
            _ImgOnly(), self.pp_img_string, self.batch_size,
            num_workers=self.num_workers, shard=False,
        )()
        outs, pending = [], None
        for batch in it:
            dev = local_batch_to_global(
                np.asarray(
                    batch["image"],
                    np.uint8 if self.device_norm else np.float32,
                ),
                self.mesh,
            )
            z = self._embed_img(params, dev)  # async dispatch
            if pending is not None:
                zp, keep = pending
                outs.append(np.asarray(jax.device_get(zp))[: len(keep)][keep])
            pending = (z, np.asarray(batch["_mask"]) > 0)
        if pending is not None:
            zp, keep = pending
            outs.append(np.asarray(jax.device_get(zp))[: len(keep)][keep])
        return np.concatenate(outs)

    def run(self, train_state):
        params = train_state["params"]
        rng = np.random.default_rng(0)

        # caption unrolling (ragged; light host work — tokenization only)
        texts, txt2img = [], []
        for i in range(len(self.source)):
            caps = self.source[i]["captions"]
            if isinstance(caps, (bytes, str)):
                caps = str(caps).split("\n")
            for cap in np.asarray(caps).reshape(-1):
                cap = cap.decode() if isinstance(cap, bytes) else str(cap)
                data = self.pp_txt({"texts": cap}, rng)
                texts.append(data["labels"])
                txt2img.append(i)

        zimg = self._embed_images_pipelined(params)
        ztxt = self._batched_embed(self._embed_txt, params, np.stack(texts))
        zimg = zimg / (np.linalg.norm(zimg, axis=-1, keepdims=True) + 1e-8)
        ztxt = ztxt / (np.linalg.norm(ztxt, axis=-1, keepdims=True) + 1e-8)

        sim = zimg @ ztxt.T
        metrics = recall_at_k(sim, np.asarray(txt2img))
        return [(f"{k}", v) for k, v in metrics.items()]
