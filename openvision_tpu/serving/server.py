"""Online embedding server with dynamic batching.

Beyond-reference: the reference ships only offline CLIs (its serving story
is "run ov-zero-shot-test.py on a folder"). Production TPU serving wants an
online daemon that coalesces concurrent requests into MXU-sized batches:
each single-image request alone would run the chip at ~1% occupancy, while
a batch of 64 runs the same fused kernels at roofline throughput.

Design (TPU-first):
- requests enqueue into a `DynamicBatcher`; a dispatcher thread drains up
  to `max_batch` items or waits `max_wait_ms` after the first arrival,
  whichever comes first;
- the batch is padded to the next power-of-two bucket, so XLA sees a small
  fixed set of static shapes (one compiled program per bucket, cached by
  jit — no recompiles in steady state; `warmup()` precompiles them all);
- host work (PIL decode, resize, normalize, tokenize) happens in the HTTP
  worker threads; the dispatcher thread only launches compiled programs,
  so the device never waits on Python image decoding;
- the encode path is the same flagship the batch CLI uses
  (`serving.encode.build_encode_fn`): fused transposed-stream bf16 by
  default on TPU, `--int8` for the calibrated W8A8 kernels.

HTTP API (JSON unless noted):
  GET  /healthz              -> {"status": "ok", ...}
  GET  /stats                -> batcher occupancy/latency metrics
  POST /v1/embed/image       body = raw image bytes (content-type image/*)
                             or {"b64": "<base64>"} / {"b64": [...]}
                             -> {"embeddings": [[...]], "dim": D}
  POST /v1/embed/tensor      body = raw (N, S, S, 3) pixel rows, headers
                             X-Tensor-Shape: "N,S,S,3" and X-Tensor-Dtype:
                             "uint8" (raw pixels; normalized ON DEVICE) or
                             "float32" (already preprocess()-normalized).
                             Skips PIL decode entirely — the saturation
                             path for high-throughput clients. With
                             Accept: application/octet-stream the reply is
                             raw float32 embedding bytes (X-Tensor-Shape
                             header carries "N,D"), else the JSON above.
  POST /v1/embed/text        {"text": "..."} or {"texts": [...]}
                             -> {"embeddings": [[...]], "dim": D}
  POST /v1/rank              {"texts": [...]} + {"b64": "<base64>"}
                             -> zero-shot softmax over the texts for the
                                image (the zero_shot tool over the wire)
  POST /v1/caption           body = raw image bytes / {"b64": ...} (same
                             payloads as /v1/embed/image)
                             -> {"captions": ["..."]}. Requires a NATIVE
                             train-state checkpoint (--caption_checkpoint
                             + --caption_config): the open_clip export
                             format carries no generative head. 503 when
                             not configured.

Usage:
  python -m openvision_tpu.serving.server --use_model <converted dir> \
      [--port 8000] [--max_batch 64] [--max_wait_ms 5] [--int8] [--warmup] \
      [--caption_checkpoint <ckpt> --caption_config "res=224,img=L/14,..."]
"""

from __future__ import annotations

import argparse
import base64
import collections
import dataclasses
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.parallel import (
    batch_sharding,
    create_mesh,
    on_accelerator,
    use_mesh,
)
from openvision_tpu.serving.encode import build_encode_fn


def bucket_size(n: int, cap: int, minimum: int = 1) -> int:
    """Next power-of-two >= n, capped at `cap` (the batcher never exceeds it).

    `minimum` floors the bucket so sharded batches stay divisible by the
    mesh's device count (TPU slice sizes are powers of two).
    """
    b = minimum
    while b < n:
        b *= 2
    return min(b, cap)


@dataclasses.dataclass
class _Work:
    payload: np.ndarray
    future: Future
    t_enqueue: float


class DynamicBatcher:
    """Coalesces concurrent `submit()` calls into batched `run_batch` calls.

    `run_batch(items)` receives the list of payloads in arrival order and
    must return one result per item. It runs on the single dispatcher
    thread, so implementations need no locking around jit caches. A raise
    fails every request in that batch (and only that batch).

    Pipelined mode (`dispatch` + `finalize` instead of `run_batch`): jax
    dispatch is ASYNC — the program is enqueued and the Python call returns
    while the device (or, under a remote runtime, the RPC in flight)
    computes. A batcher that calls device_get per batch serializes
    [dispatch → compute → readback] and pays the full dispatch latency
    every batch; with a remote TPU relay that latency exceeds the compute.
    Here `dispatch(items) -> handle` enqueues batch N+1 while batch N is
    still on the device, and `finalize(handle) -> results` blocks only when
    `pipeline_depth` batches are in flight — double-buffering that hides
    dispatch latency behind compute. Results still complete in arrival
    order (the in-flight queue is FIFO).
    """

    def __init__(self, run_batch=None, *, max_batch: int = 64,
                 max_wait_ms: float = 5.0, name: str = "batch",
                 min_bucket: int = 1, dispatch=None, finalize=None,
                 pipeline_depth: int = 2):
        assert (run_batch is None) != (dispatch is None), \
            "exactly one of run_batch / (dispatch, finalize)"
        self.run_batch = run_batch
        self.dispatch = dispatch
        self.finalize = finalize
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self.name = name
        self.min_bucket = int(min_bucket)  # stats-only: real padding floor
        self._q: queue.Queue[_Work] = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_padded = 0
        self._occupancy_sum = 0
        self._latencies = collections.deque(maxlen=1024)  # seconds
        self._thread = threading.Thread(
            target=self._loop, name=f"batcher-{name}", daemon=True)
        self._thread.start()

    def submit(self, payload: np.ndarray) -> Future:
        if self._stop.is_set():
            raise RuntimeError(f"batcher {self.name} is stopped")
        w = _Work(payload, Future(), time.monotonic())
        self._q.put(w)
        return w.future

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        while True:  # fail anything still queued so callers don't hang
            try:
                w = self._q.get_nowait()
            except queue.Empty:
                break
            w.future.set_exception(RuntimeError("batcher stopped"))

    def _collect(self, block: bool = True) -> list[_Work]:
        try:
            if block:
                first = self._q.get(timeout=0.05)
            else:
                first = self._q.get_nowait()
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # past the wait window: take whatever is already queued
                # (a burst that arrived during run_batch shouldn't be
                # split into singles), but don't block further.
                try:
                    batch.append(self._q.get_nowait())
                    continue
                except queue.Empty:
                    break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _complete(self, batch: list[_Work], results) -> None:
        if len(results) != len(batch):
            raise RuntimeError(
                f"run_batch returned {len(results)} results for "
                f"{len(batch)} items")
        now = time.monotonic()
        with self._lock:
            self._n_requests += len(batch)
            self._n_batches += 1
            self._occupancy_sum += len(batch)
            self._n_padded += (
                bucket_size(len(batch), self.max_batch, self.min_bucket)
                - len(batch))
            for w in batch:
                self._latencies.append(now - w.t_enqueue)
        for w, r in zip(batch, results):
            w.future.set_result(r)

    def _finalize_oldest(self, inflight) -> None:
        batch, handle = inflight.popleft()
        try:
            self._complete(batch, self.finalize(handle))
        except Exception as e:  # noqa: BLE001 — fan the failure out
            for w in batch:
                w.future.set_exception(e)

    def _loop(self):
        if self.run_batch is not None:
            while not self._stop.is_set():
                batch = self._collect()
                if not batch:
                    continue
                try:
                    results = self.run_batch([w.payload for w in batch])
                    self._complete(batch, results)
                except Exception as e:  # noqa: BLE001
                    for w in batch:
                        w.future.set_exception(e)
            return

        # pipelined mode: keep up to pipeline_depth batches in flight on
        # the device; only block on readback when the pipe is full (or the
        # queue is momentarily empty — finalizing then is itself the
        # accumulation window for the next batch).
        inflight: collections.deque = collections.deque()
        while not self._stop.is_set():
            batch = self._collect(block=not inflight)
            if batch:
                try:
                    handle = self.dispatch([w.payload for w in batch])
                    inflight.append((batch, handle))
                except Exception as e:  # noqa: BLE001
                    for w in batch:
                        w.future.set_exception(e)
            if not inflight:
                continue
            if len(inflight) >= self.pipeline_depth or not batch:
                self._finalize_oldest(inflight)
        while inflight:  # drain on stop so no future hangs
            self._finalize_oldest(inflight)

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            pct = (lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]
                   if lat else 0.0)
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "mean_batch": (self._occupancy_sum / self._n_batches
                               if self._n_batches else 0.0),
                "padded_rows": self._n_padded,
                "queued": self._q.qsize(),
                "latency_p50_ms": pct(0.50) * 1e3,
                "latency_p95_ms": pct(0.95) * 1e3,
            }


class EmbedService:
    """Dynamic-batched image/text embedding over a loaded two-tower model."""

    def __init__(self, model, *, int8: bool = False, on_tpu: bool | None = None,
                 max_batch: int = 64, max_wait_ms: float = 5.0, mesh=None):
        self.model = model
        self.max_batch = int(max_batch)
        # Multi-chip (batch-parallel) serving: shard every bucket over the
        # mesh's batch axes; the fused kernels shard_map themselves under
        # use_mesh (docs/SERVING.md "Multi-chip serving"). Buckets are floored
        # at the device count so every chip gets rows.
        self.mesh = mesh
        self.min_bucket = 1 if mesh is None else int(mesh.devices.size)
        if self.min_bucket > self.max_batch:
            raise ValueError(
                f"max_batch={max_batch} < mesh devices {self.min_bucket}")
        on_tpu = on_accelerator() if on_tpu is None else on_tpu
        self._encode_img = build_encode_fn(model, int8=int8, on_tpu=on_tpu)
        # raw-tensor fast path: uint8 pixels in, /255+mean/std fused into
        # the compiled program (device normalization at HBM speed)
        self._encode_img_u8 = build_encode_fn(
            model, int8=int8, on_tpu=on_tpu, uint8_input=True)
        self._mean = np.asarray(model.mean, np.float32)
        self._std = np.asarray(model.std, np.float32)

        txt_params = model.params["txt"]
        text_tower = model.text

        @jax.jit
        def encode_txt(params, tokens):
            z = text_tower.apply({"params": params}, tokens)
            return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

        self._encode_txt = lambda tokens: encode_txt(txt_params, tokens)
        # Pipelined batchers: jax dispatch is async, so batch N+1 is
        # assembled and enqueued while batch N computes — the dispatcher
        # pays device/RPC latency once per PIPELINE, not once per batch
        # (measured 3.7x daemon throughput on the remote-relay harness,
        # docs/SERVING.md round 5).
        self.images = DynamicBatcher(
            dispatch=self._dispatch_images, finalize=self._finalize_batch,
            max_batch=max_batch, max_wait_ms=max_wait_ms,
            name="image", min_bucket=self.min_bucket)
        self.texts = DynamicBatcher(
            dispatch=self._dispatch_texts, finalize=self._finalize_batch,
            max_batch=max_batch, max_wait_ms=max_wait_ms,
            name="text", min_bucket=self.min_bucket)

    # --- batch runners (dispatcher threads only) ---

    def _device_batch(self, x: np.ndarray) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, batch_sharding(self.mesh))

    def _dispatch_images(self, items: list[np.ndarray]):
        """Enqueue one image batch on the device; returns (n, jax.Array).

        Does NOT block on the result — the batcher finalizes it while the
        NEXT batch is being assembled (pipelined dispatch)."""
        n = len(items)
        b = bucket_size(n, self.max_batch, self.min_bucket)
        s = self.model.image_size
        if all(it.dtype == np.uint8 for it in items):
            # all-raw batch (the tensor endpoint's steady state): ship
            # uint8 — 4x less host→device traffic — and normalize in-graph
            x = np.zeros((b, s, s, 3), np.uint8)
            x[:n] = np.stack(items)
            enc = self._encode_img_u8
        else:
            x = np.zeros((b, s, s, 3), np.float32)
            for i, it in enumerate(items):
                # mixed batch: uplift the rare raw rows on host so one
                # program still serves the whole batch
                x[i] = (
                    (it.astype(np.float32) / 255.0 - self._mean) / self._std
                    if it.dtype == np.uint8 else it
                )
            enc = self._encode_img
        with use_mesh(self.mesh):
            return n, enc(self._device_batch(x))

    def _dispatch_texts(self, items: list[np.ndarray]):
        n = len(items)
        b = bucket_size(n, self.max_batch, self.min_bucket)
        toks = np.zeros((b, self.model.context_length), np.int32)
        toks[:n] = np.stack(items)
        with use_mesh(self.mesh):
            return n, self._encode_txt(self._device_batch(toks))

    @staticmethod
    def _finalize_batch(handle) -> list[np.ndarray]:
        n, z = handle
        return list(np.asarray(jax.device_get(z))[:n])

    # --- request-thread API (decode/preprocess here, then enqueue) ---

    def embed_image_bytes(self, data: bytes) -> Future:
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return self.images.submit(self.model.preprocess(img).astype(np.float32))

    def embed_image_tensor(self, rows: np.ndarray) -> list[Future]:
        """Raw-tensor fast path: pre-resized (N, S, S, 3) pixel rows.

        uint8 rows are raw pixels — normalization happens ON DEVICE inside
        the compiled program; float32 rows must already be normalized (the
        `model.preprocess` output convention). Rows enter the SAME dynamic
        batcher as decoded JPEG requests, so coalescing spans both APIs.
        """
        s = self.model.image_size
        if rows.ndim == 3:
            rows = rows[None]
        if rows.shape[1:] != (s, s, 3):
            raise ValueError(
                f"tensor rows must be (N, {s}, {s}, 3), got {rows.shape}")
        if rows.dtype not in (np.uint8, np.float32):
            raise ValueError(f"tensor dtype must be uint8/float32, "
                             f"got {rows.dtype}")
        return [self.images.submit(r) for r in rows]

    def embed_text(self, text: str) -> Future:
        tokens = self.model.tokenize([text])[0]
        return self.texts.submit(np.asarray(tokens, np.int32))

    def rank(self, image_bytes: bytes, texts: list[str]) -> dict:
        """Zero-shot softmax over `texts` for one image (tools/zero_shot.py
        semantics: cosine * logit_scale -> softmax)."""
        img_f = self.embed_image_bytes(image_bytes)
        txt_fs = [self.embed_text(t) for t in texts]
        zimg = img_f.result()
        ztxt = np.stack([f.result() for f in txt_fs])
        logits = self.model.logit_scale * (ztxt @ zimg)
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        order = np.argsort(-probs)
        return {
            "texts": [texts[i] for i in order],
            "probs": [float(probs[i]) for i in order],
        }

    def warmup(self):
        """Precompile every bucket so first requests don't pay XLA compiles."""
        s = self.model.image_size
        b = self.min_bucket
        while True:
            with use_mesh(self.mesh):
                np.asarray(jax.device_get(self._encode_img(
                    self._device_batch(np.zeros((b, s, s, 3), np.float32)))))
                np.asarray(jax.device_get(self._encode_img_u8(
                    self._device_batch(np.zeros((b, s, s, 3), np.uint8)))))
                np.asarray(jax.device_get(self._encode_txt(
                    self._device_batch(np.zeros(
                        (b, self.model.context_length), np.int32)))))
            if b >= self.max_batch:
                break
            b *= 2

    def stats(self) -> dict:
        return {"image": self.images.stats(), "text": self.texts.stats()}

    def stop(self):
        self.images.stop()
        self.texts.stop()


class CaptionService:
    """Dynamic-batched image captioning over a NATIVE train-state checkpoint.

    The converted open_clip export carries only the two contrastive towers
    (the reference's published zoo has no generative head to serve), so the
    caption route loads the framework's OWN train state (Orbax dir / flat
    npz / legacy tensorstore — `train/checkpoint.py` routes all three) and
    runs the one-pass prefix-LM generate the caption CLI uses
    (`tools/caption.build_captioner`: fixed query tokens conditioned on the
    image prefix, every caption position from ONE jitted forward).
    Concurrent requests coalesce in the same pipelined DynamicBatcher as
    the embed routes, so captions too run in MXU-sized batches.

    Greedy decode only: a per-request temperature would fragment each batch
    into per-temperature compiled programs; sampling stays on the offline
    CLI (`tools/caption.py --temperature`), where it batches by invocation.
    """

    def __init__(self, config, checkpoint: str, *, step: int | None = None,
                 vocab_path: str = "assets/bert_base_vocab_bos_eos.txt",
                 max_batch: int = 64, max_wait_ms: float = 5.0):
        from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
        from openvision_tpu.tools.caption import build_captioner

        self.caption_fn, self.tok = build_captioner(
            config, checkpoint, step, vocab_path=vocab_path)
        self.image_size = int(config.init_shapes[0][1])
        self.max_batch = int(max_batch)
        import_pp_modules(["ops_image"])
        # the evaluators' inference pp: resize_small -> central_crop -> vgg
        self._pp = build_pp_fn(
            f'resize_small({self.image_size}, method="bilinear", '
            f'antialias=True)|central_crop({self.image_size})|vgg_value_range'
        )
        self._rng = jax.random.PRNGKey(0)  # greedy decode ignores it
        self.batcher = DynamicBatcher(
            dispatch=self._dispatch, finalize=self._finalize,
            max_batch=self.max_batch, max_wait_ms=max_wait_ms,
            name="caption")

    # --- dispatcher-thread half ---

    def _dispatch(self, items: list[np.ndarray]):
        n = len(items)
        b = bucket_size(n, self.max_batch)
        s = self.image_size
        x = np.zeros((b, s, s, 3), np.float32)
        x[:n] = np.stack(items)
        return n, self.caption_fn(jnp.asarray(x), self._rng, 0.0)

    def _finalize(self, handle) -> list[str]:
        n, ids = handle
        ids = np.asarray(jax.device_get(ids))[:n]
        return [self.tok.decode(row.tolist()) for row in ids]

    # --- request-thread API ---

    def caption_image_bytes(self, data: bytes) -> Future:
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        row = self._pp({"image": img}, np.random.default_rng(0))["image"]
        return self.batcher.submit(np.asarray(row, np.float32))

    def warmup(self):
        s, b = self.image_size, 1
        while True:
            np.asarray(jax.device_get(self.caption_fn(
                jnp.zeros((b, s, s, 3), jnp.float32), self._rng, 0.0)))
            if b >= self.max_batch:
                break
            b *= 2

    def stats(self) -> dict:
        return self.batcher.stats()

    def stop(self):
        self.batcher.stop()


def _json_bytes(obj) -> bytes:
    return json.dumps(obj).encode("utf-8")


class _Handler(BaseHTTPRequestHandler):
    service: EmbedService  # set by make_server
    caption_service: "CaptionService | None" = None  # optional, make_server
    started: float = 0.0
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # stdlib default spams stderr per request
        pass

    def _reply(self, code: int, obj):
        body = _json_bytes(obj)
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n)

    def do_GET(self):  # noqa: N802 — stdlib naming
        if self.path == "/healthz":
            self._reply(200, {
                "status": "ok",
                "uptime_s": time.monotonic() - self.started,
                "image_size": self.service.model.image_size,
                "embed_dim": None,  # filled after first embed; cheap to omit
                "caption": self.caption_service is not None,
            })
        elif self.path == "/stats":
            s = self.service.stats()
            if self.caption_service is not None:
                s["caption"] = self.caption_service.stats()
            self._reply(200, s)
        else:
            self._reply(404, {"error": f"no route {self.path}"})

    def do_POST(self):  # noqa: N802
        try:
            if self.path == "/v1/embed/image":
                futures = [self.service.embed_image_bytes(b)
                           for b in self._image_payloads()]
            elif self.path == "/v1/embed/tensor":
                shape = tuple(
                    int(x) for x in
                    (self.headers.get("X-Tensor-Shape") or "").split(",")
                    if x.strip()
                )
                dtype = (self.headers.get("X-Tensor-Dtype") or "uint8").strip()
                if dtype not in ("uint8", "float32") or len(shape) not in (3, 4):
                    return self._reply(400, {
                        "error": "need X-Tensor-Shape 'N,S,S,3' and "
                                 "X-Tensor-Dtype uint8|float32"})
                rows = np.frombuffer(self._body(), dtype=dtype).reshape(shape)
                futures = self.service.embed_image_tensor(rows)
                if "application/octet-stream" in (
                    self.headers.get("Accept") or ""
                ):
                    z = np.stack(
                        [f.result(timeout=120.0) for f in futures]
                    ).astype(np.float32)
                    body = z.tobytes()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("X-Tensor-Shape",
                                     f"{z.shape[0]},{z.shape[1]}")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
            elif self.path == "/v1/embed/text":
                req = json.loads(self._body() or b"{}")
                texts = req.get("texts") or ([req["text"]] if "text" in req
                                             else None)
                if not texts:
                    return self._reply(400, {"error": "need text or texts"})
                futures = [self.service.embed_text(t) for t in texts]
            elif self.path == "/v1/rank":
                req = json.loads(self._body() or b"{}")
                if "b64" not in req or not req.get("texts"):
                    return self._reply(400, {"error": "need b64 and texts"})
                return self._reply(200, self.service.rank(
                    base64.b64decode(req["b64"]), list(req["texts"])))
            elif self.path == "/v1/caption":
                if self.caption_service is None:
                    return self._reply(503, {
                        "error": "no caption model loaded (start the server "
                                 "with --caption_checkpoint/--caption_config)"
                    })
                futures = [self.caption_service.caption_image_bytes(b)
                           for b in self._image_payloads()]
                return self._reply(200, {
                    "captions": [f.result(timeout=120.0) for f in futures],
                })
            else:
                return self._reply(404, {"error": f"no route {self.path}"})
            embeds = [f.result(timeout=120.0) for f in futures]
            self._reply(200, {
                "embeddings": [e.astype(np.float32).tolist() for e in embeds],
                "dim": int(embeds[0].shape[-1]) if embeds else 0,
            })
        except Exception as e:  # noqa: BLE001 — per-request isolation
            self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    def _image_payloads(self) -> list[bytes]:
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        raw = self._body()
        if ctype.startswith("image/") or ctype == "application/octet-stream":
            return [raw]
        req = json.loads(raw or b"{}")
        b64 = req.get("b64")
        if b64 is None:
            raise ValueError("need image body or b64 field")
        return [base64.b64decode(b) for b in
                ([b64] if isinstance(b64, str) else list(b64))]


def make_server(service: EmbedService, host: str = "127.0.0.1",
                port: int = 8000,
                caption_service: "CaptionService | None" = None,
                ) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,),
                   {"service": service, "caption_service": caption_service,
                    "started": time.monotonic()})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    from openvision_tpu.tools.model_io import load_model

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=64)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--attn_impl", default=None)
    parser.add_argument("--warmup", action="store_true",
                        help="precompile every batch bucket before listening")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each batch over ALL local devices "
                             "(batch-parallel multi-chip serving)")
    parser.add_argument("--caption_checkpoint", default=None,
                        help="NATIVE train-state checkpoint (Orbax dir / npz "
                             "/ legacy ts) with the CoCa decoder; enables "
                             "POST /v1/caption")
    parser.add_argument("--caption_config",
                        default="res=224,img=L/14,txt_name=L,"
                                "txt_decoder_name=L",
                        help="config arg string the caption checkpoint was "
                             "trained with (configs/openvision.py)")
    parser.add_argument("--caption_step", type=int, default=None)
    parser.add_argument("--caption_vocab",
                        default="assets/bert_base_vocab_bos_eos.txt")
    args = parser.parse_args(argv)

    on_tpu = on_accelerator()
    attn_impl = args.attn_impl or ("fused_t" if on_tpu else "xla")
    model = load_model(args.use_model, dtype=jnp.dtype(args.dtype),
                       attn_impl=attn_impl,
                       fast_gelu=attn_impl == "fused_t")
    mesh = create_mesh(data=len(jax.devices())) if args.data_parallel else None
    service = EmbedService(model, int8=args.int8, on_tpu=on_tpu,
                           max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms, mesh=mesh)
    caption_service = None
    if args.caption_checkpoint:
        from openvision_tpu.configs import openvision as cfg_mod

        caption_service = CaptionService(
            cfg_mod.get_config(args.caption_config), args.caption_checkpoint,
            step=args.caption_step, vocab_path=args.caption_vocab,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    if args.warmup:
        t0 = time.perf_counter()
        service.warmup()
        if caption_service is not None:
            caption_service.warmup()
        print(f"warmup: all buckets compiled in {time.perf_counter()-t0:.1f}s")

    server = make_server(service, args.host, args.port,
                         caption_service=caption_service)
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, max_wait={args.max_wait_ms}ms, "
          f"{'int8' if args.int8 else args.dtype}, attn={attn_impl}, "
          f"devices={1 if mesh is None else mesh.devices.size})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.stop()
        if caption_service is not None:
            caption_service.stop()


if __name__ == "__main__":
    main()
