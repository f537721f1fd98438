"""Caption route of the serving daemon (serving/server.py CaptionService).

Beyond-reference surface: the reference ships no serving at all and no
generation tool (its decoder is train-time only, src/models/text_decoder.py);
the daemon's /v1/caption batches the caption CLI's one-pass prefix-LM
generate behind the same DynamicBatcher as the embed routes.
"""

import base64
import http.client
import io
import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.serving import server as srv

CFG = ("res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
       "output_token_len=8,vocab_size=30522")
RES = 32


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import checkpoint as ckpt_lib
    from openvision_tpu.train import step as step_mod

    d = tmp_path_factory.mktemp("caption_srv")
    config = cfg_mod.get_config(CFG)
    model = step_mod.build_model(config)
    params = unbox(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1, 16), jnp.int32),
        train=False)["params"])
    npz = os.path.join(d, "ckpt.npz")
    ckpt_lib.save_npz(npz, {"params": params})
    return npz


@pytest.fixture(scope="module")
def caption_service(ckpt):
    from openvision_tpu.configs import openvision as cfg_mod

    svc = srv.CaptionService(
        cfg_mod.get_config(CFG), ckpt, max_batch=8,
        # wide window so concurrent submits coalesce deterministically
        max_wait_ms=200.0)
    yield svc
    svc.stop()


def _png_bytes(seed: int, hw=(48, 40)) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_caption_batch_matches_direct_padded_call(caption_service):
    """3 concurrent requests coalesce into one bucket-4 batch whose decoded
    ids must equal the SAME padded program run directly (padding rows are
    per-sample-independent, so real rows are unaffected)."""
    blobs = [_png_bytes(s) for s in range(3)]
    futs = [caption_service.caption_image_bytes(b) for b in blobs]
    got = [f.result(timeout=120) for f in futs]
    assert all(isinstance(c, str) for c in got)

    st = caption_service.stats()
    assert st["requests"] == 3
    assert st["batches"] == 1, "submits inside one wait window must coalesce"

    # rebuild the exact padded batch _dispatch made and run it directly
    from PIL import Image

    rows = [
        caption_service._pp(
            {"image": np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))},
            np.random.default_rng(0))["image"]
        for b in blobs
    ]
    x = np.zeros((4, RES, RES, 3), np.float32)
    x[:3] = np.stack(rows)
    ids = np.asarray(caption_service.caption_fn(
        jnp.asarray(x), caption_service._rng, 0.0))[:3]
    want = [caption_service.tok.decode(r.tolist()) for r in ids]
    assert got == want


def test_caption_http_route_and_health(caption_service, ckpt):
    """/v1/caption over the wire: raw-bytes and b64-list payloads, caption
    visibility in /healthz and /stats; 503 without a caption model."""
    from openvision_tpu.models import text as text_mod
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox
    from openvision_tpu.tools.model_io import LoadedModel

    W, L, H, E, P, CTX, V = 64, 2, 2, 32, 16, 16, 30522
    vision = vit_mod.ViT(
        num_classes=E, patch_size=(P, P), width=W, depth=L, mlp_dim=W * 4,
        num_heads=H, posemb="learn", pool_type="gap", emb_head_bias=False,
    )
    text = text_mod.TextTransformer(
        num_classes=E, width=W, depth=L, mlp_dim=W * 4, num_heads=H,
        vocab_size=V, posemb="learn", pool_type="last",
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img": unbox(vision.init(k1, jnp.zeros((1, RES, RES, 3)))["params"]),
        "txt": unbox(text.init(k2, jnp.zeros((1, CTX), jnp.int32))["params"]),
        "t": np.log(1 / 0.07) * np.ones((1,), np.float32),
    }
    model = LoadedModel(
        vision=vision, text=text, params=params, image_size=RES,
        context_length=CTX, vocab_size=V,
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711),
        vocab_path="assets/bert_base_vocab_bos_eos.txt")
    embed = srv.EmbedService(model, int8=False, on_tpu=False,
                             max_batch=8, max_wait_ms=25.0)

    def request(addr, method, path, body=None, headers=None):
        conn = http.client.HTTPConnection(*addr, timeout=120)
        conn.request(method, path, body=body, headers=headers or {})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        return resp.status, out

    httpd = srv.make_server(embed, "127.0.0.1", 0,
                            caption_service=caption_service)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        addr = httpd.server_address
        status, out = request(addr, "GET", "/healthz")
        assert status == 200 and out["caption"] is True

        blob = _png_bytes(11)
        status, out = request(addr, "POST", "/v1/caption", body=blob,
                              headers={"Content-Type": "image/png"})
        assert status == 200
        assert len(out["captions"]) == 1
        assert isinstance(out["captions"][0], str)

        b64 = base64.b64encode(blob).decode()
        status, out2 = request(
            addr, "POST", "/v1/caption",
            body=json.dumps({"b64": [b64, b64]}),
            headers={"Content-Type": "application/json"})
        assert status == 200 and len(out2["captions"]) == 2
        # same image -> same greedy caption, through either payload form
        assert out2["captions"][0] == out2["captions"][1]

        status, out = request(addr, "GET", "/stats")
        assert status == 200 and "caption" in out
        assert out["caption"]["requests"] >= 3
    finally:
        httpd.shutdown()
        embed.stop()

    # a server WITHOUT a caption model must 503 the route, not crash
    httpd2 = srv.make_server(embed, "127.0.0.1", 0)
    t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
    t2.start()
    try:
        status, out = request(httpd2.server_address, "POST", "/v1/caption",
                              body=_png_bytes(1),
                              headers={"Content-Type": "image/png"})
        assert status == 503 and "caption" in out["error"]
    finally:
        httpd2.shutdown()
