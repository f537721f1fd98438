"""Online serving daemon: dynamic batching + HTTP API (serving/server.py)."""

import base64
import http.client
import io
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.models import text as text_mod
from openvision_tpu.models import vit as vit_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.serving import server as srv
from openvision_tpu.tools.model_io import LoadedModel

VOCAB_PATH = "assets/bert_base_vocab_bos_eos.txt"
W, L, H, E, RES, P, CTX, V = 64, 2, 2, 32, 32, 16, 16, 30522


@pytest.fixture(scope="module")
def model():
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
    return LoadedModel(
        vision=vision, text=text, params=params, image_size=RES,
        context_length=CTX, vocab_size=V,
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711), vocab_path=VOCAB_PATH,
    )


@pytest.fixture(scope="module")
def service(model):
    svc = srv.EmbedService(model, int8=False, on_tpu=False,
                           max_batch=8, max_wait_ms=25.0)
    yield svc
    svc.stop()


def _png_bytes(seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (RES, RES, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_bucket_size():
    assert [srv.bucket_size(n, 8) for n in (1, 2, 3, 5, 8, 9)] == \
        [1, 2, 4, 8, 8, 8]
    assert [srv.bucket_size(n, 16, minimum=8) for n in (1, 8, 9)] == [8, 8, 16]


def test_service_data_parallel_matches_single_device(model):
    from openvision_tpu.parallel import create_mesh

    mesh = create_mesh(data=8)
    svc = srv.EmbedService(model, int8=False, on_tpu=False,
                           max_batch=16, max_wait_ms=25.0, mesh=mesh)
    try:
        blobs = [_png_bytes(s) for s in range(3)]  # 3 -> padded to bucket 8
        futs = [svc.embed_image_bytes(b) for b in blobs]
        got = np.stack([f.result(timeout=120) for f in futs])
        tfut = svc.embed_text("a photo of a cat")
        ztxt = tfut.result(timeout=120)
    finally:
        svc.stop()

    from PIL import Image

    imgs = np.stack([
        model.preprocess(np.asarray(Image.open(io.BytesIO(b)).convert("RGB")))
        for b in blobs
    ]).astype(np.float32)
    want = np.asarray(model.encode_image(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    want_t = np.asarray(model.encode_text(
        jnp.asarray(model.tokenize(["a photo of a cat"]))))[0]
    np.testing.assert_allclose(ztxt, want_t, atol=1e-5)


def test_dynamic_batcher_coalesces_and_orders():
    sizes = []

    def run_batch(items):
        sizes.append(len(items))
        return [x * 2 for x in items]

    b = srv.DynamicBatcher(run_batch, max_batch=8, max_wait_ms=50.0)
    try:
        futs = [b.submit(np.full((2,), i, np.float32)) for i in range(8)]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(f.result(timeout=10),
                                          np.full((2,), 2 * i, np.float32))
        # 8 submits within one 50ms window must not run as 8 singles
        assert max(sizes) > 1 and sum(sizes) == 8
        st = b.stats()
        assert st["requests"] == 8 and st["batches"] == len(sizes)
    finally:
        b.stop()


def test_dynamic_batcher_error_isolated_to_batch():
    def run_batch(items):
        if any(x < 0 for x in items):
            raise ValueError("negative")
        return items

    b = srv.DynamicBatcher(run_batch, max_batch=4, max_wait_ms=5.0)
    try:
        bad = b.submit(-1.0)
        with pytest.raises(ValueError):
            bad.result(timeout=10)
        good = b.submit(3.0)  # batcher must survive the failed batch
        assert good.result(timeout=10) == 3.0
    finally:
        b.stop()


def test_service_image_matches_direct_with_padding(service, model):
    from PIL import Image

    blobs = [_png_bytes(s) for s in range(3)]  # 3 -> padded to bucket 4
    futs = [service.embed_image_bytes(b) for b in blobs]
    got = np.stack([f.result(timeout=60) for f in futs])

    imgs = np.stack([
        model.preprocess(np.asarray(Image.open(io.BytesIO(b)).convert("RGB")))
        for b in blobs
    ]).astype(np.float32)
    want = np.asarray(model.encode_image(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert abs(float(np.linalg.norm(got[0])) - 1.0) < 1e-4


def test_service_text_matches_direct(service, model):
    texts = ["a photo of a cat", "a diagram", "two dogs"]
    futs = [service.embed_text(t) for t in texts]
    got = np.stack([f.result(timeout=60) for f in futs])
    want = np.asarray(model.encode_text(jnp.asarray(model.tokenize(texts))))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def http_server(service):
    httpd = srv.make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()


def _request(addr, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_http_health_and_stats(http_server):
    status, out = _request(http_server, "GET", "/healthz")
    assert status == 200 and out["status"] == "ok"
    status, out = _request(http_server, "GET", "/stats")
    assert status == 200 and set(out) == {"image", "text"}


def test_http_embed_image_raw_and_b64(http_server, model):
    blob = _png_bytes(7)
    status, raw = _request(http_server, "POST", "/v1/embed/image", body=blob,
                           headers={"Content-Type": "image/png"})
    assert status == 200 and raw["dim"] == E
    status, b64 = _request(
        http_server, "POST", "/v1/embed/image",
        body=json.dumps({"b64": base64.b64encode(blob).decode()}),
        headers={"Content-Type": "application/json"})
    assert status == 200
    np.testing.assert_allclose(np.asarray(raw["embeddings"]),
                               np.asarray(b64["embeddings"]), atol=1e-6)


def test_http_embed_text_and_rank(http_server, model):
    status, out = _request(
        http_server, "POST", "/v1/embed/text",
        body=json.dumps({"texts": ["a cat", "a dog"]}),
        headers={"Content-Type": "application/json"})
    assert status == 200 and len(out["embeddings"]) == 2

    status, rank = _request(
        http_server, "POST", "/v1/rank",
        body=json.dumps({
            "b64": base64.b64encode(_png_bytes(3)).decode(),
            "texts": ["a cat", "a dog", "a car"],
        }),
        headers={"Content-Type": "application/json"})
    assert status == 200
    assert sorted(rank["texts"]) == ["a car", "a cat", "a dog"]
    assert abs(sum(rank["probs"]) - 1.0) < 1e-4
    assert rank["probs"] == sorted(rank["probs"], reverse=True)


def test_http_concurrent_requests_coalesce(http_server, service):
    before = service.images.stats()
    blob = _png_bytes(11)
    results, errs = [], []

    def post():
        try:
            results.append(_request(
                http_server, "POST", "/v1/embed/image", body=blob,
                headers={"Content-Type": "image/png"}))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=post) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and len(results) == 6
    assert all(s == 200 for s, _ in results)
    ref = np.asarray(results[0][1]["embeddings"])
    for _, out in results[1:]:
        np.testing.assert_allclose(np.asarray(out["embeddings"]), ref,
                                   atol=1e-6)
    after = service.images.stats()
    new_reqs = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_reqs == 6 and new_batches < 6  # at least one multi-item batch


def test_http_bad_requests(http_server):
    status, out = _request(http_server, "POST", "/v1/embed/text",
                           body=b"{}",
                           headers={"Content-Type": "application/json"})
    assert status == 400 and "error" in out
    status, out = _request(http_server, "POST", "/v1/embed/image",
                           body=b"not an image",
                           headers={"Content-Type": "image/png"})
    assert status == 400 and "error" in out
    status, out = _request(http_server, "GET", "/nope")
    assert status == 404


def test_warmup_pins_zero_steady_state_recompiles(model):
    """After warmup(), no request mix may trigger an XLA compile.

    The bucket design's contract (docs/SERVING.md): batches pad to a fixed
    power-of-two set, warmup() precompiles every bucket, so steady state
    runs 0 compiles regardless of arrival pattern (VERDICT r3 #7).
    """
    import logging

    svc = srv.EmbedService(model, int8=False, on_tpu=False,
                           max_batch=8, max_wait_ms=10.0)

    class Counter(logging.Handler):
        count = 0

        def emit(self, record):
            if "Compiling" in record.getMessage():
                Counter.count += 1

    counter = Counter()
    logger = logging.getLogger("jax")
    try:
        svc.warmup()
        logger.addHandler(counter)
        with jax.log_compiles(True):
            # every bucket size (1,2,4,8) + text mixes, twice over
            for round_ in range(2):
                for n in (1, 3, 2, 8, 5):
                    futs = [svc.embed_image_bytes(_png_bytes(n + i))
                            for i in range(n)]
                    for f in futs:
                        f.result(timeout=120)
                tf = [svc.embed_text(f"query {round_} {i}") for i in range(3)]
                for f in tf:
                    f.result(timeout=120)
    finally:
        logger.removeHandler(counter)
        svc.stop()
    assert counter.count == 0, f"{counter.count} steady-state recompiles"


def test_service_tensor_uint8_matches_float_path(service, model):
    """Raw uint8 rows through the tensor API == host-preprocessed float32
    rows through the JPEG API: the on-device /255+mean/std normalization
    must match model.preprocess exactly (VERDICT r4 #2 saturation path)."""
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (3, RES, RES, 3), dtype=np.uint8)

    futs = service.embed_image_tensor(raw)
    got_u8 = np.stack([f.result(timeout=60) for f in futs])

    pre = np.stack([model.preprocess(r) for r in raw]).astype(np.float32)
    futs = service.embed_image_tensor(pre)
    got_f32 = np.stack([f.result(timeout=60) for f in futs])

    want = np.asarray(model.encode_image(jnp.asarray(pre)))
    np.testing.assert_allclose(got_u8, want, atol=1e-4)
    np.testing.assert_allclose(got_f32, want, atol=1e-5)


def test_service_tensor_rejects_bad_rows(service):
    with pytest.raises(ValueError, match="rows must be"):
        service.embed_image_tensor(np.zeros((2, RES + 1, RES, 3), np.uint8))
    with pytest.raises(ValueError, match="dtype"):
        service.embed_image_tensor(np.zeros((1, RES, RES, 3), np.float64))


def test_http_tensor_endpoint_json_and_raw(http_server, model):
    rng = np.random.default_rng(11)
    rows = rng.integers(0, 256, (2, RES, RES, 3), dtype=np.uint8)
    hdrs = {
        "Content-Type": "application/octet-stream",
        "X-Tensor-Shape": ",".join(map(str, rows.shape)),
        "X-Tensor-Dtype": "uint8",
    }
    status, out = _request(http_server, "POST", "/v1/embed/tensor",
                           body=rows.tobytes(), headers=hdrs)
    assert status == 200 and out["dim"] == E and len(out["embeddings"]) == 2

    # octet-stream reply: raw float32 bytes + shape header
    conn = http.client.HTTPConnection(*http_server, timeout=120)
    conn.request(
        "POST", "/v1/embed/tensor", body=rows.tobytes(),
        headers={**hdrs, "Accept": "application/octet-stream"},
    )
    resp = conn.getresponse()
    body = resp.read()
    shape = tuple(int(x) for x in resp.getheader("X-Tensor-Shape").split(","))
    conn.close()
    assert resp.status == 200 and shape == (2, E)
    z = np.frombuffer(body, np.float32).reshape(shape)
    np.testing.assert_allclose(z, np.asarray(out["embeddings"]), atol=1e-6)

    # malformed header -> 400, not a hung request
    status, out = _request(
        http_server, "POST", "/v1/embed/tensor", body=b"",
        headers={"X-Tensor-Shape": "nope", "X-Tensor-Dtype": "uint8"})
    assert status == 400


def test_dynamic_batcher_pipelined_orders_and_isolates_errors():
    """Pipelined dispatch/finalize mode (round 5): results must complete in
    arrival order even with several batches in flight, a finalize failure
    must fail only its own batch, and stop() must drain in-flight work."""
    import threading as _threading

    finalize_started = _threading.Event()

    def dispatch(items):
        return list(items)  # "handle" = the payloads

    def finalize(handle):
        finalize_started.set()
        time.sleep(0.02)  # device latency: lets several batches pile up
        if any(x < 0 for x in handle):
            raise ValueError("negative")
        return [x * 2 for x in handle]

    b = srv.DynamicBatcher(
        dispatch=dispatch, finalize=finalize, pipeline_depth=2,
        max_batch=4, max_wait_ms=2.0)
    try:
        futs = [b.submit(float(i)) for i in range(12)]
        out = [f.result(timeout=20) for f in futs]
        assert out == [2.0 * i for i in range(12)]
        st = b.stats()
        assert st["requests"] == 12 and st["batches"] >= 3

        bad = b.submit(-1.0)
        with pytest.raises(ValueError):
            bad.result(timeout=20)
        good = b.submit(5.0)  # pipeline must survive the failed batch
        assert good.result(timeout=20) == 10.0
    finally:
        b.stop()


def test_service_pipelined_results_match_direct(service, model):
    """End-to-end through the pipelined image batcher: a burst larger than
    max_batch (forcing >=2 in-flight batches) must return every embedding
    bit-identical to a direct jitted encode."""
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, (3 * 8, RES, RES, 3), dtype=np.uint8)  # 3 buckets
    futs = service.embed_image_tensor(raw)
    got = np.stack([f.result(timeout=120) for f in futs])

    pre = np.stack([model.preprocess(r) for r in raw]).astype(np.float32)
    want = np.asarray(model.encode_image(jnp.asarray(pre)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_service_tensor_uint8_data_parallel_matches_single_device(model):
    """Raw uint8 tensor rows through the batch-parallel (mesh) service:
    the uint8 bucket must shard over all devices (min_bucket = device
    count) with the in-graph normalization, matching the single-device
    float path bitwise-to-tolerance."""
    from openvision_tpu.parallel import create_mesh

    mesh = create_mesh(data=8)
    svc = srv.EmbedService(model, int8=False, on_tpu=False,
                           max_batch=16, max_wait_ms=25.0, mesh=mesh)
    try:
        rng = np.random.default_rng(9)
        raw = rng.integers(0, 256, (3, RES, RES, 3), dtype=np.uint8)
        futs = svc.embed_image_tensor(raw)  # 3 -> padded to bucket 8
        got = np.stack([f.result(timeout=120) for f in futs])
    finally:
        svc.stop()

    pre = np.stack([model.preprocess(r) for r in raw]).astype(np.float32)
    want = np.asarray(model.encode_image(jnp.asarray(pre)))
    np.testing.assert_allclose(got, want, atol=1e-4)
