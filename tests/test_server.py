"""HTTP inference server: the deployment front-end over MicroBatcher.

No analog in the reference (its inference story is the in-process eval
loop, /root/reference/quantization/main.py:279-290). The server must speak
npy / JSON-b64 / encoded-image payloads, coalesce concurrent requests, and
report health + stats.
"""

import base64
import io
import json
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax.numpy as jnp
import pytest

from inference_efficient_vision_models_tpu.serving import Predictor
from inference_efficient_vision_models_tpu.server import InferenceServer

from tests.test_serving import _save_artifacts


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    fold, imgs, q_fn = _save_artifacts(tmp_path_factory.mktemp("srv"))
    pred = Predictor.from_artifact(
        fold, "static_int8", batch_size=8, bucket_sizes=(1, 4)
    )
    srv = InferenceServer(
        pred, port=0, max_wait_ms=20, image_size=(64, 64), warmup=False
    )
    with srv:
        yield srv, imgs, q_fn


def _post(port, path, body, ctype, accept=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    req.add_header("Content-Type", ctype)
    if accept:
        req.add_header("Accept", accept)
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=60
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_health_stats_metadata(served):
    srv, _, _ = served
    assert _get(srv.port, "/healthz") == (200, {"status": "ok"})
    code, meta = _get(srv.port, "/v1/metadata")
    assert code == 200
    assert meta["batch_size"] == 8 and meta["bucket_sizes"] == [1, 4]
    assert len(meta["class_names"]) == 6
    code, stats = _get(srv.port, "/v1/stats")
    assert code == 200 and "mean_batch" in stats
    assert _get(srv.port, "/nope")[0] == 404


def test_predict_npy_matches_oracle(served):
    srv, _, q_fn = served
    test = np.random.default_rng(3).integers(0, 255, (5, 64, 64, 3)).astype(np.uint8)
    code, ctype, body = _post(
        srv.port, "/v1/predict", _npy_bytes(test), "application/x-npy"
    )
    assert code == 200 and ctype == "application/json"
    resp = json.loads(body)
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(test))))
    np.testing.assert_allclose(np.array(resp["logits"]), direct, atol=1e-4)
    assert resp["classes"] == direct.argmax(1).tolist()
    assert len(resp["class_names"]) == 5


def test_predict_npy_response_roundtrip(served):
    """Accept: application/x-npy returns raw logits bytes."""
    srv, _, q_fn = served
    test = np.random.default_rng(4).integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    code, ctype, body = _post(
        srv.port,
        "/v1/predict",
        _npy_bytes(test),
        "application/x-npy",
        accept="application/x-npy",
    )
    assert code == 200 and ctype == "application/x-npy"
    logits = np.load(io.BytesIO(body))
    assert logits.shape == (2, 6) and logits.dtype == np.float32


def test_predict_json_b64_and_single_image(served):
    srv, _, _ = served
    one = np.random.default_rng(5).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    payload = json.dumps(
        {"images_b64": base64.b64encode(_npy_bytes(one)).decode()}
    ).encode()
    code, _, body = _post(srv.port, "/v1/predict", payload, "application/json")
    assert code == 200
    assert len(json.loads(body)["classes"]) == 1  # (H,W,3) promoted to n=1


def test_predict_bmp_payload(served):
    srv, _, _ = served
    from PIL import Image

    im = Image.fromarray(
        np.random.default_rng(6).integers(0, 255, (80, 96, 3)).astype(np.uint8)
    )
    buf = io.BytesIO()
    im.save(buf, format="BMP")
    code, _, body = _post(srv.port, "/v1/predict", buf.getvalue(), "image/bmp")
    assert code == 200
    resp = json.loads(body)
    assert len(resp["classes"]) == 1  # decoded + resized to (64, 64)


def test_predict_error_codes(served):
    srv, _, _ = served

    def expect(code_want, body, ctype):
        try:
            code, _, raw = _post(srv.port, "/v1/predict", body, ctype)
        except urllib.error.HTTPError as e:
            code, raw = e.code, e.read()
        assert code == code_want, raw
        return json.loads(raw)

    expect(415, b"x", "text/plain")  # unsupported content type
    expect(400, b"not npy", "application/x-npy")  # malformed payload
    bad_dtype = np.zeros((1, 64, 64, 3), np.float32)
    assert "uint8" in expect(400, _npy_bytes(bad_dtype), "application/x-npy")["error"]
    bad_shape = np.zeros((1, 64, 64, 4), np.uint8)
    assert "(n, H, W, 3)" in expect(
        400, _npy_bytes(bad_shape), "application/x-npy"
    )["error"]


def test_concurrent_clients_coalesce(served):
    """Parallel HTTP clients end up coalesced by the MicroBatcher."""
    srv, _, q_fn = served
    rng = np.random.default_rng(7)
    reqs = [rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8) for _ in range(8)]
    before = srv.batcher.stats()["batches"]

    def call(r):
        _, _, body = _post(srv.port, "/v1/predict", _npy_bytes(r), "application/x-npy")
        return np.array(json.loads(body)["logits"])

    with ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(call, reqs))
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    for r, out in zip(reqs, outs):
        direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(r))))
        np.testing.assert_allclose(out, direct, atol=1e-4)
    # 8 one-image requests must have shared device calls.
    assert srv.batcher.stats()["batches"] - before < 8


def test_oversized_request_chunks(served):
    """infer() transparently chunks requests larger than max_batch."""
    srv, _, q_fn = served
    test = np.random.default_rng(8).integers(0, 255, (19, 64, 64, 3)).astype(np.uint8)
    out = srv.infer(test)
    from inference_efficient_vision_models_tpu.ops.space_to_depth import (
        space_to_depth_u8,
    )

    direct = np.asarray(q_fn(jnp.asarray(space_to_depth_u8(test))))
    np.testing.assert_allclose(out, direct, atol=1e-4)
