"""HTTP serving front-end tests (pfd_tpu/serve.py vs reference app.py:357-499).

Drives the stdlib HTTP API with a stub pipeline (no model init, no TPU):
health/zoo metadata, the inference round-trip incl. base64/nested-list image
codecs, error mapping, and the 404 paths.
"""

import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from pfd_tpu import serve, zoo


class _StubPipeline:
    tag_ctx = "SeeCoder"
    tag_diffuser = "Deliberate-v2.0"
    tag_ctl = "canny"

    def __init__(self):
        self.calls = []

    def action_inference(self, im, imctl, ctl_method, do_preprocess, h, w,
                         ugscale, seed, tag_ctx=None, tag_diffuser=None,
                         tag_ctl=None, steps=None):
        self.calls.append(dict(ctl_method=ctl_method, h=h, w=w,
                               ugscale=ugscale, seed=seed, steps=steps,
                               has_ctl=imctl is not None))
        out = np.full((h // 64, w // 64, 3), 0.5, np.float32)
        hint = np.zeros((h // 64, w // 64, 3), np.float32)
        return [out, hint]


@pytest.fixture()
def server():
    stub = _StubPipeline()
    serve._Handler.pipeline = stub
    srv = ThreadingHTTPServer(("127.0.0.1", 0), serve._Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", stub
    finally:
        srv.shutdown()
        srv.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        body = e.read()
        return e.code, json.loads(body) if body else None


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        body = e.read()
        return e.code, json.loads(body) if body else None


def test_health_reports_tags_and_zoo(server):
    base, _ = server
    status, body = _get(base + "/health")
    assert status == 200
    assert body["status"] == "ok"
    assert body["tags"] == {"ctx": "SeeCoder", "diffuser": "Deliberate-v2.0",
                            "ctl": "canny"}
    assert set(body["zoo"]["diffusers"]) == set(zoo.DIFFUSER_PATH)
    assert set(body["zoo"]["preprocess"]) == set(zoo.PREPROCESS_METHODS)


def test_get_unknown_path_404(server):
    base, _ = server
    status, _ = _get(base + "/nope")
    assert status == 404


def test_post_unknown_path_404(server):
    base, _ = server
    status, _ = _post(base + "/nope", {})
    assert status == 404


def test_inference_roundtrip_list_payload(server):
    base, stub = server
    im = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    status, body = _post(base + "/inference",
                         {"image": im.tolist(), "h": 128, "w": 192,
                          "ugscale": 3.5, "seed": 7, "steps": 5})
    assert status == 200
    assert stub.calls[-1] == dict(ctl_method="canny", h=128, w=192,
                                  ugscale=3.5, seed=7, steps=5,
                                  has_ctl=False)
    out = serve._decode_image(body["image"])
    hint = serve._decode_image(body["hint"])
    assert out.shape == (2, 3, 3) and hint.shape == (2, 3, 3)
    # stub returns 0.5 everywhere; PNG round-trip quantizes to 127/255
    np.testing.assert_allclose(out, 127 / 255 if out.max() < 0.5 else 0.5,
                               atol=1 / 255)
    assert float(hint.max()) == 0.0


def test_inference_control_image_forwarded(server):
    base, stub = server
    im = np.zeros((8, 8, 3), np.float32)
    status, _ = _post(base + "/inference",
                      {"image": im.tolist(), "control_image": im.tolist()})
    assert status == 200
    assert stub.calls[-1]["has_ctl"] is True


def test_inference_missing_image_is_500_with_error(server):
    base, _ = server
    status, body = _post(base + "/inference", {"h": 512})
    assert status == 500
    assert "error" in body and "KeyError" in body["error"]


def test_image_codec_roundtrip():
    """_encode_image -> _decode_image is an 8-bit-exact round trip for
    in-range values whichever codec path (PNG base64 or nested lists) is
    active in this environment."""
    rng = np.random.default_rng(0)
    img = rng.random((5, 7, 3)).astype(np.float32)
    enc = serve._encode_image(img)
    dec = serve._decode_image(enc)
    scale = 255.0 if isinstance(enc, list) else 1.0
    # _encode_image truncates ((x*255).astype(uint8)), so the fixed point
    # of the round trip is floor(x*255)/255
    np.testing.assert_allclose(dec / scale if scale != 1.0 else dec,
                               np.floor(img * 255) / 255, atol=0.5 / 255)
