"""The interactive front-end's core loop, driven through its HTTP API:
load scene -> render (hybrid pipeline + progress) -> IR + rays +
wavefront + WAV (the reference GUI's loop, wayverb/Source/main_model.cpp,
without JUCE)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from tools import gui


@pytest.fixture(scope="module")
def server():
    httpd = gui.serve(port=0)           # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(base, path, obj):
    req = urllib.request.Request(base + path,
                                 data=json.dumps(obj).encode(),
                                 method="POST")
    return json.loads(urllib.request.urlopen(req).read())


def _get(base, path):
    return urllib.request.urlopen(base + path).read()


def test_full_loop(server):
    page = _get(server, "/").decode()
    assert "wayverb_tpu" in page and "api/render" in page

    sc = _post(server, "/api/load", {"dims": [3.2, 2.5, 2.8]})
    assert sc["num_triangles"] == 12
    assert sc["is_box"]

    r = _post(server, "/api/render", {
        "source": [1.0, 1.2, 0.9], "receiver": [2.2, 1.4, 1.9],
        "rays": 512, "cutoff": 250, "absorption": 0.2})
    assert r["started"]
    deadline = time.time() + 600
    while True:
        p = json.loads(_get(server, "/api/progress"))
        if not p["running"]:
            break
        assert time.time() < deadline, "render timed out"
        time.sleep(1.0)
    assert p["status"] == "done", p
    assert p["error"] is None

    res = json.loads(_get(server, "/api/result"))
    ir = np.asarray(res["ir"])
    assert ir.size > 100 and np.all(np.isfinite(ir))
    assert np.max(np.abs(ir)) > 0
    assert res["rays"] and len(res["rays"][0][0]) == 3
    assert res["frames"] and res["frame_extent"]

    wav = _get(server, "/api/result.wav")
    assert wav[:4] == b"RIFF" and len(wav) > 1000


def test_cancel(server):
    _post(server, "/api/load", {"dims": [4.0, 3.0, 3.5]})
    # keep the phases SHORT: the worker thread must finish promptly even
    # if the cancel lands after the last checkpoint (a long-running
    # leftover thread compiles concurrently with later tests and
    # crashes XLA — seen as a suite-wide segfault)
    r = _post(server, "/api/render", {
        "source": [1.0, 1.2, 0.9], "receiver": [2.8, 1.4, 2.4],
        "rays": 512, "cutoff": 200, "absorption": 0.3})
    assert r["started"]
    _post(server, "/api/cancel", {})
    deadline = time.time() + 600
    while json.loads(_get(server, "/api/progress"))["running"]:
        assert time.time() < deadline
        time.sleep(1.0)
    p = json.loads(_get(server, "/api/progress"))
    assert p["status"] in ("cancelled", "done")
