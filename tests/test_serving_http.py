"""HTTP serving (tools/serve_http.py): requests served from the folded
deployment artifact, fixed batch buckets, no recompile on the request path."""

import json
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sys.path.insert(0, "tools")
    import serve_http

    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import save_state
    from deepipr_tpu.utils.config import construct_passport_kwargs

    cfg = {"0": False, "2": False, "4": True, "5": True, "6": True}
    kw, _ = construct_passport_kwargs(cfg, "bn", "shuffle", 0.1)
    model = build_model("alexnet", 10, "bn", passport_kwargs=kw, private=True)
    v = model.init({"params": jax.random.key(0), "passport": jax.random.key(1)},
                   jnp.zeros((1, 32, 32, 3)), train=True)
    ckpt = str(tmp_path_factory.mktemp("srv") / "m.ckpt")
    save_state(ckpt, TrainState.create(v, sgd_optimizer(0.0)))

    args = serve_http.build_parser().parse_args(
        ["--ckpt", ckpt, "--arch", "alexnet",
         "--passport-config", "passport_configs/alexnet_passport.json"])
    srv = serve_http.make_server(args, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, json.dumps(obj).encode(), {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert body["ok"] and body["folded"] and body["arch"] == "alexnet"


def test_predict_uint8_batch(server):
    imgs = np.random.default_rng(0).integers(
        0, 256, (3, 32, 32, 3)).astype(np.uint8)
    code, body = _post(server + "/predict", {"images": imgs.tolist()})
    assert code == 200
    assert len(body["classes"]) == 3
    assert all(0 <= c < 10 for c in body["classes"])
    assert body["latency_ms"] >= 0


def test_predict_single_image_and_padding_consistency(server):
    """A batch-1 request (padded to bucket 1) and the same image inside a
    batch-3 request (bucket 8) must agree — padding can't leak."""
    img = np.random.default_rng(1).integers(
        0, 256, (32, 32, 3)).astype(np.uint8)
    _, one = _post(server + "/predict", {"images": img.tolist()})
    _, three = _post(server + "/predict",
                     {"images": np.stack([img] * 3).tolist()})
    assert one["classes"][0] == three["classes"][0]
    assert len(set(three["classes"])) == 1


def test_bad_request(server):
    code, body = _post(server + "/predict", {"images": "nope"})
    assert code == 400 and "error" in body


def test_oversized_batch_rejected(server):
    imgs = np.zeros((257, 2, 2, 3))
    code, body = _post(server + "/predict", {"images": imgs.tolist()})
    assert code == 413
