#!/usr/bin/env python
"""Minimal production-style HTTP serving for a trained checkpoint.

Stdlib-only (ThreadingHTTPServer) around serve.Predictor — by default the
FOLDED deployment artifact: BN + affines collapsed into the conv kernels,
no passports/signatures/BN stats in memory (interop/fold.py), public branch
only. Requests are padded to a fixed set of batch sizes so the jitted
forward never recompiles after warmup.

  POST /predict   {"images": [[H][W][C]...]} (uint8 0-255 or normalized
                  floats) -> {"classes": [...], "latency_ms": ...}
  GET  /healthz   {"ok": true, ...model info...}

Example:
    python tools/serve_http.py --ckpt logs/.../best.ckpt --arch resnet \\
        --passport-config passport_configs/resnet18_passport.json --port 8000
"""

import argparse
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_predictor(args):
    import jax
    import jax.numpy as jnp

    from deepipr_tpu.models.registry import build_model
    from deepipr_tpu.serve import Predictor
    from deepipr_tpu.train.schedule import sgd_optimizer
    from deepipr_tpu.train.state import TrainState
    from deepipr_tpu.utils.checkpoint import load_state
    from deepipr_tpu.utils.config import construct_passport_kwargs

    kw = None
    if args.passport_config:
        cfg = json.load(open(args.passport_config))
        kw, _ = construct_passport_kwargs(cfg, args.norm_type, "shuffle", 0.1)
        if args.separate_stats:
            from deepipr_tpu.utils.config import mark_separate_stats

            mark_separate_stats(kw)
    private = kw is not None and args.private
    model = build_model(args.arch, args.num_classes, args.norm_type,
                        passport_kwargs=kw, private=private)
    shape = (1, args.imgcrop, args.imgcrop, 3)
    rngs = {"params": jax.random.key(0), "passport": jax.random.key(1)}
    variables = model.init(rngs, jnp.zeros(shape, jnp.float32), train=True)
    state = load_state(args.ckpt, TrainState.create(variables, sgd_optimizer(0.0)),
                       restore_opt=False)
    return Predictor(model, state, folded=args.folded, input_shape=shape)


class _Server(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, predictor, info, image_shape,
                 batch_sizes=(1, 8, 64, 256)):
        super().__init__(addr, _Handler)
        self.predictor = predictor
        self.info = info
        self.image_shape = tuple(image_shape)
        self.batch_sizes = sorted(batch_sizes)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            return self._json(200, {"ok": True, **self.server.info})
        return self._json(404, {"error": "unknown path"})

    def do_POST(self):
        import numpy as np

        if self.path != "/predict":
            return self._json(404, {"error": "unknown path"})
        want = self.server.image_shape  # (H, W, C) the model was warmed for
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            x = np.asarray(req["images"], np.float32)
            if x.ndim == 3:
                x = x[None]
            if x.ndim == 4 and len(x) > self.server.batch_sizes[-1]:
                return self._json(413, {
                    "error": f"batch > {self.server.batch_sizes[-1]}"})
            if x.ndim != 4 or x.shape[1:] != want:
                return self._json(400, {
                    "error": f"images must be (N,{','.join(map(str, want))})"
                             f" or ({','.join(map(str, want))}), got "
                             f"{list(x.shape)}"})
            # "normalized": true skips normalization explicitly; otherwise
            # uint8-range input (values outside plausible normalized range)
            # is normalized — send the flag for ambiguous (dark) images
            normalized = req.get("normalized")
            if normalized is None:
                normalized = x.max() <= 8.0
            if not normalized:
                from deepipr_tpu.data.datasets import normalize

                x = normalize(np.clip(x, 0, 255).astype(np.uint8))
        except Exception as e:
            return self._json(400, {"error": f"bad request: {e}"})
        sizes = self.server.batch_sizes
        if len(x) > sizes[-1]:
            return self._json(413, {"error": f"batch > {sizes[-1]}"})
        try:
            padded = next(s for s in sizes if s >= len(x))
            xp = np.zeros((padded,) + x.shape[1:], np.float32)
            xp[: len(x)] = x
            t0 = time.time()
            classes = np.asarray(self.server.predictor.predict(xp))[: len(x)]
        except Exception as e:
            return self._json(500, {"error": f"inference failed: {e}"})
        self._json(200, {
            "classes": classes.tolist(),
            "latency_ms": round((time.time() - t0) * 1e3, 2),
        })


def make_server(args, port=0):
    predictor = build_predictor(args)
    info = {"arch": args.arch, "folded": args.folded,
            "num_classes": args.num_classes,
            "image_shape": [args.imgcrop, args.imgcrop, 3]}
    srv = _Server(("127.0.0.1", port), predictor, info,
                  (args.imgcrop, args.imgcrop, 3))
    # warm every batch size so serving never compiles on the request path;
    # np.asarray FORCES completion (on relayed platforms the compile only
    # finishes when a result is materialized)
    import numpy as np

    for s in srv.batch_sizes:
        np.asarray(predictor.predict(
            np.zeros((s, args.imgcrop, args.imgcrop, 3), np.float32)))
    return srv


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--arch", default="resnet",
                   choices=["alexnet", "resnet", "resnet9", "resnet50"])
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--norm-type", default="bn")
    p.add_argument("--passport-config")
    p.add_argument("--private", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--separate-stats", action="store_true")
    p.add_argument("--imgcrop", type=int, default=32)
    p.add_argument("--folded", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="serve the folded deployment artifact (default)")
    p.add_argument("--port", type=int, default=8000)
    return p


def main():
    args = build_parser().parse_args()
    srv = make_server(args, port=args.port)
    print(f"serving {args.arch} (folded={args.folded}) on "
          f"http://127.0.0.1:{srv.server_address[1]} — POST /predict, "
          "GET /healthz")
    srv.serve_forever()


if __name__ == "__main__":
    main()
