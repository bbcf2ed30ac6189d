"""Inference server: keep the model + compiled graphs resident, serve NPZ.

The reference stops at a batch demo script (`demo.py`); production serving
wants the expensive parts — params on device and XLA executables — loaded
once and reused across requests. This is a minimal dependency-free HTTP
server around `EvaluationPredictor`:

    python -m mvtracker_tpu.cli.serve --ckpt_dir exp/ --port 8787 \
        --chunk_frames 24

    POST /track   body = .npz bytes with rgbs [V,T,H,W,3], depths [V,T,H,W],
                  query_points [N,4], intrs [V,T,3,3], extrs [V,T,3,4]
                  -> .npz bytes with traj [T,N,3], vis [T,N]
    GET  /healthz -> JSON: device, compiled shape count, request count

Shape discipline: every distinct input shape compiles a new graph (XLA).
`--chunk_frames` canonicalizes the time axis server-side; clients should
standardize V/H/W/N (pad N with throwaway queries) to stay on warm graphs.
Requests are serialized through one lock — one chip, one queue; scale-out
is one server process per chip behind any off-the-shelf balancer.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
import time


def make_handler(predictor, stats, lock):
    import numpy as np
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logging.info("%s " + fmt, self.client_address[0], *args)

        def _reply(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, b"not found", "text/plain")
            import jax

            body = json.dumps(
                {
                    "device": str(jax.devices()[0]),
                    "compiled_shapes": len(predictor._jitted),
                    "requests": stats["requests"],
                    "errors": stats["errors"],
                }
            ).encode()
            return self._reply(200, body, "application/json")

        def do_POST(self):
            if self.path != "/track":
                return self._reply(404, b"not found", "text/plain")
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                args = tuple(
                    np.asarray(data[k], np.float32)
                    for k in ("rgbs", "depths", "query_points", "intrs", "extrs")
                )
                t0 = time.perf_counter()
                with lock:  # one chip: serialize compute
                    out = predictor(*args)
                    traj = np.asarray(out["traj"])
                    vis = np.asarray(out["vis"])
                dt = time.perf_counter() - t0
                stats["requests"] += 1
                logging.info(
                    "tracked %d pts x %d frames in %.2fs (%.0f pf/s)",
                    traj.shape[1], traj.shape[0], dt,
                    traj.shape[0] * traj.shape[1] / max(dt, 1e-9),
                )
                buf = io.BytesIO()
                np.savez_compressed(buf, traj=traj, vis=vis)
                return self._reply(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # noqa: BLE001 — report, keep serving
                stats["errors"] += 1
                logging.exception("request failed")
                return self._reply(400, str(e).encode(), "text/plain")

    return Handler


def build_server(model, params, host="127.0.0.1", port=8787, **predictor_kwargs):
    """Construct (server, predictor); caller runs server.serve_forever()."""
    from http.server import ThreadingHTTPServer

    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor

    predictor = EvaluationPredictor(model, params, **predictor_kwargs)
    stats = {"requests": 0, "errors": 0}
    lock = threading.Lock()
    server = ThreadingHTTPServer((host, port), make_handler(predictor, stats, lock))
    return server, predictor


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--ckpt_dir", default=None, help="experiment dir with checkpoints")
    parser.add_argument("--params_msgpack", default=None, help="flax params file (cli/convert.py output)")
    parser.add_argument("--chunk_frames", type=int, default=None)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--grid_size", type=int, default=0)
    parser.add_argument("--interp_shape", type=int, nargs=2, default=None)
    parser.add_argument("--warmup_shape", type=int, nargs=5, default=None,
                        metavar=("V", "T", "H", "W", "N"),
                        help="pre-compile the graph for this shape at startup")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import numpy as np

    import mvtracker_tpu
    from mvtracker_tpu.models.mvtracker import MVTracker

    mvtracker_tpu.enable_compilation_cache()
    model = MVTracker()
    params = None
    if args.params_msgpack:
        import flax.serialization

        with open(args.params_msgpack, "rb") as f:
            params = flax.serialization.msgpack_restore(f.read())
    elif args.ckpt_dir:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(args.ckpt_dir + "/checkpoints")
        latest = mgr.latest_step()
        if latest is not None:
            params = mgr.restore(latest)["params"]
            logging.info("loaded checkpoint step %d", latest)
    if params is None:
        logging.warning("no checkpoint given: serving a randomly initialized model")
        rng = np.random.default_rng(0)
        v, t, h, w, n = args.warmup_shape or (2, 8, 128, 128, 64)
        from __graft_entry__ import _make_scene

        ex = _make_scene(rng, v, min(t, 8), h, w, n)
        params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
            jax.random.PRNGKey(0), *ex
        )

    server, predictor = build_server(
        model, params, host=args.host, port=args.port,
        interp_shape=tuple(args.interp_shape) if args.interp_shape else None,
        grid_size=args.grid_size, n_iters=args.iters,
        chunk_frames=args.chunk_frames,
    )
    if args.warmup_shape:
        from __graft_entry__ import _make_scene

        rng = np.random.default_rng(0)
        v, t, h, w, n = args.warmup_shape
        logging.info("warmup compile for shape V=%d T=%d H=%d W=%d N=%d ...", v, t, h, w, n)
        predictor(*_make_scene(rng, v, t, h, w, n))
        logging.info("warmup done")
    logging.info("serving on http://%s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
