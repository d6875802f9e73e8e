"""Serving host for exported artifacts (tools/export_model.py).

Beyond-reference serving capability: the reference has no serving story —
inference means re-driving the torch/mmcv Python stack (tools/test.py).
Here a single process loads the AOT StableHLO artifact (weights embedded,
no model code or config system) and serves it over HTTP:

  POST /infer     body: .npz with 'images' (B,N,H,W,3) f32 and
                  'lidar2img' (B,N,4,4) f32 -> JSON detections
                  (bboxes/scores/labels per valid detection)
  POST /infer_stream?stream=ID   streaming artifacts only: 'images' is
                  the NEW frame's cams (B, num_frame_cams, H, W, 3);
                  the previous frame's FPN features are cached per
                  stream id as device arrays, so only the new cams run
                  the backbone (~halves the per-frame compute of the
                  temporal model). 'lidar2img' stays (B, num_cams, 4, 4)
                  — current cams then the cached frame's cams in the
                  current lidar frame. First request bootstraps the
                  cache with the new frame (loader parity for missing
                  sweeps).
  POST /reset_stream?stream=ID   drop a stream's cached features
  GET  /manifest  the export manifest (shapes, platforms, config name)
  GET  /healthz   liveness + device + served-request counter

Device calls are serialized behind a lock (one XLA program, one chip);
request decode/encode runs in the HTTP thread pool, so host work overlaps
the device (same 2-stage pipeline as tools/test.py eval).

  python tools/serve.py --artifact work_dirs/export --port 8471
  python tools/serve.py --bench http://localhost:8471 --requests 32
"""

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", default=None, help="export dir to serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8471)
    p.add_argument(
        "--bench",
        default=None,
        metavar="URL",
        help="client mode: POST synthetic requests to URL and report latency",
    )
    p.add_argument("--requests", type=int, default=16)
    p.add_argument(
        "--concurrency",
        type=int,
        default=1,
        help="bench mode: number of parallel client threads (pipelined "
        "requests overlap host decode/encode with device work)",
    )
    p.add_argument(
        "--stream",
        action="store_true",
        help="bench mode: hit /infer_stream (streaming artifacts) — "
        "each request ships only the NEW frame's cams; the server "
        "reuses the cached previous-frame features",
    )
    p.add_argument(
        "--ready-file",
        default=None,
        help="write this file once the server is listening (test harness)",
    )
    p.add_argument(
        "--max-streams",
        type=int,
        default=16,
        help="streaming artifacts: max concurrently cached stream ids; "
        "least-recently-used streams are evicted (each cache entry "
        "holds full FPN feature arrays in device memory)",
    )
    return p.parse_args()


def synth_extra(name, shape, np):
    """Placeholder value for an extra artifact input (warmup/bench)."""
    if name == "intrinsics":
        v = np.tile(np.eye(4, dtype=np.float32), tuple(shape[:-2]) + (1, 1))
        v[..., 0, 0] = v[..., 1, 1] = 1000.0
        v[..., 0, 2], v[..., 1, 2] = 400.0, 225.0
        return v
    if name == "mean_time_stamp":
        return np.full(shape, 0.5, np.float32)
    return np.ones(shape, np.float32)


class Engine:
    """Deserialized artifact + lock-serialized device execution.

    Streaming artifacts (export_model.py --streaming) hold two programs:
    encode (current cams -> FPN features) and head (cur + cached prev
    features -> detections). infer_stream() keeps the previous frame's
    features per stream id as DEVICE arrays — they never cross the HTTP
    boundary — so each video-stream request runs the backbone on only
    the new frame (models/detector.py forward_feats; the reference
    recomputes every camera every call)."""

    def __init__(self, artifact_dir, max_streams=16):
        from collections import OrderedDict

        from graph_detr4d_tpu.utils.platform import apply_platform_override

        apply_platform_override()
        import jax
        import numpy as np
        from jax import export

        self._jax = jax

        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._lock = threading.Lock()
        self.served = 0
        self._np = np
        m = self.manifest
        B, N = m["batch_size"], m["num_cams"]
        H, W = m["img_size"]
        img_dtype = np.dtype(m["inputs"]["images"][1])
        # extra inputs the artifact requires (export_model._extras_spec),
        # positional after (images, lidar2img) / streaming lidar2img
        self.extras_spec = [
            (name, tuple(m["inputs"][name][0]))
            for name in m.get("extras", [])
        ]
        warm_extras = [
            synth_extra(name, shape, np) for name, shape in self.extras_spec
        ]
        self.streaming = m.get("streaming")
        self.max_streams = max_streams
        if self.streaming:
            with open(
                os.path.join(artifact_dir, "encode.jaxexport"), "rb"
            ) as f:
                self.encode = export.deserialize(f.read())
            with open(
                os.path.join(artifact_dir, "head.jaxexport"), "rb"
            ) as f:
                self.head = export.deserialize(f.read())
            # stream id -> list of device feat arrays, LRU order (each
            # entry is HBM-resident; unbounded growth would crash the
            # device, so the oldest stream is evicted at max_streams)
            self._cache = OrderedDict()
            nf = self.streaming["num_frame_cams"]
            # warm both programs
            self.infer_stream(
                np.zeros((B, nf, H, W, 3), img_dtype),
                np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
                warm_extras,
                stream="_warmup",
            )
            del self._cache["_warmup"]
        else:
            with open(
                os.path.join(artifact_dir, "model.jaxexport"), "rb"
            ) as f:
                self.exported = export.deserialize(f.read())
            # warm: compile happens on the first call
            self.infer(
                np.zeros((B, N, H, W, 3), img_dtype),
                np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
                warm_extras,
            )

    def _put(self, *arrays):
        """Start the host->device transfers OUTSIDE the device lock:
        request B's h2d (the dominant cost on a remote-attached chip —
        PROFILE.md serving table) overlaps request A's locked compute."""
        return [self._jax.device_put(a) for a in arrays]

    def infer(self, images, lidar2img, extras=()):
        np = self._np
        images, lidar2img, *extras = self._put(images, lidar2img, *extras)
        if self.streaming:
            # monolithic request against a streaming artifact: encode
            # both frame halves, no cache involvement
            nf = self.streaming["num_frame_cams"]
            keys = self.streaming["feat_keys"]
            with self._lock:
                cur = self.encode.call(images[:, :nf])
                prev = self.encode.call(images[:, nf:])
                out = self.head.call(
                    lidar2img,
                    *extras,
                    *[cur[k] for k in keys],
                    *[prev[k] for k in keys],
                )
                self.served += 1
        else:
            with self._lock:
                out = self.exported.call(images, lidar2img, *extras)
                self.served += 1
        # device->host copies happen OUTSIDE the lock so the next
        # request's device work overlaps this response's host transfer
        return {k: np.asarray(v) for k, v in out.items()}

    def infer_stream(self, images, lidar2img, extras=(), stream="default"):
        """images: (B, num_frame_cams, H, W, 3) — the NEW frame only.
        lidar2img: (B, num_cams, 4, 4) — current cams first, then the
        cached frame's cams mapped into the current lidar frame. On the
        first request of a stream the new frame doubles as the sweep
        (same behavior as the data loader when no sweeps exist)."""
        np = self._np
        images, lidar2img, *extras = self._put(images, lidar2img, *extras)
        keys = self.streaming["feat_keys"]
        with self._lock:
            cur = self.encode.call(images)
            cur_list = [cur[k] for k in keys]
            prev_list = self._cache.get(stream, cur_list)
            out = self.head.call(lidar2img, *extras, *cur_list, *prev_list)
            self._cache[stream] = cur_list
            self._cache.move_to_end(stream)
            while len(self._cache) > self.max_streams:
                self._cache.popitem(last=False)
            self.served += 1
        return {k: np.asarray(v) for k, v in out.items()}

    def reset_stream(self, stream="default"):
        with self._lock:
            return self._cache.pop(stream, None) is not None


def make_handler(engine):
    from http.server import BaseHTTPRequestHandler

    np = engine._np

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(
                    200, {"ok": True, "served": engine.served}
                )
            elif self.path == "/manifest":
                self._send(200, engine.manifest)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            from urllib.parse import urlparse, parse_qs

            parsed = urlparse(self.path)
            route = parsed.path
            qs = parse_qs(parsed.query)
            stream = qs.get("stream", ["default"])[0]
            if route == "/reset_stream":
                if not engine.streaming:
                    self._send(400, {"error": "not a streaming artifact"})
                    return
                self._send(
                    200, {"reset": engine.reset_stream(stream)}
                )
                return
            if route not in ("/infer", "/infer_stream"):
                self._send(404, {"error": "unknown path"})
                return
            if route == "/infer_stream" and not engine.streaming:
                self._send(
                    400,
                    {
                        "error": "not a streaming artifact; export with "
                        "--streaming"
                    },
                )
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = np.load(io.BytesIO(self.rfile.read(n)))
                required = ["images", "lidar2img"] + [
                    name for name, _ in engine.extras_spec
                ]
                missing = [k for k in required if k not in data]
                if missing:
                    self._send(
                        400,
                        {
                            "error": f"missing npz key(s) {missing}; "
                            f"this artifact requires {required}"
                        },
                    )
                    return
                img_dtype = np.dtype(
                    engine.manifest["inputs"]["images"][1]
                )
                sent = np.asarray(data["images"])
                # a silent cast across float<->integer kinds would wrap/
                # truncate normalized pixels into garbage detections with
                # HTTP 200 — reject the contract mismatch instead
                if sent.dtype.kind != img_dtype.kind:
                    self._send(
                        400,
                        {
                            "error": (
                                f"images dtype {sent.dtype.name} does not "
                                f"match this artifact's input dtype "
                                f"{img_dtype.name} (uint8-ingest artifacts "
                                "take RAW pixels 0-255; float artifacts "
                                "take normalized pixels — see /manifest)"
                            )
                        },
                    )
                    return
                images = sent.astype(img_dtype, copy=False)
                l2i = np.asarray(data["lidar2img"], np.float32)
                want_i = tuple(engine.manifest["inputs"]["images"][0])
                if route == "/infer_stream":
                    s = engine.streaming
                    want_i = (
                        want_i[0],
                        s["num_frame_cams"],
                    ) + want_i[2:]
                want_l = tuple(engine.manifest["inputs"]["lidar2img"][0])
                extras = []
                shape_errs = []
                if images.shape != want_i:
                    shape_errs.append(
                        f"images {list(images.shape)} != {list(want_i)}"
                    )
                if l2i.shape != want_l:
                    shape_errs.append(
                        f"lidar2img {list(l2i.shape)} != {list(want_l)}"
                    )
                for name, want_e in engine.extras_spec:
                    v = np.asarray(data[name], np.float32)
                    if v.shape != want_e:
                        shape_errs.append(
                            f"{name} {list(v.shape)} != {list(want_e)}"
                        )
                    extras.append(v)
                if shape_errs:
                    self._send(
                        400,
                        {
                            "error": "input shape mismatch vs artifact: "
                            + "; ".join(shape_errs)
                        },
                    )
                    return
                if route == "/infer_stream":
                    det = engine.infer_stream(
                        images, l2i, extras, stream=stream
                    )
                else:
                    det = engine.infer(images, l2i, extras)
                out = []
                for b in range(det["bboxes"].shape[0]):
                    keep = det["valid"][b].astype(bool)
                    out.append(
                        {
                            "bboxes": det["bboxes"][b][keep].tolist(),
                            "scores": det["scores"][b][keep].tolist(),
                            "labels": det["labels"][b][keep].tolist(),
                        }
                    )
                self._send(200, {"detections": out})
            except Exception as e:  # surface to the client, keep serving
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def run_server(args):
    from http.server import ThreadingHTTPServer

    engine = Engine(args.artifact, max_streams=args.max_streams)
    srv = ThreadingHTTPServer(
        (args.host, args.port), make_handler(engine)
    )
    print(
        json.dumps(
            {
                "serving": f"http://{args.host}:{srv.server_address[1]}",
                "artifact": args.artifact,
                "config": engine.manifest.get("config"),
            }
        ),
        flush=True,
    )
    if args.ready_file:
        with open(args.ready_file, "w") as f:
            f.write(str(srv.server_address[1]))
    srv.serve_forever()


def run_bench(args):
    import urllib.request

    import numpy as np

    with urllib.request.urlopen(args.bench + "/manifest") as r:
        manifest = json.load(r)
    B, N = manifest["batch_size"], manifest["num_cams"]
    H, W = manifest["img_size"]
    # uint8-ingest artifacts (export_model.py --uint8-input) take raw
    # pixels and normalize on device — 4x smaller request payload/h2d
    img_dtype = manifest["inputs"]["images"][1]
    rng = np.random.RandomState(0)
    extras = {
        name: synth_extra(name, tuple(manifest["inputs"][name][0]), np)
        for name in manifest.get("extras", [])
    }

    n_img = N
    route = "/infer"
    if args.stream:
        if not manifest.get("streaming"):
            raise SystemExit("--stream needs a --streaming artifact")
        n_img = manifest["streaming"]["num_frame_cams"]
        route = "/infer_stream?stream=bench"

    def make_body(rng):
        if img_dtype == "uint8":
            images = rng.randint(0, 256, (B, n_img, H, W, 3), np.uint8)
        else:
            images = rng.randn(B, n_img, H, W, 3).astype(np.float32)
        buf = io.BytesIO()
        np.savez(
            buf,
            images=images,
            lidar2img=np.tile(
                np.eye(4, dtype=np.float32), (B, N, 1, 1)
            ),
            **extras,
        )
        return buf.getvalue()

    def one(body):
        t0 = time.perf_counter()
        req = urllib.request.Request(
            args.bench + route, data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            resp = json.load(r)
        assert "detections" in resp, resp
        return time.perf_counter() - t0

    wall0 = time.perf_counter()
    if args.concurrency > 1:
        # pipelined clients: request decode/encode on the server overlaps
        # the (lock-serialized) device work of other in-flight requests
        from concurrent.futures import ThreadPoolExecutor

        bodies = [
            make_body(np.random.RandomState(i))
            for i in range(args.concurrency)
        ]
        with ThreadPoolExecutor(args.concurrency) as pool:
            lat = list(
                pool.map(
                    lambda i: one(bodies[i % len(bodies)]),
                    range(args.requests),
                )
            )
        payload_bytes = len(bodies[0])
    else:
        body = make_body(rng)
        lat = [one(body) for _ in range(args.requests)]
        payload_bytes = len(body)
    wall = time.perf_counter() - wall0
    lat_ms = sorted(x * 1e3 for x in lat)
    n = len(lat_ms)

    def pct(p):
        return round(lat_ms[min(n - 1, int(n * p))], 1)

    print(
        json.dumps(
            {
                "requests": n,
                "route": route.split("?")[0],
                "concurrency": args.concurrency,
                "payload_mb": round(payload_bytes / 1e6, 1),
                "p50_ms": pct(0.50),
                "p90_ms": pct(0.90),
                "p95_ms": pct(0.95),
                "p99_ms": pct(0.99),
                "mean_ms": round(sum(lat_ms) / n, 1),
                "throughput_rps": round(n / wall, 2),
            }
        )
    )


def main():
    args = parse_args()
    if args.bench:
        run_bench(args)
    else:
        if not args.artifact:
            raise SystemExit("--artifact or --bench required")
        run_server(args)


if __name__ == "__main__":
    main()
