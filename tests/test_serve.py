"""Serving host (tools/serve.py): export a tiny artifact, start the HTTP
server in a fresh process (no model code needed server-side beyond the
artifact), and drive /healthz, /manifest, /infer and the client bench
against it. Beyond-reference capability — the reference has no serving
path (inference = re-running tools/test.py under torch/mmcv)."""

import io
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
ENV = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("serve") / "export")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--tiny",
            "--platforms",
            "cpu",
            "--out",
            out_dir,
        ],
        env=ENV,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out_dir


def _start_server(artifact_dir, tmp_path):
    ready = str(tmp_path / "ready")
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(TOOLS, "serve.py"),
            "--artifact",
            artifact_dir,
            "--port",
            "0",
            "--ready-file",
            ready,
        ],
        env=ENV,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    deadline = time.time() + 240  # includes first-call compile
    while not os.path.exists(ready):
        if proc.poll() is not None:
            raise AssertionError(
                f"server died: {proc.stderr.read()[-2000:]}"
            )
        if time.time() > deadline:
            proc.kill()
            raise AssertionError("server never became ready")
        time.sleep(0.5)
    with open(ready) as f:
        port = int(f.read())
    return proc, f"http://127.0.0.1:{port}"


def test_serve_end_to_end(artifact_dir, tmp_path):
    proc, url = _start_server(artifact_dir, tmp_path)
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            health = json.load(r)
        assert health["ok"]

        with urllib.request.urlopen(url + "/manifest") as r:
            manifest = json.load(r)
        B, N = manifest["batch_size"], manifest["num_cams"]
        H, W = manifest["img_size"]

        rng = np.random.RandomState(0)
        buf = io.BytesIO()
        np.savez(
            buf,
            images=rng.randn(B, N, H, W, 3).astype(np.float32),
            lidar2img=np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        )
        req = urllib.request.Request(
            url + "/infer", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            resp = json.load(r)
        assert len(resp["detections"]) == B
        for det in resp["detections"]:
            assert set(det) == {"bboxes", "scores", "labels"}
            assert len(det["bboxes"]) == len(det["scores"])

        # wrong shape -> 400, server keeps serving
        buf = io.BytesIO()
        np.savez(
            buf,
            images=np.zeros((B, N, H + 1, W, 3), np.float32),
            lidar2img=np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        )
        req = urllib.request.Request(
            url + "/infer", data=buf.getvalue(), method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "shape" in json.load(e)["error"]

        # client bench mode against the live server
        rb = subprocess.run(
            [
                sys.executable,
                os.path.join(TOOLS, "serve.py"),
                "--bench",
                url,
                "--requests",
                "3",
            ],
            env=ENV,
            capture_output=True,
            text=True,
            timeout=240,
        )
        assert rb.returncode == 0, rb.stderr[-2000:]
        stats = json.loads(rb.stdout.strip().splitlines()[-1])
        assert stats["requests"] == 3
        assert stats["p50_ms"] > 0

        with urllib.request.urlopen(url + "/healthz") as r:
            assert json.load(r)["served"] >= 4  # warmup + ok + 3 bench
    finally:
        proc.kill()
        proc.wait()


@pytest.fixture(scope="module")
def extras_artifact_dir(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("serve_extras") / "export")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--tiny",
            "--cfg-options",
            "head.cam_aware=True",
            "--platforms",
            "cpu",
            "--out",
            out_dir,
        ],
        env=ENV,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out_dir


def test_serve_extras_artifact(extras_artifact_dir, tmp_path):
    """cam_aware artifacts require intrinsics/ida_scale per request: a
    request missing them gets a 400 naming the required npz keys (not an
    opaque 500), a malformed lidar2img gets a 400, and a complete
    request serves. Different intrinsics must change the output (the
    extras actually reach DepthNet — they are not baked-in constants)."""
    proc, url = _start_server(extras_artifact_dir, tmp_path)
    try:
        with urllib.request.urlopen(url + "/manifest") as r:
            manifest = json.load(r)
        assert manifest["extras"] == ["intrinsics", "ida_scale"]
        B, N = manifest["batch_size"], manifest["num_cams"]
        H, W = manifest["img_size"]
        rng = np.random.RandomState(0)
        images = rng.randn(B, N, H, W, 3).astype(np.float32)
        l2i = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))

        def post(**arrays):
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            req = urllib.request.Request(
                url + "/infer", data=buf.getvalue(), method="POST"
            )
            with urllib.request.urlopen(req) as r:
                return json.load(r)

        # missing extras -> 400 naming the required keys
        try:
            post(images=images, lidar2img=l2i)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            msg = json.load(e)["error"]
            assert "intrinsics" in msg and "ida_scale" in msg

        # malformed lidar2img -> 400 (not a 500 from inside jax.export)
        intr = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
        intr[..., 0, 0] = intr[..., 1, 1] = 500.0
        ida = np.ones((B, N), np.float32)
        try:
            post(
                images=images,
                lidar2img=l2i[..., :3, :],
                intrinsics=intr,
                ida_scale=ida,
            )
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "lidar2img" in json.load(e)["error"]

        resp = post(
            images=images, lidar2img=l2i, intrinsics=intr, ida_scale=ida
        )
        assert len(resp["detections"]) == B

        intr2 = intr.copy()
        intr2[..., 0, 0] = intr2[..., 1, 1] = 2000.0
        resp2 = post(
            images=images, lidar2img=l2i, intrinsics=intr2, ida_scale=ida
        )
        s1 = [d["scores"] for d in resp["detections"]]
        s2 = [d["scores"] for d in resp2["detections"]]
        assert s1 != s2  # intrinsics reach DepthNet
    finally:
        proc.kill()
        proc.wait()


@pytest.fixture(scope="module")
def streaming_artifact_dir(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("serve_stream") / "export")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--tiny",
            "--streaming",
            "--platforms",
            "cpu",
            "--out",
            out_dir,
        ],
        env=ENV,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out_dir


def test_serve_streaming(streaming_artifact_dir, tmp_path):
    """Streaming serving: /infer_stream caches the previous frame's
    features server-side (first request bootstraps from the new frame),
    /infer still works by encoding both halves, /reset_stream drops the
    cache. The second streamed request must differ from the first (prev
    features now come from the cache, not the duplicated new frame)."""
    proc, url = _start_server(streaming_artifact_dir, tmp_path)
    try:
        with urllib.request.urlopen(url + "/manifest") as r:
            manifest = json.load(r)
        s = manifest["streaming"]
        B, N = manifest["batch_size"], manifest["num_cams"]
        nf = s["num_frame_cams"]
        H, W = manifest["img_size"]
        rng = np.random.RandomState(0)
        l2i = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))

        def post(route, images):
            buf = io.BytesIO()
            np.savez(buf, images=images, lidar2img=l2i)
            req = urllib.request.Request(
                url + route, data=buf.getvalue(), method="POST"
            )
            with urllib.request.urlopen(req) as r:
                return json.load(r)

        frame_a = rng.randn(B, nf, H, W, 3).astype(np.float32)
        frame_b = rng.randn(B, nf, H, W, 3).astype(np.float32)

        # bootstrap: prev := frame_a, so this equals monolithic on
        # images [a | a]
        got_a = post("/infer_stream", frame_a)
        mono_aa = post("/infer", np.concatenate([frame_a, frame_a], 1))
        np.testing.assert_allclose(
            np.asarray(got_a["detections"][0]["bboxes"]),
            np.asarray(mono_aa["detections"][0]["bboxes"]),
            rtol=1e-4,
            atol=1e-4,
        )

        # second frame uses cached frame_a features == monolithic [b | a]
        got_b = post("/infer_stream", frame_b)
        mono_ba = post("/infer", np.concatenate([frame_b, frame_a], 1))
        np.testing.assert_allclose(
            np.asarray(got_b["detections"][0]["bboxes"]),
            np.asarray(mono_ba["detections"][0]["bboxes"]),
            rtol=1e-4,
            atol=1e-4,
        )

        # reset, then frame_b bootstraps fresh == monolithic [b | b]
        req = urllib.request.Request(
            url + "/reset_stream", data=b"", method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["reset"] is True
        got_b2 = post("/infer_stream", frame_b)
        mono_bb = post("/infer", np.concatenate([frame_b, frame_b], 1))
        np.testing.assert_allclose(
            np.asarray(got_b2["detections"][0]["bboxes"]),
            np.asarray(mono_bb["detections"][0]["bboxes"]),
            rtol=1e-4,
            atol=1e-4,
        )
    finally:
        proc.kill()
        proc.wait()


@pytest.fixture(scope="module")
def uint8_artifact_dir(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("serve_u8") / "export")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--tiny",
            "--uint8-input",
            "--platforms",
            "cpu",
            "--out",
            out_dir,
        ],
        env=ENV,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return out_dir


def test_serve_uint8_artifact(uint8_artifact_dir, tmp_path):
    """uint8-ingest serving (export_model.py --uint8-input): raw pixels
    arrive, the artifact normalizes on device (ModelConfig.
    device_normalize) — 4x smaller request payload/h2d than f32. The
    server must warm up and decode requests with the manifest's dtype,
    and the bench client must generate uint8 payloads (and its
    --concurrency pipelining must hold the same contract)."""
    with open(os.path.join(uint8_artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["inputs"]["images"][1] == "uint8"
    assert manifest["img_norm"]["on_device"] is True

    proc, url = _start_server(uint8_artifact_dir, tmp_path)
    try:
        B, N = manifest["batch_size"], manifest["num_cams"]
        H, W = manifest["img_size"]
        rng = np.random.RandomState(0)
        buf = io.BytesIO()
        np.savez(
            buf,
            images=rng.randint(0, 256, (B, N, H, W, 3), np.uint8),
            lidar2img=np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        )
        req = urllib.request.Request(
            url + "/infer", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            resp = json.load(r)
        assert len(resp["detections"]) == B

        # dtype contract: a float payload against a uint8-ingest artifact
        # must be REJECTED (a silent cast would wrap normalized pixels
        # into garbage detections with HTTP 200)
        buf = io.BytesIO()
        np.savez(
            buf,
            images=rng.randn(B, N, H, W, 3).astype(np.float32),
            lidar2img=np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        )
        req = urllib.request.Request(
            url + "/infer", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "dtype" in json.load(ei.value)["error"]

        # bench client: uint8 payload generation + concurrency pipelining
        rb = subprocess.run(
            [
                sys.executable,
                os.path.join(TOOLS, "serve.py"),
                "--bench",
                url,
                "--requests",
                "4",
                "--concurrency",
                "2",
            ],
            env=ENV,
            capture_output=True,
            text=True,
            timeout=240,
        )
        assert rb.returncode == 0, rb.stderr[-2000:]
        stats = json.loads(rb.stdout.strip().splitlines()[-1])
        assert stats["requests"] == 4
        assert stats["concurrency"] == 2
        assert stats["p99_ms"] >= stats["p50_ms"] > 0
        # uint8 payload is ~4x smaller than the f32 equivalent
        f32_mb = B * N * H * W * 3 * 4 / 1e6
        assert stats["payload_mb"] < 0.5 * f32_mb
    finally:
        proc.kill()
        proc.wait()
