"""AOT serving export (tools/export_model.py): the serialized StableHLO
artifact must reproduce direct inference bit-for-bit-ish and be runnable
from the manifest alone (serving-side path, no model code)."""

import json
import os
import subprocess
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.core.coder import decode_batch
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.models import GraphDETR4D

    cfg = tiny_test_config()
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=1)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)

    def infer(images, lidar2img):
        out = model.apply(variables, images, lidar2img)
        det = decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
        )
        return {"bboxes": det.bboxes, "scores": det.scores, "valid": det.valid}

    exp = export.export(jax.jit(infer))(
        jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        jax.ShapeDtypeStruct(l2i.shape, l2i.dtype),
    )
    blob = exp.serialize()
    assert len(blob) > 1000

    got = export.deserialize(blob).call(imgs, l2i)
    want = jax.jit(infer)(imgs, l2i)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-5, atol=2e-5
        )


def test_export_cli_and_run(tmp_path):
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "export")
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
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verify: deserialized artifact matches" in r.stdout
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["outputs"] == ["bboxes", "scores", "labels", "valid"]
    # the artifact records which kernel variants it was traced with
    # (config-driven; an int8-DCN export differs numerically)
    assert manifest["kernel_variants"] == {
        "dcn_gather": "shift4",
        "msda_impl": "shift4h",
        "msda_late_proj": False,
        "stem_s2d": False,
    }

    r2 = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--run",
            out_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    line = json.loads(r2.stdout.strip().splitlines()[-1])
    assert line["artifact"] == out_dir


def test_export_extras_cli(tmp_path):
    """Configs that need serving-time extras (cam_aware -> intrinsics +
    ida_scale, scale_pred -> depth_factors) must export them as artifact
    inputs — a (images, lidar2img)-only signature would silently run
    DepthNet with identity intrinsics (models/head.py fallback). The
    --run smoke path feeds them from the manifest."""
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "export_extras")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--tiny",
            "--cfg-options",
            "head.cam_aware=True",
            "head.scale_pred=True",
            "--platforms",
            "cpu",
            "--out",
            out_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verify: deserialized artifact matches" in r.stdout
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["extras"] == ["intrinsics", "ida_scale", "depth_factors"]
    B, N = manifest["batch_size"], manifest["num_cams"]
    assert manifest["inputs"]["intrinsics"][0] == [B, N, 4, 4]
    assert manifest["inputs"]["ida_scale"][0] == [B, N]
    assert manifest["inputs"]["depth_factors"][0] == [B]

    r2 = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--run",
            out_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    line = json.loads(r2.stdout.strip().splitlines()[-1])
    assert line["artifact"] == out_dir


def test_export_streaming_cli(tmp_path):
    """--streaming exports encode+head programs whose composition the
    CLI itself verifies against monolithic inference (printed marker);
    the manifest carries the feature-cache contract for the server."""
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "stream_export")
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
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "streaming encode+head composition matches" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "encode.jaxexport"))
    assert os.path.exists(os.path.join(out_dir, "head.jaxexport"))
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    s = manifest["streaming"]
    assert s["num_frame_cams"] * 2 == manifest["num_cams"]
    assert len(s["feat_keys"]) == len(s["feat_shapes"])
    # per-level feature shapes carry num_frame_cams on the camera axis
    assert all(fs[1] == s["num_frame_cams"] for fs in s["feat_shapes"])

    # --run must smoke streaming artifacts too (encode+head composition),
    # not crash on the missing model.jaxexport
    r2 = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "export_model.py"),
            "--run",
            out_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    line = json.loads(r2.stdout.strip().splitlines()[-1])
    assert line["streaming"] is True
