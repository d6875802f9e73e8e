"""Tool-layer units: conv+BN folding equivalence, BEV PNG writer, storage
client path remapping."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), "..", relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fuse_conv_bn_preserves_outputs():
    """Folding frozen-BN stats into conv kernels leaves the backbone's
    function unchanged (tools/misc/fuse_conv_bn.py fuse_tree)."""
    from graph_detr4d_tpu.models.resnet import ResNet

    fuse = _load("tools/misc/fuse_conv_bn.py", "fuse_conv_bn")
    rng = np.random.RandomState(0)
    net = ResNet(depth=18, use_dcn=False)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    vs = net.init(jax.random.PRNGKey(0), x)
    # randomize the BN stats so folding is non-trivial
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape), jnp.float32
        ),
        vs["batch_stats"],
    )
    vs = {"params": vs["params"], "batch_stats": stats}
    want = net.apply(vs, x)

    import copy

    params = copy.deepcopy(
        jax.tree.map(np.asarray, jax.device_get(vs["params"]))
    )
    bstats = copy.deepcopy(
        jax.tree.map(np.asarray, jax.device_get(vs["batch_stats"]))
    )
    n = fuse.fuse_tree(params, bstats)
    assert n > 10  # every conv+bn pair in r18
    got = net.apply({"params": params, "batch_stats": bstats}, x)
    for a, b in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )


def test_bev_png_writer(tmp_path):
    viz = _load("tools/misc/visualize_results.py", "visualize_results")
    boxes = np.asarray(
        [[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.5, 0.0, 0.0]], np.float32
    )
    img = viz.draw_bev(
        boxes, np.asarray([0]), np.asarray([0.9]),
        [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0], size=128,
    )
    assert img.shape == (128, 128, 3)
    assert img.max() > 0  # something was drawn
    out = os.path.join(tmp_path, "bev.png")
    viz.save_png(out, img)
    # PNG magic + parses back with PIL if available
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    try:
        from PIL import Image

        back = np.asarray(Image.open(out))
        np.testing.assert_array_equal(back, img)
    except ImportError:
        pass


def test_file_client_remap_and_read(tmp_path):
    from graph_detr4d_tpu.data.storage import FileClient

    p = os.path.join(tmp_path, "real", "file.bin")
    os.makedirs(os.path.dirname(p))
    with open(p, "wb") as f:
        f.write(b"hello")
    client = FileClient(
        path_mapping={"./data/nuscenes": os.path.join(tmp_path, "real")}
    )
    assert client.get("./data/nuscenes/file.bin") == b"hello"
    assert client.exists("./data/nuscenes/file.bin")
    assert not client.exists("./data/nuscenes/missing.bin")


def test_eval_cli_pipelined_dataset(tmp_path):
    """tools/test.py end-to-end over a custom6cam fixture: the prefetch
    thread + 2-stage submit/finish pipeline must produce one result per
    sample, in dataset order, with the evaluator fed every sample."""
    import json
    import pickle
    import subprocess

    from PIL import Image

    from graph_detr4d_tpu.data.custom6cam import DEFAULT_CAMS

    rng = np.random.RandomState(0)
    infos = []
    for idx in range(4):
        K = np.eye(3)
        K[0, 0] = K[1, 1] = 500.0
        K[0, 2], K[1, 2] = 400.0, 160.0
        center2lidar = np.eye(4)
        center2lidar[:3, 3] = [1.0, 0.0, -0.5]
        cams = {}
        for i, cam in enumerate(DEFAULT_CAMS):
            img = (rng.rand(64, 128, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f"{idx}_{cam}.jpg")
            Image.fromarray(img).save(p)
            ext = np.eye(4)
            ext[:3, 3] = [0.1 * i, 0.0, 0.0]
            cams[cam] = {
                "timestamp": 1_000_000 + i,
                "data_path": p,
                "cam_intrinsic": K.reshape(-1).tolist(),
                "extrinsic": ext.reshape(-1).tolist(),
            }
        infos.append(
            {
                "timestamp": 1_000_000,
                "center2lidar": center2lidar.reshape(-1).tolist(),
                "cams": cams,
                "gt_boxes": (
                    rng.randn(3, 7).astype(np.float32)
                    * np.array([10, 10, 1, 1, 1, 1, 1], np.float32)
                ),
                "gt_names": ["VEHICLE_CAR", "VEHICLE_TRUCK", "PEDESTRIAN"],
                "sweeps": [],
            }
        )
    ann = str(tmp_path / "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos}, f)

    out_json = str(tmp_path / "results.json")
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools", "test.py"),
            "--tiny",
            "--dataset",
            "custom6cam",
            "--ann-file",
            ann,
            "--max-samples",
            "4",
            "--work-dir",
            str(tmp_path / "wd"),
            "--out",
            out_json,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_json) as f:
        results = json.load(f)["results"]
    assert len(results) == 4
    assert [res["token"] for res in results] == [
        f"sample-{i}" for i in range(4)
    ]


def test_eval_cli_tta(tmp_path):
    """--tta-resizes drives aug_forward feature averaging end-to-end:
    same fixture as the pipelined test, two extra resize copies."""
    import json
    import pickle
    import subprocess

    from PIL import Image

    from graph_detr4d_tpu.data.custom6cam import DEFAULT_CAMS

    rng = np.random.RandomState(1)
    infos = []
    for idx in range(2):
        K = np.eye(3)
        K[0, 0] = K[1, 1] = 500.0
        K[0, 2], K[1, 2] = 400.0, 160.0
        center2lidar = np.eye(4)
        cams = {}
        for i, cam in enumerate(DEFAULT_CAMS):
            img = (rng.rand(64, 128, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f"{idx}_{cam}.jpg")
            Image.fromarray(img).save(p)
            ext = np.eye(4)
            ext[:3, 3] = [0.1 * i, 0.0, 0.0]
            cams[cam] = {
                "timestamp": 1_000_000 + i,
                "data_path": p,
                "cam_intrinsic": K.reshape(-1).tolist(),
                "extrinsic": ext.reshape(-1).tolist(),
            }
        infos.append(
            {
                "timestamp": 1_000_000,
                "center2lidar": center2lidar.reshape(-1).tolist(),
                "cams": cams,
                "gt_boxes": rng.randn(2, 7).astype(np.float32),
                "gt_names": ["VEHICLE_CAR", "PEDESTRIAN"],
                "sweeps": [],
            }
        )
    ann = str(tmp_path / "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos}, f)

    out_json = str(tmp_path / "results.json")
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools", "test.py"),
            "--tiny",
            "--dataset",
            "custom6cam",
            "--ann-file",
            ann,
            "--max-samples",
            "2",
            "--tta-resizes",
            "1.0,0.9,1.1",
            "--work-dir",
            str(tmp_path / "wd"),
            "--out",
            out_json,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_json) as f:
        results = json.load(f)["results"]
    assert len(results) == 2


def test_eval_cli_petrv2_nuscenes_temporal(tmp_path):
    """petrv2 end-to-end through tools/test.py on a nuScenes-style
    fixture: temporal sampling (12 cams from sweeps), mean_time_stamp
    production, BGR caffe normalization, CPFPN neck — the full
    petr-family integration path."""
    import json
    import pickle
    import subprocess

    from PIL import Image

    from graph_detr4d_tpu.data.nuscenes import CAM_ORDER
    from graph_detr4d_tpu.geometry.transforms import (
        quaternion_to_rotation_matrix,
    )

    rng = np.random.RandomState(5)

    def cam_entry(seed, idx):
        r = np.random.RandomState(seed)
        q = r.randn(4)
        q /= np.linalg.norm(q)
        img = (rng.rand(64, 128, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{seed}.jpg")
        Image.fromarray(img).save(p)
        return {
            "data_path": p,
            "cam_intrinsic": np.array(
                [[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]]
            ),
            "sensor2lidar_rotation": quaternion_to_rotation_matrix(q),
            "sensor2lidar_translation": r.randn(3) * 0.1,
            "sensor2ego_rotation": q,
            "sensor2ego_translation": r.randn(3) * 0.1,
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [10.0, 5.0, 0.0],
            "timestamp": 1e15 + seed,
        }

    infos = []
    for i in range(2):
        sweep = {
            cam: {
                **cam_entry(500 + i * 10 + j, j),
                "ego2global_rotation": [1, 0, 0, 0],
                "ego2global_translation": [9.5, 5.0, 0.0],
            }
            for j, cam in enumerate(CAM_ORDER)
        }
        infos.append(
            {
                "token": f"tok{i}",
                "timestamp": 1e15 + i * 5e5,
                "cams": {
                    cam: cam_entry(i * 10 + j, j)
                    for j, cam in enumerate(CAM_ORDER)
                },
                "sweeps": [sweep] * 4,
                "lidar2ego_rotation": [1, 0, 0, 0],
                "lidar2ego_translation": [0.9, 0, 1.8],
                "ego2global_rotation": [1, 0, 0, 0],
                "ego2global_translation": [10.0, 5.0, 0.0],
                "gt_boxes": rng.rand(2, 7).astype(np.float32) + 1,
                "gt_names": np.array(["car", "bus"]),
                "gt_velocity": rng.rand(2, 2).astype(np.float32),
                "valid_flag": np.array([True, True]),
            }
        )
    ann = str(tmp_path / "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "t"}}, f)

    out_json = str(tmp_path / "results.json")
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools", "test.py"),
            "--config",
            "petrv2_res50_gridmask_p4_800x320",
            "--cfg-options",
            "img_size=(64,128)",
            "head.num_query=24",
            "head.embed_dims=64",
            "head.ffn_dims=128",
            "head.num_decoder_layers=2",
            "head.depth_num=8",
            "head.pe_num_feats=32",
            "backbone.depth=18",
            "backbone.use_dcn=False",
            "coder.max_num=16",
            "bf16=False",
            "--ann-file",
            ann,
            "--max-samples",
            "2",
            "--work-dir",
            str(tmp_path / "wd"),
            "--out",
            out_json,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_json) as f:
        results = json.load(f)["results"]
    assert len(results) == 2


def _parity_fixture(tmp_path):
    """Synthetic nuScenes-style infos pkl + tiny reference-layout .pth
    for the parity_run dry-run tests. Returns (ann_path, pth_path)."""
    import pickle

    import torch
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.nuscenes import CAM_ORDER
    from graph_detr4d_tpu.geometry.transforms import (
        quaternion_to_rotation_matrix,
    )
    from tools.convert_checkpoint import export_state_dict

    rng = np.random.RandomState(7)

    def cam_entry(seed):
        r = np.random.RandomState(seed)
        q = r.randn(4)
        q /= np.linalg.norm(q)
        img = (rng.rand(64, 128, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{seed}.jpg")
        Image.fromarray(img).save(p)
        return {
            "data_path": p,
            "cam_intrinsic": np.array(
                [[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]]
            ),
            "sensor2lidar_rotation": quaternion_to_rotation_matrix(q),
            "sensor2lidar_translation": r.randn(3) * 0.1,
            "sensor2ego_rotation": q,
            "sensor2ego_translation": r.randn(3) * 0.1,
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [10.0, 5.0, 0.0],
            "timestamp": 1e15 + seed,
        }

    infos = []
    for i in range(2):
        infos.append(
            {
                "token": f"tok{i}",
                "timestamp": 1e15 + i * 5e5,
                "cams": {
                    cam: cam_entry(i * 10 + j)
                    for j, cam in enumerate(CAM_ORDER)
                },
                "sweeps": [],
                "lidar2ego_rotation": [1, 0, 0, 0],
                "lidar2ego_translation": [0.9, 0, 1.8],
                "ego2global_rotation": [1, 0, 0, 0],
                "ego2global_translation": [10.0, 5.0, 0.0],
                "gt_boxes": rng.rand(2, 7).astype(np.float32) + 1,
                "gt_names": np.array(["car", "bus"]),
                "gt_velocity": rng.rand(2, 2).astype(np.float32),
                "valid_flag": np.array([True, True]),
            }
        )
    ann = str(tmp_path / "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "t"}}, f)

    # tiny .pth in the reference layout via the golden-locked exporter
    cfg = tiny_test_config()
    model = GraphDETR4D(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, cfg.head.num_cams, *cfg.img_size, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, cfg.head.num_cams, 4, 4)),
    )
    sd = export_state_dict(
        jax.tree.map(np.asarray, dict(variables)),
        cfg.head.num_decoder_layers,
        cfg.head.num_heads,
    )
    pth = str(tmp_path / "epoch_1.pth")
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        pth,
    )
    return ann, pth


def test_parity_run_dry_run(tmp_path):
    """tools/parity_run.py end-to-end on synthetic assets: a tiny
    exported .pth -> convert -> tools/test.py eval over a nuScenes-style
    fixture -> baseline comparison JSON. Proves the one-command parity
    harness before real checkpoints/data exist."""
    import json
    import subprocess

    ann, pth = _parity_fixture(tmp_path)
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "tools", "parity_run.py"
            ),
            "--pth", pth,
            "--ann-file", ann,
            "--tiny",
            "--max-samples", "2",
            "--work-dir", str(tmp_path / "wd"),
            "--baseline-map", "0.0",
            "--baseline-nds", "0.0",
            "--extra-test-args=--no-temporal",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"mAP", "NDS", "delta_mAP", "delta_NDS"} <= set(verdict)
    assert verdict["delta_mAP"] == verdict["mAP"]  # baseline 0


def test_parity_run_dry_run_tta(tmp_path):
    """The flagship parity target is a *testaug* config: --tta-resizes
    must ride through parity_run into tools/test.py's aug_forward
    feature-averaging path (ref models/detectors/detr3d.py:191-216), so
    the one-command parity measures the protocol the config names."""
    import json
    import subprocess

    ann, pth = _parity_fixture(tmp_path)
    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "tools", "parity_run.py"
            ),
            "--pth", pth,
            "--ann-file", ann,
            "--tiny",
            "--max-samples", "1",
            "--tta-resizes", "1.0,0.9",
            "--work-dir", str(tmp_path / "wd"),
            "--baseline-map", "0.0",
            "--baseline-nds", "0.0",
            "--extra-test-args=--no-temporal",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    # the eval command parity_run launched must carry the flag through
    assert "--tta-resizes 1.0,0.9" in r.stdout, r.stdout[-1500:]
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"mAP", "NDS", "delta_mAP", "delta_NDS"} <= set(verdict)


def _tools(name):
    return os.path.join(os.path.dirname(__file__), "..", "tools", name)


def test_cli_chain_train_checkpoint_test(tmp_path):
    """The reference's canonical loop — `tools/train.py CFG` then
    `tools/test.py CFG CKPT --eval bbox` (ref tools/train.py:246,
    tools/test.py:195-243) — rehearsed through the ACTUAL CLIs: train a
    tiny config a few synthetic steps to an orbax checkpoint, then load
    that checkpoint through tools/test.py to metrics. Exercises the
    integration seam the unit tests skip: param-tree layout, checkpoint
    dir contract (work_dir/checkpoints), config plumbing."""
    import json
    import subprocess

    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    wd = str(tmp_path / "wd")
    r = subprocess.run(
        [
            sys.executable, _tools("train.py"),
            "--tiny", "--synthetic",
            "--total-steps", "3",
            "--work-dir", wd,
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    ckpt = os.path.join(wd, "checkpoints")
    # the trainer's final save must leave a restorable step
    assert os.path.isdir(ckpt) and os.listdir(ckpt), ckpt

    out_json = str(tmp_path / "results.json")
    r2 = subprocess.run(
        [
            sys.executable, _tools("test.py"),
            "--tiny", "--synthetic",
            "--checkpoint", ckpt,
            "--max-samples", "2",
            "--work-dir", str(tmp_path / "wd_eval"),
            "--out", out_json,
        ],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r2.returncode == 0, (r2.stdout[-1500:], r2.stderr[-1500:])
    # the load must actually happen (silent params=None would skip this)
    assert "loaded weights from" in r2.stdout, r2.stdout[-1500:]
    with open(out_json) as f:
        payload = json.load(f)
    assert len(payload["results"]) == 2
    assert "mAP" in payload["metrics"]


def test_cli_chain_distill_train_to_distill_test(tmp_path):
    """Same seam for the distillation mode (ref
    apis/mmdet_distill_train.py:37-174 then tools/test.py on the
    student): distill_train saves student weights to
    work_dir/checkpoints; distill_test must load them and evaluate."""
    import subprocess

    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    wd = str(tmp_path / "wd")
    r = subprocess.run(
        [
            sys.executable, _tools("distill_train.py"),
            "--tiny", "--synthetic",
            "--steps", "2",
            "--work-dir", wd,
        ],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    ckpt = os.path.join(wd, "checkpoints")
    assert os.path.isdir(ckpt) and os.listdir(ckpt), ckpt

    r2 = subprocess.run(
        [
            sys.executable, _tools("distill_test.py"),
            "--tiny",
            "--checkpoint", ckpt,
            "--max-samples", "2",
        ],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r2.returncode == 0, (r2.stdout[-1500:], r2.stderr[-1500:])
    assert "loaded student weights from" in r2.stdout, r2.stdout[-1500:]
    assert "mAP" in r2.stdout


def test_distill_split_teacher_matches_inline():
    """--split-teacher runs the frozen teacher as its own executable;
    the step-1 losses must match the inline double-program (the teacher
    outputs are stop-gradient constants, so the split is mathematically
    identity — this locks that invariant through the CLI seam)."""
    import json as _json
    import subprocess

    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")

    def run(split, wd):
        cmd = [
            sys.executable, _tools("distill_train.py"),
            "--tiny", "--synthetic",
            "--steps", "1",
            "--seed", "3",
            "--work-dir", wd,
        ]
        if split:
            cmd.append("--split-teacher")
        r = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=560
        )
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
        with open(os.path.join(wd, "distill_log.jsonl")) as f:
            return _json.loads(f.readline())

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        inline = run(False, os.path.join(td, "inline"))
        split = run(True, os.path.join(td, "split"))
    for k in ("loss", "distill_loss_cls", "distill_loss_reg"):
        assert abs(inline[k] - split[k]) <= 1e-3 * (1 + abs(inline[k])), (
            k, inline[k], split[k],
        )


def test_distill_data_parallel_cli(tmp_path):
    """--data-parallel N shards the distill batch over a 1-D mesh with
    GSPMD grad all-reduce — the TPU-native form of the reference distill
    runner's DDP wrap (apis/mmdet_distill_train.py:74-82). Runs the full
    CLI on the 8-device virtual CPU mesh, combined with --split-teacher
    (the sharded two-program path)."""
    import json as _json
    import subprocess

    env = dict(
        os.environ,
        GRD4D_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    wd = str(tmp_path / "dp")
    r = subprocess.run(
        [
            sys.executable, _tools("distill_train.py"),
            "--tiny", "--synthetic",
            "--steps", "1",
            "--data-parallel", "8",
            "--split-teacher",
            "--work-dir", wd,
        ],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    with open(os.path.join(wd, "distill_log.jsonl")) as f:
        rec = _json.loads(f.readline())
    import math

    assert math.isfinite(rec["loss"]), rec
    ckpt = os.path.join(wd, "checkpoints")
    assert os.path.isdir(ckpt) and os.listdir(ckpt), ckpt


def test_misc_cli_smokes(tmp_path):
    """The small analysis CLIs run end-to-end: print_config --list and
    --config, get_flops --tiny (XLA cost analysis), analyze_logs
    cal_train_time on a synthetic train_log.jsonl (reference:
    tools/misc/print_config.py, tools/analysis_tools/get_flops.py,
    analyze_logs.py cal_train_time)."""
    import json as _json
    import subprocess

    env = dict(os.environ, GRD4D_PLATFORM="cpu", JAX_PLATFORMS="cpu")

    r = subprocess.run(
        [sys.executable, _tools("misc/print_config.py"), "--list"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0 and "detr4d_res50_deform_pe_testaug_2subset_12e" in r.stdout

    r = subprocess.run(
        [
            sys.executable, _tools("misc/print_config.py"),
            "--config", "detr3d_res50",
            "--cfg-options", "head.num_query=60",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0 and '"num_query":60' in r.stdout.replace(
        " ", ""
    )

    r = subprocess.run(
        [sys.executable, _tools("get_flops.py"), "--tiny"],
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    assert "flops" in r.stdout.lower()

    log = tmp_path / "train_log.jsonl"
    with open(log, "w") as f:
        for i in range(5):
            f.write(_json.dumps({"step": i, "loss": 3.0 - i * 0.1,
                                 "iter_time": 0.5 + 0.01 * i}) + "\n")
    r = subprocess.run(
        [sys.executable, _tools("analyze_logs.py"), "cal_train_time",
         str(log)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    assert "iter" in r.stdout.lower()
