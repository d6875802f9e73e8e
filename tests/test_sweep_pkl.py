"""generate_sweep_pkl: walk a synthetic raw nuScenes JSON DB and verify the
produced sweeps layout is exactly what NuScenesSweepDataset consumes."""

import importlib.util
import os
import sys

import numpy as np

spec = importlib.util.spec_from_file_location(
    "generate_sweep_pkl",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "generate_sweep_pkl.py"),
)
gsp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gsp)


def make_db(num_samples=3, num_inter=2):
    """Chain of key samples; between consecutive keys each camera has
    `num_inter` intermediate sample_datas."""
    sample, sample_data, ego_pose = {}, {}, {}
    tokens = [f"s{i}" for i in range(num_samples)]
    sd_counter = 0

    def new_pose(t):
        tok = f"p{t}"
        ego_pose[tok] = {
            "token": tok,
            "timestamp": t,
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "translation": [float(t), 0.0, 0.0],
        }
        return tok

    # per-camera chains
    cam_chains = {c: [] for c in gsp.CAMS}
    for i, tok in enumerate(tokens):
        sample[tok] = {
            "token": tok,
            "prev": tokens[i - 1] if i > 0 else "",
            "next": tokens[i + 1] if i < num_samples - 1 else "",
            "data": {},
        }
    for cam in gsp.CAMS:
        prev_tok = ""
        for i, tok in enumerate(tokens):
            # intermediate (non-key) frames before this key frame
            if i > 0:
                for j in range(num_inter):
                    t = i * 100 - (num_inter - j) * 10
                    sdt = f"sd{sd_counter}"
                    sd_counter += 1
                    sample_data[sdt] = {
                        "token": sdt,
                        "sample_token": tokens[i - 1],
                        "ego_pose_token": new_pose(t * 1000 + sd_counter),
                        "timestamp": t,
                        "is_key_frame": False,
                        "filename": f"sweeps/{cam}/{t}.jpg",
                        "prev": prev_tok,
                        "next": "",
                    }
                    prev_tok = sdt
            t = i * 100
            sdt = f"sd{sd_counter}"
            sd_counter += 1
            sample_data[sdt] = {
                "token": sdt,
                "sample_token": tok,
                "ego_pose_token": new_pose(t * 1000 + sd_counter),
                "timestamp": t,
                "is_key_frame": True,
                "filename": f"samples/{cam}/{t}.jpg",
                "prev": prev_tok,
                "next": "",
            }
            prev_tok = sdt
            sample[tok]["data"][cam] = sdt
            cam_chains[cam].append(sdt)
    return {"sample": sample, "sample_data": sample_data,
            "ego_pose": ego_pose}


def test_build_sweeps_layout_and_counts():
    tables = make_db(num_samples=3, num_inter=2)
    info = {"token": "s2", "timestamp": 200}
    sweeps = gsp.build_sweeps(
        info, tables, "/data", num_prev=2, num_sweep=2
    )
    # 2 prev steps x (2 inter + 1 key) = 6 sweep entries
    assert len(sweeps) == 6
    for sweep in sweeps:
        assert set(sweep.keys()) == set(gsp.CAMS)
        for cam in gsp.CAMS:
            e = sweep[cam]
            # exactly the keys sweep_frame_calib consumes
            for k in (
                "data_path",
                "timestamp",
                "ego2global_rotation",
                "ego2global_translation",
                "is_key_frame",
            ):
                assert k in e, k
            assert e["data_path"].startswith("/data/")
    # entries are strictly older going backwards
    ts = [s[gsp.CAMS[0]]["timestamp"] for s in sweeps]
    assert ts == sorted(ts, reverse=True)
    # the key-frame entries are flagged
    assert sweeps[2][gsp.CAMS[0]]["is_key_frame"]
    assert not sweeps[0][gsp.CAMS[0]]["is_key_frame"]


def test_build_sweeps_first_sample_has_none():
    tables = make_db(num_samples=2, num_inter=1)
    info = {"token": "s0", "timestamp": 0}
    sweeps = gsp.build_sweeps(info, tables, "/d", num_prev=5, num_sweep=5)
    assert sweeps == []


def test_sweeps_feed_dataset_alignment():
    """The generated entry layout composes with sweep_lidar2img."""
    from graph_detr4d_tpu.geometry.transforms import sweep_lidar2img

    tables = make_db()
    info = {"token": "s2", "timestamp": 200}
    sweeps = gsp.build_sweeps(info, tables, "/d", 1, 1)
    s = sweeps[0][gsp.CAMS[0]]
    K = np.eye(3) * 500.0
    K[2, 2] = 1.0
    m = sweep_lidar2img(
        K,
        [1.0, 0.0, 0.0, 0.0],  # sensor2ego rot
        [0.0, 0.0, 0.0],
        s["ego2global_rotation"],
        s["ego2global_translation"],
        [1.0, 0.0, 0.0, 0.0],  # current ego2global rot
        [200.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],  # lidar2ego
        [0.0, 0.0, 0.0],
    )
    assert m.shape == (4, 4)
    assert np.isfinite(m).all()
