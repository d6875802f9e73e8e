"""tools/create_data.py: raw-JSON nuScenes converter vs hand-computed
geometry, and integration with the dataset reader."""

import importlib.util
import json
import os
import pickle

import numpy as np

spec = importlib.util.spec_from_file_location(
    "create_data",
    os.path.join(os.path.dirname(__file__), "..", "tools", "create_data.py"),
)
cd = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cd)


def q_from_yaw(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


def make_raw_db(tmp_path, ego_yaw=0.5, ego_t=(10.0, 5.0, 0.0)):
    version = "v1.0-mini"
    root = os.path.join(tmp_path, "nusc")
    os.makedirs(os.path.join(root, version))

    K = [[500.0, 0, 320.0], [0, 500.0, 180.0], [0, 0, 1.0]]
    cs_lidar = {
        "token": "cs_lidar",
        "translation": [0.9, 0.0, 1.8],
        "rotation": q_from_yaw(0.0),
        "camera_intrinsic": [],
    }
    cs_cams = [
        {
            "token": f"cs_cam{i}",
            "translation": [1.5, 0.1 * i, 1.5],
            "rotation": q_from_yaw(0.1 * i),
            "camera_intrinsic": K,
        }
        for i in range(6)
    ]
    pose = {
        "token": "pose0",
        "timestamp": 1000000,
        "rotation": q_from_yaw(ego_yaw),
        "translation": list(ego_t),
    }
    sample_data = [
        {
            "token": "sd_lidar",
            "sample_token": "s0",
            "ego_pose_token": "pose0",
            "calibrated_sensor_token": "cs_lidar",
            "timestamp": 1000000,
            "is_key_frame": True,
            "filename": "samples/LIDAR_TOP/x.bin",
            "channel": "LIDAR_TOP",
            "prev": "",
            "next": "",
        }
    ]
    data = {"LIDAR_TOP": "sd_lidar"}
    for i, cam in enumerate(cd.CAMERA_TYPES):
        tok = f"sd_{cam}"
        sample_data.append(
            {
                "token": tok,
                "sample_token": "s0",
                "ego_pose_token": "pose0",
                "calibrated_sensor_token": f"cs_cam{i}",
                "timestamp": 1000000 + i,
                "is_key_frame": True,
                "filename": f"samples/{cam}/x.jpg",
                "channel": cam,
                "prev": "",
                "next": "",
            }
        )
        data[cam] = tok

    # one car annotation 20m ahead of the ego in global frame, moving +x
    ego_R = np.array(
        [
            [np.cos(ego_yaw), -np.sin(ego_yaw), 0],
            [np.sin(ego_yaw), np.cos(ego_yaw), 0],
            [0, 0, 1],
        ]
    )
    box_in_lidar = np.array([20.0, 3.0, 0.0])
    box_global = ego_R @ (box_in_lidar + [0.9, 0.0, 1.8]) + np.asarray(ego_t)
    ann = {
        "token": "a0",
        "sample_token": "s0",
        "instance_token": "i0",
        "translation": box_global.tolist(),
        "size": [2.0, 4.5, 1.6],
        "rotation": q_from_yaw(ego_yaw + 0.3),  # yaw 0.3 in lidar frame
        "num_lidar_pts": 10,
        "num_radar_pts": 2,
        "attribute_tokens": ["at0"],
        "prev": "",
        "next": "",
    }
    tables = {
        "sample": [
            {
                "token": "s0",
                "timestamp": 1000000,
                "prev": "",
                "next": "",
                "scene_token": "sc0",
                "data": data,
                "anns": ["a0"],
            }
        ],
        "sample_data": sample_data,
        "ego_pose": [pose],
        "calibrated_sensor": [cs_lidar] + cs_cams,
        "sample_annotation": [ann],
        "instance": [{"token": "i0", "category_token": "c0"}],
        "category": [{"token": "c0", "name": "vehicle.car"}],
        "scene": [{"token": "sc0", "name": "scene-0001"}],
        "attribute": [{"token": "at0", "name": "vehicle.moving"}],
    }
    for name, rows in tables.items():
        with open(os.path.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root, version


def test_build_info_geometry(tmp_path):
    root, version = make_raw_db(tmp_path)
    tables = cd.load_tables(
        root,
        version,
        (
            "sample",
            "sample_data",
            "ego_pose",
            "calibrated_sensor",
            "sample_annotation",
            "instance",
            "category",
            "scene",
            "attribute",
        ),
    )
    sample = list(tables["sample"].values())[0]
    info = cd.build_info(sample, tables, root)

    # box lands at its known lidar-frame position
    np.testing.assert_allclose(
        info["gt_boxes"][0, :3], [20.0, 3.0, 0.0], atol=1e-9
    )
    # SECOND yaw convention: -yaw - pi/2
    np.testing.assert_allclose(
        info["gt_boxes"][0, 6], -0.3 - np.pi / 2, atol=1e-9
    )
    assert info["gt_names"][0] == "car"
    assert info["gt_attrs"][0] == "vehicle.moving"
    assert bool(info["valid_flag"][0])
    # no prev/next annotation -> nan velocity zeroed
    np.testing.assert_allclose(info["gt_velocity"][0], [0.0, 0.0])

    # cams: sensor2lidar composes to sensor2ego relative to lidar2ego
    cam0 = info["cams"]["CAM_FRONT"]
    # with lidar2ego rotation identity: sensor2lidar_t = s2e_t - l2e_t
    np.testing.assert_allclose(
        cam0["sensor2lidar_translation"],
        np.asarray([1.5, 0.0, 1.5]) - np.asarray([0.9, 0.0, 1.8]),
        atol=1e-9,
    )

    # integration: the info feeds the dataset reader's calib path
    from graph_detr4d_tpu.data.nuscenes import NuScenesSweepDataset

    p = os.path.join(tmp_path, "infos.pkl")
    with open(p, "wb") as f:
        pickle.dump({"infos": [info]}, f)
    ds = NuScenesSweepDataset(p, max_gt=8)
    paths, mats = ds.current_frame_calib(ds.infos[0])
    assert len(paths) == 6 and mats.shape == (6, 4, 4)
    assert np.isfinite(mats).all()


def test_ann_velocity_differentiation(tmp_path):
    root, version = make_raw_db(tmp_path)
    tables = cd.load_tables(
        root, version,
        ("sample", "sample_data", "ego_pose", "calibrated_sensor",
         "sample_annotation", "instance", "category", "scene"),
    )
    # add prev/next annotations 0.5s apart, moving 1 m in x per 0.5 s
    sa = tables["sample_annotation"]
    smp = tables["sample"]
    base = sa["a0"]
    smp["s_prev"] = dict(smp["s0"], token="s_prev", timestamp=500000)
    smp["s_next"] = dict(smp["s0"], token="s_next", timestamp=1500000)
    sa["a_prev"] = dict(
        base,
        token="a_prev",
        sample_token="s_prev",
        translation=(np.asarray(base["translation"]) - [1, 0, 0]).tolist(),
        prev="",
        next="a0",
    )
    sa["a_next"] = dict(
        base,
        token="a_next",
        sample_token="s_next",
        translation=(np.asarray(base["translation"]) + [1, 0, 0]).tolist(),
        prev="a0",
        next="",
    )
    ann = dict(base, prev="a_prev", next="a_next")
    v = cd.ann_velocity(ann, tables)
    np.testing.assert_allclose(v, [2.0, 0.0], atol=1e-9)  # 2 m over 1 s
