"""Host-side (numpy) camera calibration composition.

These run in the input pipeline on CPU — they produce the dense
`lidar2img (N, 4, 4)` tensors the on-device model consumes. Behavioral
parity targets:

  * `lidar2img_from_calib` — the current-frame composition at
    projects/mmdet3d_plugin/datasets/nuscenes_dataset.py:56-68
    (lidar2img = viewpad @ lidar2cam_rt.T).
  * `sweep_cam_to_current_lidar` — the temporal ego-motion alignment at
    projects/mmdet3d_plugin/datasets/pipelines/loading.py:136-183, which
    chains sweep-ego2global / current-ego2global / lidar2ego quaternions
    into a sweep-camera -> current-lidar extrinsic.

We derive the same matrices from clean rigid-transform composition instead
of the reference's transposed-row gymnastics; tests check equality against
a literal numpy oracle of the reference formulas.
"""

import numpy as np


def quaternion_to_rotation_matrix(q) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> 3x3 rotation matrix (numpy)."""
    w, x, y, z = np.asarray(q, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    if n < 1e-12:
        return np.eye(3)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def _rt(R: np.ndarray, t) -> np.ndarray:
    """4x4 homogeneous transform from rotation R and translation t
    (column-vector convention: p' = R @ p + t)."""
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = np.asarray(t, dtype=np.float64)
    return m


def lidar2img_from_calib(
    cam_intrinsic,
    sensor2lidar_rotation,
    sensor2lidar_translation,
) -> np.ndarray:
    """Compose the 4x4 lidar -> image projection for one camera.

    Args:
      cam_intrinsic: (3, 3) camera matrix K.
      sensor2lidar_rotation: (3, 3) camera->lidar rotation.
      sensor2lidar_translation: (3,) camera->lidar translation.

    Returns (4, 4) float64 matrix P with x_img_hom = P @ x_lidar_hom;
    matches viewpad @ lidar2cam_rt.T of nuscenes_dataset.py:56-68.
    """
    R_cl = np.asarray(sensor2lidar_rotation, dtype=np.float64)
    t_cl = np.asarray(sensor2lidar_translation, dtype=np.float64)
    # lidar -> cam is the inverse rigid transform.
    lidar2cam = _rt(R_cl.T, -R_cl.T @ t_cl)
    viewpad = np.eye(4)
    K = np.asarray(cam_intrinsic, dtype=np.float64)
    viewpad[: K.shape[0], : K.shape[1]] = K
    return viewpad @ lidar2cam


def sweep_cam_to_current_lidar(
    cam2ego_rotation,
    cam2ego_translation,
    sweep_ego2global_rotation,
    sweep_ego2global_translation,
    cur_ego2global_rotation,
    cur_ego2global_translation,
    lidar2ego_rotation,
    lidar2ego_translation,
):
    """Sweep-camera -> current-frame-lidar rigid transform (R, t).

    cam2ego is the (time-invariant, rigidly mounted) camera->ego extrinsic;
    the two ego2global poses realise the ego-motion alignment:

      cam->lidar_cur = (lidar2ego)^-1 (ego2global_cur)^-1
                       ego2global_sweep  cam2ego

    Quaternions are (w, x, y, z). Returns (R (3,3), t (3,)) with
    p_lidar = R @ p_cam + t, numerically equal to the reference's
    sensor2lidar_rotation/translation (loading.py:154-166).
    """
    cam2ego = _rt(quaternion_to_rotation_matrix(cam2ego_rotation), cam2ego_translation)
    e2g_s = _rt(
        quaternion_to_rotation_matrix(sweep_ego2global_rotation),
        sweep_ego2global_translation,
    )
    e2g_c = _rt(
        quaternion_to_rotation_matrix(cur_ego2global_rotation),
        cur_ego2global_translation,
    )
    l2e = _rt(quaternion_to_rotation_matrix(lidar2ego_rotation), lidar2ego_translation)
    m = np.linalg.inv(l2e) @ np.linalg.inv(e2g_c) @ e2g_s @ cam2ego
    return m[:3, :3], m[:3, 3]


def sweep_lidar2img(
    cam_intrinsic,
    cam2ego_rotation,
    cam2ego_translation,
    sweep_ego2global_rotation,
    sweep_ego2global_translation,
    cur_ego2global_rotation,
    cur_ego2global_translation,
    lidar2ego_rotation,
    lidar2ego_translation,
) -> np.ndarray:
    """Full 4x4 current-lidar -> sweep-image projection (loading.py:168-183)."""
    R, t = sweep_cam_to_current_lidar(
        cam2ego_rotation,
        cam2ego_translation,
        sweep_ego2global_rotation,
        sweep_ego2global_translation,
        cur_ego2global_rotation,
        cur_ego2global_translation,
        lidar2ego_rotation,
        lidar2ego_translation,
    )
    return lidar2img_from_calib(cam_intrinsic, R, t)


def quat_multiply(q1, q2) -> np.ndarray:
    """Hamilton product of (w, x, y, z) quaternions."""
    w1, x1, y1, z1 = np.asarray(q1, np.float64)
    w2, x2, y2, z2 = np.asarray(q2, np.float64)
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_inverse(q) -> np.ndarray:
    """Inverse of a unit (w, x, y, z) quaternion (= conjugate)."""
    w, x, y, z = np.asarray(q, np.float64)
    n = w * w + x * x + y * y + z * z
    return np.array([w, -x, -y, -z]) / n


def quat_yaw(q) -> float:
    """Yaw (rotation about +z) of a (w, x, y, z) quaternion — the
    yaw_pitch_roll[0] the devkit Box exposes."""
    w, x, y, z = np.asarray(q, np.float64)
    return float(np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)))
