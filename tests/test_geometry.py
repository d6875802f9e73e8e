"""Geometry core vs literal numpy oracles of the reference formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_detr4d_tpu.geometry import (
    normalize_bbox,
    denormalize_bbox,
    quaternion_to_rotation_matrix,
    lidar2img_from_calib,
    sweep_cam_to_current_lidar,
    project_points_to_cameras,
)
from graph_detr4d_tpu.geometry.projection import (
    denormalize_points,
    normalize_points,
)

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
RNG = np.random.RandomState(0)


def random_quat(rng):
    q = rng.randn(4)
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------- box codec
def oracle_normalize_bbox(bboxes):
    # literal transcription of core/bbox/util.py:38-58
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = np.log(bboxes[..., 3:4])
    l = np.log(bboxes[..., 4:5])
    h = np.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    out = [cx, cy, w, l, cz, h, np.sin(rot), np.cos(rot)]
    if bboxes.shape[-1] > 7:
        out += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return np.concatenate(out, -1)


def test_normalize_bbox_matches_oracle():
    boxes = RNG.rand(32, 9).astype(np.float32)
    boxes[:, 3:6] += 0.5  # positive sizes
    got = np.asarray(normalize_bbox(jnp.asarray(boxes)))
    np.testing.assert_allclose(
        got, oracle_normalize_bbox(boxes), rtol=1e-3, atol=1e-5
    )


def test_box_codec_roundtrip():
    boxes = RNG.rand(64, 9).astype(np.float32)
    boxes[:, 3:6] += 0.5
    boxes[:, 6] = (boxes[:, 6] - 0.5) * 2 * np.pi * 0.99
    rec = np.asarray(denormalize_bbox(normalize_bbox(jnp.asarray(boxes))))
    np.testing.assert_allclose(rec, boxes, rtol=1e-4, atol=1e-5)


def test_box_codec_7dof():
    boxes = RNG.rand(8, 7).astype(np.float32)
    boxes[:, 3:6] += 0.5
    code = normalize_bbox(jnp.asarray(boxes))
    assert code.shape == (8, 8)
    rec = denormalize_bbox(code)
    assert rec.shape == (8, 7)


# ------------------------------------------------------------- quaternions
def test_quaternion_vs_formula():
    # oracle: the standard wxyz rotation matrix formula (pyquaternion
    # semantics used at loading.py:154-157)
    for _ in range(10):
        w, x, y, z = random_quat(RNG)
        R = quaternion_to_rotation_matrix([w, x, y, z])
        oracle = np.array(
            [
                [
                    1 - 2 * (y * y + z * z),
                    2 * (x * y - w * z),
                    2 * (x * z + w * y),
                ],
                [
                    2 * (x * y + w * z),
                    1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x),
                ],
                [
                    2 * (x * z - w * y),
                    2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y),
                ],
            ]
        )
        np.testing.assert_allclose(R, oracle, atol=1e-10)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)


# ---------------------------------------------------------- lidar2img math
def oracle_lidar2img(intrinsic, s2l_rot, s2l_trans):
    # literal transcription of nuscenes_dataset.py:56-68
    lidar2cam_r = np.linalg.inv(s2l_rot)
    lidar2cam_t = s2l_trans @ lidar2cam_r.T
    lidar2cam_rt = np.eye(4)
    lidar2cam_rt[:3, :3] = lidar2cam_r.T
    lidar2cam_rt[3, :3] = -lidar2cam_t
    viewpad = np.eye(4)
    viewpad[: intrinsic.shape[0], : intrinsic.shape[1]] = intrinsic
    return viewpad @ lidar2cam_rt.T


def test_lidar2img_matches_reference_composition():
    for _ in range(5):
        K = np.array(
            [[1266.4, 0, 816.3], [0, 1266.4, 491.5], [0, 0, 1]]
        ) * RNG.uniform(0.5, 2.0)
        K[2, 2] = 1.0
        R = quaternion_to_rotation_matrix(random_quat(RNG))
        t = RNG.randn(3)
        got = lidar2img_from_calib(K, R, t)
        np.testing.assert_allclose(got, oracle_lidar2img(K, R, t), atol=1e-8)


def oracle_sweep_sensor2lidar(
    l2e_r_s_mat, l2e_t_s, e2g_r_s_mat, e2g_t_s, e2g_r_mat, e2g_t, l2e_r_mat, l2e_t
):
    # literal transcription of loading.py:154-166
    R = (l2e_r_s_mat.T @ e2g_r_s_mat.T) @ (
        np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    )
    T = (l2e_t_s @ e2g_r_s_mat.T + e2g_t_s) @ (
        np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    )
    T -= e2g_t @ (
        np.linalg.inv(e2g_r_mat).T @ np.linalg.inv(l2e_r_mat).T
    ) + l2e_t @ np.linalg.inv(l2e_r_mat).T
    return R.T, T


def test_sweep_alignment_matches_reference():
    for _ in range(5):
        cam2ego_q, e2g_s_q, e2g_c_q, l2e_q = (random_quat(RNG) for _ in range(4))
        cam2ego_t, e2g_s_t, e2g_c_t, l2e_t = (RNG.randn(3) for _ in range(4))
        R, t = sweep_cam_to_current_lidar(
            cam2ego_q, cam2ego_t, e2g_s_q, e2g_s_t, e2g_c_q, e2g_c_t, l2e_q, l2e_t
        )
        R_o, t_o = oracle_sweep_sensor2lidar(
            quaternion_to_rotation_matrix(cam2ego_q),
            cam2ego_t,
            quaternion_to_rotation_matrix(e2g_s_q),
            e2g_s_t,
            quaternion_to_rotation_matrix(e2g_c_q),
            e2g_c_t,
            quaternion_to_rotation_matrix(l2e_q),
            l2e_t,
        )
        np.testing.assert_allclose(R, R_o, atol=1e-9)
        np.testing.assert_allclose(t, t_o, atol=1e-9)


# ---------------------------------------------------------------- projection
def test_point_range_normalization_roundtrip():
    pts = RNG.rand(4, 10, 3).astype(np.float32)
    metric = denormalize_points(jnp.asarray(pts), PC_RANGE)
    back = normalize_points(metric, PC_RANGE)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_projection_oracle():
    """Project random points with a synthetic pinhole rig; check against a
    per-point numpy loop implementing deform3d_cross_attn.py:232-252."""
    B, N, P = 2, 3, 17
    img_h, img_w = 320, 800
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 400.0
    K[0, 2], K[1, 2] = img_w / 2, img_h / 2
    l2i = np.zeros((B, N, 4, 4))
    for b in range(B):
        for n in range(N):
            R = quaternion_to_rotation_matrix(random_quat(RNG))
            t = RNG.randn(3) * 0.5
            ext = np.eye(4)
            ext[:3, :3], ext[:3, 3] = R, t
            l2i[b, n] = K @ ext
    pts = RNG.randn(B, P, 3) * 10

    loc, mask = project_points_to_cameras(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(l2i, jnp.float32),
        (img_h, img_w),
    )
    loc, mask = np.asarray(loc), np.asarray(mask)

    eps = 1e-5
    for b in range(B):
        for n in range(N):
            for p in range(P):
                hom = np.append(pts[b, p], 1.0)
                cam = l2i[b, n] @ hom
                z = cam[2]
                xy = cam[:2] / max(z, eps)
                ref_loc = xy / np.array([img_w, img_h])
                ref_valid = (
                    (z > eps)
                    and (0.0 < ref_loc[0] < 1.0)
                    and (0.0 < ref_loc[1] < 1.0)
                )
                # loc only matters where the point is valid — out-of-view
                # samples get zero attention weight, and their fp32 values
                # are dominated by cancellation error
                if ref_valid:
                    np.testing.assert_allclose(loc[b, n, p], ref_loc, atol=5e-3)
                assert mask[b, n, p] == pytest.approx(float(ref_valid))


def test_closed_form_inverses_match_numpy():
    """inv4x4/inv3x3 (closed-form, no LAPACK custom call — exportable and
    TPU-fusable) must match np.linalg.inv on realistic lidar2img-style
    matrices: K @ [R|t] with large focal lengths, plus random batches."""
    import numpy as np
    from graph_detr4d_tpu.geometry.projection import inv3x3, inv4x4

    rng = np.random.RandomState(0)
    # realistic projective matrices: intrinsics (f~1000) @ rigid transform
    mats = []
    for _ in range(8):
        k = np.eye(4)
        k[0, 0] = rng.uniform(800, 1400)
        k[1, 1] = rng.uniform(800, 1400)
        k[0, 2] = rng.uniform(500, 900)
        k[1, 2] = rng.uniform(200, 500)
        theta = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(theta), np.sin(theta)
        rt = np.eye(4)
        rt[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) @ np.array(
            [[1, 0, 0], [0, 0, -1], [0, 1, 0]]
        )
        rt[:3, 3] = rng.uniform(-2, 2, 3)
        mats.append(k @ rt)
    m4 = np.stack(mats).reshape(2, 4, 4, 4).astype(np.float32)
    got = np.asarray(inv4x4(m4))
    want = np.linalg.inv(m4.astype(np.float64))
    # fp32 closed-form vs fp64 LU; focal~1e3 -> inverse entries ~1e-3
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # and actually inverts: m @ inv(m) == I
    prod = np.einsum("bnij,bnjk->bnik", m4.astype(np.float64), got)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(4), prod.shape), atol=5e-4
    )

    m3 = m4[..., :3, :3]
    got3 = np.asarray(inv3x3(m3))
    want3 = np.linalg.inv(m3.astype(np.float64))
    np.testing.assert_allclose(got3, want3, rtol=2e-4, atol=1e-6)
