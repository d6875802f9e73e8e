"""On-device projection of 3D points into all camera views.

This is the geometric core of graph-structured sampling: N 3D points per
query are pushed through every camera's `lidar2img` and turned into
normalized image-plane locations + validity masks. Behavioral parity with
projects/mmdet3d_plugin/models/utils/deform3d_cross_attn.py:232-258
(homogeneous matmul, eps-guarded depth divide, in-front AND in-image mask).

TPU-first: everything is one batched einsum (MXU) plus elementwise ops that
XLA fuses; masks stay multiplicative float, never boolean gathers.
"""

import jax.numpy as jnp


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of batched (..., 3, 3) matrices.

    jnp.linalg.inv lowers to LU (a sequential scan on TPU, and a LAPACK
    custom call on CPU that is not portable through jax.export). Camera
    intrinsics/extrinsics are tiny, well-conditioned matrices — the
    cofactor formula is exact-ish fp32, fully fuses into the surrounding
    elementwise graph, and keeps exported artifacts free of host custom
    calls (segfaulted serving processes that never import jax's lapack
    registrations).
    """
    m = m.astype(jnp.float32)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def inv4x4(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched (..., 4, 4) matrices via 2x2 minors.

    Same rationale as inv3x3 — lidar2img matrices are K @ [R|t] with a
    [0,0,0,1] bottom row; the 2x2-minor (Laplace) expansion is branch-free,
    vectorizes over all leading batch dims, and avoids LU entirely.
    """
    m = m.astype(jnp.float32)
    a00, a01, a02, a03 = (m[..., 0, j] for j in range(4))
    a10, a11, a12, a13 = (m[..., 1, j] for j in range(4))
    a20, a21, a22, a23 = (m[..., 2, j] for j in range(4))
    a30, a31, a32, a33 = (m[..., 3, j] for j in range(4))

    # 2x2 minors of rows (0,1) and rows (2,3)
    s0 = a00 * a11 - a01 * a10
    s1 = a00 * a12 - a02 * a10
    s2 = a00 * a13 - a03 * a10
    s3 = a01 * a12 - a02 * a11
    s4 = a01 * a13 - a03 * a11
    s5 = a02 * a13 - a03 * a12
    c5 = a22 * a33 - a23 * a32
    c4 = a21 * a33 - a23 * a31
    c3 = a21 * a32 - a22 * a31
    c2 = a20 * a33 - a23 * a30
    c1 = a20 * a32 - a22 * a30
    c0 = a20 * a31 - a21 * a30

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det

    r00 = (a11 * c5 - a12 * c4 + a13 * c3) * inv_det
    r01 = (-a01 * c5 + a02 * c4 - a03 * c3) * inv_det
    r02 = (a31 * s5 - a32 * s4 + a33 * s3) * inv_det
    r03 = (-a21 * s5 + a22 * s4 - a23 * s3) * inv_det
    r10 = (-a10 * c5 + a12 * c2 - a13 * c1) * inv_det
    r11 = (a00 * c5 - a02 * c2 + a03 * c1) * inv_det
    r12 = (-a30 * s5 + a32 * s2 - a33 * s1) * inv_det
    r13 = (a20 * s5 - a22 * s2 + a23 * s1) * inv_det
    r20 = (a10 * c4 - a11 * c2 + a13 * c0) * inv_det
    r21 = (-a00 * c4 + a01 * c2 - a03 * c0) * inv_det
    r22 = (a30 * s4 - a31 * s2 + a33 * s0) * inv_det
    r23 = (-a20 * s4 + a21 * s2 - a23 * s0) * inv_det
    r30 = (-a10 * c3 + a11 * c1 - a12 * c0) * inv_det
    r31 = (a00 * c3 - a01 * c1 + a02 * c0) * inv_det
    r32 = (-a30 * s3 + a31 * s1 - a32 * s0) * inv_det
    r33 = (a20 * s3 - a21 * s1 + a22 * s0) * inv_det

    return jnp.stack(
        [
            jnp.stack([r00, r01, r02, r03], axis=-1),
            jnp.stack([r10, r11, r12, r13], axis=-1),
            jnp.stack([r20, r21, r22, r23], axis=-1),
            jnp.stack([r30, r31, r32, r33], axis=-1),
        ],
        axis=-2,
    )


def denormalize_points(pts01: jnp.ndarray, pc_range) -> jnp.ndarray:
    """[0,1]-normalized 3D points -> metric lidar coords in pc_range."""
    lo = jnp.asarray(pc_range[:3], dtype=pts01.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=pts01.dtype)
    return pts01 * (hi - lo) + lo


def normalize_points(pts: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Metric lidar coords -> [0,1] normalized by pc_range."""
    lo = jnp.asarray(pc_range[:3], dtype=pts.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=pts.dtype)
    return (pts - lo) / (hi - lo)


def project_points_to_cameras(
    points: jnp.ndarray,
    lidar2img: jnp.ndarray,
    img_shape,
    eps: float = 1e-5,
):
    """Project metric 3D points into every camera.

    Reference/test implementation of the projection semantics: the hot
    sampling path in models/attention.py:140-156 inlines the identical
    math (homogeneous matmul, eps depth divide, strict (0,1) mask) in
    its own fused layout — keep the two in sync when changing either
    (tests/test_geometry.py locks this helper; the attention goldens
    lock the inline copy).

    Args:
      points:    (B, P, 3) metric lidar-frame points.
      lidar2img: (B, N, 4, 4) per-camera projection matrices.
      img_shape: (img_h, img_w) static ints — the *network input* image size
                 the projections are normalized by (reference divides by
                 img_metas img_shape, deform3d_cross_attn.py:242-243).

    Returns:
      loc:  (B, N, P, 2) sampling locations normalized to [0, 1] (x, y).
      mask: (B, N, P) float validity — in front of camera AND strictly
            inside (0, 1)^2, matching the reference's strict inequalities
            (deform3d_cross_attn.py:239, 249-252).
    """
    img_h, img_w = img_shape
    B, P, _ = points.shape
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    # (B, N, P, 4) = einsum over the 4-vector: cam_pts = l2i @ p
    cam = jnp.einsum("bnij,bpj->bnpi", lidar2img, hom)
    z = cam[..., 2:3]
    in_front = z > eps
    xy = cam[..., 0:2] / jnp.maximum(z, eps)
    loc = xy / jnp.asarray([img_w, img_h], dtype=xy.dtype)
    valid = (
        in_front
        & (loc[..., 0:1] > 0.0)
        & (loc[..., 0:1] < 1.0)
        & (loc[..., 1:2] > 0.0)
        & (loc[..., 1:2] < 1.0)
    )
    return loc, valid[..., 0].astype(points.dtype)


def points_img2cam(points, cam2img):
    """2.5D image points (u, v, depth) -> 3D camera coordinates
    (core/bbox/util.py points_img2cam:5-35). cam2img may be (3,3)/(3,4)/
    (4,4); padded to 4x4 before inversion."""
    points = jnp.asarray(points, jnp.float32)
    cam2img = jnp.asarray(cam2img, jnp.float32)
    pad = jnp.eye(4, dtype=jnp.float32)
    pad = pad.at[: cam2img.shape[0], : cam2img.shape[1]].set(cam2img)
    xys = points[:, :2]
    depths = points[:, 2:3]
    unnormed = jnp.concatenate([xys * depths, depths], axis=1)
    homo = jnp.concatenate(
        [unnormed, jnp.ones_like(depths)], axis=1
    )
    return (homo @ inv4x4(pad).T)[:, :3]
