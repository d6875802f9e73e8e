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
    return (homo @ jnp.linalg.inv(pad).T)[:, :3]
