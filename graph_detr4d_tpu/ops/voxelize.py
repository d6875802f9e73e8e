"""Pillar voxelization as a dense scatter — TPU-native point-cloud entry.

The reference's LiDAR branch (ObjDGCNN) voxelizes with mmdet3d's CUDA hard
voxelizer (`Voxelization` in obj_dgcnn.py:34-47): dynamic per-voxel point
lists with caps `max_points/max_voxels`. Dynamic voxel lists are hostile to
XLA (data-dependent shapes), so the TPU formulation is the *dense* pillar
scatter used by modern accelerator PointPillars implementations:

  * every point gets a flat BEV cell id (static-shape integer math),
  * per-point features are embedded by an MLP, then reduced into the dense
    (H, W) grid with `jax.ops.segment_max` / `segment_sum` — XLA lowers
    these to a single sorted scatter, fully on-device, differentiable.

Invalid points (padding) are routed to a trash cell one past the grid.
Behavioral equivalence: a hard voxelizer with unlimited points-per-voxel +
max pooling inside the pillar encoder produces exactly this result; the
reference's caps are a GPU memory workaround, not semantics.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def pillar_indices(
    points: jnp.ndarray,  # (P, >=3) xyz + extra features
    mask: jnp.ndarray,  # (P,) validity (0/1)
    pc_range: Sequence[float],
    grid_hw: Tuple[int, int],
):
    """Flat BEV cell id per point; invalid/out-of-range -> trash cell H*W.

    Grid layout matches the reference's BEV convention
    (dgcnn3d_head.py:48-49): x indexes the first grid axis.
    """
    H, W = grid_hw
    x0, y0 = pc_range[0], pc_range[1]
    sx = (pc_range[3] - pc_range[0]) / H
    sy = (pc_range[4] - pc_range[1]) / W
    ix = jnp.floor((points[..., 0] - x0) / sx).astype(jnp.int32)
    iy = jnp.floor((points[..., 1] - y0) / sy).astype(jnp.int32)
    # z bound: the reference's hard voxelizer bound-checks EVERY dim of
    # point_cloud_range (mmdet3d voxelize kernel) — a pillar grid has one
    # z layer, so floor((z - z0)/sz) must be exactly 0, i.e. z0 <= z < z1.
    z_ok = (points[..., 2] >= pc_range[2]) & (points[..., 2] < pc_range[5])
    inb = (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W) & z_ok & (mask > 0)
    flat = jnp.where(inb, ix * W + iy, H * W)
    return flat, inb


def pillar_scatter(
    feats: jnp.ndarray,  # (P, C) per-point features
    cell_ids: jnp.ndarray,  # (P,) flat ids in [0, H*W] (H*W = trash)
    grid_hw: Tuple[int, int],
    reduce: str = "max",
) -> jnp.ndarray:
    """Scatter per-point features into a dense (H, W, C) BEV grid."""
    H, W = grid_hw
    n = H * W + 1
    if reduce == "max":
        out = jax.ops.segment_max(
            feats, cell_ids, num_segments=n, indices_are_sorted=False
        )
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif reduce == "mean":
        s = jax.ops.segment_sum(feats, cell_ids, num_segments=n)
        c = jax.ops.segment_sum(
            jnp.ones((feats.shape[0], 1), feats.dtype), cell_ids, num_segments=n
        )
        out = s / jnp.maximum(c, 1.0)
    else:
        raise ValueError(reduce)
    return out[: H * W].reshape(H, W, feats.shape[-1])


def pillar_center_offsets(
    points: jnp.ndarray,
    cell_ids: jnp.ndarray,
    pc_range: Sequence[float],
    grid_hw: Tuple[int, int],
) -> jnp.ndarray:
    """PointPillars PFN feature augmentation (PillarFeatureNet's
    `_with_cluster_center` + `_with_voxel_center`): offset of each point
    from its pillar's geometric center (dx_c, dy_c) AND from the mean
    xyz of the points sharing its pillar (dx_m, dy_m, dz_m — the
    "cluster" features). The cluster mean is a dense segment-mean over
    the BEV cells followed by a gather back to points — the same sorted
    scatter XLA uses for pillar_scatter, no dynamic voxel lists.
    Returns (P, F + 5) augmented features:
    [points..., dx_c, dy_c, dx_m, dy_m, dz_m]."""
    H, W = grid_hw
    sx = (pc_range[3] - pc_range[0]) / H
    sy = (pc_range[4] - pc_range[1]) / W
    ix = cell_ids // W
    iy = cell_ids % W
    cx = pc_range[0] + (ix.astype(jnp.float32) + 0.5) * sx
    cy = pc_range[1] + (iy.astype(jnp.float32) + 0.5) * sy
    dxc = points[..., 0] - cx
    dyc = points[..., 1] - cy
    # cluster mean: per-cell mean xyz (trash cell H*W absorbs invalid
    # points so they contribute nothing to real pillars)
    n = H * W + 1
    xyz = points[..., :3]
    s = jax.ops.segment_sum(xyz, cell_ids, num_segments=n)
    c = jax.ops.segment_sum(
        jnp.ones((xyz.shape[0], 1), xyz.dtype), cell_ids, num_segments=n
    )
    mean = s / jnp.maximum(c, 1.0)
    dm = xyz - mean[cell_ids]
    return jnp.concatenate(
        [points, dxc[..., None], dyc[..., None], dm], axis=-1
    )
