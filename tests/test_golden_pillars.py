"""Golden test: the dense pillar pipeline vs a torch HARD-VOXELIZER oracle.

The reference's LiDAR branch voxelizes with mmdet3d's CUDA hard voxelizer
(obj_dgcnn.py:34-47 -> Voxelization): dynamic per-voxel point LISTS, then
PillarFeatureNet augments each point with cluster-mean and voxel-center
offsets, embeds, and max-pools within the voxel, and PointPillarsScatter
writes voxel features into the dense BEV grid. Our TPU formulation
(ops/voxelize.py + models/dgcnn.py PillarEncoder) never builds voxel
lists — it is one dense segment-scatter. The docstring claim
(voxelize.py:15-17) is that a hard voxelizer with unlimited
points-per-voxel is *exactly* this computation; this oracle PROVES it:
it implements the voxel-list formulation literally in torch (python dict
of per-voxel point lists, per-voxel cluster means, per-point embed,
in-voxel max pool, scatter to grid) and must match the dense pipeline
bit-for-bit-ish (fp32 tolerance) including masked and out-of-range point
handling (all three dims — the hard voxelizer bound-checks z too) and
empty-cell zeros.

Fixture notes (round-5 advisor findings): the grid is ASYMMETRIC
(8x4 cells, 16x12 m extents) so an x<->y transpose bug cannot alias to
the same geometry; the z distribution extends past pc_range so the z
bound is actually exercised; emptiness is asserted from geometry (a
cell no live in-range point maps to), not from feature values.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_detr4d_tpu.models.dgcnn import PillarEncoder  # noqa: E402

# asymmetric on purpose: sx = 16/8 = 2.0, sy = 12/4 = 3.0 — an ix/iy or
# sx/sy mix-up between the dense pipeline and the oracle changes cell
# geometry and fails deterministically
PC_RANGE = (-8.0, -6.0, -3.0, 8.0, 6.0, 3.0)
GRID = (8, 4)
C_OUT = 16


def _cell_of(p):
    """Flat cell id of an in-range point under the fixture geometry."""
    H, W = GRID
    sx = (PC_RANGE[3] - PC_RANGE[0]) / H
    sy = (PC_RANGE[4] - PC_RANGE[1]) / W
    ix = int(np.floor((p[0] - PC_RANGE[0]) / sx))
    iy = int(np.floor((p[1] - PC_RANGE[1]) / sy))
    return ix * W + iy


def _in_range(p):
    return (
        PC_RANGE[0] <= p[0] < PC_RANGE[3]
        and PC_RANGE[1] <= p[1] < PC_RANGE[4]
        and PC_RANGE[2] <= p[2] < PC_RANGE[5]
    )


def _hard_voxelize_oracle(points, mask, lin, ln):
    """Literal voxel-list PointPillars forward (unlimited points/voxel).

    points (P, F) float32, mask (P,). Returns (H, W, C_OUT) numpy.
    Bound-checks every dim of PC_RANGE like the mmdet3d hard voxelizer
    (a pillar grid has one z layer: floor((z-z0)/sz) must be 0).
    """
    H, W = GRID
    x0, y0 = PC_RANGE[0], PC_RANGE[1]
    sx = (PC_RANGE[3] - PC_RANGE[0]) / H
    sy = (PC_RANGE[4] - PC_RANGE[1]) / W
    voxels = {}  # flat cell id -> list of point rows
    for p, m in zip(points, mask):
        if m <= 0:
            continue
        ix = int(np.floor((p[0] - x0) / sx))
        iy = int(np.floor((p[1] - y0) / sy))
        if not (0 <= ix < H and 0 <= iy < W):
            continue
        if not (PC_RANGE[2] <= p[2] < PC_RANGE[5]):
            continue
        voxels.setdefault(ix * W + iy, []).append(p)
    bev = np.zeros((H * W, C_OUT), np.float32)
    for cid, pts in voxels.items():
        pts = np.stack(pts)  # (n, F)
        ix, iy = cid // W, cid % W
        cx = x0 + (ix + 0.5) * sx
        cy = y0 + (iy + 0.5) * sy
        cluster = pts[:, :3].mean(axis=0)  # per-VOXEL mean (PFN cluster)
        aug = np.concatenate(
            [
                pts,
                (pts[:, 0] - cx)[:, None],
                (pts[:, 1] - cy)[:, None],
                pts[:, :3] - cluster,  # (dx_m, dy_m, dz_m)
            ],
            axis=1,
        )
        with torch.no_grad():
            f = torch.relu(ln(lin(torch.from_numpy(aug.astype(np.float32)))))
        bev[cid] = f.numpy().max(axis=0)  # in-voxel max pool
    return bev.reshape(H, W, C_OUT)


def _make_points(rng, P=64, F=4):
    pts = rng.uniform(-9.0, 9.0, size=(P, F)).astype(np.float32)  # x/y OOR
    pts[:, 2] = rng.uniform(-5.0, 5.0, size=P)  # z extends PAST (-3, 3)
    # force several points into the SAME pillar to exercise cluster mean +
    # in-voxel max with n > 1 (z pinned in-range so they survive the bound)
    pts[:6, 0] = rng.uniform(1.0, 2.9, size=6)
    pts[:6, 1] = rng.uniform(1.0, 2.9, size=6)
    pts[:6, 2] = rng.uniform(-2.0, 2.0, size=6)
    mask = (rng.uniform(size=P) > 0.2).astype(np.float32)  # some masked
    return pts, mask


def _mapped_oracle_modules(params):
    """torch Linear+LayerNorm carrying the flax PillarEncoder weights."""
    k = np.asarray(params["pfn"]["kernel"])  # (F_aug, C)
    b = np.asarray(params["pfn"]["bias"])
    lin = tnn.Linear(k.shape[0], k.shape[1])
    lin.weight.data = torch.from_numpy(k.T.copy())
    lin.bias.data = torch.from_numpy(b.copy())
    ln = tnn.LayerNorm(k.shape[1], eps=1e-5)
    ln.weight.data = torch.from_numpy(np.asarray(params["pfn_norm"]["scale"]).copy())
    ln.bias.data = torch.from_numpy(np.asarray(params["pfn_norm"]["bias"]).copy())
    return lin, ln


def test_pillar_encoder_matches_hard_voxelizer_oracle():
    rng = np.random.RandomState(0)
    pts, mask = _make_points(rng)
    enc = PillarEncoder(out_channels=C_OUT, pc_range=PC_RANGE, grid_hw=GRID)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    got = np.asarray(
        enc.apply(variables, jnp.asarray(pts[None]), jnp.asarray(mask[None]))
    )[0]
    lin, ln = _mapped_oracle_modules(variables["params"])
    want = _hard_voxelize_oracle(pts, mask, lin, ln)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # fixture must exercise: a z-dropped point whose x/y are in-grid (the
    # z bound is load-bearing), a multi-point pillar, and an empty cell
    live = [
        p for p, m in zip(pts, mask) if m > 0 and _in_range(p)
    ]
    z_dropped = [
        p
        for p, m in zip(pts, mask)
        if m > 0
        and not (PC_RANGE[2] <= p[2] < PC_RANGE[5])
        and PC_RANGE[0] <= p[0] < PC_RANGE[3]
        and PC_RANGE[1] <= p[1] < PC_RANGE[4]
    ]
    assert z_dropped, "no z-out-of-range point with in-grid x/y in fixture"
    assert len({_cell_of(p) for p in pts[:6]}) < 6, "no multi-point pillar"
    # emptiness from GEOMETRY: a cell no live in-range point maps to must
    # be exactly zero in both formulations
    occupied = {_cell_of(p) for p in live}
    empty_cells = set(range(GRID[0] * GRID[1])) - occupied
    assert empty_cells, "fixture has no geometrically empty cell"
    flat_got = got.reshape(-1, C_OUT)
    for cid in empty_cells:
        np.testing.assert_array_equal(flat_got[cid], 0.0)


def test_pillar_encoder_point_order_invariant():
    """Hard voxelizers visit points in storage order; under unlimited
    points/voxel + max pool the result is order-free — the dense pipeline
    must be too (mean + max are the only in-voxel reductions)."""
    rng = np.random.RandomState(1)
    pts, mask = _make_points(rng)
    enc = PillarEncoder(out_channels=C_OUT, pc_range=PC_RANGE, grid_hw=GRID)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    a = np.asarray(
        enc.apply(variables, jnp.asarray(pts[None]), jnp.asarray(mask[None]))
    )
    perm = rng.permutation(len(pts))
    b = np.asarray(
        enc.apply(
            variables, jnp.asarray(pts[perm][None]), jnp.asarray(mask[perm][None])
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pillar_encoder_masked_points_are_inert():
    """Masked points must not perturb ANY pillar (they ride the trash
    cell): flipping a masked point's coordinates changes nothing."""
    rng = np.random.RandomState(2)
    pts, mask = _make_points(rng)
    mask[3] = 0.0
    enc = PillarEncoder(out_channels=C_OUT, pc_range=PC_RANGE, grid_hw=GRID)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    a = np.asarray(
        enc.apply(variables, jnp.asarray(pts[None]), jnp.asarray(mask[None]))
    )
    pts2 = pts.copy()
    pts2[3, :3] = [1.5, 1.5, 0.0]  # move the dead point into a live pillar
    b = np.asarray(
        enc.apply(variables, jnp.asarray(pts2[None]), jnp.asarray(mask[None]))
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_pillar_z_bound_drops_point():
    """A lone point with in-grid x/y but z past pc_range must leave its
    pillar empty (reference hard-voxelizer z bound-check)."""
    enc = PillarEncoder(out_channels=C_OUT, pc_range=PC_RANGE, grid_hw=GRID)
    pts = np.zeros((2, 4), np.float32)
    pts[0] = [-7.5, -5.5, 4.0, 0.3]  # z=4.0 outside (-3, 3) -> dropped
    pts[1] = [5.0, 5.0, 0.0, 0.1]  # a live anchor point elsewhere
    mask = np.ones(2, np.float32)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    out = np.asarray(
        enc.apply(variables, jnp.asarray(pts[None]), jnp.asarray(mask[None]))
    )[0].reshape(-1, C_OUT)
    np.testing.assert_array_equal(out[_cell_of(pts[0])], 0.0)
    assert np.abs(out[_cell_of(pts[1])]).sum() > 0
