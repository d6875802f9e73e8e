"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP launch stack
(tools/dist_train.sh + MMDistributedDataParallel, SURVEY §2.10): a 1-D
`Mesh(('data',))` over ICI, batch sharded on 'data', parameters replicated.
GSPMD inserts the gradient all-reduces; the reference's explicit
`reduce_mean` sync points are recovered automatically because the loss is
written over the *global* batch under jit.

Scaling to multi-slice later is the same code with a larger mesh (DCN axis
prepended); no backend config, the mesh IS the backend.

Beyond the reference's data parallelism, a 2-D `Mesh(('data', 'cam'))`
shards the camera axis (the natural "sequence" axis of this model,
SURVEY §2.10/§5): the conv stack partitions its folded B*N batch over both
axes, and the cross-attention's per-camera gated sum becomes a GSPMD
all-reduce over 'cam' — so the 12-camera backbone/FPN/sampling FLOPs split
across chips even at global batch 1. `constrain()` is the in-model
annotation point; it no-ops when the ambient mesh lacks the named axes, so
the same model code runs single-chip, DP, and DPxCAM unchanged.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    devices: Optional[Sequence] = None, cam: int = 1
) -> Mesh:
    """(data, cam) mesh: len(devices) must be divisible by `cam`."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % cam:
        raise ValueError(f"{len(devices)} devices not divisible by cam={cam}")
    grid = np.asarray(devices).reshape(len(devices) // cam, cam)
    return Mesh(grid, ("data", "cam"))


def constrain(x, *spec_axes):
    """with_sharding_constraint against the ambient mesh (jax.set_mesh),
    dropping any axis name the mesh doesn't have. No-op outside a mesh
    context — model code calls this unconditionally."""
    mesh = jax.sharding.get_abstract_mesh()
    names = set(getattr(mesh, "axis_names", ()) or ())
    if not names:
        return x

    def keep(a):
        if a is None:
            return None
        parts = a if isinstance(a, tuple) else (a,)
        parts = tuple(p for p in parts if p in names)
        if not parts:
            return None
        return parts if len(parts) > 1 else parts[0]

    spec = tuple(keep(a) for a in spec_axes)
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


# batch keys whose second axis is the camera axis (B, N, ...)
_CAM_KEYS = ("images", "lidar2img", "intrinsics", "ida_scale", "depth_factors")


def cast_for_transfer(batch, bf16: bool):
    """Minimize image bytes before the host->device transfer: under a
    bf16 compute config, float images cast to bf16 on host — compute-
    exact, the backbone casts its input to bf16 anyway (grid-mask is a
    0/1 multiply) — HALVING h2d bytes, which dominate train iter time on
    remote-attached TPUs (~36 MB/s tunnel, PROFILE.md). uint8
    (device_normalize raw pixels) already ships at minimum width. The
    ONE shared implementation of this rule — Trainer, the eval CLI, and
    the timing tools all call it."""
    import ml_dtypes

    imgs = batch.get("images")
    if (
        not bf16
        or imgs is None
        or np.asarray(imgs).dtype
        in (np.dtype(ml_dtypes.bfloat16), np.uint8)
    ):
        return batch
    return {**batch, "images": np.asarray(imgs).astype(ml_dtypes.bfloat16)}


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with leading batch axis sharded over the mesh;
    on a (data, cam) mesh, (B, N, ...) arrays also shard their camera
    axis."""
    data_s = NamedSharding(mesh, P(axis))
    cam_s = (
        NamedSharding(mesh, P(axis, "cam"))
        if "cam" in mesh.axis_names
        else data_s
    )

    if getattr(batch.get("images"), "ndim", 0) == 6:
        # (A, B, N, H, W, 3) TTA stack: P('data') would shard the
        # TTA-copy axis, not the batch — misaligned with lidar2img's
        # batch sharding. TTA is a single-host, no-mesh path
        # (tools/test.py gates it); fail loudly instead of mis-sharding.
        raise ValueError(
            "shard_batch cannot shard a TTA image stack (ndim 6); run "
            "--tta-resizes without a device mesh"
        )

    def place(v, s):
        if jax.process_count() > 1:
            # multi-host: each process holds its LOCAL batch shard; the
            # global array is assembled across hosts (single-controller
            # semantics, replaces DistributedSampler + DDP)
            return jax.make_array_from_process_local_data(s, np.asarray(v))
        return jax.device_put(v, s)

    return {
        k: place(
            v,
            cam_s
            if k in _CAM_KEYS and getattr(v, "ndim", 0) >= 2
            else data_s,
        )
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
