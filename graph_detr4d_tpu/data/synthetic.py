"""Synthetic nuScenes-like batches for tests and benchmarking.

Builds a plausible 6/12-camera surround rig (nuScenes-like intrinsics and
yaw-distributed extrinsics) plus random GT boxes inside pc_range, shaped
exactly like the real input pipeline's output. This is the CPU-test
"fake backend" recommended by SURVEY §4 — no nuScenes download needed.
"""

from typing import Tuple

import numpy as np

from ..config import ModelConfig
from ..geometry.transforms import lidar2img_from_calib


def synthetic_camera_rig(
    num_cams: int, img_hw: Tuple[int, int], seed: int = 0
) -> np.ndarray:
    """(N, 4, 4) lidar2img for a surround rig; temporal mode (N=12) reuses
    the first 6 poses with a small ego-motion perturbation."""
    rng = np.random.RandomState(seed)
    H, W = img_hw
    base = min(6, num_cams)
    mats = []
    for n in range(num_cams):
        slot = n % base
        yaw = 2 * np.pi * slot / base
        cos, sin = np.cos(yaw), np.sin(yaw)
        # camera forward axis = lidar direction (cos, sin, 0)
        R_yaw = np.array([[cos, -sin, 0], [sin, cos, 0], [0, 0, 1]])
        # cam coords: x right, y down, z forward
        cam_axes = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        R_cl = (cam_axes @ R_yaw.T).T  # cam->lidar rotation
        t_cl = R_yaw @ np.array([1.5, 0.0, 1.6])
        if n >= base:  # "previous frame": ego moved ~2m forward
            t_cl = t_cl + np.array([-2.0, 0.0, 0.0]) + rng.randn(3) * 0.05
        K = np.array(
            [
                [0.65 * W, 0.0, W / 2],
                [0.0, 0.65 * W, H / 2],
                [0.0, 0.0, 1.0],
            ]
        )
        mats.append(lidar2img_from_calib(K, R_cl, t_cl))
    return np.asarray(mats, np.float32)


def synthetic_batch(
    cfg: ModelConfig, batch_size: int = 1, seed: int = 0, num_gt: int = 12
) -> dict:
    rng = np.random.RandomState(seed)
    N = cfg.head.num_cams
    H, W = cfg.img_size
    G = cfg.loss.max_gt
    num_gt = min(num_gt, G)

    if cfg.device_normalize:
        # raw-pixel shipping: the pipeline emits uint8 and the model
        # normalizes on device (ModelConfig.device_normalize)
        images = rng.randint(
            0, 256, (batch_size, N, H, W, 3), dtype=np.int64
        ).astype(np.uint8)
    else:
        images = rng.randn(batch_size, N, H, W, 3).astype(np.float32) * 0.5
    l2i = np.stack(
        [synthetic_camera_rig(N, (H, W), seed + b) for b in range(batch_size)]
    )

    pc = cfg.head.pc_range
    gt_bboxes = np.zeros((batch_size, G, 9), np.float32)
    gt_bboxes[:, :num_gt, 0] = rng.uniform(pc[0] * 0.8, pc[3] * 0.8, (batch_size, num_gt))
    gt_bboxes[:, :num_gt, 1] = rng.uniform(pc[1] * 0.8, pc[4] * 0.8, (batch_size, num_gt))
    gt_bboxes[:, :num_gt, 2] = rng.uniform(-2.0, 0.5, (batch_size, num_gt))
    gt_bboxes[:, :num_gt, 3:6] = rng.uniform(0.5, 4.0, (batch_size, num_gt, 3))
    gt_bboxes[:, :num_gt, 6] = rng.uniform(-np.pi, np.pi, (batch_size, num_gt))
    gt_bboxes[:, :num_gt, 7:9] = rng.randn(batch_size, num_gt, 2) * 2
    gt_labels = np.zeros((batch_size, G), np.int32)
    gt_labels[:, :num_gt] = rng.randint(
        0, cfg.head.num_classes, (batch_size, num_gt)
    )
    gt_valid = np.zeros((batch_size, G), bool)
    gt_valid[:, :num_gt] = True

    return {
        "images": images,
        "lidar2img": l2i,
        "gt_bboxes": gt_bboxes,
        "gt_labels": gt_labels,
        "gt_valid": gt_valid,
    }
