"""Bound the int8 DCN gather-table quantization at BOX level.

PROFILE.md records ~1e-2 relative cls-logit drift for the opt-in
`backbone.dcn_gather=int8` serving path (halves the bandwidth-bound stage-3
gather bytes, 9.31 -> 9.58 fps), but the decision to promote/keep-opt-in
needs the number users feel: the decoded-box delta on the flagship shape.

This tool runs the SAME params + inputs through the default ('shift4')
and int8 paths at the bench shape (640x1600, 6 cams, cam_capacity 0.5,
bf16) and reports, over the NMS-free decode's top-max_num boxes:
  * decode-rank churn: |top-K selection set difference| (selection is
    (query, class) pairs from the flattened-logit topk, the quantity the
    coder actually ranks — core/coder.py)
  * max |delta| on matched boxes: center (m), size (log-dim), yaw (rad),
    velocity, score
Run on the real chip (~2 min):  python tools/int8_box_bound.py
CPU escape for shape-checking:  GRD4D_PLATFORM=cpu ... --tiny

The variant is an ordinary config field (BackboneConfig.dcn_gather), so
the two paths are two distinct configs/models traced as two distinct
jitted functions in one process — the jit cache keys on it naturally.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from graph_detr4d_tpu.utils.platform import (
    apply_platform_override,
    enable_compile_cache,
)

apply_platform_override()
enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--w", type=int, default=1600)
    args = ap.parse_args()

    from graph_detr4d_tpu.config import (
        ModelConfig,
        HeadConfig,
        tiny_test_config,
    )
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.core.coder import decode_batch
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    if args.tiny:
        import dataclasses

        cfg = tiny_test_config()
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, use_dcn=True),
        )
    else:
        cfg = ModelConfig(
            head=HeadConfig(
                num_cams=6, with_detach=False, cam_capacity=0.5
            ),
            img_size=(args.h, args.w),
            bf16=True,
        )
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=1)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs, l2i
    )

    def run(variant):
        # the variant only changes the sampling kernel, not the param
        # tree, so the SAME variables apply to both models
        import dataclasses

        vcfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, dcn_gather=variant),
        )
        vmodel = GraphDETR4D(vcfg)
        out = jax.jit(lambda v, i, l: vmodel.apply(v, i, l))(
            variables, imgs, l2i
        )
        det = decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
        )
        # raw top-K selection: the flattened (query*class) indices the
        # coder ranks, BEFORE the post-center-range validity mask
        cls = out["all_cls_scores"][-1]  # (B, Q, C) final layer
        B, Q, C = cls.shape
        scores = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(B, -1)
        _, idx = jax.lax.top_k(scores, cfg.coder.max_num)
        return (
            jax.tree_util.tree_map(np.asarray, det),
            np.asarray(idx),
        )

    det_a, idx_a = run("shift4")
    det_b, idx_b = run("int8")

    # ---- decode-rank churn on the raw top-K selection
    churn = []
    for b in range(idx_a.shape[0]):
        sa, sb = set(idx_a[b].tolist()), set(idx_b[b].tolist())
        churn.append(len(sa - sb))
    K = idx_a.shape[1]
    print(f"top-{K} selection churn: {churn} of {K} "
          f"({100.0 * max(churn) / K:.1f}% max)")

    # ---- matched-box deltas: compare boxes that select the SAME
    # (query,class) pair in both runs, in rank-a order
    ba = np.asarray(det_a.bboxes, np.float32)  # (B, K, 9/10)
    bb = np.asarray(det_b.bboxes, np.float32)
    sa = np.asarray(det_a.scores, np.float32)
    sb = np.asarray(det_b.scores, np.float32)
    d_center = d_size = d_yaw = d_vel = d_score = 0.0
    matched = 0
    for b in range(ba.shape[0]):
        pos_b = {int(v): i for i, v in enumerate(idx_b[b])}
        for i, v in enumerate(idx_a[b]):
            j = pos_b.get(int(v))
            if j is None:
                continue
            matched += 1
            d_center = max(
                d_center,
                float(np.abs(ba[b, i, :3] - bb[b, j, :3]).max()),
            )
            d_size = max(
                d_size,
                float(np.abs(ba[b, i, 3:6] - bb[b, j, 3:6]).max()),
            )
            dy = float(np.abs(ba[b, i, 6] - bb[b, j, 6]))
            d_yaw = max(d_yaw, min(dy, abs(dy - 2 * np.pi)))
            if ba.shape[-1] >= 9:
                d_vel = max(
                    d_vel,
                    float(np.abs(ba[b, i, 7:9] - bb[b, j, 7:9]).max()),
                )
            d_score = max(d_score, float(abs(sa[b, i] - sb[b, j])))
    print(
        f"matched {matched}/{K}: max |d center| {d_center:.4f} m, "
        f"|d size| {d_size:.4f}, |d yaw| {d_yaw:.4f} rad, "
        f"|d vel| {d_vel:.4f}, |d score| {d_score:.5f}"
    )


if __name__ == "__main__":
    main()
