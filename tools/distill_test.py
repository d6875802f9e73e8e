"""Distill eval CLI (reference: tools/distill_test.py — loads the
distiller, then tests the *student*). Here the student checkpoint saved by
distill_train.py is evaluated through the standard test path.

  python tools/distill_test.py --config mixdistill_r50_r18_cls_reg_2subset \
      --checkpoint work_dirs/distill/checkpoints [--synthetic]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config", default="mixdistill_r50_r18_cls_reg_2subset"
    )
    p.add_argument("--checkpoint", default=None, help="orbax ckpt dir")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--max-samples", type=int, default=32)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    from graph_detr4d_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.configs import get_distill_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.parallel.step import init_state, build_eval_step
    from graph_detr4d_tpu.train.checkpoint import CheckpointManager
    from graph_detr4d_tpu.eval import DetectionEvaluator
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    s_cfg = apply_env_kernel_overrides(
        tiny_test_config()
        if args.tiny
        else get_distill_config(args.config).student
    )
    model = GraphDETR4D(s_cfg)
    state = init_state(model, s_cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        mngr = CheckpointManager(args.checkpoint, s_cfg)
        params = mngr.load_weights(jax.tree.map(np.asarray, state.params))
        if params is not None:
            state = state.replace(params=params)
            print(f"loaded student weights from {args.checkpoint}")
    eval_step = build_eval_step(model, s_cfg)

    evaluator = DetectionEvaluator()
    for i in range(args.max_samples):
        batch = synthetic_batch(s_cfg, batch_size=1, seed=1000 + i)
        det = eval_step(
            state.params,
            state.batch_stats,
            {k: jnp.asarray(v) for k, v in batch.items()},
        )
        boxes, scores = np.asarray(det.bboxes), np.asarray(det.scores)
        labels, valid = np.asarray(det.labels), np.asarray(det.valid)
        for b in range(boxes.shape[0]):
            keep = valid[b]
            gkeep = batch["gt_valid"][b] > 0
            evaluator.add_sample(
                boxes[b][keep],
                labels[b][keep],
                scores[b][keep],
                batch["gt_bboxes"][b][gkeep],
                batch["gt_labels"][b][gkeep],
            )
    metrics = evaluator.evaluate()
    print(
        {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if not isinstance(v, dict)
        }
    )


if __name__ == "__main__":
    main()
