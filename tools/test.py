"""Eval CLI (reference: tools/test.py): run inference over the val set,
decode NMS-free detections, compute standalone nuScenes metrics
(mAP/NDS), optionally dump results json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="named config")
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument("--ann-file", required=False, default=None)
    p.add_argument(
        "--dataset",
        default="nuscenes",
        choices=["nuscenes", "custom6cam"],
        help="custom6cam = the internal-dataset format with center2lidar "
        "calibration (tools/test_internal.py parity)",
    )
    p.add_argument("--checkpoint", default=None, help="orbax ckpt dir")
    p.add_argument("--work-dir", default="work_dirs/detr4d")
    p.add_argument("--img-h", type=int, default=320)
    p.add_argument("--img-w", type=int, default=800)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument(
        "--sweeps-num",
        type=int,
        default=1,
        help="previous frames per sample (loading.py sweeps_num)",
    )
    p.add_argument("--out", default=None, help="write results json here")
    p.add_argument(
        "--format-nusc",
        default=None,
        help="directory to write the official-submission results_nusc.json "
        "(--format-only parity; boxes converted lidar->global)",
    )
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument(
        "--no-temporal",
        action="store_true",
        help="sample only the current frame's cameras (6-cam single-frame "
        "mode, the graph-detr3d branch behavior)",
    )
    p.add_argument(
        "--tta-resizes",
        default=None,
        help="comma-separated ida resize multipliers for test-time "
        "augmentation, e.g. '1.0,0.95,1.05' — per-level features are "
        "averaged across the copies (aug_test parity, detr3d.py:192-216); "
        "the first copy's calibration drives the head",
    )
    p.add_argument(
        "--cam-parallel",
        type=int,
        default=1,
        help="shard the camera axis over this many devices for inference "
        "(2-D (data, cam) mesh — the win case is batch-1 serving, where "
        "the per-camera backbone/FPN/sampling FLOPs split across chips)",
    )
    p.add_argument(
        "--native-loader",
        action="store_true",
        help="decode/resize through the multithreaded C++ loader "
        "(graph_detr4d_tpu/native; supports device_normalize uint8 "
        "output). Opt-in: its direct-bilinear resample differs from the "
        "python cv2 path at the rounding level, which matters for "
        "strict parity runs. Incompatible with --tta-resizes.",
    )
    args = p.parse_args()
    if args.native_loader and args.tta_resizes:
        p.error(
            "--native-loader and --tta-resizes are incompatible (TTA "
            "copies reuse the python path's decoded images)"
        )
    return args


def main():
    args = parse_args()
    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    from graph_detr4d_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from graph_detr4d_tpu.config import ModelConfig, tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.parallel.step import init_state, build_eval_step
    from graph_detr4d_tpu.train.checkpoint import CheckpointManager
    from graph_detr4d_tpu.eval import DetectionEvaluator
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    if args.tiny:
        cfg = tiny_test_config()
    elif args.config:
        from graph_detr4d_tpu.configs import get_config

        cfg = get_config(args.config, overrides=args.cfg_options)
    else:
        cfg = ModelConfig(img_size=(args.img_h, args.img_w))
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = apply_env_kernel_overrides(cfg)
    if args.cam_parallel == 1 and cfg.backbone.cam_chunk is None:
        # single-device serving: chunk the conv stack at the measured
        # 6-image sweet spot (bitwise-exact; detector skips it unless
        # B*N > 6 and divisible). Not applied on a cam-sharded mesh —
        # the chunk slices would cross shard boundaries.
        import dataclasses

        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, cam_chunk=6)
        )
    model = GraphDETR4D(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        mngr = CheckpointManager(args.checkpoint, cfg)
        params = mngr.load_weights(jax.tree.map(np.asarray, state.params))
        if params is not None:
            state = state.replace(params=params)
            print(f"loaded weights from {args.checkpoint}")
    mesh = None
    if args.cam_parallel > 1:
        from graph_detr4d_tpu.parallel.mesh import make_mesh_2d

        # serving layout: data=1, cam=N (batch 1 per step; the camera
        # axis carries all the parallelism)
        mesh = make_mesh_2d(
            jax.devices()[: args.cam_parallel], cam=args.cam_parallel
        )
    eval_step = build_eval_step(model, cfg, mesh)

    evaluator = DetectionEvaluator()
    results = []
    eval_samples = []  # multi-host: re-added into rank 0's evaluator

    # the eval loop is a 2-stage pipeline: submit_batch enqueues the
    # device step and returns immediately (JAX dispatch is async); the
    # host-side decode/evaluator work for step i runs while the device
    # executes step i+1. One pending slot ≡ double buffering — same
    # overlap the reference gets from DataLoader workers + CUDA streams.
    _pending = []

    def run_batch(
        batch, gt_bboxes, gt_labels, gt_valid, tokens, gt_attrs=None,
        ego_xys=None,
    ):
        submit_batch(
            batch, gt_bboxes, gt_labels, gt_valid, tokens, gt_attrs,
            ego_xys,
        )
        while len(_pending) > 1:
            finish_batch(_pending.pop(0))

    def drain_batches():
        while _pending:
            finish_batch(_pending.pop(0))

    def submit_batch(
        batch, gt_bboxes, gt_labels, gt_valid, tokens, gt_attrs=None,
        ego_xys=None,
    ):
        from graph_detr4d_tpu.parallel import cast_for_transfer

        batch = cast_for_transfer(batch, cfg.bf16)
        if mesh is not None:
            from graph_detr4d_tpu.parallel.mesh import shard_batch

            dev_batch = shard_batch(
                {k: np.asarray(v) for k, v in batch.items()}, mesh
            )
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if dev_batch["images"].ndim == 6:  # (A, B, N, H, W, 3) TTA stack
            det = tta_step(
                state.params,
                state.batch_stats,
                dev_batch["images"],
                dev_batch["lidar2img"],
                {
                    k: v
                    for k, v in dev_batch.items()
                    if k not in ("images", "lidar2img")
                },
            )
        else:
            det = eval_step(state.params, state.batch_stats, dev_batch)
        _pending.append(
            (det, gt_bboxes, gt_labels, gt_valid, tokens, gt_attrs,
             ego_xys)
        )

    def finish_batch(item):
        (det, gt_bboxes, gt_labels, gt_valid, tokens, gt_attrs,
         ego_xys) = item
        boxes = np.asarray(det.bboxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        for b in range(boxes.shape[0]):
            keep = valid[b]
            gkeep = np.asarray(gt_valid[b]) > 0
            battrs = (
                np.asarray(gt_attrs[b], object)[gkeep]
                if gt_attrs is not None
                else None
            )
            evaluator.add_sample(
                boxes[b][keep],
                labels[b][keep],
                scores[b][keep],
                gt_bboxes[b][gkeep],
                gt_labels[b][gkeep],
                gt_attrs=battrs,
                ego_xy=None if ego_xys is None else ego_xys[b],
            )
            if jax.process_count() > 1:
                eval_samples.append(
                    [
                        np.asarray(a).tolist()
                        for a in (
                            boxes[b][keep],
                            labels[b][keep],
                            scores[b][keep],
                            gt_bboxes[b][gkeep],
                            gt_labels[b][gkeep],
                        )
                    ]
                    + [
                        [] if battrs is None
                        else [str(a) for a in battrs]
                    ]
                    + [
                        [] if ego_xys is None or ego_xys[b] is None
                        else np.asarray(ego_xys[b]).tolist()
                    ]
                )
            results.append(
                {
                    "token": tokens[b],
                    "boxes": boxes[b][keep].tolist(),
                    "scores": scores[b][keep].tolist(),
                    "labels": labels[b][keep].tolist(),
                }
            )

    if args.synthetic or args.ann_file is None:
        n = args.max_samples or 4
        for i in range(n):
            batch = synthetic_batch(cfg, 1, seed=100 + i)
            run_batch(
                {
                    "images": batch["images"],
                    "lidar2img": batch["lidar2img"],
                },
                batch["gt_bboxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                [f"synthetic-{i}"],
            )
    else:
        from graph_detr4d_tpu.data.pipeline import build_batch

        if args.dataset == "custom6cam":
            from graph_detr4d_tpu.data.custom6cam import Custom6CamDataset

            ds = Custom6CamDataset(
                args.ann_file, max_gt=cfg.loss.max_gt, test_mode=True
            )
        else:
            from graph_detr4d_tpu.data.nuscenes import NuScenesSweepDataset

            ds = NuScenesSweepDataset(
                args.ann_file,
                test_mode=True,
                sweeps_num=args.sweeps_num,
                max_gt=cfg.loss.max_gt,
            )
        n = min(args.max_samples or len(ds), len(ds))
        infos_by_token = {
            info["token"]: info
            for info in ds.infos
            if isinstance(info, dict) and "token" in info
        }
        # multi-host eval: stride the dataset by process, like the
        # reference's multi_gpu_test per-rank sharding (tools/test.py:223)
        rank, world = jax.process_index(), jax.process_count()
        if world > 1:
            # drop any stale partial from a previous run in this work_dir
            # BEFORE computing — jax.distributed.initialize has already
            # synchronized startup, so every rank clears its own file
            # long before rank 0 starts polling
            stale = os.path.join(
                args.work_dir, f"results_rank{rank}.json"
            )
            if os.path.exists(stale):
                os.remove(stale)
        tta_mults = (
            [float(x) for x in args.tta_resizes.split(",")]
            if args.tta_resizes
            else None
        )
        if tta_mults:
            assert mesh is None and world == 1, (
                "--tta-resizes is single-host/single-mesh only"
            )
            from graph_detr4d_tpu.parallel.step import build_tta_eval_step

            tta_step = build_tta_eval_step(model, cfg)

        def sample_iter():
            for i in range(rank, n, world):
                temporal = (
                    not args.no_temporal
                    and cfg.head.num_cams > cfg.head.num_frame_cams
                )
                if args.dataset == "nuscenes":
                    s = ds.sample(i, temporal=temporal)
                else:
                    s = ds.sample(i)
                b = build_batch(
                    [s],
                    cfg.img_size,
                    training=False,
                    img_norm=(cfg.img_mean, cfg.img_std, cfg.img_bgr),
                    tta_resize_mults=tta_mults,
                    device_normalize=cfg.device_normalize,
                    use_native=args.native_loader,
                )
                yield i, s, b

        # decode/resize of sample i+1..i+2 runs in a worker thread while
        # the device evaluates sample i (numpy/PIL release the GIL)
        from graph_detr4d_tpu.train.trainer import PrefetchIterator

        for i, s, batch in PrefetchIterator(sample_iter(), depth=2):
            dev = {
                "images": batch["images"],
                "lidar2img": batch["lidar2img"],
            }
            # optional model inputs must reach eval_step too: PETRv2's
            # velocity/Δt division and the cam-aware DepthNet otherwise
            # silently fall back (None / identity intrinsics)
            for k in ("mean_time_stamp", "intrinsics", "ida_scale",
                      "depth_factors"):
                if k in batch:
                    dev[k] = batch[k]
            run_batch(
                dev,
                batch["gt_bboxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                [s.get("token", f"sample-{i}")],
                gt_attrs=(
                    s["gt_attrs"][None] if "gt_attrs" in s else None
                ),
                ego_xys=[s.get("ego_xy")],
            )

    drain_batches()

    # multi-host: each rank writes a partial results file, a cross-host
    # barrier syncs, then rank 0 merges and evaluates (tmpdir/gpu-collect
    # parity, tools/test.py:244-246 in the reference)
    if jax.process_count() > 1:
        os.makedirs(args.work_dir, exist_ok=True)
        part = os.path.join(
            args.work_dir, f"results_rank{jax.process_index()}.json"
        )
        tmp = part + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"results": results, "eval_samples": eval_samples}, f)
        os.replace(tmp, part)  # atomic: pollers never see partial json
        if jax.process_index() != 0:
            return
        # rank 0 collects over the shared filesystem (mmcv tmpdir-collect
        # parity) — no device collective, so arbitrary rank skew is fine
        import time as _time

        deadline = _time.time() + 3600
        want = [
            os.path.join(args.work_dir, f"results_rank{r}.json")
            for r in range(jax.process_count())
        ]
        while not all(os.path.exists(p) for p in want):
            if _time.time() > deadline:
                missing = [p for p in want if not os.path.exists(p)]
                raise TimeoutError(f"eval ranks never finished: {missing}")
            _time.sleep(2.0)
        results = []
        evaluator = DetectionEvaluator()
        for r in range(jax.process_count()):
            with open(
                os.path.join(args.work_dir, f"results_rank{r}.json")
            ) as f:
                partial = json.load(f)
            results.extend(partial["results"])
            for es in partial["eval_samples"]:
                # reshape recovers (0, 9) box arrays that json flattened
                evaluator.add_sample(
                    np.asarray(es[0], np.float32).reshape(-1, 9),
                    np.asarray(es[1], np.int32),
                    np.asarray(es[2], np.float32),
                    np.asarray(es[3], np.float32).reshape(-1, 9),
                    np.asarray(es[4], np.int32),
                    gt_attrs=(
                        np.asarray(es[5], object)
                        if len(es) > 5 and es[5]
                        else None
                    ),
                    ego_xy=(
                        np.asarray(es[6], np.float64)
                        if len(es) > 6 and es[6]
                        else None
                    ),
                )

    metrics = evaluator.evaluate()
    print(json.dumps(metrics, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"results": results, "metrics": metrics}, f)
    if (
        args.format_nusc
        and args.dataset == "nuscenes"
        and not (args.synthetic or args.ann_file is None)
    ):
        from graph_detr4d_tpu.eval.submission import (
            boxes_to_nusc_annos,
            write_submission,
        )

        per_sample = {}
        for r in results:
            info = infos_by_token[r["token"]]
            per_sample[r["token"]] = boxes_to_nusc_annos(
                np.asarray(r["boxes"], np.float32),
                np.asarray(r["scores"], np.float32),
                np.asarray(r["labels"], np.int32),
                info,
            )
        path = write_submission(per_sample, args.format_nusc)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
