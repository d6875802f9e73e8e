"""Train CLI (reference: tools/train.py + dist_train.sh).

  python tools/train.py --ann-file data/nuscenes/..._train.pkl \
      --work-dir work_dirs/detr4d_r50 [--synthetic] [--resume]

The reference launches one process per GPU via torch.distributed; here one
process drives the whole mesh (single-controller pjit). Use --synthetic to
train on generated data (smoke/perf runs without the dataset).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config",
        default=None,
        help="named config (graph_detr4d_tpu.configs registry; the "
        "reference's config-file path becomes a name here)",
    )
    p.add_argument(
        "--cfg-options",
        nargs="*",
        default=None,
        help="dot-path overrides, e.g. head.num_query=600 bf16=False",
    )
    p.add_argument("--ann-file", default=None, help="nuScenes infos pkl")
    p.add_argument("--work-dir", default="work_dirs/detr4d")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None, help="global")
    p.add_argument("--img-h", type=int, default=320)
    p.add_argument("--img-w", type=int, default=800)
    p.add_argument("--tiny", action="store_true", help="tiny debug config")
    p.add_argument("--load-interval", type=int, default=2)
    p.add_argument(
        "--sweeps-num",
        type=int,
        default=1,
        help="previous frames per sample (loading.py sweeps_num); "
        "head.num_cams must equal 6*(1+sweeps_num)",
    )
    p.add_argument(
        "--cbgs",
        action="store_true",
        help="class-balanced resampling (CBGSDataset parity, "
        "detr3d_res50.py:165)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--val-ann-file",
        default=None,
        help="run the EvalHook-equivalent (nuScenes mAP/NDS on this val "
        "pkl) at every checkpoint interval",
    )
    p.add_argument("--eval-samples", type=int, default=64)
    p.add_argument(
        "--profile-steps",
        type=int,
        default=0,
        help="capture a jax.profiler trace of this many steps into "
        "WORK_DIR/profile (viewable in tensorboard / xprof)",
    )
    p.add_argument(
        "--cam-parallel",
        type=int,
        default=1,
        help="shard the camera axis over this many devices (2-D "
        "(data, cam) mesh; device count must be divisible)",
    )
    p.add_argument(
        "--native-loader",
        action="store_true",
        help="load/resize jpegs through the C++ loader "
        "(graph_detr4d_tpu/native) on the TRAIN side — the reference's "
        "hot path is 12 jpegs/sample through workers_per_gpu=4 "
        "(loading.py:66-188); photometric jitter runs post-resize on "
        "the fused output. Falls back to python if the native library "
        "is unavailable",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    from graph_detr4d_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import numpy as np
    from graph_detr4d_tpu.config import ModelConfig, tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.train.trainer import Trainer
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    if args.tiny:
        cfg = tiny_test_config()
    elif args.config:
        from graph_detr4d_tpu.configs import get_config

        cfg = get_config(args.config, overrides=args.cfg_options)
    else:
        cfg = ModelConfig(img_size=(args.img_h, args.img_w))
        if args.cfg_options:
            from graph_detr4d_tpu.configs import apply_overrides

            cfg = apply_overrides(cfg, args.cfg_options)
    # CLI-layer kernel-variant overrides (GRD4D_DCN_GATHER etc.) become
    # ordinary config fields here; library code never reads the env
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = apply_env_kernel_overrides(cfg)
    n_dev = len(jax.devices())
    mesh = None
    if args.cam_parallel > 1:
        from graph_detr4d_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(jax.devices(), cam=args.cam_parallel)
        batch_size = args.batch_size or max(1, n_dev // args.cam_parallel)
    else:
        batch_size = args.batch_size or n_dev
    model = GraphDETR4D(cfg)
    total = args.total_steps or cfg.train.total_steps

    # multi-host: each process loads only its local shard of the global
    # batch (DistributedSampler parity); parallel/mesh.shard_batch
    # assembles the global array across hosts
    rank, world = jax.process_index(), jax.process_count()
    if batch_size % world:
        # round the global batch up so every rank gets an equal non-empty
        # shard (the sharded global array requires it anyway)
        batch_size = ((batch_size + world - 1) // world) * world
        if rank == 0:
            print(f"global batch rounded up to {batch_size} ({world} hosts)")
    local_bs = batch_size // world

    if args.synthetic or args.ann_file is None:
        def batches():
            seed = args.seed + rank * 100003
            while True:
                seed += 1
                yield {
                    k: np.asarray(v)
                    for k, v in synthetic_batch(
                        cfg, local_bs, seed=seed
                    ).items()
                }
    else:
        from graph_detr4d_tpu.data.nuscenes import NuScenesSweepDataset
        from graph_detr4d_tpu.data.pipeline import build_batch

        ds = NuScenesSweepDataset(
            args.ann_file,
            load_interval=args.load_interval,
            sweeps_num=args.sweeps_num,
            max_gt=cfg.loss.max_gt,
            seed=args.seed,
        )
        if args.cbgs:
            from graph_detr4d_tpu.data.nuscenes import CBGSDataset

            ds = CBGSDataset(ds, seed=args.seed)

        def batches():
            # every process draws the SAME global index sequence (shared
            # seed) and takes its rank-strided slice of each global batch
            # (DistributedSampler semantics); augs use a per-rank rng
            rng = np.random.RandomState(args.seed)
            aug_rng = np.random.RandomState(args.seed + 7919 * rank)
            order = rng.permutation(len(ds))
            i = 0
            while True:
                idxs = []
                for _ in range(batch_size):
                    if i >= len(order):
                        order = rng.permutation(len(ds))
                        i = 0
                    idxs.append(int(order[i]))
                    i += 1
                local = idxs[rank * local_bs : (rank + 1) * local_bs]
                # temporal sampling iff the model's rig carries
                # past-frame cameras (PETRv1/graph-detr3d are
                # single-frame: their pipelines have no
                # LoadMultiViewImageFromMultiSweepsFiles)
                temporal = cfg.head.num_cams > cfg.head.num_frame_cams
                samples = [
                    ds.sample(j, temporal=temporal) for j in local
                ]
                yield build_batch(
                    samples,
                    cfg.img_size,
                    training=True,
                    rng=aug_rng,
                    aug=cfg.train,
                    img_norm=(cfg.img_mean, cfg.img_std, cfg.img_bgr),
                    device_normalize=cfg.device_normalize,
                    use_native=args.native_loader,
                )

    eval_fn = None
    if args.val_ann_file:
        # EvalHook parity (configs/...12e.py:218): decode + standalone
        # nuScenes metrics on a val slice at every checkpoint interval
        from graph_detr4d_tpu.data.nuscenes import NuScenesSweepDataset
        from graph_detr4d_tpu.data.pipeline import build_batch
        from graph_detr4d_tpu.parallel.step import build_eval_step
        from graph_detr4d_tpu.eval import DetectionEvaluator
        import jax.numpy as jnp

        val_ds = NuScenesSweepDataset(
            args.val_ann_file, test_mode=True, max_gt=cfg.loss.max_gt
        )
        eval_step = build_eval_step(model, cfg)

        def eval_fn(state):
            evaluator = DetectionEvaluator()
            n = min(args.eval_samples, len(val_ds))
            for i in range(n):
                s = val_ds.sample(
                    i,
                    temporal=cfg.head.num_cams > cfg.head.num_frame_cams,
                )
                vb = build_batch(
                    [s],
                    cfg.img_size,
                    training=False,
                    img_norm=(cfg.img_mean, cfg.img_std, cfg.img_bgr),
                    device_normalize=cfg.device_normalize,
                    use_native=args.native_loader,
                )
                dev = {
                    "images": jnp.asarray(vb["images"]),
                    "lidar2img": jnp.asarray(vb["lidar2img"]),
                }
                for k in (
                    "mean_time_stamp",
                    "intrinsics",
                    "ida_scale",
                    "depth_factors",
                ):
                    if k in vb:
                        dev[k] = jnp.asarray(vb[k])
                det = eval_step(
                    state.params,
                    state.batch_stats,
                    dev,
                )
                keep = np.asarray(det.valid[0])
                gkeep = vb["gt_valid"][0] > 0
                evaluator.add_sample(
                    np.asarray(det.bboxes[0])[keep],
                    np.asarray(det.labels[0])[keep],
                    np.asarray(det.scores[0])[keep],
                    vb["gt_bboxes"][0][gkeep],
                    vb["gt_labels"][0][gkeep],
                    gt_attrs=(
                        np.asarray(s["gt_attrs"], object)[gkeep]
                        if "gt_attrs" in s
                        else None
                    ),
                    ego_xy=s.get("ego_xy"),
                )
            m = evaluator.evaluate()
            return {
                "val_mAP": float(m["mAP"]),
                "val_NDS": float(m["NDS"]),
            }

    trainer = Trainer(
        model, cfg, args.work_dir, batches(), eval_fn=eval_fn,
        seed=args.seed, mesh=mesh, profile_steps=args.profile_steps,
    )
    if args.resume:
        step = trainer.resume()
        print(f"resumed at step {step}")
    trainer.fit(total)


if __name__ == "__main__":
    main()
