"""Distillation train CLI (reference: tools/distill_train.py +
apis/mmdet_distill_train.py:37-174).

  python tools/distill_train.py --config mixdistill_r50_r18_cls_reg_2subset \
      [--teacher-checkpoint DIR] [--synthetic] [--steps N]

One process drives the mesh; the teacher is frozen (its params never enter
the grad computation — the optimizer scope is student + lateral convs,
matching mmdet_distill_train.py:88-92's base_parameters()).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config",
        default="mixdistill_r50_r18_cls_reg_2subset",
        help="named distill config (graph_detr4d_tpu.configs registry)",
    )
    p.add_argument("--teacher-checkpoint", default=None, help="orbax dir")
    p.add_argument("--work-dir", default="work_dirs/distill")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny smoke configs")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument(
        "--teacher-top-k",
        type=int,
        default=-1,
        help="cap instance-distill soft GT to top-K teacher queries "
        "(on-device matching cost ~K^2). -1 = config default (64, "
        "20.4s -> 0.5s/step on chip); 0 = all rows (exact reference "
        "parity, slow on device)",
    )
    p.add_argument(
        "--split-teacher",
        action="store_true",
        help="run the frozen teacher forward as its OWN executable "
        "instead of inlining it into the student train program "
        "(mathematically identical — teacher outputs are stop-gradient "
        "constants; CPU losses match digit-for-digit). Halves the "
        "per-program size. NOTE: on the axon TPU runtime the "
        "two-executable handoff itself crashes the worker even with "
        "gather4 and both programs fitting HBM (PROFILE.md round 5) — "
        "use the default inline mode there; split is for other "
        "runtimes",
    )
    p.add_argument(
        "--teacher-msda",
        default=None,
        help="with --split-teacher: override the teacher program's "
        "msda_impl (e.g. shift4h), lifting the bundle's gather4 distill "
        "pin for the teacher half only",
    )
    p.add_argument(
        "--data-parallel",
        type=int,
        default=0,
        help="shard the distill batch over N devices (1-D data mesh, "
        "params/teacher replicated, GSPMD gradient all-reduce) — the "
        "TPU-native equivalent of the reference distill runner's DDP "
        "wrap (apis/mmdet_distill_train.py:74-82). 0 = single device. "
        "--batch-size defaults to N and must be a multiple of it.",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    from graph_detr4d_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import dataclasses
    import json
    import time

    import jax.numpy as jnp
    import numpy as np
    import optax

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.configs import get_distill_config, DistillBundle
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.distill import Distiller, DistillConfig, distill_loss
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.train.checkpoint import CheckpointManager
    from graph_detr4d_tpu.train.optim import build_optimizer

    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    if args.tiny:
        t_cfg = s_cfg = tiny_test_config()
        bundle = DistillBundle(teacher=t_cfg, student=s_cfg, mix=True)
    else:
        bundle = get_distill_config(args.config)
        t_cfg, s_cfg = bundle.teacher, bundle.student
    # CLI-layer kernel-variant overrides apply to BOTH models (e.g.
    # GRD4D_MSDA_IMPL can lift the bundle's gather4 safety pin for A/B)
    t_cfg = apply_env_kernel_overrides(t_cfg)
    s_cfg = apply_env_kernel_overrides(s_cfg)
    if args.teacher_msda:
        assert args.split_teacher, "--teacher-msda requires --split-teacher"
        t_cfg = dataclasses.replace(
            t_cfg,
            head=dataclasses.replace(t_cfg.head, msda_impl=args.teacher_msda),
        )

    dcfg = DistillConfig(
        use_instance_distill=bundle.distill_cls or bundle.distill_reg,
        cls_distill_weight=bundle.effective_cls_weight,
        reg_distill_weight=bundle.effective_reg_weight,
        use_feat_distill=bundle.distill_feat,
        feat_distill_weight=bundle.effective_feat_weight,
        feat_distill_kind=bundle.feat_mode,
        reweight_score=bundle.reweight_score,
        mix=bundle.mix,
        teacher_top_k=(
            bundle.teacher_top_k
            if args.teacher_top_k < 0
            else (args.teacher_top_k or None)
        ),
    )

    teacher = GraphDETR4D(t_cfg)
    batch0 = synthetic_batch(t_cfg, batch_size=1, seed=0)
    imgs0 = jnp.asarray(batch0["images"])
    l2i0 = jnp.asarray(batch0["lidar2img"])
    tvars = jax.jit(teacher.init)(
        {"params": jax.random.PRNGKey(0)}, imgs0, l2i0
    )
    if args.teacher_checkpoint:
        mngr = CheckpointManager(args.teacher_checkpoint, t_cfg)
        params = mngr.load_weights(
            jax.tree.map(np.asarray, tvars["params"])
        )
        if params is not None:
            tvars = dict(tvars)
            tvars["params"] = params
            print(f"loaded teacher weights from {args.teacher_checkpoint}")
    t_qe = tvars["params"]["head"]["query_embedding"] if bundle.mix else None

    dist = Distiller(
        student_cfg=s_cfg, teacher_feat_channels=t_cfg.neck.out_channels
    )
    dvars = jax.jit(dist.init)(
        {"params": jax.random.PRNGKey(1)},
        imgs0,
        l2i0,
        teacher_query_embed=t_qe,
    )

    tx = build_optimizer(s_cfg.train)
    opt_state = tx.init(dvars["params"])

    def _teacher_fwd_body(imgs, l2i):
        # one teacher backbone pass: extract once, head on the features
        # (a second full teacher.apply would re-run the conv stack —
        # XLA does not reliably CSE it across the remat'd scopes, which
        # doubles the teacher's live activations on top of the student's
        # forward+backward)
        t_feats = teacher.apply(
            tvars, imgs, False, None, method=GraphDETR4D.extract_feats
        )
        t_feats = [jax.lax.stop_gradient(f) for f in t_feats]
        t_outs = teacher.apply(
            tvars, t_feats, l2i, method=GraphDETR4D.forward_feats
        )
        return t_feats, t_outs

    def _student_train_body(params, opt_state, batch, t_feats, t_outs, rng):
        def loss_fn(p):
            variables = {**dvars, "params": p}
            s_outs, adapted = dist.apply(
                variables,
                batch["images"],
                batch["lidar2img"],
                train=True,
                rng=rng,
                teacher_query_embed=t_qe,
                rngs={"dropout": rng},
            )
            return distill_loss(
                s_outs,
                adapted,
                t_outs,
                t_feats,
                batch["gt_bboxes"],
                batch["gt_labels"],
                batch["gt_valid"],
                s_cfg,
                dcfg,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    mesh = None
    if args.data_parallel and args.data_parallel > 1:
        from graph_detr4d_tpu.parallel import make_mesh, replicate
        from graph_detr4d_tpu.parallel.mesh import (
            batch_sharding,
            replicated_sharding,
        )

        devices = jax.devices()[: args.data_parallel]
        assert len(devices) == args.data_parallel, (
            f"--data-parallel {args.data_parallel} but only "
            f"{len(devices)} devices visible"
        )
        mesh = make_mesh(devices)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        # replicate the trainable state and the frozen teacher; the
        # per-step batch is sharded on 'data' in the loop below
        tvars = replicate(tvars, mesh)
        dvars = replicate(dvars, mesh)
        opt_state = replicate(opt_state, mesh)
        if t_qe is not None:
            t_qe = jax.device_put(t_qe, repl)

    def _jit(fn, **shardings):
        if mesh is None:
            return jax.jit(fn)
        jitted = jax.jit(fn, **shardings)

        def wrapped(*a, **k):
            with jax.set_mesh(mesh):
                return jitted(*a, **k)

        return wrapped

    if mesh is not None:
        # pjit shardings: GLOBAL-shape semantics, so the loss means and
        # the grad reduction are global automatically (GSPMD inserts the
        # all-reduce the reference gets from DDP+reduce_mean)
        _sh_inline = dict(
            in_shardings=(repl, repl, data, repl),
            out_shardings=(repl, repl, repl),
        )
        # teacher outputs: feats are batch-leading (shardable on 'data')
        # but head outputs are LAYER-leading (L, B, Q, ...) — leave their
        # shardings to the compiler (None = committed/inferred) rather
        # than forcing axis-0 'data' onto the layer axis
        _sh_teacher = dict(in_shardings=(data, data))
        _sh_student = dict(
            in_shardings=(repl, repl, data, None, None, repl),
            out_shardings=(repl, repl, repl),
        )
    else:
        _sh_inline = _sh_teacher = _sh_student = {}

    if args.split_teacher:
        teacher_forward = _jit(_teacher_fwd_body, **_sh_teacher)
        student_train = _jit(_student_train_body, **_sh_student)

        def train_step(params, opt_state, batch, rng):
            t_feats, t_outs = teacher_forward(
                batch["images"], batch["lidar2img"]
            )
            return student_train(
                params, opt_state, batch, t_feats, t_outs, rng
            )
    else:

        def _inline_step(params, opt_state, batch, rng):
            t_feats, t_outs = _teacher_fwd_body(
                batch["images"], batch["lidar2img"]
            )
            return _student_train_body(
                params, opt_state, batch, t_feats, t_outs, rng
            )

        train_step = _jit(_inline_step, **_sh_inline)

    os.makedirs(args.work_dir, exist_ok=True)
    log_path = os.path.join(args.work_dir, "distill_log.jsonl")
    ckpt = CheckpointManager(
        os.path.join(args.work_dir, "checkpoints"), s_cfg
    )
    params = dvars["params"]
    rng = jax.random.PRNGKey(args.seed + 2)
    t0 = time.time()
    default_bs = args.data_parallel if args.data_parallel > 1 else 1
    bs = args.batch_size or default_bs
    if args.data_parallel > 1 and bs % args.data_parallel:
        raise SystemExit("--batch-size must be a multiple of --data-parallel")
    # multi-host (launch_multihost.py distill_train): each process feeds
    # its LOCAL shard of the global batch; shard_batch assembles the
    # global array (make_array_from_process_local_data) — same
    # single-controller recipe as tools/train.py
    rank, world = jax.process_index(), jax.process_count()
    if world > 1:
        assert mesh is not None, (
            "multi-process distill requires --data-parallel (the mesh "
            "spans all global devices)"
        )
        assert bs % world == 0, (bs, world)
    local_bs = bs // world
    for step in range(args.steps):
        local = synthetic_batch(
            t_cfg, batch_size=local_bs, seed=step + rank * 100003
        )
        if mesh is not None:
            from graph_detr4d_tpu.parallel import shard_batch

            batch = shard_batch(
                {k: np.asarray(v) for k, v in local.items()}, mesh
            )
        else:
            batch = {k: jnp.asarray(v) for k, v in local.items()}
        rng, sub = jax.random.split(rng)
        params, opt_state, metrics = train_step(
            params, opt_state, batch, sub
        )
        if ((step + 1) % args.log_interval == 0 or step == 0) and rank == 0:
            # logging is rank-0-gated (the fetch of replicated metric
            # scalars is fine on every rank; the files are shared)
            rec = {"step": step + 1}
            rec.update({k: float(v) for k, v in metrics.items()})
            rec["iter_time"] = (time.time() - t0) / (step + 1)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(rec)
    # save the bare student subtree so tools/test.py / distill_test.py can
    # load it into a plain GraphDETR4D (the lateral adapters are
    # distillation-only, mmdet_distill_train.py:88-92). Orbax saves are
    # COLLECTIVE — every rank must call save (rank-0-gating deadlocks the
    # shutdown barrier, CLAUDE.md multihost notes)
    ckpt.save_weights(
        args.steps, jax.tree.map(np.asarray, params["student"])
    )
    if rank == 0:
        print(f"saved student to {args.work_dir}/checkpoints")


if __name__ == "__main__":
    main()
