"""On-chip train-step timing: flagship train step and distill train step.

VERDICT r1 item 8: the instance-distill matcher solves a square
teacher-queries x student-queries Jonker-Volgenant per decoder stage per
image — time it on the real chip, full rows vs --teacher-top-k capped.

Timing chains steps through the params data dependency (step i+1 consumes
step i's params) and ends with a host fetch of the loss — the
block_until_ready-free protocol this runtime requires (CLAUDE.md).

Usage:
  python tools/time_train_steps.py                   # flagship train step
  python tools/time_train_steps.py --distill         # distill step (full JV)
  python tools/time_train_steps.py --distill --teacher-top-k 32
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="detr4d_res50_deform_pe_testaug_2subset_12e")
    p.add_argument("--distill-config", default="mixdistill_r50_r18_cls_reg_2subset")
    p.add_argument("--distill", action="store_true")
    p.add_argument("--teacher-top-k", type=int, default=None)
    p.add_argument(
        "--split-teacher",
        action="store_true",
        help="run the frozen teacher forward as its OWN executable "
        "instead of inlining it into the student train program. "
        "Mathematically identical (teacher outputs are stop-gradient "
        "constants); halves the per-program size. NOTE: on the axon "
        "TPU runtime the two-executable handoff itself crashes the "
        "worker even with gather4 and both halves fitting HBM "
        "(student 13.34 GB / teacher 0.84 GB, PROFILE.md round 5) "
        "while the inline gather4 control runs at 1051 ms/step — "
        "split is for other runtimes",
    )
    p.add_argument(
        "--teacher-msda",
        default=None,
        help="with --split-teacher: override the teacher program's "
        "msda_impl (e.g. shift4h) — lifts the bundle's gather4 distill "
        "pin for the teacher half only, which runs as a single-model "
        "program",
    )
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument(
        "--cfg-options", nargs="*", default=["backbone.remat=true", "head.cam_capacity=0.5"]
    )
    p.add_argument(
        "--memory-analysis",
        action="store_true",
        help="compile the step and print XLA's HBM breakdown WITHOUT "
        "executing — safe on a worker that an OOM would crash (the "
        "axon worker dies with a kernel fault instead of a clean OOM, "
        "degrading the tunnel; see CLAUDE.md postmortems)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    from graph_detr4d_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import json
    import optax

    from graph_detr4d_tpu.configs import get_config
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.train.optim import build_optimizer

    print("devices:", jax.devices(), flush=True)

    if args.distill:
        from graph_detr4d_tpu.configs import get_distill_config
        from graph_detr4d_tpu.distill import Distiller, DistillConfig, distill_loss

        bundle = get_distill_config(args.distill_config)
        from graph_detr4d_tpu.configs import apply_env_kernel_overrides

        # CLI-layer kernel-variant overrides (GRD4D_MSDA_IMPL /
        # GRD4D_DCN_GATHER / GRD4D_MSDA_LATEPROJ) apply to BOTH models —
        # the same A/B instrument the flagship branch has
        t_cfg = apply_env_kernel_overrides(bundle.teacher)
        s_cfg = apply_env_kernel_overrides(bundle.student)
        if args.teacher_msda:
            import dataclasses

            assert args.split_teacher, "--teacher-msda requires --split-teacher"
            t_cfg = dataclasses.replace(
                t_cfg,
                head=dataclasses.replace(
                    t_cfg.head, msda_impl=args.teacher_msda
                ),
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
            teacher_top_k=args.teacher_top_k,
        )
        teacher = GraphDETR4D(t_cfg)
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(
                t_cfg, batch_size=args.batch_size, seed=0
            ).items()
        }
        imgs, l2i = batch["images"], batch["lidar2img"]
        tvars = jax.jit(teacher.init)({"params": jax.random.PRNGKey(0)}, imgs, l2i)
        t_qe = tvars["params"]["head"]["query_embedding"] if bundle.mix else None
        dist = Distiller(
            student_cfg=s_cfg, teacher_feat_channels=t_cfg.neck.out_channels
        )
        dvars = jax.jit(dist.init)(
            {"params": jax.random.PRNGKey(1)}, imgs, l2i, teacher_query_embed=t_qe
        )
        tx = build_optimizer(s_cfg.train)
        opt_state = tx.init(dvars["params"])
        rng = jax.random.PRNGKey(7)

        def _teacher_fwd_body(images):
            # one teacher backbone pass (same structure as
            # tools/distill_train.py): extract once, head on the
            # features — a second full apply doubles the teacher's live
            # activations when XLA misses the CSE across remat scopes
            t_feats = teacher.apply(
                tvars, images, False, None, method=GraphDETR4D.extract_feats
            )
            t_feats = [jax.lax.stop_gradient(f) for f in t_feats]
            t_outs = teacher.apply(
                tvars, t_feats, l2i, method=GraphDETR4D.forward_feats
            )
            return t_feats, t_outs

        def _student_loss_grads(params, opt_state, t_feats, t_outs):
            def loss_fn(p):
                variables = {**dvars, "params": p}
                s_outs, adapted = dist.apply(
                    variables,
                    imgs,
                    l2i,
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
            return optax.apply_updates(params, updates), opt_state, loss

        params = dvars["params"]
        split = " split" if args.split_teacher else ""
        tmsda = f" tmsda={args.teacher_msda}" if args.teacher_msda else ""
        tag = (
            f"distill[{args.distill_config}] top_k={args.teacher_top_k}"
            f"{split}{tmsda}"
        )

        if args.split_teacher:
            # two executables per step: teacher inference, then student
            # train. The chain carry feeds the teacher's input so the
            # timed loop serializes both dispatches per iteration.
            teacher_fwd = jax.jit(
                lambda carry: _teacher_fwd_body(imgs + carry * 1e-12)
            )
            student_step = jax.jit(_student_loss_grads)
            _carry = {"v": jnp.float32(0.0)}

            def step(params, opt_state):
                t_feats, t_outs = teacher_fwd(_carry["v"])
                params, opt_state, loss = student_step(
                    params, opt_state, t_feats, t_outs
                )
                _carry["v"] = loss
                return params, opt_state, loss

            def lower_step():
                # memory analysis of the STUDENT program (the big half);
                # the teacher program's analysis prints separately below
                t_shapes = jax.eval_shape(teacher_fwd, jnp.float32(0.0))
                return student_step.lower(params, opt_state, *t_shapes)

            def lower_teacher():
                return teacher_fwd.lower(jnp.float32(0.0))
        else:

            @jax.jit
            def step(params, opt_state):
                t_feats, t_outs = _teacher_fwd_body(imgs)
                return _student_loss_grads(params, opt_state, t_feats, t_outs)

            def lower_step():
                return step.lower(params, opt_state)

            lower_teacher = None
    else:
        from graph_detr4d_tpu.parallel.step import build_train_step, init_state

        cfg = get_config(args.config, args.cfg_options)
        from graph_detr4d_tpu.configs import apply_env_kernel_overrides

        cfg = apply_env_kernel_overrides(cfg)
        model = GraphDETR4D(cfg)
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(
                cfg, batch_size=args.batch_size, seed=0
            ).items()
        }
        train_step = build_train_step(model, cfg)
        tstate = init_state(model, cfg, jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(7)

        def step(params, opt_state):
            nonlocal tstate
            tstate, metrics = train_step(tstate, batch, rng)
            return None, None, metrics["loss"]

        params = opt_state = None
        tag = f"train[{args.config}] bs={args.batch_size}"

        def lower_step():
            return train_step.lower(tstate, batch, rng)

        lower_teacher = None

    if args.memory_analysis:

        def report(lowered, what):
            ma = lowered.compile().memory_analysis()
            out = {"what": f"memory[{what}]"}
            for k in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "alias_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                v = getattr(ma, k, None)
                if v is not None:
                    out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
            # peak live = args + temps (outputs alias args where donated)
            if "temp_size_gb" in out and "argument_size_gb" in out:
                out["peak_gb_approx"] = round(
                    out["temp_size_gb"] + out["argument_size_gb"], 3
                )
            print(json.dumps(out), flush=True)

        report(lower_step(), tag)
        if lower_teacher is not None:
            report(lower_teacher(), f"{tag} :: teacher program")
        return

    # compile + warm: 2 steps, force with host fetch of the loss
    params, opt_state, loss = step(params, opt_state)
    print(f"{tag}: first-step loss {float(loss):.3f} (compiled)", flush=True)
    params, opt_state, loss = step(params, opt_state)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = step(params, opt_state)
    final = float(loss)  # forces the whole chain
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(
        json.dumps(
            {"what": tag, "step_ms": round(ms, 1), "iters": args.iters, "final_loss": final}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
