"""AOT serving export: serialize the jitted inference function (forward +
NMS-free decode, weights embedded) to a portable StableHLO artifact via
``jax.export``.

Beyond-reference serving capability: the reference serves through the
full torch/mmcv Python stack every request (tools/test.py ->
model.simple_test). Here the whole inference program — backbone, FPN,
decoder, NMS-free decode (nms_free_coder.py:48-120 behavior) — is
lowered ahead of time into one multi-platform artifact that a serving
process deserializes and calls without the model code or config system;
XLA recompiles nothing at load time on the platforms baked in at export.

Usage:
  python tools/export_model.py --config detr4d_res50_deform_pe_testaug_2subset_12e \
      --checkpoint work_dirs/x/checkpoints --out work_dirs/export
  python tools/export_model.py --run work_dirs/export      # smoke the artifact
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
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--checkpoint", default=None, help="orbax ckpt dir")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument(
        "--platforms",
        default="cpu,tpu",
        help="comma-separated lowering platforms baked into the artifact",
    )
    p.add_argument("--out", default="work_dirs/export")
    p.add_argument(
        "--streaming",
        action="store_true",
        help="export the temporal model as TWO programs — encode "
        "(current-frame cams -> FPN features) and head (cur+cached "
        "prev features -> detections) — so a video-stream server "
        "reuses the previous frame's features and skips half the "
        "backbone work (models/detector.py forward_feats)",
    )
    p.add_argument(
        "--uint8-input",
        action="store_true",
        help="artifact ingests RAW uint8 pixels and normalizes on device "
        "(ModelConfig.device_normalize): 4x smaller request payload and "
        "host->device transfer than f32 — the production-serving default",
    )
    p.add_argument(
        "--no-verify",
        action="store_true",
        help="skip the deserialize+run-and-compare check after export",
    )
    p.add_argument(
        "--run",
        default=None,
        metavar="DIR",
        help="load an exported artifact and run it on a synthetic batch "
        "(no model code path)",
    )
    return p.parse_args()


def _extras_spec(cfg, batch_size):
    """Config-derived extra serving inputs, in artifact argument order.

    build_eval_step (parallel/step.py) feeds these from the batch; an
    artifact that omitted them would silently degrade: petrv2 skips the
    with_time velocity normalization when mean_time_stamp is None
    (models/petr_head.py), and cam_aware falls back to identity
    intrinsics for DepthNet (models/head.py)."""
    B, N = batch_size, cfg.head.num_cams
    spec = []
    if cfg.head_type == "petrv2" or (
        cfg.head_type == "petr_seg"
        and cfg.head.num_cams > cfg.head.num_frame_cams
    ):
        spec.append(("mean_time_stamp", (B,)))
    if cfg.head.cam_aware:
        spec.append(("intrinsics", (B, N, 4, 4)))
        spec.append(("ida_scale", (B, N)))
    if cfg.head.scale_pred:
        spec.append(("depth_factors", (B,)))
    return spec


def synth_extra(name, shape):
    """Plausible placeholder value for an extra input (smoke/verify)."""
    import numpy as np

    if name == "intrinsics":
        v = np.tile(np.eye(4, dtype=np.float32), shape[:-2] + (1, 1))
        v[..., 0, 0] = v[..., 1, 1] = 1000.0
        v[..., 0, 2], v[..., 1, 2] = 400.0, 225.0
        return v
    if name == "mean_time_stamp":
        return np.full(shape, 0.5, np.float32)
    return np.ones(shape, np.float32)


def _manifest_extras(manifest):
    """[(name, shape)] for the artifact's extra inputs, argument order."""
    return [
        (name, tuple(manifest["inputs"][name][0]))
        for name in manifest.get("extras", [])
    ]


def run_artifact(out_dir):
    """Serving-side path: manifest + bytes only, no model construction."""
    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    import numpy as np
    from jax import export

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    B = manifest["batch_size"]
    N = manifest["num_cams"]
    H, W = manifest["img_size"]
    rng = np.random.RandomState(0)
    if manifest["inputs"]["images"][1] == "uint8":
        images = rng.randint(0, 256, (B, N, H, W, 3), np.int64).astype(
            np.uint8
        )
    else:
        images = rng.randn(B, N, H, W, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    extras = [
        synth_extra(name, shape)
        for name, shape in _manifest_extras(manifest)
    ]
    if manifest.get("streaming"):
        s = manifest["streaming"]
        with open(os.path.join(out_dir, "encode.jaxexport"), "rb") as f:
            enc = export.deserialize(f.read())
        with open(os.path.join(out_dir, "head.jaxexport"), "rb") as f:
            head = export.deserialize(f.read())
        nf, keys = s["num_frame_cams"], s["feat_keys"]
        cur = enc.call(images[:, :nf])
        prev = enc.call(images[:, nf:])
        out = head.call(
            l2i,
            *extras,
            *[cur[k] for k in keys],
            *[prev[k] for k in keys],
        )
    else:
        with open(os.path.join(out_dir, "model.jaxexport"), "rb") as f:
            exp = export.deserialize(f.read())
        out = exp.call(images, l2i, *extras)
    det = {k: np.asarray(v) for k, v in out.items()}
    n_valid = int(det["valid"].sum())
    assert np.isfinite(det["bboxes"][det["valid"]]).all()
    print(
        json.dumps(
            {
                "artifact": out_dir,
                "platforms": manifest["platforms"],
                "streaming": bool(manifest.get("streaming")),
                "detections_shape": list(det["bboxes"].shape),
                "n_valid": n_valid,
            }
        )
    )


def main():
    args = parse_args()
    if args.run:
        run_artifact(args.run)
        return

    import jax

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    import jax.numpy as jnp
    import numpy as np
    from jax import export

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.core.coder import decode_batch
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.train.checkpoint import CheckpointManager

    if args.tiny:
        cfg = tiny_test_config()
        cfg_name = "tiny"
        if args.cfg_options:
            from graph_detr4d_tpu.configs import apply_overrides

            cfg = apply_overrides(cfg, args.cfg_options)
    else:
        from graph_detr4d_tpu.configs import get_config

        cfg_name = args.config
        cfg = get_config(cfg_name, args.cfg_options)
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = apply_env_kernel_overrides(cfg)

    # single-device serving defaults (measured on chip, PROFILE.md):
    # chunk the conv stack at 6 folded images and the head at batch 1 —
    # exact, and linear-scaling where the monolithic programs degrade
    import dataclasses

    if cfg.backbone.cam_chunk is None:
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, cam_chunk=6)
        )
    if cfg.head.batch_chunk is None and args.batch_size > 1:
        cfg = dataclasses.replace(
            cfg, head=dataclasses.replace(cfg.head, batch_chunk=1)
        )
    if args.uint8_input:
        # raw-pixel ingest: synthetic_batch emits uint8 and the model
        # normalizes in fp32 on device (models/detector.py extract_feats)
        cfg = dataclasses.replace(cfg, device_normalize=True)

    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=args.batch_size)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, imgs, l2i
    )
    if args.checkpoint:
        mngr = CheckpointManager(args.checkpoint, cfg)
        params = mngr.load_weights(
            jax.tree.map(np.asarray, variables["params"])
        )
        if params is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        variables = {**variables, "params": params}
        print(f"loaded weights from {args.checkpoint}")

    extras_spec = _extras_spec(cfg, args.batch_size)
    extras_np = [synth_extra(n, s) for n, s in extras_spec]
    extras_jnp = [jnp.asarray(v) for v in extras_np]
    extras_sds = [
        jax.ShapeDtypeStruct(s, jnp.float32) for _, s in extras_spec
    ]

    def infer(images, lidar2img, *extras):
        kw = {name: v for (name, _), v in zip(extras_spec, extras)}
        out = model.apply(variables, images, lidar2img, **kw)
        det = decode_batch(
            out,
            max_num=cfg.coder.max_num,
            post_center_range=cfg.coder.post_center_range,
            score_threshold=cfg.coder.score_threshold,
        )
        return {
            "bboxes": det.bboxes,
            "scores": det.scores,
            "labels": det.labels,
            "valid": det.valid,
        }

    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    os.makedirs(args.out, exist_ok=True)
    manifest = {
        "config": cfg_name,
        "batch_size": args.batch_size,
        "num_cams": cfg.head.num_cams,
        "img_size": list(cfg.img_size),
        "platforms": platforms,
        # kernel variants the artifact was traced with (config-driven;
        # an int8-DCN export differs numerically from the default)
        "kernel_variants": {
            "dcn_gather": cfg.backbone.dcn_gather,
            "msda_impl": cfg.head.msda_impl,
            "msda_late_proj": cfg.head.msda_late_proj,
            "stem_s2d": cfg.backbone.stem_s2d,
        },
        "inputs": {
            "images": [list(imgs.shape), str(imgs.dtype)],
            "lidar2img": [list(l2i.shape), str(l2i.dtype)],
            **{
                name: [list(shape), "float32"]
                for name, shape in extras_spec
            },
        },
        # extra inputs the config requires at serving time, in the
        # artifact's positional-argument order after (images, lidar2img)
        # — for streaming heads, after lidar2img and before the features
        "extras": [name for name, _ in extras_spec],
        "outputs": ["bboxes", "scores", "labels", "valid"],
        # preprocessing contract: with on_device=False images must
        # arrive normalized as (raw - mean) / std; with on_device=True
        # (--uint8-input) raw pixels arrive and the artifact normalizes
        # (bgr=True means the model consumes BGR — petr/petrv2 families;
        # the client still supplies that channel order either way)
        "img_norm": {
            "mean": list(cfg.img_mean),
            "std": list(cfg.img_std),
            "bgr": cfg.img_bgr,
            "on_device": cfg.device_normalize,
        },
    }

    if args.streaming:
        nf = cfg.head.num_frame_cams
        if cfg.head.num_cams != 2 * nf:
            raise SystemExit(
                "--streaming needs num_cams == 2*num_frame_cams "
                f"(one cached sweep frame); got {cfg.head.num_cams} "
                f"vs num_frame_cams={nf}"
            )

        def encode(images):
            feats = model.apply(
                variables,
                images,
                False,
                None,
                method=GraphDETR4D.extract_feats,
            )
            return {f"feat{i}": f for i, f in enumerate(feats)}

        def head_infer(lidar2img, *rest):
            # rest = extras (manifest order), then L current + L cached
            # previous feature levels
            extras = rest[: len(extras_spec)]
            feats = rest[len(extras_spec) :]
            kw = {name: v for (name, _), v in zip(extras_spec, extras)}
            L = len(feats) // 2
            merged = [
                jnp.concatenate([c, p], axis=1)
                for c, p in zip(feats[:L], feats[L:])
            ]
            out = model.apply(
                variables,
                merged,
                lidar2img,
                method=GraphDETR4D.forward_feats,
                **kw,
            )
            det = decode_batch(
                out,
                max_num=cfg.coder.max_num,
                post_center_range=cfg.coder.post_center_range,
                score_threshold=cfg.coder.score_threshold,
            )
            return {
                "bboxes": det.bboxes,
                "scores": det.scores,
                "labels": det.labels,
                "valid": det.valid,
            }

        imgs6 = jax.ShapeDtypeStruct(
            (args.batch_size, nf) + imgs.shape[2:], imgs.dtype
        )
        enc_exp = export.export(jax.jit(encode), platforms=platforms)(imgs6)
        feat_shapes = jax.eval_shape(encode, imgs6)
        feat_keys = sorted(feat_shapes, key=lambda k: int(k[4:]))
        feat_sds = [
            jax.ShapeDtypeStruct(feat_shapes[k].shape, feat_shapes[k].dtype)
            for k in feat_keys
        ]
        head_exp = export.export(jax.jit(head_infer), platforms=platforms)(
            jax.ShapeDtypeStruct(l2i.shape, l2i.dtype),
            *extras_sds,
            *(feat_sds + feat_sds),
        )
        enc_blob, head_blob = enc_exp.serialize(), head_exp.serialize()
        manifest["streaming"] = {
            "num_frame_cams": nf,
            "feat_keys": feat_keys,
            "feat_shapes": [list(s.shape) for s in feat_sds],
            "feat_dtype": str(feat_sds[0].dtype),
        }
        manifest["size_bytes"] = len(enc_blob) + len(head_blob)

        # verify BEFORE any file lands on disk, so a failed check never
        # leaves a complete-looking broken artifact behind. Two separate
        # claims, checked separately:
        # 1) serialization fidelity: the deserialized programs equal a
        #    direct jit of the same functions (tight tol);
        # 2) composition semantics: encode-halves + head equals the
        #    monolithic forward in RAW head-output space. Raw space, not
        #    decoded detections: decode ends in a top-k, and with bf16
        #    the conv batch-fold differs between the paths (nf vs 2*nf),
        #    so near-tied scores can flip ranks and reorder the top-k —
        #    an elementwise compare of decoded rows then reports huge
        #    mismatches that are pure reordering (seen on TPU at
        #    640x1600; decode exactness itself is golden-locked in
        #    tests/test_coder.py).
        if not args.no_verify:
            e2 = export.deserialize(enc_blob)
            h2 = export.deserialize(head_blob)
            cur = e2.call(imgs[:, :nf])
            prev = e2.call(imgs[:, nf:])
            cur_direct = jax.jit(encode)(imgs[:, :nf])
            for k in feat_keys:
                np.testing.assert_allclose(
                    np.asarray(cur[k], np.float32),
                    np.asarray(cur_direct[k], np.float32),
                    rtol=1e-5,
                    atol=1e-5,
                    err_msg=f"encode artifact fidelity: {k}",
                )
            got = h2.call(
                l2i,
                *extras_jnp,
                *[cur[k] for k in feat_keys],
                *[prev[k] for k in feat_keys],
            )
            got_direct = jax.jit(head_infer)(
                l2i,
                *extras_jnp,
                *[cur[k] for k in feat_keys],
                *[prev[k] for k in feat_keys],
            )
            for k in got:
                np.testing.assert_allclose(
                    np.asarray(got[k], np.float32),
                    np.asarray(got_direct[k], np.float32),
                    rtol=1e-5,
                    atol=1e-5,
                    err_msg=f"head artifact fidelity: {k}",
                )

            def raw_stream(images):
                feats = model.apply(
                    variables,
                    images[:, :nf],
                    False,
                    None,
                    method=GraphDETR4D.extract_feats,
                )
                feats_prev = model.apply(
                    variables,
                    images[:, nf:],
                    False,
                    None,
                    method=GraphDETR4D.extract_feats,
                )
                merged = [
                    jnp.concatenate([c, p], axis=1)
                    for c, p in zip(feats, feats_prev)
                ]
                kw = {
                    name: v
                    for (name, _), v in zip(extras_spec, extras_jnp)
                }
                return model.apply(
                    variables,
                    merged,
                    l2i,
                    method=GraphDETR4D.forward_feats,
                    **kw,
                )

            def raw_mono(images):
                kw = {
                    name: v
                    for (name, _), v in zip(extras_spec, extras_jnp)
                }
                return model.apply(variables, images, l2i, **kw)

            rs = jax.jit(raw_stream)(imgs)
            rm = jax.jit(raw_mono)(imgs)
            tol = 5e-2 if cfg.bf16 else 1e-4
            np.testing.assert_allclose(
                jax.nn.sigmoid(
                    np.asarray(rs["all_cls_scores"][-1], np.float32)
                ),
                jax.nn.sigmoid(
                    np.asarray(rm["all_cls_scores"][-1], np.float32)
                ),
                rtol=tol,
                atol=tol,
                err_msg="composition: final-layer scores",
            )
            np.testing.assert_allclose(
                np.asarray(rs["all_bbox_preds"][-1], np.float32),
                np.asarray(rm["all_bbox_preds"][-1], np.float32),
                rtol=tol,
                atol=tol,
                err_msg="composition: final-layer boxes",
            )
            print(
                "verify: artifacts match direct jit; streaming "
                "encode+head composition matches monolithic forward "
                "(raw head outputs)"
            )

        with open(os.path.join(args.out, "encode.jaxexport"), "wb") as f:
            f.write(enc_blob)
        with open(os.path.join(args.out, "head.jaxexport"), "wb") as f:
            f.write(head_blob)
        with open(os.path.join(args.out, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        print(json.dumps({"exported": args.out, **manifest}))
        return

    exp = export.export(jax.jit(infer), platforms=platforms)(
        jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        jax.ShapeDtypeStruct(l2i.shape, l2i.dtype),
        *extras_sds,
    )
    blob = exp.serialize()
    manifest["size_bytes"] = len(blob)

    if not args.no_verify:
        exp2 = export.deserialize(blob)
        got = exp2.call(imgs, l2i, *extras_jnp)
        want = jax.jit(infer)(imgs, l2i, *extras_jnp)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]),
                np.asarray(want[k]),
                rtol=2e-5,
                atol=2e-5,
                err_msg=k,
            )

    with open(os.path.join(args.out, "model.jaxexport"), "wb") as f:
        f.write(blob)
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps({"exported": args.out, **manifest}))
    if not args.no_verify:
        print("verify: deserialized artifact matches direct inference")


if __name__ == "__main__":
    main()
