"""Fold frozen-BN statistics into adjacent conv kernels for inference
(reference: tools/misc/fuse_conv_bn.py — mmcv's fuse_conv_bn over a torch
checkpoint).

Our backbones run BN as a frozen per-channel affine (models/layers.py
FrozenBatchNorm), i.e. y = conv(x) * scale + bias with
scale = gamma / sqrt(var + eps), bias = beta - mean * scale. This tool
rewrites the params/batch_stats so that every FrozenBatchNorm that
directly follows a conv becomes the identity (gamma=1, beta=0, mean=0,
var=1) with the conv kernel pre-scaled — removing an elementwise op per
conv at inference.

  python tools/misc/fuse_conv_bn.py --in-dir CKPT --out-dir CKPT_FUSED [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

EPS = 1e-5

# conv child -> bn sibling naming patterns used by our backbones
FUSE_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("stem_conv", "stem_bn"),
    ("downsample_conv", "downsample_bn"),
    ("expand", "expand_bn"),
    ("dw", "dw_bn"),
    ("project", "project_bn"),
)


def fuse_tree(params: dict, stats: dict):
    """Recursively fold bn stats into conv kernels where a known
    (conv, bn) sibling pair exists under the same module scope."""
    import numpy as np

    n_fused = 0

    def visit(p: dict, s: dict):
        nonlocal n_fused
        for conv_name, bn_name in FUSE_PAIRS:
            if (
                isinstance(p.get(conv_name), dict)
                and "kernel" in p[conv_name]
                and isinstance(s.get(bn_name), dict)
                and "mean" in s[bn_name]
            ):
                bn = s[bn_name]
                scale = np.asarray(bn["gamma"]) / np.sqrt(
                    np.asarray(bn["var"]) + EPS
                )
                bias = np.asarray(bn["beta"]) - np.asarray(bn["mean"]) * scale
                k = np.asarray(p[conv_name]["kernel"])
                # scale folds into the conv kernel (output channels);
                # the additive part stays as the BN's beta (our convs are
                # bias-less, and a frozen BN with gamma=1/var=1/mean=0 is a
                # pure add that XLA fuses into the conv epilogue)
                p[conv_name]["kernel"] = (k * scale).astype(k.dtype)
                if "bias" in p[conv_name]:
                    p[conv_name]["bias"] = (
                        np.asarray(p[conv_name]["bias"]) * scale
                    ).astype(k.dtype)
                bn["gamma"] = np.ones_like(bn["gamma"])
                bn["beta"] = bias.astype(np.asarray(bn["beta"]).dtype)
                bn["mean"] = np.zeros_like(bn["mean"])
                bn["var"] = (
                    np.ones_like(bn["var"]) * (1.0 - EPS)
                )  # sqrt(var+eps) == 1 exactly
                n_fused += 1
        for key, child in p.items():
            if isinstance(child, dict) and key in s and isinstance(
                s[key], dict
            ):
                visit(child, s[key])

    visit(params, stats)
    return n_fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--config", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    from graph_detr4d_tpu.config import ModelConfig, tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.parallel.step import init_state
    from graph_detr4d_tpu.train.checkpoint import CheckpointManager

    if args.tiny:
        cfg = tiny_test_config()
    elif args.config:
        from graph_detr4d_tpu.configs import get_config

        cfg = get_config(args.config)
    else:
        cfg = ModelConfig()
    model = GraphDETR4D(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    mngr = CheckpointManager(args.in_dir, cfg)
    restored = mngr.restore(jax.tree.map(np.asarray, state))
    if restored is None:
        raise SystemExit(f"no checkpoint in {args.in_dir}")

    params = jax.tree.map(np.asarray, restored.params)
    stats = jax.tree.map(np.asarray, restored.batch_stats)
    # plain nested dicts for in-place rewriting
    import flax

    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    n = fuse_tree(params, stats)
    out = CheckpointManager(args.out_dir, cfg)
    out.save(
        int(restored.step),
        restored.replace(params=params, batch_stats=stats),
    )
    print(f"fused {n} conv+bn pairs -> {args.out_dir}")


if __name__ == "__main__":
    main()
