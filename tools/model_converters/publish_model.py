"""Publish a checkpoint: strip optimizer state, keep weights only, append a
content hash to the output name (reference:
tools/model_converters/publish_model.py — which torch.saves the stripped
state_dict and renames with the sha256 prefix).

  python tools/model_converters/publish_model.py \
      --in-dir work_dirs/detr4d/checkpoints --out-dir release/detr4d
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def tree_hash(params) -> str:
    import numpy as np
    import jax

    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(params)[0],
        key=lambda kv: str(kv[0]),
    ):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(leaf).tobytes())
    return h.hexdigest()[:8]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in-dir", required=True, help="orbax checkpoint dir")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--step", type=int, default=None)
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
    params = mngr.load_weights(
        jax.tree.map(np.asarray, state.params), step=args.step
    )
    if params is None:
        raise SystemExit(f"no checkpoint found in {args.in_dir}")

    digest = tree_hash(params)
    out = os.path.join(args.out_dir, f"published-{digest}")
    pub = CheckpointManager(out, cfg)
    pub.save_weights(0, jax.tree.map(np.asarray, params))
    print(f"published weights-only checkpoint to {out} (sha {digest})")


if __name__ == "__main__":
    main()
