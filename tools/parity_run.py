"""One-command real-data parity harness: .pth -> convert -> eval -> compare.

The reference's parity protocol is `tools/test.py CFG CKPT --eval bbox`
(tools/test.py:234-243 -> dataset.evaluate -> devkit mAP/NDS). This wraps
the TPU-native equivalent into one command so that the moment a reference
checkpoint + nuScenes infos pkl exist, parity is:

    python tools/parity_run.py \
        --pth work_dirs/.../epoch_12.pth \
        --ann-file data/nuscenes/mmdet3d_nuscenes_30f_infos_val.pkl \
        --config detr4d_res50_deform_pe_testaug_2subset_12e

It converts the torch checkpoint (tools/convert_checkpoint.py — golden-
locked per family), runs the eval CLI (tools/test.py) over the val pkl,
and prints ONE JSON line comparing mAP/NDS against BASELINE.md's row for
the config family, with a nonzero exit iff --require-parity and the gap
exceeds --tolerance.

Dry-run proof: tests/test_tools.py::test_parity_run_dry_run exercises the
full command on a synthetic fixture + tiny exported .pth, so the command
is known-good before real assets exist.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BASELINE.md rows (reference README.md:19-21): nuScenes VAL numbers by
# config family. Keys are matched as config-name prefixes.
BASELINES = {
    "detr4d": {"mAP": 34.2, "NDS": 44.5},  # Graph-DETR4D
    "graph_detr3d": {"mAP": 32.2, "NDS": 38.1},
    "detr3d": {"mAP": 28.9, "NDS": 34.2},
}


def baseline_for(config_name: str):
    for prefix, row in BASELINES.items():
        if config_name.startswith(prefix):
            return row
    return None


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--ann-file", required=True, help="val infos pkl")
    p.add_argument("--config", default=None, help="named config")
    p.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    p.add_argument("--work-dir", default="work_dirs/parity")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument(
        "--num-decoder-layers",
        type=int,
        default=None,
        help="converter hint; defaults to the config's value",
    )
    p.add_argument("--baseline-map", type=float, default=None)
    p.add_argument("--baseline-nds", type=float, default=None)
    p.add_argument(
        "--tolerance",
        type=float,
        default=0.5,
        help="allowed mAP/NDS shortfall (points) under --require-parity",
    )
    p.add_argument("--require-parity", action="store_true")
    p.add_argument(
        "--tta-resizes",
        default=None,
        help="comma-separated resize multipliers for test-time aug "
        "feature averaging (tools/test.py --tta-resizes). The flagship "
        "parity target detr4d_res50_deform_pe_*testaug* is a test-aug "
        "protocol (ref models/detectors/detr3d.py:191-216 aug_test): "
        "pass e.g. 1.0,0.9,1.1 to measure the protocol the config names",
    )
    p.add_argument(
        "--extra-test-args",
        nargs="*",
        default=None,
        help="passed through to tools/test.py verbatim",
    )
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    # ---- resolve config dims for the converter
    if args.tiny:
        from graph_detr4d_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        cfg_name = "tiny"
    else:
        from graph_detr4d_tpu.configs import get_config

        assert args.config, "--config or --tiny required"
        cfg = get_config(args.config, overrides=args.cfg_options)
        cfg_name = args.config
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = apply_env_kernel_overrides(cfg)
    layers = args.num_decoder_layers or cfg.head.num_decoder_layers

    # ---- 1. convert the torch checkpoint
    import torch
    import numpy as np
    from tools.convert_checkpoint import convert_state_dict

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    variables = convert_state_dict(sd, layers, cfg.head.num_heads)

    import orbax.checkpoint as ocp

    conv_dir = os.path.abspath(os.path.join(args.work_dir, "converted"))
    if os.path.exists(conv_dir):
        import shutil

        shutil.rmtree(conv_dir)
    ocp.StandardCheckpointer().save(conv_dir, variables)
    print(f"[parity] converted {len(sd)} tensors -> {conv_dir}", flush=True)

    # ---- 2. eval via tools/test.py (same process env; the platform
    # override is inherited)
    out_json = os.path.join(args.work_dir, "parity_results.json")
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "test.py"),
        "--ann-file",
        args.ann_file,
        "--checkpoint",
        conv_dir,
        "--work-dir",
        args.work_dir,
        "--out",
        out_json,
    ]
    if args.tiny:
        cmd.append("--tiny")
    else:
        cmd += ["--config", args.config]
        if args.cfg_options:
            cmd += ["--cfg-options", *args.cfg_options]
    if args.max_samples is not None:
        cmd += ["--max-samples", str(args.max_samples)]
    if args.tta_resizes:
        cmd += ["--tta-resizes", args.tta_resizes]
    elif "testaug" in cfg_name:
        print(
            "[parity] WARNING: config name says testaug but no "
            "--tta-resizes given — evaluating single-pass, which is NOT "
            "the protocol the config names",
            flush=True,
        )
    if args.extra_test_args:
        cmd += args.extra_test_args
    print(f"[parity] eval: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd)
    if r.returncode != 0:
        print(json.dumps({"error": "eval failed", "rc": r.returncode}))
        sys.exit(2)

    with open(out_json) as f:
        metrics = json.load(f)["metrics"]

    # ---- 3. compare against the baseline row
    row = baseline_for(cfg_name) or {}
    b_map = args.baseline_map if args.baseline_map is not None else row.get("mAP")
    b_nds = args.baseline_nds if args.baseline_nds is not None else row.get("NDS")
    got_map = 100.0 * metrics["mAP"]
    got_nds = 100.0 * metrics["NDS"]
    verdict = {
        "config": cfg_name,
        "mAP": round(got_map, 2),
        "NDS": round(got_nds, 2),
        "baseline_mAP": b_map,
        "baseline_NDS": b_nds,
        "delta_mAP": round(got_map - b_map, 2) if b_map is not None else None,
        "delta_NDS": round(got_nds - b_nds, 2) if b_nds is not None else None,
    }
    ok = True
    if args.require_parity:
        # gate on whichever baselines exist (a one-sided --baseline-map
        # or --baseline-nds must not crash or be silently ignored)
        checks = []
        if b_map is not None:
            checks.append(got_map >= b_map - args.tolerance)
        if b_nds is not None:
            checks.append(got_nds >= b_nds - args.tolerance)
        if not checks:
            print(json.dumps({**verdict, "error": "no baseline row"}))
            sys.exit(2)
        ok = all(checks)
        verdict["parity"] = bool(ok)
    print(json.dumps(verdict))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
