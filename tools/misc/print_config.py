"""Print a fully-resolved named config (reference: tools/misc/print_config.py).

  python tools/misc/print_config.py --config detr4d_res50_deform_pe_testaug_2subset_12e \
      [--cfg-options head.num_query=600]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument("--list", action="store_true", help="list config names")
    args = p.parse_args()

    from graph_detr4d_tpu.configs import (
        get_config,
        list_configs,
        list_distill_configs,
    )

    if args.list or not args.config:
        print("model configs:")
        for n in list_configs():
            print(f"  {n}")
        print("distill configs:")
        for n in list_distill_configs():
            print(f"  {n}")
        return

    cfg = get_config(args.config, overrides=args.cfg_options)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
