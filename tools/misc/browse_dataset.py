"""Browse dataset samples: dump each camera image with projected GT box
centers marked (reference: tools/misc/browse_dataset.py).

  python tools/misc/browse_dataset.py --ann-file infos.pkl --out-dir browse/
"""

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--out-dir", default="browse")
    p.add_argument("--max-samples", type=int, default=5)
    args = p.parse_args()

    from graph_detr4d_tpu.data.nuscenes import NuScenesSweepDataset
    from graph_detr4d_tpu.data.pipeline import load_image
    from tools.misc.visualize_results import save_png

    ds = NuScenesSweepDataset(args.ann_file, max_gt=128)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.max_samples, len(ds))):
        s = ds.sample(i)
        gt = s["gt_bboxes"][s["gt_valid"] > 0]
        centers = np.concatenate(
            [gt[:, :3], np.ones((len(gt), 1))], axis=1
        )
        for ci, (path, l2i) in enumerate(
            zip(s["image_paths"], s["lidar2img"])
        ):
            img = load_image(path).astype(np.float32)
            proj = centers @ np.asarray(l2i).T
            z = np.maximum(proj[:, 2:3], 1e-5)
            uv = proj[:, :2] / z
            vis = ((proj[:, 2] > 0.1)
                   & (uv[:, 0] >= 0) & (uv[:, 0] < img.shape[1])
                   & (uv[:, 1] >= 0) & (uv[:, 1] < img.shape[0]))
            out = img.copy()
            for u, v in uv[vis]:
                u, v = int(u), int(v)
                out[max(v - 4, 0) : v + 4, max(u - 4, 0) : u + 4] = [
                    255, 0, 0,
                ]
            dst = os.path.join(
                args.out_dir, f"sample{i:04d}_cam{ci}.png"
            )
            save_png(dst, out.astype(np.uint8))
            print(dst, f"({int(vis.sum())} centers in view)")


if __name__ == "__main__":
    main()
