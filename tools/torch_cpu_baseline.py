"""PyTorch-CPU baseline for the bench target (BASELINE.md: ">=5x
PyTorch-CPU 6-cam fps"). Since the reference's mmcv/mmdet3d stack is not
installable here, this reimplements the same compute graph in plain torch
(from scratch, CPU): ResNet-50 + FPN over 6 cameras at the test resolution,
plus a 6-layer DETR3D-style decoder with 900 queries doing projection +
grid_sample deformable gathering — the reference's benchmark.py protocol
(warmup 5, timed loop, "Overall fps").

Run: python tools/torch_cpu_baseline.py  -> writes BASELINE_CPU.json
"""

import json
import time
import sys

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d(3, 2, 1),
        )
        blocks = [3, 4, 6, 3]
        cin, width = 64, 64
        self.stages = nn.ModuleList()
        for s, n in enumerate(blocks):
            layers = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                layers.append(Bottleneck(cin, width, stride))
                cin = width * 4
            self.stages.append(nn.Sequential(*layers))
            width *= 2

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for st in self.stages:
            x = st(x)
            outs.append(x)
        return outs


class Model(nn.Module):
    def __init__(self, num_query=900, C=256, layers=6):
        super().__init__()
        self.backbone = ResNet50()
        self.lateral = nn.ModuleList(
            [nn.Conv2d(c, C, 1) for c in (512, 1024, 2048)]
        )
        self.fpn = nn.ModuleList([nn.Conv2d(C, C, 3, padding=1) for _ in range(3)])
        self.extra = nn.Conv2d(C, C, 3, 2, 1)
        self.query = nn.Parameter(torch.randn(num_query, 2 * C))
        self.layers = layers
        self.self_attn = nn.ModuleList(
            [nn.MultiheadAttention(C, 8, batch_first=True) for _ in range(layers)]
        )
        self.offs = nn.ModuleList([nn.Linear(C, 8 * 4 * 3) for _ in range(layers)])
        self.attnw = nn.ModuleList([nn.Linear(C, 8 * 4 * 4) for _ in range(layers)])
        self.vproj = nn.ModuleList([nn.Linear(C, C) for _ in range(layers)])
        self.oproj = nn.ModuleList([nn.Linear(C, C) for _ in range(layers)])
        self.ffn = nn.ModuleList(
            [
                nn.Sequential(nn.Linear(C, 512), nn.ReLU(), nn.Linear(512, C))
                for _ in range(layers)
            ]
        )
        self.cls = nn.ModuleList([nn.Linear(C, 10) for _ in range(layers)])
        self.reg = nn.ModuleList([nn.Linear(C, 10) for _ in range(layers)])

    def forward(self, imgs, lidar2img):
        B, N, _, H, W = imgs.shape
        feats = self.backbone(imgs.flatten(0, 1))[1:]
        lat = [l(f) for l, f in zip(self.lateral, feats)]
        for i in range(2, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(lat[i], scale_factor=2)
        outs = [conv(x) for conv, x in zip(self.fpn, lat)]
        outs.append(self.extra(F.relu(outs[-1])))

        C = outs[0].shape[1]
        qp, q = self.query.split(C, dim=1)
        q = q[None].expand(B, -1, -1)
        qp = qp[None].expand(B, -1, -1)
        ref = torch.rand(B, q.shape[1], 3)
        for lid in range(self.layers):
            q = self.self_attn[lid](q + qp, q + qp, q)[0] + q
            # projection + per-level grid_sample gather (4 points x 8 heads)
            off = self.offs[lid](q).view(B, -1, 8 * 4, 3)
            pts = ref[:, :, None] * 102.4 - 51.2 + off
            hom = torch.cat([pts, torch.ones_like(pts[..., :1])], -1)
            cam = torch.einsum("bnij,bqkj->bnqki", lidar2img, hom)
            loc = cam[..., :2] / cam[..., 2:3].clamp(min=1e-5)
            loc = loc / torch.tensor([W, H]) * 2 - 1
            gathered = 0
            for f in outs:
                g = F.grid_sample(
                    f,
                    loc.flatten(0, 1),
                    align_corners=False,
                    padding_mode="zeros",
                )
                gathered = gathered + g.mean(-1).permute(0, 2, 1).view(
                    B, N, -1, C
                )
            w = self.attnw[lid](q)
            q = q + self.oproj[lid](
                self.vproj[lid](gathered.sum(1)) * w.mean(-1, keepdim=True)
            )
            q = q + self.ffn[lid](q)
            self.cls[lid](q), self.reg[lid](q)
        return q


def main(iters=5, H=640, W=1600, N=6):
    torch.set_grad_enabled(False)
    torch.set_num_threads(torch.get_num_threads())
    model = Model().eval()
    imgs = torch.randn(1, N, 3, H, W)
    l2i = torch.eye(4).expand(1, N, 4, 4).contiguous()
    # warmup (reference benchmark.py warms 5; CPU is slow, use 1)
    model(imgs, l2i)
    t0 = time.perf_counter()
    for _ in range(iters):
        model(imgs, l2i)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt
    out = {
        "metric": "pytorch_cpu_6cam_fps",
        "value": fps,
        "sec_per_sample": dt,
        "img_hw": [H, W],
        "num_cams": N,
    }
    with open("BASELINE_CPU.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main(iters=int(sys.argv[1]) if len(sys.argv) > 1 else 5)
