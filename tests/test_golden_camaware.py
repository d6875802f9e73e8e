"""Golden test: the camera-aware DepthNet vs a torch oracle.

The oracle re-implements Detr3DHeadPECAM's DepthNet
(detr3d_head_pe_camaware.py:59-105): reduce_conv Sequential
(Conv3x3 + BatchNorm2d + ReLU), pixel size from the inverse intrinsics
(norm of (inv00, inv11), :87-91), the aug-scale QUIRK
`sqrt(ida00^2 + ida00^2)` (ida[0,0] used twice, :93-95), a 1->mid->mid
ReLU Mlp of the scaled pixel size, and the SE gate. `context_conv` is
dead code in the reference forward (computed, never returned, :84-85).

Weights flow through tools/convert_checkpoint.convert_state_dict's new
depth_net mapping, so this also locks the .pth layout for the cam-aware
head family.

Note: the reference's DepthNet BN is a live BatchNorm2d (the head is not
under the backbone's norm_eval); we evaluate it with running stats
(FrozenBatchNorm), which is exact for inference/eval parity.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_checkpoint import convert_state_dict  # noqa: E402

B, N, H, W = 1, 3, 5, 7
CIN = 16
MID = 16  # reference uses DepthNet(256, 256, 80); mid == in here


class DepthNetOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.reduce_conv = tnn.Sequential(
            tnn.Conv2d(CIN, MID, 3, padding=1),
            tnn.BatchNorm2d(MID),
            tnn.ReLU(inplace=True),
        )
        self.context_conv = tnn.Conv2d(MID, 4, 1)  # dead in forward
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(1, MID)
        self.mlp.fc2 = tnn.Linear(MID, MID)
        self.se_reduce = tnn.Conv2d(MID, MID, 1)
        self.se_expand = tnn.Conv2d(MID, MID, 1)

    def forward(self, x, intrin, ida, scale_depth_factor=1000.0):
        # x: (N, CIN, H, W); intrin (N, 4, 4); ida (N, 3, 3)
        x = self.reduce_conv(x)
        inv = torch.inverse(intrin)
        pixel_size = torch.norm(
            torch.stack([inv[..., 0, 0], inv[..., 1, 1]], dim=-1), dim=-1
        ).reshape(-1, 1)
        aug_scale = torch.sqrt(
            ida[..., 0, 0] ** 2 + ida[..., 0, 0] ** 2
        ).reshape(-1, 1)
        scaled = pixel_size * scale_depth_factor / aug_scale
        x_se = self.mlp.fc2(torch.relu(self.mlp.fc1(scaled)))[
            ..., None, None
        ]
        gate = torch.sigmoid(
            self.se_expand(torch.relu(self.se_reduce(x_se)))
        )
        return x * gate

    def state_dict_ref_layout(self):
        """Keys in the reference's layout (se.conv_reduce/.conv_expand)."""
        sd = {}
        base = self.state_dict()
        for k, v in base.items():
            if k.startswith("se_reduce."):
                k = "se.conv_reduce." + k.split(".", 1)[1]
            elif k.startswith("se_expand."):
                k = "se.conv_expand." + k.split(".", 1)[1]
            sd["pts_bbox_head.depth_net." + k] = v.detach().numpy()
        return sd


def test_depth_net_matches_torch_oracle():
    from graph_detr4d_tpu.models.camera_aware import DepthNet

    torch.manual_seed(7)
    oracle = DepthNetOracle().eval()
    with torch.no_grad():
        for p in oracle.parameters():
            if p.dim() == 1:
                p.add_(torch.randn_like(p) * 0.05)
        # non-trivial BN running stats
        oracle.reduce_conv[1].running_mean.normal_(0.0, 0.2)
        oracle.reduce_conv[1].running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    x = torch.randn(N, CIN, H, W)
    intrin = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    for n in range(N):
        intrin[n, 0, 0] = 400.0 + 50 * n
        intrin[n, 1, 1] = 410.0 + 40 * n
        intrin[n, 0, 2] = 320.0
        intrin[n, 1, 2] = 180.0
    ida = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    ida[:, 0, 0] = rng.uniform(0.8, 1.2, N)
    with torch.no_grad():
        want = oracle(
            x, torch.from_numpy(intrin), torch.from_numpy(ida)
        ).numpy()

    variables = convert_state_dict(oracle.state_dict_ref_layout())
    dn_params = variables["params"]["head"]["depth_net"]
    dn_stats = variables["batch_stats"]["head"]["depth_net"]

    net = DepthNet(mid_channels=MID, context_channels=4)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))[None]  # (B,N,H,W,C)
    ida_scale = jnp.asarray(
        np.sqrt(ida[:, 0, 0] ** 2 + ida[:, 0, 0] ** 2)
    )[None]
    got = net.apply(
        {"params": dn_params, "batch_stats": dn_stats},
        x_j,
        jnp.asarray(intrin)[None],
        ida_scale,
    )
    got = np.asarray(got)[0].transpose(0, 3, 1, 2)  # (N, C, H, W)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
