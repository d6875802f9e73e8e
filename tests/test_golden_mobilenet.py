"""Golden test: MobileNetV2 distill-student backbone vs a torch oracle
with mmdet naming (conv1/conv2 ConvModules + layer{1..7}.{b}.conv.{i}
inverted residuals, ReLU6, linear project, residual when stride==1 and
channels match). Locks the converter mapping for the m2 student .pth
checkpoints and the torch-vs-flax stride-2 padding alignment (torch
Conv2d padding=1 is symmetric; flax 'SAME' is not)."""

from collections import OrderedDict
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_detr4d_tpu.models.mobilenet import MobileNetV2, ARCH  # noqa: E402
from tools.convert_checkpoint import convert_state_dict  # noqa: E402


class ConvModule(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(
            cin, cout, k, stride, k // 2, groups=groups, bias=False
        )
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return tnn.functional.relu6(x) if self.act else x


class InvertedResidualOracle(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        mods = []
        if expand != 1:
            mods.append(ConvModule(cin, hidden, 1))
        mods.append(ConvModule(hidden, hidden, 3, stride, groups=hidden))
        mods.append(ConvModule(hidden, cout, 1, act=False))
        self.conv = tnn.Sequential(*mods)
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.res else y


class M2Oracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = ConvModule(3, 32, 3, stride=2)
        cin = 32
        for s, (t, ch, n, st) in enumerate(ARCH):
            blocks = []
            for b in range(n):
                blocks.append(
                    InvertedResidualOracle(cin, ch, st if b == 0 else 1, t)
                )
                cin = ch
            self.add_module(f"layer{s + 1}", tnn.Sequential(*blocks))
        self.conv2 = ConvModule(cin, 1280, 1)

    def forward(self, x, out_indices=(2, 4, 7)):
        x = self.conv1(x)
        outs = []
        for s in range(7):
            x = getattr(self, f"layer{s + 1}")(x)
            if s in out_indices:
                outs.append(x)
        if 7 in out_indices:
            outs.append(self.conv2(x))
        return outs


def test_mobilenetv2_matches_torch_oracle():
    torch.manual_seed(11)
    oracle = M2Oracle().eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)

    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        ref = oracle(x)

    sd = {
        "img_backbone." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = convert_state_dict(sd)

    model = MobileNetV2()
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init = model.init(jax.random.PRNGKey(0), x_j)
    for col in ("params", "batch_stats"):
        got = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(
                variables[col]["backbone"]
            )
        }
        want = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(init[col])
        }
        assert got == want, (col, sorted(want - got), sorted(got - want))

    outs = model.apply(
        {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        },
        x_j,
    )
    assert len(outs) == len(ref) == 3
    for lvl, (g, r) in enumerate(zip(outs, ref)):
        got = np.asarray(g)
        want = r.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (lvl, got.shape, want.shape)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4, err_msg=f"out {lvl}"
        )
