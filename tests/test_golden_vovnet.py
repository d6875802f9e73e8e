"""Golden test: VoVNet backbone vs a torch oracle with reference naming.

The oracle mirrors models/backbones/vovnet.py exactly — conv3x3/conv1x1
OrderedDict naming ('{module}_{postfix}/conv|norm', :124-162), the OSA
module (accumulate layer outputs, concat, 1x1 aggregate, eSE with
HARD-sigmoid relu6(x+3)/6, identity add on blocks >= 2, :188-239), stage
structure with `nn.MaxPool2d(3, stride=2, ceil_mode=True)` and NO padding
between stages (:249 — windows start at pixel 0, edge-clipped; this
pooling alignment is what the symmetric-pad formulation got wrong), and
eval-mode BatchNorm (norm_eval). Weights flow through
tools/convert_checkpoint.convert_state_dict's VoVNet branch, locking the
.pth mapping for the petr_vovnet / petrv2_vovnet / vovnetcp config
families.
"""

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

from graph_detr4d_tpu.models.vovnet import VoVNet, VOVNET_SPECS  # noqa: E402
from tools.convert_checkpoint import convert_state_dict  # noqa: E402

SPEC = "V-39-eSE"  # block_per_stage (1,1,2,2) exercises the identity path


def conv3x3(in_ch, out_ch, module_name, postfix, stride=1):
    return [
        (
            f"{module_name}_{postfix}/conv",
            tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False),
        ),
        (f"{module_name}_{postfix}/norm", tnn.BatchNorm2d(out_ch)),
        (f"{module_name}_{postfix}/relu", tnn.ReLU()),
    ]


def conv1x1(in_ch, out_ch, module_name, postfix):
    return [
        (
            f"{module_name}_{postfix}/conv",
            tnn.Conv2d(in_ch, out_ch, 1, 1, 0, bias=False),
        ),
        (f"{module_name}_{postfix}/norm", tnn.BatchNorm2d(out_ch)),
        (f"{module_name}_{postfix}/relu", tnn.ReLU()),
    ]


class ESEOracle(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.fc = tnn.Conv2d(ch, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = self.fc(s)
        return x * (torch.nn.functional.relu6(s + 3.0) / 6.0)


class OSAOracle(tnn.Module):
    def __init__(self, in_ch, stage_ch, concat_ch, layer_per_block, name,
                 identity):
        super().__init__()
        self.identity = identity
        self.layers = tnn.ModuleList()
        ch = in_ch
        for i in range(layer_per_block):
            self.layers.append(
                tnn.Sequential(OrderedDict(conv3x3(ch, stage_ch, name, i)))
            )
            ch = stage_ch
        agg = in_ch + layer_per_block * stage_ch
        self.concat = tnn.Sequential(
            OrderedDict(conv1x1(agg, concat_ch, name, "concat"))
        )
        self.ese = ESEOracle(concat_ch)

    def forward(self, x):
        idt = x
        out = [x]
        for layer in self.layers:
            x = layer(x)
            out.append(x)
        x = self.ese(self.concat(torch.cat(out, dim=1)))
        if self.identity:
            x = x + idt
        return x


class VoVOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        spec = VOVNET_SPECS[SPEC]
        s1, s2, s3 = spec["stem"]
        stem = conv3x3(3, s1, "stem", "1", 2)
        stem += conv3x3(s1, s2, "stem", "2", 1)
        stem += conv3x3(s2, s3, "stem", "3", 2)
        self.stem = tnn.Sequential(OrderedDict(stem))
        in_ch = [s3] + spec["stage_out_ch"][:-1]
        for s in range(4):
            mods = []
            if s > 0:
                mods.append(
                    ("Pooling", tnn.MaxPool2d(3, stride=2, ceil_mode=True))
                )
            for b in range(spec["block_per_stage"][s]):
                name = f"OSA{s + 2}_{b + 1}"
                mods.append(
                    (
                        name,
                        OSAOracle(
                            in_ch[s] if b == 0 else spec["stage_out_ch"][s],
                            spec["stage_conv_ch"][s],
                            spec["stage_out_ch"][s],
                            spec["layer_per_block"],
                            name,
                            identity=b > 0,
                        ),
                    )
                )
            self.add_module(f"stage{s + 2}", tnn.Sequential(OrderedDict(mods)))

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for s in range(4):
            x = getattr(self, f"stage{s + 2}")(x)
            outs.append(x)
        return outs


def test_vovnet_matches_torch_oracle():
    torch.manual_seed(7)
    oracle = VoVOracle().eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)
            elif isinstance(m, tnn.Conv2d):
                # keep activations O(1) through the deep stack
                m.weight.mul_(0.5)

    x = torch.randn(1, 3, 64, 80)
    with torch.no_grad():
        ref = oracle(x)

    sd = {
        "img_backbone." + k: v.detach().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = convert_state_dict(sd)

    model = VoVNet(spec_name=SPEC)
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
    assert len(outs) == 4
    for lvl, (got_j, ref_t) in enumerate(zip(outs, ref)):
        got = np.asarray(got_j)
        want = ref_t.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (lvl, got.shape, want.shape)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4, err_msg=f"stage{lvl + 2}"
        )
