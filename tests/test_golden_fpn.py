"""Golden test: FPN / CPFPN vs a torch functional oracle.

Mirrors mmdet FPN semantics as the reference configures them
(cp_fpn.py:157-209 is the checked-in copy): 1x1 laterals, nearest
top-down upsample, 3x3 output convs, 'on_output' extra convs where the
FIRST extra conv sees the raw source and `relu_before_extra_convs` only
applies from the second extra conv on (:203-208), and the CPFPN variant
that applies the 3x3 conv ONLY on level 0 (:182-185).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_detr4d_tpu.models.fpn import FPN  # noqa: E402


def _w(p):  # flax (kh, kw, I, O) -> torch (O, I, kh, kw)
    return torch.from_numpy(np.transpose(np.asarray(p), (3, 2, 0, 1)))


def _b(p):
    return torch.from_numpy(np.asarray(p))


def _oracle(inputs, params, start_level, num_outs, cp, relu_before):
    used = inputs[start_level:]
    laterals = [
        F.conv2d(x, _w(params[f"lateral{i}"]["kernel"]),
                 _b(params[f"lateral{i}"]["bias"]))
        for i, x in enumerate(used)
    ]
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + F.interpolate(
            laterals[i], size=laterals[i - 1].shape[2:], mode="nearest"
        )
    outs = []
    for i, x in enumerate(laterals):
        if i == 0 or not cp:
            x = F.conv2d(x, _w(params[f"fpn_conv{i}"]["kernel"]),
                         _b(params[f"fpn_conv{i}"]["bias"]), padding=1)
        outs.append(x)
    for i in range(len(outs), num_outs):
        src = outs[-1]
        if relu_before and i > len(laterals):
            src = F.relu(src)
        outs.append(
            F.conv2d(src, _w(params[f"fpn_conv{i}"]["kernel"]),
                     _b(params[f"fpn_conv{i}"]["bias"]), stride=2, padding=1)
        )
    return outs


@pytest.mark.parametrize(
    "chans,start,num_outs,cp,relu_before",
    [
        # flagship: 4 ins, start 1, 4 outs => ONE extra conv (must be
        # relu-free even with relu_before_extra_convs=True)
        ((8, 16, 32, 64), 1, 4, False, True),
        # two extra convs: second one gets the relu
        ((8, 16, 32, 64), 1, 5, False, True),
        # petr CPFPN: 2 ins, 2 outs, conv only on level 0
        ((32, 64), 0, 2, True, False),
    ],
)
def test_fpn_matches_torch_oracle(chans, start, num_outs, cp, relu_before):
    rng = np.random.RandomState(1)
    H = 32
    inputs = []
    h = H
    for c in chans:
        inputs.append(rng.randn(2, h, 16 * h // H, c).astype(np.float32))
        h //= 2
    model = FPN(
        out_channels=24,
        start_level=start,
        num_outs=num_outs,
        relu_before_extra_convs=relu_before,
        cp=cp,
    )
    variables = model.init(
        jax.random.PRNGKey(0), [jnp.asarray(x) for x in inputs]
    )
    # non-zero biases so conv-vs-passthrough mix-ups shift values
    params = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 1 else a, variables["params"]
    )
    outs = model.apply({"params": params}, [jnp.asarray(x) for x in inputs])
    ref = _oracle(
        [torch.from_numpy(x.transpose(0, 3, 1, 2)) for x in inputs],
        jax.tree.map(np.asarray, params),
        start, num_outs, cp, relu_before,
    )
    assert len(outs) == num_outs == len(ref)
    for lvl, (g, r) in enumerate(zip(outs, ref)):
        np.testing.assert_allclose(
            np.asarray(g),
            r.numpy().transpose(0, 2, 3, 1),
            rtol=1e-5,
            atol=1e-5,
            err_msg=f"level {lvl}",
        )
