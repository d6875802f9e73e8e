"""Golden activation parity: the NHWC flax ResNet vs a plain-torch NCHW
oracle running identical weights (SURVEY §4 implication (b): the
reference's mmcv stack isn't installable here, so torch's conv / maxpool /
eval-BN semantics — what the reference's backbone actually computes — are
the oracle). Catches stride placement ('pytorch' style: stride on the 3x3),
padding conventions, and frozen-BN math drift."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_detr4d_tpu.models.resnet import ResNet, ARCH_SETTINGS  # noqa: E402

RNG = np.random.RandomState(0)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv_w(flax_kernel):
    # (kh, kw, I, O) -> (O, I, kh, kw)
    return _t(np.transpose(flax_kernel, (3, 2, 0, 1)))


def _bn_eval(x, stats):
    return F.batch_norm(
        x,
        _t(stats["mean"]),
        _t(stats["var"]),
        weight=_t(stats["gamma"]),
        bias=_t(stats["beta"]),
        training=False,
        eps=1e-5,
    )


def _bottleneck_torch(x, p, s, stride):
    idt = x
    y = F.relu(_bn_eval(F.conv2d(x, _conv_w(p["conv1"]["kernel"])), s["bn1"]))
    y = F.conv2d(y, _conv_w(p["conv2"]["kernel"]), stride=stride, padding=1)
    y = F.relu(_bn_eval(y, s["bn2"]))
    y = _bn_eval(F.conv2d(y, _conv_w(p["conv3"]["kernel"])), s["bn3"])
    if "downsample_conv" in p:
        idt = _bn_eval(
            F.conv2d(
                x, _conv_w(p["downsample_conv"]["kernel"]), stride=stride
            ),
            s["downsample_bn"],
        )
    return F.relu(y + idt)


def _randomize_stats(stats):
    """Non-trivial frozen-BN statistics so the affine actually matters."""
    return jax.tree.map(
        lambda a: jnp.asarray(
            RNG.uniform(0.5, 1.5, np.shape(a)).astype(np.float32)
        ),
        stats,
    )


def test_resnet50_matches_torch_oracle():
    model = ResNet(depth=50, use_dcn=False, out_indices=(0, 1, 2, 3))
    x = RNG.randn(1, 64, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {
        "params": variables["params"],
        "batch_stats": _randomize_stats(variables["batch_stats"]),
    }
    flax_outs = model.apply(variables, jnp.asarray(x))

    p, s = variables["params"], variables["batch_stats"]
    t = _t(np.transpose(x, (0, 3, 1, 2)))
    t = F.conv2d(t, _conv_w(p["stem_conv"]["kernel"]), stride=2, padding=3)
    t = F.relu(_bn_eval(t, s["stem_bn"]))
    t = F.max_pool2d(t, 3, stride=2, padding=1)

    _, stage_blocks = ARCH_SETTINGS[50]
    for stage, num_blocks in enumerate(stage_blocks):
        for b in range(num_blocks):
            name = f"layer{stage + 1}_block{b}"
            stride = 2 if (b == 0 and stage > 0) else 1
            t = _bottleneck_torch(t, p[name], s[name], stride)
        torch_out = np.transpose(t.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(flax_outs[stage]),
            torch_out,
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"stage {stage} diverged from the torch oracle",
        )
