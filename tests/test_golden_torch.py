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


def test_msda_matches_torch_grid_sample():
    """ops/msda vs the mmcv MultiScaleDeformableAttnFunction semantics
    expressed in torch: per-(head, level) F.grid_sample with
    grid = 2*loc - 1, align_corners=False, zero padding, then
    attention-weighted sum over levels x points
    (deform3d_cross_attn.py:301-309 calls the CUDA op with exactly this
    convention)."""
    from graph_detr4d_tpu.ops.msda import multi_scale_deformable_attention

    B, Q, nheads, P, hd = 2, 7, 4, 3, 8
    shapes = [(10, 18), (5, 9)]
    L = len(shapes)
    values = [
        RNG.randn(B, h, w, nheads, hd).astype(np.float32) for h, w in shapes
    ]
    loc = RNG.uniform(-0.2, 1.2, (B, Q, nheads, L, P, 2)).astype(np.float32)
    attn = RNG.rand(B, Q, nheads, L, P).astype(np.float32)

    want = np.zeros((B, Q, nheads, hd), np.float32)
    for lvl in range(L):
        # (B, nheads, hd, H, W) -> grid_sample input (B*nheads, hd, H, W)
        v = torch.from_numpy(values[lvl]).permute(0, 3, 4, 1, 2)
        v = v.reshape(B * nheads, hd, *shapes[lvl])
        grid = torch.from_numpy(2.0 * loc[:, :, :, lvl] - 1.0)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * nheads, Q, P, 2)
        s = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # (B*nheads, hd, Q, P)
        s = s.reshape(B, nheads, hd, Q, P).numpy()
        want += np.einsum(
            "bhcqp,bqhp->bqhc", s, attn[:, :, :, lvl]
        )

    for impl in ("gather4", "shift4", "pair"):
        got = np.asarray(
            multi_scale_deformable_attention(
                [jnp.asarray(v) for v in values],
                jnp.asarray(loc),
                jnp.asarray(attn),
                impl=impl,
            )
        )
        np.testing.assert_allclose(
            got,
            want.reshape(B, Q, nheads * hd),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"impl={impl} diverged from torch grid_sample",
        )


def test_self_attn_conversion_matches_torch_mha():
    """The checkpoint converter's packed-in_proj split
    (tools/convert_checkpoint.py:180-198) must reproduce torch
    nn.MultiheadAttention numerics through flax
    MultiHeadDotProductAttention — the decoder's self-attention
    (DetrTransformerDecoderLayer attentions.0 in the reference)."""
    import flax.linen as nn

    C, h = 32, 4
    hd = C // h
    mha = torch.nn.MultiheadAttention(C, h, batch_first=True)
    mha.eval()
    sd = {k: v.detach().numpy() for k, v in mha.state_dict().items()}

    w, b = sd["in_proj_weight"], sd["in_proj_bias"]
    params = {}
    for gi, name in enumerate(("query", "key", "value")):
        params[name] = {
            "kernel": jnp.asarray(
                np.transpose(w[gi * C:(gi + 1) * C]).reshape(C, h, hd)
            ),
            "bias": jnp.asarray(b[gi * C:(gi + 1) * C].reshape(h, hd)),
        }
    params["out"] = {
        "kernel": jnp.asarray(
            np.transpose(sd["out_proj.weight"]).reshape(h, hd, C)
        ),
        "bias": jnp.asarray(sd["out_proj.bias"]),
    }

    q = RNG.randn(2, 5, C).astype(np.float32)
    v = RNG.randn(2, 5, C).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(_t(q), _t(q), _t(v))

    attn = nn.MultiHeadDotProductAttention(num_heads=h, dropout_rate=0.0)
    got = attn.apply(
        {"params": params},
        jnp.asarray(q),
        jnp.asarray(q),
        jnp.asarray(v),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


def test_deform_conv_matches_torch_grid_sample():
    """ops/deform_conv vs mmcv ModulatedDeformConv2d semantics expressed
    in torch: per tap, sample x at (out*stride - pad + tap + offset) with
    bilinear zero-padding (grid_sample align_corners=False over the
    padded coordinate space), scale by the mask, contract with the
    weight."""
    from graph_detr4d_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(5)
    B, H, W, Cin, Cout = 2, 9, 13, 4, 6
    ks, pad, stride = 3, 1, 1
    K = ks * ks
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    off = (rng.randn(B, H, W, K, 2) * 2.5).astype(np.float32)
    mask = rng.rand(B, H, W, K).astype(np.float32)
    w = rng.randn(K, Cin, Cout).astype(np.float32)

    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
            jnp.asarray(w), stride=stride, padding=pad,
        )
    )

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # (B, C, H, W)
    ys = np.arange(H, dtype=np.float32) * stride - pad
    xs = np.arange(W, dtype=np.float32) * stride - pad
    want = np.zeros((B, H, W, Cout), np.float32)
    for k in range(K):
        ky, kx = divmod(k, ks)
        py = ys[None, :, None] + ky + off[..., k, 0]  # (B, H, W)
        px = xs[None, None, :] + kx + off[..., k, 1]
        # normalized grid for align_corners=False: (2*p + 1)/size - 1
        gx = (2.0 * px + 1.0) / W - 1.0
        gy = (2.0 * py + 1.0) / H - 1.0
        grid = torch.from_numpy(np.stack([gx, gy], -1))
        s = F.grid_sample(
            xt, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )  # (B, Cin, H, W)
        s = s.numpy().transpose(0, 2, 3, 1) * mask[..., k : k + 1]
        want += s @ w[k]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_gather_path_matches_torch(monkeypatch):
    """Same oracle, forced through the large-grid gather path."""
    from graph_detr4d_tpu.ops import deform_conv as dc

    monkeypatch.setattr(dc, "ONEHOT_MAX_PIXELS", 0)
    test_deform_conv_matches_torch_grid_sample()
