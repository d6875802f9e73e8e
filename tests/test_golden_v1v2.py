"""Golden tests: Detr3DCrossAtten (V1) and Detr3DCrossAttenV2 vs torch
functional oracles of the reference math.

V1 (detr3d_transformer.py:229-438): single projected point per query,
per-level F.grid_sample (align_corners=False, zeros padding), attention
weights SIGMOID (not softmax) over (cams, points, levels) gated by the
projection-validity mask, no value projection, LN-MLP positional encoder
over inverse-sigmoid reference points.

V2 (:441-710): + learned 2D offsets per (cam, head, level, point) added
to the [-1, 1] grid-space center and normalized by each level's (W, H)
(:699-702 — i.e. HALF a [0,1]-pixel offset), per-head channel split of
the raw features, softmax over (levels*points) per (cam, head).

Weights are extracted from a flax init and randomized, so these lock
numerics of the full forward including masks and sampling conventions.
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

from graph_detr4d_tpu.models.attention_variants import (  # noqa: E402
    Detr3DCrossAtten,
    Detr3DCrossAttenV2,
)
from tests.test_golden_mp import (  # noqa: E402
    _t, _lin, _ln, _inverse_sigmoid, _denorm,
)
from tests.test_golden_petr import _lidar2img  # noqa: E402

B, Q, HH, L, P, N, C = 1, 7, 4, 2, 3, 2, 32
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
IMG_H, IMG_W = 16, 20
SIZES = [(IMG_H // 4, IMG_W // 4), (IMG_H // 8, IMG_W // 8)]


def _project_grid(ref01, l2i):
    """Reference feature_sampling steps 1-4: normalized ref -> per-cam
    grid-space [-1, 1] locations + validity mask (:397-427)."""
    eps = 1e-5
    pts = _denorm(ref01)
    hom = torch.cat([pts, torch.ones_like(pts[..., :1])], -1)
    cam = torch.einsum("bnij,bqj->bnqi", l2i, hom)
    mask = cam[..., 2:3] > eps
    xy = cam[..., 0:2] / torch.maximum(
        cam[..., 2:3], torch.ones_like(cam[..., 2:3]) * eps
    )
    xy = xy / torch.tensor([IMG_W, IMG_H], dtype=torch.float32)
    grid = (xy - 0.5) * 2
    mask = (
        mask
        & (grid[..., 0:1] > -1)
        & (grid[..., 0:1] < 1)
        & (grid[..., 1:2] > -1)
        & (grid[..., 1:2] < 1)
    )
    return grid, mask[..., 0].float()  # (B, N, Q, 2), (B, N, Q)


def _pos_mlp(ref01, pe):
    x = _inverse_sigmoid(_t(ref01))
    x = torch.relu(_ln(_lin(x, pe["Dense_0"]), pe["LayerNorm_0"]))
    return torch.relu(_ln(_lin(x, pe["Dense_1"]), pe["LayerNorm_1"]))


def _inputs(seed):
    rng = np.random.RandomState(seed)
    values = [
        jnp.asarray(rng.randn(B, N, h, w, C).astype(np.float32))
        for h, w in SIZES
    ]
    query = jnp.asarray(rng.randn(B, Q, C).astype(np.float32) * 0.3)
    qpos = jnp.asarray(rng.randn(B, Q, C).astype(np.float32) * 0.3)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 3)).astype(np.float32))
    l2i = jnp.asarray(_lidar2img())
    return rng, values, query, qpos, ref, l2i


def test_detr3d_cross_atten_v1_matches_reference_math():
    rng, values, query, qpos, ref, l2i = _inputs(13)
    module = Detr3DCrossAtten(
        embed_dims=C, num_levels=L, num_points=P, num_cams=N,
        pc_range=PC, dropout=0.0,
    )
    variables = module.init(
        jax.random.PRNGKey(0), query, values, qpos, ref, l2i,
        (IMG_H, IMG_W),
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1),
        variables["params"],
    )
    out = module.apply(
        {"params": params}, query, values, qpos, ref, l2i, (IMG_H, IMG_W)
    )

    p = jax.tree.map(np.asarray, params)
    qt = _t(query) + _t(qpos)
    grid, mask = _project_grid(_t(ref), _t(l2i))
    # attention: sigmoid over (N, P, L) raw logits (:375-383)
    w = torch.sigmoid(_lin(qt, p["attention_weights"])).view(B, Q, N, P, L)
    w = w * mask.permute(0, 2, 1)[..., None, None]
    # per-level grid_sample of the SAME center point (:429-437)
    samples = []
    for lvl, v in enumerate(values):
        feat = _t(v).permute(0, 1, 4, 2, 3).reshape(B * N, C, *SIZES[lvl])
        g = grid.reshape(B * N, Q, 1, 2)
        s = F.grid_sample(feat, g, align_corners=False)  # (B*N, C, Q, 1)
        samples.append(s.view(B, N, C, Q))
    sampled = torch.stack(samples, -1)  # (B, N, C, Q, L)
    outp = torch.einsum("bncql,bqnpl->bqc", sampled, w)
    outp = _lin(outp, p["output_proj"])
    want = outp + _t(query) + _pos_mlp(ref, p["position_encoder"])
    np.testing.assert_allclose(
        np.asarray(out), want.numpy(), rtol=2e-4, atol=2e-4
    )


def test_detr3d_cross_atten_v2_matches_reference_math():
    rng, values, query, qpos, ref, l2i = _inputs(17)
    module = Detr3DCrossAttenV2(
        embed_dims=C, num_heads=HH, num_levels=L, num_points=P,
        num_cams=N, pc_range=PC, dropout=0.0,
    )
    variables = module.init(
        jax.random.PRNGKey(0), query, values, qpos, ref, l2i,
        (IMG_H, IMG_W),
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1),
        variables["params"],
    )
    out = module.apply(
        {"params": params}, query, values, qpos, ref, l2i, (IMG_H, IMG_W)
    )

    p = jax.tree.map(np.asarray, params)
    qt = _t(query) + _t(qpos)
    grid, mask = _project_grid(_t(ref), _t(l2i))
    attn = _lin(qt, p["attention_weights"]).view(B, Q, N, HH, L * P)
    attn = attn.softmax(-1).view(B, Q, N, HH, L, P)
    attn = attn * mask.permute(0, 2, 1)[:, :, :, None, None, None]
    offs = _lin(qt, p["sampling_offsets"]).view(B, Q, N, HH, L, P, 2)
    hd = C // HH
    acc = torch.zeros(B, Q, N, HH, hd)
    for lvl, v in enumerate(values):
        Hl, Wl = SIZES[lvl]
        # per-head channel split of the RAW features (:693-697)
        feat = (
            _t(v).permute(0, 1, 4, 2, 3)
            .reshape(B, N, HH, hd, Hl, Wl)
            .reshape(B * N * HH, hd, Hl, Wl)
        )
        norm = torch.tensor([Wl, Hl], dtype=torch.float32)
        # grid-space center + offset/(W, H) (:699-702)
        loc = grid[:, :, :, None, None, :] + offs[
            :, :, :, :, lvl
        ].permute(0, 2, 1, 3, 4, 5) / norm  # (B, N, Q, HH, P, 2)
        g = loc.permute(0, 1, 3, 2, 4, 5).reshape(B * N * HH, Q, P, 2)
        s = F.grid_sample(feat, g, align_corners=False)  # (BNH, hd, Q, P)
        s = s.view(B, N, HH, hd, Q, P)
        a = attn[:, :, :, :, lvl].permute(0, 2, 3, 1, 4)  # (B, N, HH, Q, P)
        acc = acc + torch.einsum("bnhdqp,bnhqp->bqnhd", s, a)
    outp = acc.sum(2).reshape(B, Q, C)
    outp = _lin(outp, p["output_proj"])
    want = outp + _t(query) + _pos_mlp(ref, p["position_encoder"])
    np.testing.assert_allclose(
        np.asarray(out), want.numpy(), rtol=2e-4, atol=2e-4
    )
