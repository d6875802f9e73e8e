"""Model variants: VoVNet, DETR3D single-point attention, multi-point
graph attention, PETR/PETRv2 heads."""

import numpy as np
import jax
import jax.numpy as jnp

from graph_detr4d_tpu.config import HeadConfig
from graph_detr4d_tpu.models.vovnet import VoVNet
from graph_detr4d_tpu.models.attention_variants import (
    Detr3DCrossAtten,
    Deform3DCrossAttnMP,
)
from graph_detr4d_tpu.models.petr_head import PETRHead, pos2posemb3d

RNG = np.random.RandomState(0)
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def feats_fixture(B=1, N=3, C=32, shapes=((16, 32), (8, 16))):
    return [
        jnp.asarray(RNG.randn(B, N, h, w, C), jnp.float32)
        for h, w in shapes
    ]


def rig(B=1, N=3, H=64, W=128):
    from graph_detr4d_tpu.data.synthetic import synthetic_camera_rig

    return jnp.asarray(
        np.stack([synthetic_camera_rig(N, (H, W), s) for s in range(B)]),
        jnp.float32,
    )


def test_vovnet_shapes():
    x = jnp.zeros((2, 64, 128, 3))
    net = VoVNet(spec_name="V-19-slim-eSE")
    vs = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(vs, x)
    assert [o.shape for o in outs] == [
        (2, 16, 32, 112),
        (2, 8, 16, 256),
        (2, 4, 8, 384),
        (2, 2, 4, 512),
    ]


def test_detr3d_cross_atten():
    B, N, Q, C = 1, 3, 10, 32
    attn = Detr3DCrossAtten(
        embed_dims=C, num_levels=2, num_points=1, num_cams=N, pc_range=PC
    )
    q = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    ref = jnp.asarray(RNG.rand(B, Q, 3), jnp.float32)
    feats = feats_fixture(B, N, C)
    vs = attn.init(jax.random.PRNGKey(0), q, feats, q, ref, rig(B, N), (64, 128))
    out = attn.apply(vs, q, feats, q, ref, rig(B, N), (64, 128))
    assert out.shape == (B, Q, C)
    assert bool(jnp.isfinite(out).all())


def test_deform3d_cross_attn_mp():
    B, N, Q, C, K = 1, 3, 6, 32, 8
    attn = Deform3DCrossAttnMP(
        embed_dims=C,
        num_heads=4,
        num_levels=2,
        num_points=4,
        num_cams=N,
        num_neighbors=K,
        pc_range=PC,
    )
    q = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    # center + 8 neighbor reference points per query
    ref = jnp.asarray(RNG.rand(B, Q * (1 + K), 3), jnp.float32)
    feats = feats_fixture(B, N, C)
    vs = attn.init(
        jax.random.PRNGKey(0), q, feats, q, ref, rig(B, N), (64, 128)
    )
    out = attn.apply(vs, q, feats, q, ref, rig(B, N), (64, 128))
    assert out.shape == (B, Q, C)
    assert bool(jnp.isfinite(out).all())


def test_pos2posemb3d():
    pos = jnp.asarray(RNG.rand(4, 3), jnp.float32)
    emb = pos2posemb3d(pos, 16)
    assert emb.shape == (4, 48)
    assert bool(jnp.isfinite(emb).all())


def test_petr_head_forward_and_time():
    cfg = HeadConfig(
        num_query=12,
        embed_dims=32,
        num_decoder_layers=2,
        num_heads=4,
        num_cams=3,
        ffn_dims=64,
        depth_num=4,
        pe_num_feats=16,
        num_classes=10,
    )
    head = PETRHead(
        cfg=cfg, img_shape=(64, 128), with_time=True, dtype=jnp.float32
    )
    feats = feats_fixture(1, 3, 32, shapes=((8, 16),))
    l2i = rig(1, 3)
    ts = jnp.asarray([0.5])
    vs = head.init(
        jax.random.PRNGKey(0), feats, l2i, True, ts
    )
    out = head.apply(vs, feats, l2i, True, ts)
    assert out["all_cls_scores"].shape == (2, 1, 12, 10)
    assert out["all_bbox_preds"].shape == (2, 1, 12, 10)
    assert bool(jnp.isfinite(out["all_bbox_preds"]).all())
    # with_time halves... (divides by 0.5 => doubles) velocity vs raw
    out2 = head.apply(vs, feats, l2i, True, jnp.asarray([1.0]))
    v1 = np.asarray(out["all_bbox_preds"])[..., 8:10]
    v2 = np.asarray(out2["all_bbox_preds"])[..., 8:10]
    np.testing.assert_allclose(v1, 2 * v2, rtol=1e-4, atol=1e-5)


def test_detr3d_cross_atten_v2():
    """Learned 2D image-plane offset variant (detr3d_transformer.py:441-710):
    zero offsets at init => samples exactly at the projected center, so the
    output must be finite and depend on the reference points."""
    from graph_detr4d_tpu.models.attention_variants import Detr3DCrossAttenV2

    B, Q, C, N = 1, 8, 32, 3
    attn = Detr3DCrossAttenV2(
        embed_dims=C, num_heads=4, num_levels=2, num_points=2, num_cams=N,
        pc_range=PC,
    )
    feats = feats_fixture(B, N, C)
    q = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    qp = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    ref = jnp.asarray(RNG.uniform(0.3, 0.7, (B, Q, 3)), jnp.float32)
    l2i = rig(B, N)
    vs = attn.init(
        jax.random.PRNGKey(0), q, feats, qp, ref, l2i, (64, 128)
    )
    out = attn.apply(vs, q, feats, qp, ref, l2i, (64, 128))
    assert out.shape == (B, Q, C)
    assert np.all(np.isfinite(np.asarray(out)))
    # circular offset bias present (non-zero init on sampling_offsets bias)
    bias = np.asarray(vs["params"]["sampling_offsets"]["bias"])
    assert np.abs(bias).max() > 0

    out2 = attn.apply(
        vs, q, feats, qp,
        jnp.asarray(RNG.uniform(0.3, 0.7, (B, Q, 3)), jnp.float32),
        l2i, (64, 128),
    )
    assert np.abs(np.asarray(out2 - out)).max() > 1e-6


def test_nms_free_cls_decode():
    """Softmax coder (NMSFreeClsCoder): background column dropped, labels
    from per-query argmax."""
    from graph_detr4d_tpu.core.coder import nms_free_cls_decode

    Q, C = 24, 10
    logits = jnp.asarray(RNG.randn(Q, C + 1) * 2, jnp.float32)
    codes = jnp.zeros((Q, 10), jnp.float32)
    det = nms_free_cls_decode(logits, codes, max_num=8)
    assert det.bboxes.shape == (8, 9)
    probs = np.asarray(jax.nn.softmax(logits, -1))[:, :-1]
    want_best = probs.max(-1).max()
    assert abs(float(det.scores[0]) - want_best) < 1e-6
    assert int(det.labels[0]) == int(
        probs[probs.max(-1).argmax()].argmax()
    )


def test_points_img2cam_roundtrip():
    from graph_detr4d_tpu.geometry.projection import points_img2cam

    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 400.0, 420.0, 320.0, 180.0
    pts_cam = RNG.uniform(1.0, 20.0, (16, 3)).astype(np.float32)
    uvd = np.stack(
        [
            K[0, 0] * pts_cam[:, 0] / pts_cam[:, 2] + K[0, 2],
            K[1, 1] * pts_cam[:, 1] / pts_cam[:, 2] + K[1, 2],
            pts_cam[:, 2],
        ],
        axis=1,
    )
    back = np.asarray(points_img2cam(jnp.asarray(uvd), jnp.asarray(K)))
    np.testing.assert_allclose(back, pts_cam, rtol=1e-4, atol=1e-4)


def test_cam_conv_channels():
    from graph_detr4d_tpu.models.camera_aware import CAMConv

    B, N, H, W, C = 1, 2, 8, 16, 12
    x = jnp.asarray(RNG.randn(B, N, H, W, C), jnp.float32)
    intr = jnp.broadcast_to(jnp.eye(4) * 400.0, (B, N, 4, 4))
    mod = CAMConv(out_channels=C, img_shape=(64, 128))
    vs = mod.init(jax.random.PRNGKey(0), x, intr)
    y = mod.apply(vs, x, intr)
    assert y.shape == (B, N, H, W, C)
    assert np.all(np.isfinite(np.asarray(y)))


def test_camconv_fpe_forward():
    """fpe_type='camconv' (SELayerCAMConvV1 parity) runs and is finite."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    base = tiny_test_config()
    cfg = dataclasses.replace(
        base, head=dataclasses.replace(base.head, fpe_type="camconv")
    )
    model = GraphDETR4D(cfg)
    b = synthetic_batch(cfg, 1, num_gt=2)
    imgs, l2i = jnp.asarray(b["images"]), jnp.asarray(b["lidar2img"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    out = model.apply(variables, imgs, l2i)
    assert bool(jnp.isfinite(out["all_cls_scores"]).all())
    # the camconv SE layer exists in the param tree
    assert "conv_reduce" in variables["params"]["head"]["fpe"]


def test_build_batch_aug_flags(tmp_path):
    """TrainConfig aug switches: ida_aug=False gives a deterministic
    resize; rot_aug=False leaves lidar2img equal across calls."""
    import numpy as np
    from PIL import Image

    from graph_detr4d_tpu.config import TrainConfig
    from graph_detr4d_tpu.data.pipeline import build_batch

    paths = []
    r = np.random.RandomState(0)
    for i in range(2):
        p = str(tmp_path / f"c{i}.jpg")
        Image.fromarray(
            r.randint(0, 255, (900, 1600, 3), np.uint8)
        ).save(p)
        paths.append(p)
    sample = {
        "image_paths": paths,
        "lidar2img": np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
        "gt_bboxes": r.randn(4, 9).astype(np.float32),
        "gt_labels": np.zeros(4, np.int32),
        "gt_valid": np.ones(4, bool),
    }
    aug_off = TrainConfig(
        photometric=False, ida_aug=False, rot_aug=False
    )
    b1 = build_batch(
        [sample], (64, 128), training=True,
        rng=np.random.RandomState(1), aug=aug_off,
    )
    b2 = build_batch(
        [sample], (64, 128), training=True,
        rng=np.random.RandomState(2), aug=aug_off,
    )
    # all randomness disabled -> identical batches despite different rngs
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["lidar2img"], b2["lidar2img"])
    np.testing.assert_array_equal(b1["gt_bboxes"], b2["gt_bboxes"])


def test_deform3d_fix_offset_and_depth_encode():
    """deform3d_cross_attn.py:64-65 option knobs: fix_offset freezes the
    sampling-offset linear (zero param grads, input grads intact);
    depth_encode widens the positional MLP input to 4 (rho channel)."""
    from graph_detr4d_tpu.models.attention import Deform3DCrossAttn

    B, N, Q, C = 1, 3, 6, 32
    q = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    ref = jnp.asarray(RNG.rand(B, Q, 3), jnp.float32)
    feats = feats_fixture(B, N, C)
    l2i = rig(B, N)

    def build(**kw):
        attn = Deform3DCrossAttn(
            embed_dims=C,
            num_heads=4,
            num_levels=2,
            num_points=2,
            num_cams=N,
            pc_range=PC,
            **kw,
        )
        vs = attn.init(
            jax.random.PRNGKey(0), q, feats, q, ref, l2i, (64, 128)
        )
        return attn, vs

    # depth_encode: Linear(4 -> C) first positional layer (reference :105)
    attn_de, vs_de = build(depth_encode=True)
    k0 = vs_de["params"]["position_encoder"]["layers_0"]["kernel"]
    assert k0.shape[0] == 4
    out = attn_de.apply(vs_de, q, feats, q, ref, l2i, (64, 128))
    assert out.shape == (B, Q, C) and bool(jnp.isfinite(out).all())

    # fix_offset: identical param tree, zero grads on sampling_offsets only
    attn_fx, vs_fx = build(fix_offset=True)
    attn_pl, vs_pl = build(fix_offset=False)
    assert jax.tree_util.tree_structure(
        vs_fx["params"]
    ) == jax.tree_util.tree_structure(vs_pl["params"])

    def loss(params):
        y = attn_fx.apply(
            {"params": params}, q, feats, q, ref, l2i, (64, 128)
        )
        return (y**2).sum()

    g = jax.grad(loss)(vs_fx["params"])
    assert float(jnp.abs(g["sampling_offsets"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(g["sampling_offsets"]["bias"]).max()) == 0.0
    # value path still trains
    assert float(jnp.abs(g["value_proj"]["kernel"]).max()) > 0.0


def test_deformable_detr_decoder_generic():
    """Generic 2D deformable decoder (models/utils/detr.py:33-115):
    refinement semantics for 2-d refs (only first two reg channels) and
    4-d refs, valid_ratios scaling, intermediate stacking."""
    import flax.linen as nn_
    from graph_detr4d_tpu.models.detr_decoder import (
        Deformable3DDetrTransformerDecoder,
    )

    B, Q, C, L = 1, 5, 32, 2
    dec = Deformable3DDetrTransformerDecoder(
        embed_dims=C,
        num_layers=2,
        num_heads=4,
        num_levels=L,
        num_points=2,
        ffn_dims=64,
    )
    q = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    qp = jnp.asarray(RNG.randn(B, Q, C), jnp.float32)
    feats = [
        jnp.asarray(RNG.randn(B, h, w, C), jnp.float32)
        for h, w in ((16, 32), (8, 16))
    ]
    ref2 = jnp.asarray(RNG.rand(B, Q, 2), jnp.float32)

    class Wrapped(nn_.Module):
        def setup(self):
            self.regs = [nn_.Dense(10, name=f"reg{i}") for i in range(2)]
            self.dec = dec.copy()

        def __call__(self, q, qp, feats, ref):
            return self.dec(q, qp, feats, ref, reg_branches=self.regs)

    m = Wrapped()
    vs = m.init(jax.random.PRNGKey(0), q, qp, feats, ref2)
    outs, refs = m.apply(vs, q, qp, feats, ref2)
    assert outs.shape == (2, B, Q, C)
    assert refs.shape == (2, B, Q, 2)
    assert bool(jnp.isfinite(outs).all())
    # refs stay in (0, 1) (sigmoid space)
    assert float(refs.min()) > 0.0 and float(refs.max()) < 1.0

    # 4-d reference points refine all four channels
    ref4 = jnp.asarray(RNG.rand(B, Q, 4), jnp.float32)
    vs4 = m.init(jax.random.PRNGKey(1), q, qp, feats, ref4)
    outs4, refs4 = m.apply(vs4, q, qp, feats, ref4)
    assert refs4.shape == (2, B, Q, 4)
    assert bool(jnp.isfinite(outs4).all())


def test_msda_impl_reaches_every_call_site(monkeypatch):
    """HeadConfig.msda_impl must reach EVERY multi_scale_deformable_attention
    call site, not just the flagship Deform3DCrossAttn — the distill
    gather4 safety pin and any A/B only mean something if the variant
    heads honor the field too (round-4 review finding)."""
    import dataclasses

    from graph_detr4d_tpu.config import tiny_test_config
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch
    from graph_detr4d_tpu.ops import msda as msda_mod

    seen = []
    real = msda_mod.multi_scale_deformable_attention

    def spy(*a, **kw):
        seen.append(kw.get("impl", a[3] if len(a) > 3 else "shift4h"))
        return real(*a, **kw)

    # each model module imported the symbol into its own namespace
    import graph_detr4d_tpu.models.attention as m_attn
    import graph_detr4d_tpu.models.attention_variants as m_var
    import graph_detr4d_tpu.models.detr_decoder as m_dec
    import graph_detr4d_tpu.models.dgcnn as m_dgcnn

    for mod in (m_attn, m_var, m_dec, m_dgcnn):
        if hasattr(mod, "multi_scale_deformable_attention"):
            monkeypatch.setattr(
                mod, "multi_scale_deformable_attention", spy
            )

    cfg0 = tiny_test_config()
    for attn_type in ("deform3d", "deform3d_mp", "detr3d", "detr3d_v2"):
        seen.clear()
        cfg = dataclasses.replace(
            cfg0,
            head=dataclasses.replace(
                cfg0.head, attn_type=attn_type, msda_impl="gather4"
            ),
        )
        model = GraphDETR4D(cfg)
        b = synthetic_batch(cfg, batch_size=1)
        imgs = jnp.asarray(b["images"])
        l2i = jnp.asarray(b["lidar2img"])
        model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
        assert seen and all(i == "gather4" for i in seen), (attn_type, seen)

    # the generic 2D deformable decoder (standalone module)
    from graph_detr4d_tpu.models.detr_decoder import (
        Deformable3DDetrTransformerDecoder,
    )

    seen.clear()
    B, Q, C = 1, 6, 32
    feats = [
        jnp.zeros((B, 4, 8, C), jnp.float32),
        jnp.zeros((B, 2, 4, C), jnp.float32),
    ]
    dec = Deformable3DDetrTransformerDecoder(
        embed_dims=C,
        num_layers=1,
        num_heads=4,
        num_levels=2,
        num_points=2,
        msda_impl="gather4",
    )
    q = jnp.zeros((B, Q, C), jnp.float32)
    ref = jnp.full((B, Q, 2), 0.5, jnp.float32)
    dec.init(jax.random.PRNGKey(0), q, q, feats, ref)
    assert seen and all(i == "gather4" for i in seen), seen

    # DGCNN3DHead BEV decoder reads cfg.msda_impl
    from graph_detr4d_tpu.models.dgcnn import DGCNN3DHead

    seen.clear()
    hcfg = dataclasses.replace(
        cfg0.head,
        embed_dims=32,
        num_query=6,
        num_heads=4,
        num_points=2,
        num_decoder_layers=1,
        msda_impl="gather4",
    )
    head = DGCNN3DHead(cfg=hcfg, knn_k=2)
    bev = [
        jnp.zeros((1, 8, 8, 32), jnp.float32),
        jnp.zeros((1, 4, 4, 32), jnp.float32),
    ]
    head.init(jax.random.PRNGKey(0), bev)
    assert seen and all(i == "gather4" for i in seen), seen
