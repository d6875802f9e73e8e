"""Named model configs mirroring the reference's config inventory.

The reference drives everything through mmcv python-file configs under
projects/configs/{detr3d,detr4d,petr,petrv2,distillers} and
projects/distill_cfg (50+ files; ceph/path-only duplicates collapse to one
entry here). Each name maps to a zero-arg constructor returning a
ModelConfig (or a distill bundle via `get_distill_config`).

CLI override syntax matches the reference's `--cfg-options` dot paths
(tools/train.py:68-77): `head.num_query=600 img_size=(320,800)`.

Usage:
    from graph_detr4d_tpu.configs import get_config, list_configs
    cfg = get_config("detr4d_res50_deform_pe_testaug_2subset_12e",
                     overrides=["head.num_query=600"])
"""

import ast
import dataclasses
from typing import Callable, Dict, Optional, Sequence

from ..config import (
    BackboneConfig,
    CoderConfig,
    HeadConfig,
    LossConfig,
    ModelConfig,
    NeckConfig,
    TrainConfig,
)

_REGISTRY: Dict[str, Callable[[], ModelConfig]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_configs():
    return sorted(_REGISTRY)


def get_config(
    name: str, overrides: Optional[Sequence[str]] = None
) -> ModelConfig:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown config {name!r}; available: {', '.join(list_configs())}"
        )
    cfg = _REGISTRY[name]()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg, overrides: Sequence[str]):
    """Dot-path overrides on nested frozen dataclasses:
    'head.num_query=600' / 'bf16=False' / 'img_size=(320,800)'.

    Coercion is driven by the TARGET field's declared type: bool and
    Optional fields get mmcv-style lowercase 'true'/'false'/'none'
    parsing, while str fields keep the raw text — so a genuinely
    string-valued option can still be set to the literal 'none'."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        path, raw = ov.split("=", 1)
        keys = path.strip().split(".")
        value = _coerce(raw, _field_type(cfg, keys))
        cfg = _replace_path(cfg, keys, value)
    return cfg


def _field_type(obj, keys):
    """Declared type of the dataclass field at a dot path (None if the
    path doesn't resolve — _replace_path raises the real error)."""
    try:
        for k in keys[:-1]:
            obj = getattr(obj, k)
        for f in dataclasses.fields(obj):
            if f.name == keys[-1]:
                return f.type
    except (AttributeError, TypeError):
        pass
    return None


def _type_accepts(tp, target) -> bool:
    import types as _t
    import typing as _ty

    if tp is target:
        return True
    origin = _ty.get_origin(tp)
    if origin is _ty.Union or origin is getattr(_t, "UnionType", ()):
        return any(_type_accepts(a, target) for a in _ty.get_args(tp))
    return False


def _coerce(raw: str, tp):
    s = raw.strip()
    if tp is str:
        return s  # string field: 'none'/'true' stay strings
    low = s.lower()
    if low in ("true", "false") and (tp is None or _type_accepts(tp, bool)):
        # mmcv-style lowercase bools: 'backbone.remat=true' must set the
        # bool, not the (truthy) string "true"
        return low == "true"
    if low in ("none", "null") and (
        tp is None or _type_accepts(tp, type(None))
    ):
        return None
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s  # bare string


def apply_env_kernel_overrides(cfg):
    """CLI-layer kernel-variant overrides from GRD4D_* environment vars.

    Library code never reads these (the jit cache is not keyed on env and
    two configs in one process must not share a variant silently); CLIs
    and bench tools call this ONCE at startup so the active kernel
    variants become ordinary config fields — visible to the jit cache,
    to logs, and to export manifests.
    """
    import os

    ovs = []
    v = os.environ.get("GRD4D_DCN_GATHER")
    if v:
        ovs.append(f"backbone.dcn_gather={v}")
    v = os.environ.get("GRD4D_MSDA_IMPL")
    if v:
        ovs.append(f"head.msda_impl={v}")
    v = os.environ.get("GRD4D_MSDA_LATEPROJ")
    if v:  # empty string = unset, like the sibling knobs
        truthy = v.strip().lower() in ("1", "true", "yes", "on")
        falsy = v.strip().lower() in ("0", "false", "no", "off")
        if not (truthy or falsy):
            raise ValueError(
                f"GRD4D_MSDA_LATEPROJ={v!r}: expected a boolean "
                "(1/0/true/false/yes/no/on/off)"
            )
        ovs.append("head.msda_late_proj=" + ("true" if truthy else "false"))
    v = os.environ.get("GRD4D_STEM_S2D")
    if v:
        truthy = v.strip().lower() in ("1", "true", "yes", "on")
        ovs.append("backbone.stem_s2d=" + ("true" if truthy else "false"))
    return apply_overrides(cfg, ovs) if ovs else cfg


def _replace_path(obj, keys, value):
    if len(keys) == 1:
        if not hasattr(obj, keys[0]):
            raise AttributeError(
                f"{type(obj).__name__} has no field {keys[0]!r}"
            )
        return dataclasses.replace(obj, **{keys[0]: value})
    child = getattr(obj, keys[0])
    return dataclasses.replace(
        obj, **{keys[0]: _replace_path(child, keys[1:], value)}
    )


# --------------------------------------------------------------- helpers
def _detr4d(img_size=(640, 1600), **head_kw) -> ModelConfig:
    # cam_capacity=0.5: exact unless >Q/2 queries project into one camera
    # (the sown 'cam_overflow' counter exposes clipping; set 1.0 to
    # disable)
    head = dict(num_cams=12, with_detach=False, cam_capacity=0.5)
    head.update(head_kw)
    return ModelConfig(head=HeadConfig(**head), img_size=img_size)


# ------------------------------------------------------- detr4d family
@register("detr4d_res50_deform_pe_testaug_2subset_12e")
def detr4d_flagship():
    """The flagship Graph-DETR4D (mAP 34.2 / NDS 44.5 recipe;
    configs/detr4d/detr4d_res50_deform_pe_testaug_2subset_12e.py)."""
    return _detr4d()


@register("detr4d_res50_deform_pe_2subset_12e")
def detr4d_no_testaug():
    # identical model; differs only in eval-time ida augmentation
    return _detr4d()


@register("detr4d_res50_deform_pe_testaug_detach_2subset_12e")
def detr4d_detach():
    return _detr4d(with_detach=True)


@register("detr4d_res50_deform_pe_mp_testaug_2subset_12e")
def detr4d_mp():
    """Graph multi-point neighbors (Deform3DCrossAttnMP)."""
    return _detr4d(attn_type="deform3d_mp")


@register("detr4d_res50_deform_camaware_pe_aug_2subset_12e")
def detr4d_camaware():
    """BEVDepth-style DepthNet modulation (Detr3DHeadPECAM)."""
    return _detr4d(cam_aware=True)


@register("detr4d_res50_deform_camaware_fpe_2subset_12e")
def detr4d_camaware_fpe():
    return _detr4d(cam_aware=True, with_fpe=True)


@register("detr4d_res50_deform_pe_450_2subset_12e")
def detr4d_450():
    return _detr4d(img_size=(448, 800))  # 450x800 padded /32


@register("detr4d_res50_deform_pe_testaug_320_800")
def detr4d_320():
    return _detr4d(img_size=(320, 800))


@register("detr4d_res50_deform_simpleda_2subset_12e")
def detr4d_scale_aware():
    """Scale-aware depth-factor variant (scale_pred=True,
    RandomResizeMultiViewImage_SimpleDA pipeline)."""
    return _detr4d(scale_pred=True)


def _with_augs(cfg: ModelConfig, *, photo=True, ida=True, rot=True):
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, photometric=photo, ida_aug=ida, rot_aug=rot
        ),
    )


@register("detr4d_res50")
def detr4d_res50_plain():
    """Plain Detr3DHead (no 3D PE) with single-point DETR3D attention
    (configs/detr4d/detr4d_res50.py:49,72)."""
    return _detr4d(with_pe=False, attn_type="detr3d")


@register("detr4d_res50_deform")
def detr4d_res50_deform():
    """Plain head + graph deformable sampling, no PE
    (configs/detr4d/detr4d_res50_deform.py:51,74)."""
    return _detr4d(with_pe=False)


@register("detr4d_res50_deform_ms")
def detr4d_res50_deform_ms():
    """Multi-scale training: random depth-scaled resizes
    (RandomResizeImageMultiViewImage + ScaleAnnotations3D,
    configs/detr4d/detr4d_res50_deform_ms.py:132-134)."""
    cfg = _detr4d(with_pe=False)
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            resize_scales=(
                (400, 9999),
                (784, 9999),
                (848, 9999),
                (912, 9999),
                (976, 9999),
                (1040, 9999),
                (1104, 9999),
            ),
        ),
    )


@register("detr4d_res50_mp")
def detr4d_res50_mp():
    """Plain head + multi-point graph neighbors
    (configs/detr4d/detr4d_res50_mp.py:60,73)."""
    return _detr4d(with_pe=False, attn_type="deform3d_mp")


@register("detr4d_res50_deform_aug_2subset_12e")
def detr4d_deform_aug():
    """photometric + ida crop/flip + BEV rot — the reference 'aug'
    pipeline has ALL THREE active
    (detr4d_res50_deform_aug_2subset_12e.py:142-153)."""
    return _with_augs(_detr4d(with_pe=False))


@register("detr4d_res50_deform_pe_aug_2subset_12e")
def detr4d_pe_aug():
    return _with_augs(_detr4d())


@register("detr4d_res50_deform_pe_rotaug_2subset_12e")
def detr4d_pe_rotaug():
    """photometric + BEV rot/scale, ida OFF
    (detr4d_res50_deform_pe_rotaug_2subset_12e.py:142-148)."""
    return _with_augs(_detr4d(), ida=False)


@register("detr4d_res50_deform_pe_rotcropaug_2subset_12e")
def detr4d_pe_rotcropaug():
    """photometric + ida + BEV rot (all augs on,
    detr4d_res50_deform_pe_rotcropaug_2subset_12e.py:143-148)."""
    return _with_augs(_detr4d())


@register("detr4d_res50_deform_camconvfpe_2subset_12e")
def detr4d_camconvfpe():
    """SE gate with camera-intrinsic coordinate channels
    (SELayerCAMConvV1, detr3d_head_pe.py:277-295)."""
    return _detr4d(fpe_type="camconv")


@register("detr4d_vovnet")
def detr4d_vovnet_plain():
    """VoVNet backbone, plain head, single-point attention
    (configs/detr4d/detr4d_vovnet.py)."""
    cfg = _detr4d(with_pe=False, attn_type="detr3d")
    return dataclasses.replace(
        cfg,
        backbone_type="vovnet",
        neck=NeckConfig(in_channels=(256, 512, 768, 1024)),
    )


@register("h_detr4d_res50_deform_pe_testaug_2subset_12e")
def h_detr4d():
    """H-DETR hybrid one2one + one2many matching
    (h_detr3d_head_pe.py:40-693)."""
    return _detr4d(
        num_query_one2many=1800, k_one2many=6, lambda_one2many=2.0
    )


@register("detr4d_res18_deform_pe_testaug_320_2subset")
def detr4d_r18():
    cfg = _detr4d(img_size=(320, 800))
    return dataclasses.replace(
        cfg,
        backbone=BackboneConfig(depth=18, use_dcn=False),
        neck=NeckConfig(in_channels=(64, 128, 256, 512)),
    )


@register("detr4d_m2_deform_pe_testaug_320_fullset")
def detr4d_m2():
    """MobileNetV2 student (configs/detr4d/detr4d_m2_..._fullset.py:51)."""
    cfg = _detr4d(img_size=(320, 800))
    return dataclasses.replace(
        cfg,
        backbone_type="mobilenetv2",
        backbone=BackboneConfig(out_indices=(2, 4, 7)),
        neck=NeckConfig(in_channels=(32, 96, 1280), start_level=0),
    )


@register("detr4d_vovnet_deform")
def detr4d_vovnet():
    cfg = _detr4d()
    return dataclasses.replace(
        cfg,
        backbone_type="vovnet",
        neck=NeckConfig(in_channels=(256, 512, 768, 1024)),
    )


# ------------------------------------------------------- detr3d family
@register("detr3d_res50")
def detr3d_res50():
    """Single-frame DETR3D: 6 cams, single-point cross-attention
    (configs/detr3d/detr3d_res50.py)."""
    return ModelConfig(
        head=HeadConfig(num_cams=6, with_detach=False, attn_type="detr3d"),
        img_size=(640, 1600),
    )


@register("graph_detr3d_res50")
def graph_detr3d_res50():
    """Single-frame Graph-DETR3D: 6 cams with graph deformable sampling
    (the graph-detr3d branch's model; same head, num_cams=6)."""
    return ModelConfig(
        head=HeadConfig(num_cams=6, with_detach=False),
        img_size=(640, 1600),
    )


@register("graph_detr3d_res101")
def graph_detr3d_res101():
    """Graph-DETR3D with a ResNet-101 backbone (BASELINE.json config
    scenario 'ResNet-101 multi-scale graph sampling'; the reference's
    r101 variants live on the graph-detr3d branch)."""
    cfg = graph_detr3d_res50()
    return dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, depth=101)
    )


# --------------------------------------------------------- petr family
def _petr(backbone="resnet", img_size=(320, 800), **kw) -> ModelConfig:
    """PETR-family base: the reference necks are 2-level CPFPNs over the
    backbone's LAST TWO maps (petr_r50dcn_gridmask_p4.py:33, 43-47
    out_indices=(2,3) + CPFPN(in_channels=[1024, 2048], num_outs=2);
    petrv2_vovnet...py:35-40 out_features=('stage4','stage5') +
    CPFPN([768, 1024])) — the head reads position_level=0, the stride-16
    map."""
    head = dict(num_cams=6, with_detach=False)
    head.update(kw)
    cfg = ModelConfig(
        head_type="petr",
        head=HeadConfig(**head),
        img_size=img_size,
        neck=NeckConfig(
            in_channels=(1024, 2048), start_level=0, num_outs=2, cp=True
        ),
        # petr-family img_norm: BGR input (to_rgb=False), caffe means
        # with std [57.375, 57.120, 58.395] (petrv2_*.py:13-16,
        # petr_vovnet_*.py:13-14); the PETRv1 r50dcn configs override
        # std to 1.0 below (petr_r50dcn_gridmask_p4.py:13-14)
        img_mean=(103.530, 116.280, 123.675),
        img_std=(57.375, 57.120, 58.395),
        img_bgr=True,
        # no PhotoMetricDistortion in ANY petr-family train pipeline
        # (petr/petrv2/BEVseg configs list only ida + rot aug)
        train=TrainConfig(photometric=False),
    )
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, out_indices=(2, 3))
    )
    if backbone == "vovnet":
        cfg = dataclasses.replace(
            cfg,
            backbone_type="vovnet",
            neck=dataclasses.replace(cfg.neck, in_channels=(768, 1024)),
        )
    return cfg


@register("petr_r50dcn_gridmask_p4")
def petr_r50():
    # PETRv1 r50dcn: std=1.0 (petr_r50dcn_gridmask_p4.py:13-14)
    return dataclasses.replace(_petr(), img_std=(1.0, 1.0, 1.0))


@register("petr_vovnet_gridmask_p4_800x320")
def petr_vovnet_800():
    return _petr(backbone="vovnet")


@register("petr_vovnet_gridmask_p4_1600x640")
def petr_vovnet_1600():
    return _petr(backbone="vovnet", img_size=(640, 1600))


@register("petrv2_res50_gridmask_p4_800x320")
def petrv2_r50():
    """Unlike every other petr-family config, petrv2_res50 uses the
    flagship-style neck: r50 + DCN stages 3-4, out_indices=(0,1,2,3),
    STANDARD 4-level FPN with start_level=1 and 'on_output' extra convs
    (petrv2_res50_gridmask_p4_800x320.py:31-49) — position_level=0 is
    the stride-8 map."""
    cfg = _petr(num_cams=12)
    return dataclasses.replace(
        cfg,
        head_type="petrv2",
        backbone=dataclasses.replace(cfg.backbone, out_indices=(0, 1, 2, 3)),
        neck=NeckConfig(),  # flagship default: start_level=1, 4 outs
    )


@register("petrv2_vovnet_gridmask_p4_800x320")
def petrv2_vovnet():
    cfg = _petr(backbone="vovnet", num_cams=12)
    return dataclasses.replace(cfg, head_type="petrv2")


@register("petr_r50dcn_gridmask_c5")
def petr_c5():
    """PETR over the single raw C5 feature map: the reference c5 config
    has NO img_neck at all — the head's input_proj consumes the
    2048-channel C5 directly (petr_r50dcn_gridmask_c5.py:46
    in_channels=2048)."""
    cfg = _petr()
    return dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, out_indices=(3,)),
        neck=dataclasses.replace(cfg.neck, num_outs=0),  # neck-less
        head=dataclasses.replace(cfg.head, num_levels=1),
        img_std=(1.0, 1.0, 1.0),  # petr_r50dcn_gridmask_c5.py:13-14
    )


@register("petrv2_vovnet_gridmask_p4_1600x640")
def petrv2_vovnet_1600():
    cfg = _petr(backbone="vovnet", img_size=(640, 1600), num_cams=12)
    return dataclasses.replace(cfg, head_type="petrv2")


@register("petrv2_vovnet_gridmask_p4_1600x640_trainval")
def petrv2_vovnet_1600_trainval():
    return petrv2_vovnet_1600()


@register("petrv2_BEVseg")
def petrv2_bevseg():
    """PETR + BEV map segmentation (Petr3D_seg + PETRHeadseg):
    VoVNetCP V-99-eSE (remat) over stages 4-5, CPFPN [768, 1024],
    12 temporal cams, with_time + with_se (petrv2_BEVseg.py:27-56)."""
    cfg = _petr(backbone="vovnet", num_cams=12)
    return dataclasses.replace(
        cfg,
        head_type="petr_seg",
        backbone=dataclasses.replace(cfg.backbone, remat=True),
    )


# ------------------------------------------------------------- distill
@dataclasses.dataclass(frozen=True)
class DistillBundle:
    """teacher/student configs + distill loss switches, the semantic
    content of projects/distill_cfg/* (22 ablations collapse to the
    cls/reg/img/reweight/mix switch matrix)."""

    teacher: ModelConfig
    student: ModelConfig
    distill_cls: bool = True
    distill_reg: bool = True
    distill_feat: bool = False
    feat_mode: str = "vanilla"  # 'vanilla' | 'attention'
    reweight_score: bool = False
    mix: bool = False  # MixDistill teacher-query guided decode
    # Loss weights. None derives from the booleans (cls 1.0, reg 0.25,
    # feat 1.0); the named reference ablations override them with the
    # literal values from projects/distill_cfg/*.py (e.g. img_att 1e-3,
    # img_att_5e3 5e-3, mix img 0.1, reg-only 1.0).
    cls_weight: Optional[float] = None
    reg_weight: Optional[float] = None
    feat_weight: Optional[float] = None

    @property
    def effective_cls_weight(self) -> float:
        if self.cls_weight is not None:
            return self.cls_weight
        return 1.0 if self.distill_cls else 0.0

    @property
    def effective_reg_weight(self) -> float:
        if self.reg_weight is not None:
            return self.reg_weight
        return 0.25 if self.distill_reg else 0.0

    @property
    def effective_feat_weight(self) -> float:
        return 1.0 if self.feat_weight is None else self.feat_weight
    # TPU-native default: cap soft-GT rows to the top-K teacher queries
    # by max sigmoid score. The reference matches all Qt=900 rows via
    # scipy on CPU (detr4d_distiller.py:143-168); the on-device JV at
    # K=900 measures 20.4 s/step vs 0.50 s at K=32 (PROFILE.md) — a 40x
    # difference for rows that are overwhelmingly near-zero-score
    # padding. None = full rows (exact reference parity); CLI
    # --teacher-top-k overrides.
    teacher_top_k: Optional[int] = 64


_DISTILL: Dict[str, Callable[[], DistillBundle]] = {}


def register_distill(name: str):
    def deco(fn):
        _DISTILL[name] = fn
        return fn

    return deco


def list_distill_configs():
    return sorted(_DISTILL)


def _pin_distill_safe_msda(cfg: ModelConfig) -> ModelConfig:
    """Pin the MSDA sampling layout to the pure-gather 'gather4' variant
    for BOTH models of a distill bundle.

    Measured on the real chip (2026-08-20, tools/time_train_steps.py,
    mixdistill_r50_r18 at 320x800): the default one-hot MXU small-level
    path crashes the TPU worker with a kernel fault inside the DISTILL
    program (teacher + student + mix double-decode = up to 72 one-hot
    instances), while the same program with 'gather4' runs at 1030.2
    ms/step (top_k=32) / 1045.2 ms/step (top_k=64). XLA memory analysis
    rules out OOM — the crashing one-hot build peaks at 3.4 GB HBM vs
    gather4's 12.6 GB — so this is an execution-level fault, not memory
    pressure. The shift4 A/B (same date) confirmed the fault is not
    one-hot-specific: shift4 compiles to the SAME 3.43 GB footprint and
    ALSO kills the worker inside the distill program, while running fine
    in single-model programs — gather4 (no folded corner tables, no
    one-hot levels) is the only distill-safe layout measured.
    Single-model train/inference programs keep the faster one-hot
    default; GRD4D_MSDA_IMPL still overrides at the CLI layer for A/B
    (on non-axon runtimes).
    """
    return dataclasses.replace(
        cfg, head=dataclasses.replace(cfg.head, msda_impl="gather4")
    )


def get_distill_config(name: str) -> DistillBundle:
    if name not in _DISTILL:
        raise KeyError(
            f"unknown distill config {name!r}; available: "
            f"{', '.join(list_distill_configs())}"
        )
    b = _DISTILL[name]()
    return dataclasses.replace(
        b,
        teacher=_pin_distill_safe_msda(b.teacher),
        student=_pin_distill_safe_msda(b.student),
    )


def _r50_r18(**kw):
    return DistillBundle(
        teacher=get_config("detr4d_res50_deform_pe_testaug_320_800"),
        student=get_config("detr4d_res18_deform_pe_testaug_320_2subset"),
        **kw,
    )


@register_distill("distill_r50_r18_cls_2subset")
def d_cls():
    return _r50_r18(distill_cls=True, distill_reg=False)


@register_distill("distill_r50_r18_cls_reg_2subset")
def d_cls_reg():
    # reference literal: instance_distill loss_cls_weight=1.0,
    # loss_reg_weight=1.0 (distill_r50_r18_cls_reg_2subset.py:12) — NB
    # that config dialect passes kwargs Detr4D_Distiller.__init__ does
    # not accept (it is stale upstream); the weights encode its intent
    return _r50_r18(reg_weight=1.0)


@register_distill("distill_r50_r18_reg_2subset")
def d_reg():
    """reg-only instance distill (distill_r50_r18_reg_2subset.py:12:
    loss_cls_weight=0.0, loss_reg_weight=1.0)."""
    return _r50_r18(distill_cls=False, reg_weight=1.0)


@register_distill("distill_r50_r18_cls_reweight_2subset")
def d_cls_rw():
    """cls-only + reweight_score (distill_r50_r18_cls_reweight_2subset.py:
    loss_reg_distill weight 0.0, loss_cls_distill weight 1.0,
    reweight_score=True — the reweight only touches the reg term,
    detr3d_head_pe.py:907-911, so it is inert here; kept for name parity)."""
    return _r50_r18(distill_reg=False, reweight_score=True)


@register_distill("distill_r50_r18_reg_reweight_2subset")
def d_reg_rw():
    # loss_reg_distill L1 0.25 + reweight_score=True
    # (distill_r50_r18_reg_reweight_2subset.py:17-19)
    return _r50_r18(distill_cls=False, reweight_score=True)


@register_distill("distill_r50_r18_img_2subset")
def d_img():
    # feat_distill loss_weight=1.0 (distill_r50_r18_img_2subset.py:18)
    return _r50_r18(distill_cls=False, distill_reg=False, distill_feat=True)


@register_distill("distill_r50_r18_img001_2subset")
def d_img001():
    """vanilla feature distill at weight 0.01
    (distill_r50_r18_img001_2subset_ceph.py:17-18; ceph-path dupe
    normalized to the disk name)."""
    return _r50_r18(
        distill_cls=False,
        distill_reg=False,
        distill_feat=True,
        feat_weight=0.01,
    )


@register_distill("distill_r50_r18_img_att_2subset")
def d_img_att():
    # loss_feat_distill type='attention' loss_weight=1e-3
    # (distill_r50_r18_img_att_2subset.py:19)
    return _r50_r18(
        distill_cls=False,
        distill_reg=False,
        distill_feat=True,
        feat_mode="attention",
        feat_weight=1e-3,
    )


@register_distill("distill_r50_r18_img_att_5e3_2subset")
def d_img_att_5e3():
    """attention feature distill at weight 5e-3
    (distill_r50_r18_img_att_5e3_2subset.py:16)."""
    return _r50_r18(
        distill_cls=False,
        distill_reg=False,
        distill_feat=True,
        feat_mode="attention",
        feat_weight=5e-3,
    )


@register_distill("distill_r50_r18_none_2subset")
def d_none():
    """No distill losses at all — the student-baseline control run under
    the distill runner (distill_r50_r18_none_2subset_ceph.py:
    instance_distill=None, feat_distill=None => use_teacher=False,
    detr4d_distiller.py:29-31)."""
    return _r50_r18(distill_cls=False, distill_reg=False, distill_feat=False)


# MixDistill defaults reweight_score=True (mix_distill.py:23) — the
# named mix bundles that don't say otherwise inherit it; the *_wore
# ("WithOut REweight") ablations set it False explicitly.
@register_distill("mixdistill_r50_r18_cls_2subset")
def md_cls():
    return _r50_r18(mix=True, distill_reg=False, reweight_score=True)


@register_distill("mixdistill_r50_r18_cls_wore_2subset")
def md_cls_wore():
    return _r50_r18(mix=True, distill_reg=False, reweight_score=False)


@register_distill("mixdistill_r50_r18_reg_2subset")
def md_reg():
    return _r50_r18(mix=True, distill_cls=False, reweight_score=True)


@register_distill("mixdistill_r50_r18_reg_wore_2subset")
def md_reg_wore():
    return _r50_r18(mix=True, distill_cls=False, reweight_score=False)


@register_distill("mixdistill_r50_r18_cls_reg_2subset")
def md_cls_reg():
    return _r50_r18(mix=True, reweight_score=True)


@register_distill("mixdistill_r50_r18_cls_reg_img")
def md_cls_reg_img():
    # loss_feat_distill type='vanilla' loss_weight=0.1
    # (mixdistill_r50_r18_cls_reg_img_ceph.py:17)
    return _r50_r18(
        mix=True, distill_feat=True, feat_weight=0.1, reweight_score=True
    )


@register_distill("detr4d_r50_distill_r50_1x")
def d_r50_r50():
    """configs/distillers/objdgcnn_Gdetr4d_r50_distill_Gdetr4d_r50_1x_*:
    trained-r50 teacher -> fresh-r50 student (self-distillation; the
    'objdgcnn' in the reference filename is vestigial — both models in
    that config are camera Detr3D r50)."""
    flagship = get_config("detr4d_res50_deform_pe_testaug_2subset_12e")
    return DistillBundle(teacher=flagship, student=flagship)


@register_distill("mixdistill_r50_m2_cls_reg_img")
def md_m2():
    # loss_feat_distill type='vanilla' loss_weight=0.1, MixDistill default
    # reweight_score=True (mixdistill_r50_m2_cls_reg_img_ceph.py:17)
    return DistillBundle(
        teacher=get_config("detr4d_res50_deform_pe_testaug_320_800"),
        student=get_config("detr4d_m2_deform_pe_testaug_320_fullset"),
        mix=True,
        distill_feat=True,
        feat_weight=0.1,
        reweight_score=True,
    )
