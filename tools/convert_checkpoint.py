"""Convert a reference-layout (mmdet3d/torch) checkpoint into this
framework's flax variables.

The reference trains from FCOS3D-pretrained weights and publishes .pth
checkpoints whose state_dict keys follow mmcv naming (img_backbone.*,
img_neck.*, pts_bbox_head.*; see SURVEY §5 checkpoint/resume). This
converter maps that layout onto our param tree so published weights can
reproduce mAP/NDS (the parity goal).

Layout conversions:
  torch Conv2d  (O, I, kh, kw)  -> flax Conv kernel (kh, kw, I, O)
  torch Linear  (O, I)          -> flax Dense kernel (I, O)
  torch BN      weight/bias/running_mean/running_var
                                -> FrozenBatchNorm gamma/beta/mean/var
  torch nn.MultiheadAttention in_proj (3C, C) packed q|k|v
                                -> flax MHA query/key/value (C, H, hd)
  mmcv DCNv2    conv2.weight + conv2.conv_offset.{weight,bias}
                                -> DeformConv weight (K, I, O) + conv_offset
                                   (offset channel order: [dy,dx] pairs then
                                   K mask channels, mmcv convention)

Usage:
  python tools/convert_checkpoint.py ref.pth out_dir [--depth 50]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_conv(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_lin(w):  # (O, I) -> (I, O)
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def convert_state_dict(sd: dict, num_decoder_layers: int = 6, nheads: int = 8):
    """Map a reference state_dict (str -> ndarray) to
    {'params': ..., 'batch_stats': ...} trees for GraphDETR4D."""
    params, stats = {}, {}
    blocks_per_stage = {}  # discover from keys

    def bn(dst_scope, src_prefix):
        _set(stats, dst_scope + ["gamma"], sd[src_prefix + ".weight"])
        _set(stats, dst_scope + ["beta"], sd[src_prefix + ".bias"])
        _set(stats, dst_scope + ["mean"], sd[src_prefix + ".running_mean"])
        _set(stats, dst_scope + ["var"], sd[src_prefix + ".running_var"])

    def lin(dst_scope, src_prefix, bias=True):
        _set(params, dst_scope + ["kernel"], t_lin(sd[src_prefix + ".weight"]))
        if bias and src_prefix + ".bias" in sd:
            _set(params, dst_scope + ["bias"], sd[src_prefix + ".bias"])

    def conv(dst_scope, src_prefix, bias=False):
        _set(params, dst_scope + ["kernel"], t_conv(sd[src_prefix + ".weight"]))
        if bias and src_prefix + ".bias" in sd:
            _set(params, dst_scope + ["bias"], sd[src_prefix + ".bias"])

    # ---------------- backbone (mmcv ResNet naming); guarded so head-only
    # state dicts (oracle fixtures, stripped checkpoints) convert too
    if "img_backbone.conv1.weight" in sd:
        conv(["backbone", "stem_conv"], "img_backbone.conv1")
        bn(["backbone", "stem_bn"], "img_backbone.bn1")
    for key in sd:
        if key.startswith("img_backbone.layer") and key.endswith(
            ".conv1.weight"
        ):
            parts = key.split(".")
            stage = int(parts[1][5:])
            blk = int(parts[2])
            blocks_per_stage[stage] = max(
                blocks_per_stage.get(stage, 0), blk + 1
            )
    for stage, nblocks in sorted(blocks_per_stage.items()):
        for b in range(nblocks):
            src = f"img_backbone.layer{stage}.{b}"
            dst = ["backbone", f"layer{stage}_block{b}"]
            for ci in (1, 2, 3):
                cw = f"{src}.conv{ci}.weight"
                if cw not in sd:
                    continue
                if f"{src}.conv{ci}.conv_offset.weight" in sd:
                    # DCNv2 conv2 -> DeformConv
                    w = np.asarray(sd[cw])  # (O, I, 3, 3)
                    O, I = w.shape[:2]
                    _set(
                        params,
                        dst + [f"conv{ci}", "weight"],
                        np.transpose(w, (2, 3, 1, 0)).reshape(9, I, O),
                    )
                    conv(
                        dst + [f"conv{ci}", "conv_offset"],
                        f"{src}.conv{ci}.conv_offset",
                        bias=True,
                    )
                else:
                    conv(dst + [f"conv{ci}"], f"{src}.conv{ci}")
                bn(dst + [f"bn{ci}"], f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                conv(dst + ["downsample_conv"], f"{src}.downsample.0")
                bn(dst + ["downsample_bn"], f"{src}.downsample.1")

    # ---------------- backbone (VoVNet naming, vovnet.py:124-162: keys
    # like stem.stem_1/conv.weight, stage3.OSA3_2.layers.0.OSA3_2_0/conv.
    # weight, ...concat.OSA3_2_concat/conv.weight, ...ese.fc.weight)
    if "img_backbone.stem.stem_1/conv.weight" in sd:
        for k in (1, 2, 3):
            conv(
                ["backbone", f"stem{k}_conv"],
                f"img_backbone.stem.stem_{k}/conv",
            )
            bn(["backbone", f"stem{k}_bn"], f"img_backbone.stem.stem_{k}/norm")
        for s in range(2, 6):
            b = 1
            while (
                f"img_backbone.stage{s}.OSA{s}_{b}.concat."
                f"OSA{s}_{b}_concat/conv.weight" in sd
            ):
                src = f"img_backbone.stage{s}.OSA{s}_{b}"
                mod = f"OSA{s}_{b}"
                dst = ["backbone", f"stage{s}_osa{b - 1}"]
                i = 0
                while f"{src}.layers.{i}.{mod}_{i}/conv.weight" in sd:
                    conv(
                        dst + [f"layer{i}_conv"],
                        f"{src}.layers.{i}.{mod}_{i}/conv",
                    )
                    bn(
                        dst + [f"layer{i}_bn"],
                        f"{src}.layers.{i}.{mod}_{i}/norm",
                    )
                    i += 1
                conv(
                    dst + ["concat_conv"], f"{src}.concat.{mod}_concat/conv"
                )
                bn(dst + ["concat_bn"], f"{src}.concat.{mod}_concat/norm")
                conv(dst + ["ese", "fc"], f"{src}.ese.fc", bias=True)
                b += 1

    # ---------------- backbone (mmdet MobileNetV2 naming: conv1/conv2
    # ConvModules + layer{1..7}.{b}.conv.{i} inverted residuals; i is
    # (expand, dw, project) for expand_ratio != 1, (dw, project) for
    # layer1's expand_ratio == 1)
    if "img_backbone.conv1.conv.weight" in sd:
        conv(["backbone", "stem"], "img_backbone.conv1.conv")
        bn(["backbone", "stem_bn"], "img_backbone.conv1.bn")
        for s in range(1, 8):
            b = 0
            while f"img_backbone.layer{s}.{b}.conv.0.conv.weight" in sd:
                src = f"img_backbone.layer{s}.{b}.conv"
                dst = ["backbone", f"stage{s - 1}_block{b}"]
                parts = (
                    ["dw", "project"]
                    if f"{src}.2.conv.weight" not in sd
                    else ["expand", "dw", "project"]
                )
                for i, part in enumerate(parts):
                    conv(dst + [part], f"{src}.{i}.conv")
                    bn(dst + [f"{part}_bn"], f"{src}.{i}.bn")
                b += 1
        if "img_backbone.conv2.conv.weight" in sd:
            conv(["backbone", "conv2"], "img_backbone.conv2.conv")
            bn(["backbone", "conv2_bn"], "img_backbone.conv2.bn")

    # ---------------- neck (mmdet FPN naming)
    i = 0
    while f"img_neck.lateral_convs.{i}.conv.weight" in sd:
        conv(
            ["neck", f"lateral{i}"],
            f"img_neck.lateral_convs.{i}.conv",
            bias=True,
        )
        i += 1
    i = 0
    while f"img_neck.fpn_convs.{i}.conv.weight" in sd:
        conv(
            ["neck", f"fpn_conv{i}"],
            f"img_neck.fpn_convs.{i}.conv",
            bias=True,
        )
        i += 1

    # ---------------- head
    hd = "pts_bbox_head"

    def mha(dst, src_prefix):
        """torch nn.MultiheadAttention -> flax MHA (packed in_proj split)."""
        w = np.asarray(sd[f"{src_prefix}.in_proj_weight"])
        b = np.asarray(sd[f"{src_prefix}.in_proj_bias"])
        C = w.shape[1]
        hd_dim = C // nheads
        for gi, name in enumerate(("query", "key", "value")):
            _set(
                params,
                dst + [name, "kernel"],
                t_lin(w[gi * C : (gi + 1) * C]).reshape(C, nheads, hd_dim),
            )
            _set(
                params,
                dst + [name, "bias"],
                b[gi * C : (gi + 1) * C].reshape(nheads, hd_dim),
            )
        _set(
            params,
            dst + ["out", "kernel"],
            t_lin(sd[f"{src_prefix}.out_proj.weight"]).reshape(
                nheads, hd_dim, C
            ),
        )
        _set(params, dst + ["out", "bias"], sd[f"{src_prefix}.out_proj.bias"])

    if (
        f"{hd}.transformer.decoder.layers.0.attentions.1.attn.in_proj_weight"
        in sd
    ):
        # PETR / PETRv2 head layout (petr_head.py:213-270): dense MHA
        # cross-attention, Conv2d-1x1 PE MLPs, Embedding reference points,
        # SHARED cls/reg branches (cls_branches is the same module repeated
        # per layer, :240-243), decoder post_norm applied to every
        # intermediate (petr_transformer.py:443-445).
        conv(["head", "input_proj"], f"{hd}.input_proj", bias=True)
        for dst, src in (
            ("position_encoder", f"{hd}.position_encoder"),
            ("adapt_pos3d", f"{hd}.adapt_pos3d"),
        ):
            for j, tidx in enumerate((0, 2)):
                w = np.asarray(sd[f"{src}.{tidx}.weight"])[:, :, 0, 0]
                _set(params, ["head", dst, f"Dense_{j}", "kernel"], t_lin(w))
                _set(
                    params,
                    ["head", dst, f"Dense_{j}", "bias"],
                    sd[f"{src}.{tidx}.bias"],
                )
        _set(
            params,
            ["head", "reference_points"],
            sd[f"{hd}.reference_points.weight"],
        )
        for j, tidx in enumerate((0, 2)):
            lin(
                ["head", "query_embedding", f"Dense_{j}"],
                f"{hd}.query_embedding.{tidx}",
            )
        lid = 0
        while (
            f"{hd}.transformer.decoder.layers.{lid}.norms.0.weight" in sd
        ):
            lsrc = f"{hd}.transformer.decoder.layers.{lid}"
            dst = ["head", f"layer{lid}"]
            mha(dst + ["self_attn"], f"{lsrc}.attentions.0.attn")
            mha(dst + ["cross_attn"], f"{lsrc}.attentions.1.attn")
            lin(dst + ["Dense_0"], f"{lsrc}.ffns.0.layers.0.0")
            lin(dst + ["Dense_1"], f"{lsrc}.ffns.0.layers.1")
            for ni in range(3):
                lin_ln(params, dst + [f"norm{ni + 1}"], sd, f"{lsrc}.norms.{ni}")
            lid += 1
        lin_ln(
            params,
            ["head", "post_norm"],
            sd,
            f"{hd}.transformer.decoder.post_norm",
        )
        # fpe SE gate on the coords PE (petrv2_head.py:327-328)
        if f"{hd}.fpe.conv_reduce.weight" in sd:
            conv(["head", "fpe", "reduce"], f"{hd}.fpe.conv_reduce",
                 bias=True)
            conv(["head", "fpe", "expand"], f"{hd}.fpe.conv_expand",
                 bias=True)
        # seg variant's `se` gate on the coords PE (with_se,
        # petr_head_seg.py:362-363, 507-508)
        if f"{hd}.se.conv_reduce.weight" in sd:
            conv(["head", "se", "reduce"], f"{hd}.se.conv_reduce", bias=True)
            conv(["head", "se", "expand"], f"{hd}.se.conv_expand", bias=True)
        # seg variant's lane stream (petr_head_seg.py:313-318, 365-374,
        # 544-548): query_embedding_lane MLP, a SECOND PETRTransformer
        # with its own post_norm, and the lane branch shared across
        # layers (lane_branches.{i} all alias the same tensors)
        if f"{hd}.query_embedding_lane.0.weight" in sd:
            for j, tidx in enumerate((0, 2)):
                lin(
                    ["head", "query_embedding_lane", f"Dense_{j}"],
                    f"{hd}.query_embedding_lane.{tidx}",
                )
            lid = 0
            while (
                f"{hd}.transformer_lane.decoder.layers.{lid}.norms.0.weight"
                in sd
            ):
                lsrc = f"{hd}.transformer_lane.decoder.layers.{lid}"
                dst = ["head", f"lane_layer{lid}"]
                mha(dst + ["self_attn"], f"{lsrc}.attentions.0.attn")
                mha(dst + ["cross_attn"], f"{lsrc}.attentions.1.attn")
                lin(dst + ["Dense_0"], f"{lsrc}.ffns.0.layers.0.0")
                lin(dst + ["Dense_1"], f"{lsrc}.ffns.0.layers.1")
                for ni in range(3):
                    lin_ln(
                        params, dst + [f"norm{ni + 1}"], sd,
                        f"{lsrc}.norms.{ni}",
                    )
                lid += 1
            lin_ln(
                params,
                ["head", "lane_post_norm"],
                sd,
                f"{hd}.transformer_lane.decoder.post_norm",
            )
            # [Linear, ReLU] x num_reg_fcs + Linear(lane_out): torch
            # Sequential indices 0, 2, ... -> MLP fc{i} + out
            t, j = 0, 0
            while f"{hd}.lane_branches.0.{t + 2}.weight" in sd:
                lin(["head", "lane_branch", f"fc{j}"],
                    f"{hd}.lane_branches.0.{t}")
                t, j = t + 2, j + 1
            lin(["head", "lane_branch", "out"], f"{hd}.lane_branches.0.{t}")

        def cls_map(dst, src):
            lin(dst + ["fc0"], f"{src}.0")
            lin_ln(params, dst + ["ln0"], sd, f"{src}.1")
            lin(dst + ["fc1"], f"{src}.3")
            lin_ln(params, dst + ["ln1"], sd, f"{src}.4")
            lin(dst + ["out"], f"{src}.6")

        def plain_reg_map(dst, src):
            lin(dst + ["fc0"], f"{src}.0")
            lin(dst + ["fc1"], f"{src}.2")
            lin(dst + ["out"], f"{src}.4")

        if f"{hd}.reg_branches.0.reg_branch.0.weight" in sd:
            # PETRv2: per-layer deepcopied branches (petrv2_head.py:
            # 297-300) + grouped RegLayer (with_multi, :58-88) — trunk
            # Sequential is [Linear, ReLU, Dropout] x num_fcs (Linears
            # at 0, 3), task heads [Linear, ReLU, Linear] (0, 2)
            lvl = 0
            while f"{hd}.cls_branches.{lvl}.0.weight" in sd:
                cls_map(["head", f"cls_branch{lvl}"],
                        f"{hd}.cls_branches.{lvl}")
                rsrc = f"{hd}.reg_branches.{lvl}"
                dst = ["head", f"reg_branch{lvl}"]
                lin(dst + ["fc0"], f"{rsrc}.reg_branch.0")
                lin(dst + ["fc1"], f"{rsrc}.reg_branch.3")
                t = 0
                while f"{rsrc}.task_heads.{t}.0.weight" in sd:
                    lin(dst + [f"task{t}_fc"], f"{rsrc}.task_heads.{t}.0")
                    lin(dst + [f"task{t}_out"], f"{rsrc}.task_heads.{t}.2")
                    t += 1
                lvl += 1
        else:
            # plain Sequential branches. PETRv1/seg ALIAS one module
            # across layers (petr_head.py:240-243 — every index
            # serializes identical tensors), while a petrv2-style head
            # with with_multi off DEEPCOPIES per layer
            # (petrv2_head.py:296-299): discriminate by value equality
            # so trained per-layer branches aren't collapsed to layer 0
            lvls = 0
            while f"{hd}.cls_branches.{lvls}.0.weight" in sd:
                lvls += 1
            aliased = all(
                np.array_equal(
                    np.asarray(sd[f"{hd}.{b}.{lv}.{t}.weight"]),
                    np.asarray(sd[f"{hd}.{b}.0.{t}.weight"]),
                )
                for lv in range(1, lvls)
                for b, t in (("cls_branches", 0), ("reg_branches", 0))
            )
            if aliased:
                cls_map(["head", "cls_branch"], f"{hd}.cls_branches.0")
                plain_reg_map(["head", "reg_branch"],
                              f"{hd}.reg_branches.0")
            else:
                for lvl in range(lvls):
                    cls_map(["head", f"cls_branch{lvl}"],
                            f"{hd}.cls_branches.{lvl}")
                    plain_reg_map(["head", f"reg_branch{lvl}"],
                                  f"{hd}.reg_branches.{lvl}")
        return {"params": params, "batch_stats": stats}

    # camera-aware DepthNet (Detr3DHeadPECAM, detr3d_head_pe_camaware.py:
    # 59-105, one instance shared across levels :198, 314-319).
    # `context_conv` is DEAD in the reference forward (computed but never
    # returned, :84-85) and is skipped. Mapped before the head-presence
    # early-out so module-level fixtures convert too.
    if f"{hd}.depth_net.reduce_conv.0.weight" in sd:
        conv(
            ["head", "depth_net", "reduce_conv"],
            f"{hd}.depth_net.reduce_conv.0",
            bias=True,
        )
        bn(["head", "depth_net", "reduce_bn"], f"{hd}.depth_net.reduce_conv.1")
        lin(["head", "depth_net", "mlp", "Dense_0"], f"{hd}.depth_net.mlp.fc1")
        lin(["head", "depth_net", "mlp", "Dense_1"], f"{hd}.depth_net.mlp.fc2")
        conv(
            ["head", "depth_net", "se", "reduce"],
            f"{hd}.depth_net.se.conv_reduce",
            bias=True,
        )
        conv(
            ["head", "depth_net", "se", "expand"],
            f"{hd}.depth_net.se.conv_expand",
            bias=True,
        )

    if f"{hd}.transformer.reference_points.weight" not in sd:
        # backbone/neck-only state dict (e.g. a VoVNet .pth)
        return {"params": params, "batch_stats": stats}

    if f"{hd}.query_embedding.weight" in sd:
        _set(
            params,
            ["head", "query_embedding"],
            sd[f"{hd}.query_embedding.weight"],
        )
    lin(["head", "reference_points"], f"{hd}.transformer.reference_points")
    # PE mlps (Conv2d 1x1 -> Dense) — only with_pe heads have them; the
    # plain Detr3DHead families (detr3d_head.py) carry none of
    # position_encoder / adapt_pos3d / fpe
    if f"{hd}.position_encoder.0.weight" in sd:
        for dst, src in (
            ("position_encoder", f"{hd}.position_encoder"),
            ("adapt_pos3d", f"{hd}.adapt_pos3d"),
        ):
            for j, tidx in enumerate((0, 2)):
                w = np.asarray(sd[f"{src}.{tidx}.weight"])[:, :, 0, 0]
                _set(
                    params,
                    ["head", dst, f"Dense_{j}", "kernel"],
                    t_lin(w),
                )
                _set(
                    params,
                    ["head", dst, f"Dense_{j}", "bias"],
                    sd[f"{src}.{tidx}.bias"],
                )
    # fpe SELayer
    if f"{hd}.fpe.conv_reduce.weight" in sd:
        conv(["head", "fpe", "reduce"], f"{hd}.fpe.conv_reduce", bias=True)
        conv(["head", "fpe", "expand"], f"{hd}.fpe.conv_expand", bias=True)

    # branches
    for lid in range(num_decoder_layers):
        cls_src = f"{hd}.cls_branches.{lid}"
        dst = ["head", f"cls_branch{lid}"]
        lin(dst + ["fc0"], f"{cls_src}.0")
        lin_ln(params, dst + ["ln0"], sd, f"{cls_src}.1")
        lin(dst + ["fc1"], f"{cls_src}.3")
        lin_ln(params, dst + ["ln1"], sd, f"{cls_src}.4")
        lin(dst + ["out"], f"{cls_src}.6")
        reg_src = f"{hd}.reg_branches.{lid}"
        dst = ["head", f"reg_branch{lid}"]
        lin(dst + ["fc0"], f"{reg_src}.0")
        lin(dst + ["fc1"], f"{reg_src}.2")
        lin(dst + ["out"], f"{reg_src}.4")

        # decoder layer
        lsrc = f"{hd}.transformer.decoder.layers.{lid}"
        dst = ["head", f"decoder_layer{lid}"]
        # self-attn: split packed in_proj
        w = np.asarray(sd[f"{lsrc}.attentions.0.attn.in_proj_weight"])
        bsa = np.asarray(sd[f"{lsrc}.attentions.0.attn.in_proj_bias"])
        C = w.shape[1]
        hd_dim = C // nheads
        for gi, name in enumerate(("query", "key", "value")):
            wk = t_lin(w[gi * C : (gi + 1) * C]).reshape(C, nheads, hd_dim)
            bk = bsa[gi * C : (gi + 1) * C].reshape(nheads, hd_dim)
            _set(params, dst + ["self_attn", name, "kernel"], wk)
            _set(params, dst + ["self_attn", name, "bias"], bk)
        wo = t_lin(
            sd[f"{lsrc}.attentions.0.attn.out_proj.weight"]
        ).reshape(nheads, hd_dim, C)
        _set(params, dst + ["self_attn", "out", "kernel"], wo)
        _set(
            params,
            dst + ["self_attn", "out", "bias"],
            sd[f"{lsrc}.attentions.0.attn.out_proj.bias"],
        )
        # cross-attn: Deform3DCrossAttn (cam gate + value proj),
        # Detr3DCrossAttenV2 (2D offsets), or plain Detr3DCrossAtten —
        # discriminated by key presence (detr3d_transformer.py:292-303,
        # :504-518; deform3d_cross_attn.py)
        xsrc = f"{lsrc}.attentions.1"
        xdst = dst + ["cross_attn"]
        is_deform = f"{xsrc}.cam_attention_weights.weight" in sd
        if is_deform:
            lin(xdst + ["cam_attention_weights"],
                f"{xsrc}.cam_attention_weights")
            lin(xdst + ["sampling_offsets"],
                f"{xsrc}.deform_sampling_offsets")
            lin(xdst + ["value_proj"], f"{xsrc}.value_proj")
        elif f"{xsrc}.sampling_offsets.weight" in sd:
            # Detr3DCrossAttenV2 (attention_variants.py)
            lin(xdst + ["sampling_offsets"], f"{xsrc}.sampling_offsets")
        lin(xdst + ["attention_weights"], f"{xsrc}.attention_weights")
        lin(xdst + ["output_proj"], f"{xsrc}.output_proj")
        pe = f"{xsrc}.position_encoder"
        if is_deform:
            # models/attention.py names its PE sub-layers layers_{0,1,3,4}
            lin(xdst + ["position_encoder", "layers_0"], f"{pe}.0")
            lin_ln(params, xdst + ["position_encoder", "layers_1"], sd,
                   f"{pe}.1")
            lin(xdst + ["position_encoder", "layers_3"], f"{pe}.3")
            lin_ln(params, xdst + ["position_encoder", "layers_4"], sd,
                   f"{pe}.4")
        else:
            # variants share PositionEncoderMLP (attention_variants.py):
            # flax auto-names Dense_{0,1} / LayerNorm_{0,1}
            lin(xdst + ["position_encoder", "Dense_0"], f"{pe}.0")
            lin_ln(params, xdst + ["position_encoder", "LayerNorm_0"], sd,
                   f"{pe}.1")
            lin(xdst + ["position_encoder", "Dense_1"], f"{pe}.3")
            lin_ln(params, xdst + ["position_encoder", "LayerNorm_1"], sd,
                   f"{pe}.4")
        # ffn + norms
        lin(dst + ["ffn", "Dense_0"], f"{lsrc}.ffns.0.layers.0.0")
        lin(dst + ["ffn", "Dense_1"], f"{lsrc}.ffns.0.layers.1")
        for ni in range(3):
            lin_ln(params, dst + [f"norm{ni + 1}"], sd, f"{lsrc}.norms.{ni}")

    return {"params": params, "batch_stats": stats}


def lin_ln(params, dst_scope, sd, src_prefix):
    """LayerNorm weight/bias -> scale/bias."""
    _set(params, dst_scope + ["scale"], sd[src_prefix + ".weight"])
    _set(params, dst_scope + ["bias"], sd[src_prefix + ".bias"])


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


def export_state_dict(variables, num_decoder_layers: int = 6, nheads: int = 8):
    """Inverse mapping: our flax variables -> reference-layout state_dict.

    Used to publish weights in the reference's format and as the roundtrip
    oracle for convert_state_dict in tests.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def inv_conv(src_scope, dst_prefix, bias=False):
        sd[dst_prefix + ".weight"] = np.transpose(
            _get(params, src_scope + ["kernel"]), (3, 2, 0, 1)
        )
        if bias:
            sd[dst_prefix + ".bias"] = _get(params, src_scope + ["bias"])

    def inv_lin(src_scope, dst_prefix):
        sd[dst_prefix + ".weight"] = np.transpose(
            _get(params, src_scope + ["kernel"]), (1, 0)
        )
        node = params
        for k in src_scope:
            node = node[k]
        if "bias" in node:
            sd[dst_prefix + ".bias"] = np.asarray(node["bias"])

    def inv_bn(src_scope, dst_prefix):
        sd[dst_prefix + ".weight"] = _get(stats, src_scope + ["gamma"])
        sd[dst_prefix + ".bias"] = _get(stats, src_scope + ["beta"])
        sd[dst_prefix + ".running_mean"] = _get(stats, src_scope + ["mean"])
        sd[dst_prefix + ".running_var"] = _get(stats, src_scope + ["var"])

    def inv_ln(src_scope, dst_prefix):
        sd[dst_prefix + ".weight"] = _get(params, src_scope + ["scale"])
        sd[dst_prefix + ".bias"] = _get(params, src_scope + ["bias"])

    inv_conv(["backbone", "stem_conv"], "img_backbone.conv1")
    inv_bn(["backbone", "stem_bn"], "img_backbone.bn1")
    for name in sorted(params["backbone"]):
        if not name.startswith("layer"):
            continue
        stage = int(name[5])
        blk = int(name.split("block")[1])
        src = ["backbone", name]
        dst = f"img_backbone.layer{stage}.{blk}"
        for ci in (1, 2, 3):
            key = f"conv{ci}"
            if key not in params["backbone"][name]:
                continue
            sub = params["backbone"][name][key]
            if "weight" in sub:  # DeformConv
                w = _get(params, src + [key, "weight"])  # (9, I, O)
                K, I, O = w.shape
                sd[f"{dst}.conv{ci}.weight"] = np.transpose(
                    w.reshape(3, 3, I, O), (3, 2, 0, 1)
                )
                inv_conv(
                    src + [key, "conv_offset"],
                    f"{dst}.conv{ci}.conv_offset",
                    bias=True,
                )
            else:
                inv_conv(src + [key], f"{dst}.conv{ci}")
            inv_bn(src + [f"bn{ci}"], f"{dst}.bn{ci}")
        if "downsample_conv" in params["backbone"][name]:
            inv_conv(src + ["downsample_conv"], f"{dst}.downsample.0")
            inv_bn(src + ["downsample_bn"], f"{dst}.downsample.1")

    i = 0
    while f"lateral{i}" in params["neck"]:
        inv_conv(
            ["neck", f"lateral{i}"],
            f"img_neck.lateral_convs.{i}.conv",
            bias=True,
        )
        i += 1
    i = 0
    while f"fpn_conv{i}" in params["neck"]:
        inv_conv(
            ["neck", f"fpn_conv{i}"],
            f"img_neck.fpn_convs.{i}.conv",
            bias=True,
        )
        i += 1

    hd = "pts_bbox_head"
    sd[f"{hd}.query_embedding.weight"] = _get(
        params, ["head", "query_embedding"]
    )
    inv_lin(["head", "reference_points"], f"{hd}.transformer.reference_points")
    # with_pe heads only — plain Detr3DHead has no PE mlps / fpe
    if "position_encoder" in params["head"]:
        for src_name, dst_name in (
            ("position_encoder", f"{hd}.position_encoder"),
            ("adapt_pos3d", f"{hd}.adapt_pos3d"),
        ):
            for j, tidx in enumerate((0, 2)):
                w = np.transpose(
                    _get(params, ["head", src_name, f"Dense_{j}", "kernel"]),
                    (1, 0),
                )[:, :, None, None]
                sd[f"{dst_name}.{tidx}.weight"] = w
                sd[f"{dst_name}.{tidx}.bias"] = _get(
                    params, ["head", src_name, f"Dense_{j}", "bias"]
                )
    if "fpe" in params["head"]:
        inv_conv(["head", "fpe", "reduce"], f"{hd}.fpe.conv_reduce",
                 bias=True)
        inv_conv(["head", "fpe", "expand"], f"{hd}.fpe.conv_expand",
                 bias=True)

    for lid in range(num_decoder_layers):
        dst = ["head", f"cls_branch{lid}"]
        csrc = f"{hd}.cls_branches.{lid}"
        inv_lin(dst + ["fc0"], f"{csrc}.0")
        inv_ln(dst + ["ln0"], f"{csrc}.1")
        inv_lin(dst + ["fc1"], f"{csrc}.3")
        inv_ln(dst + ["ln1"], f"{csrc}.4")
        inv_lin(dst + ["out"], f"{csrc}.6")
        dst = ["head", f"reg_branch{lid}"]
        rsrc = f"{hd}.reg_branches.{lid}"
        inv_lin(dst + ["fc0"], f"{rsrc}.0")
        inv_lin(dst + ["fc1"], f"{rsrc}.2")
        inv_lin(dst + ["out"], f"{rsrc}.4")

        lsrc = f"{hd}.transformer.decoder.layers.{lid}"
        dst = ["head", f"decoder_layer{lid}"]
        qkv = []
        qkvb = []
        for name in ("query", "key", "value"):
            k = _get(params, dst + ["self_attn", name, "kernel"])
            b = _get(params, dst + ["self_attn", name, "bias"])
            C = k.shape[0]
            qkv.append(np.transpose(k.reshape(C, -1), (1, 0)))
            qkvb.append(b.reshape(-1))
        sd[f"{lsrc}.attentions.0.attn.in_proj_weight"] = np.concatenate(qkv, 0)
        sd[f"{lsrc}.attentions.0.attn.in_proj_bias"] = np.concatenate(qkvb, 0)
        ko = _get(params, dst + ["self_attn", "out", "kernel"])
        C = ko.shape[-1]
        sd[f"{lsrc}.attentions.0.attn.out_proj.weight"] = np.transpose(
            ko.reshape(-1, C), (1, 0)
        )
        sd[f"{lsrc}.attentions.0.attn.out_proj.bias"] = _get(
            params, dst + ["self_attn", "out", "bias"]
        )

        xsrc = f"{lsrc}.attentions.1"
        xdst = dst + ["cross_attn"]
        xparams = params["head"][f"decoder_layer{lid}"]["cross_attn"]
        is_deform = "cam_attention_weights" in xparams
        if is_deform:
            inv_lin(xdst + ["cam_attention_weights"],
                    f"{xsrc}.cam_attention_weights")
            inv_lin(xdst + ["sampling_offsets"],
                    f"{xsrc}.deform_sampling_offsets")
            inv_lin(xdst + ["value_proj"], f"{xsrc}.value_proj")
        elif "sampling_offsets" in xparams:  # Detr3DCrossAttenV2
            inv_lin(xdst + ["sampling_offsets"], f"{xsrc}.sampling_offsets")
        inv_lin(xdst + ["attention_weights"], f"{xsrc}.attention_weights")
        inv_lin(xdst + ["output_proj"], f"{xsrc}.output_proj")
        pe = f"{xsrc}.position_encoder"
        if is_deform:
            inv_lin(xdst + ["position_encoder", "layers_0"], f"{pe}.0")
            inv_ln(xdst + ["position_encoder", "layers_1"], f"{pe}.1")
            inv_lin(xdst + ["position_encoder", "layers_3"], f"{pe}.3")
            inv_ln(xdst + ["position_encoder", "layers_4"], f"{pe}.4")
        else:
            inv_lin(xdst + ["position_encoder", "Dense_0"], f"{pe}.0")
            inv_ln(xdst + ["position_encoder", "LayerNorm_0"], f"{pe}.1")
            inv_lin(xdst + ["position_encoder", "Dense_1"], f"{pe}.3")
            inv_ln(xdst + ["position_encoder", "LayerNorm_1"], f"{pe}.4")

        inv_lin(dst + ["ffn", "Dense_0"], f"{lsrc}.ffns.0.layers.0.0")
        inv_lin(dst + ["ffn", "Dense_1"], f"{lsrc}.ffns.0.layers.1")
        for ni in range(3):
            inv_ln(dst + [f"norm{ni + 1}"], f"{lsrc}.norms.{ni}")
    return sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("out_dir")
    p.add_argument("--num-decoder-layers", type=int, default=6)
    args = p.parse_args()

    # honor GRD4D_PLATFORM before orbax imports jax — the axon
    # sitecustomize force-selects TPU programmatically, and device
    # discovery hangs for minutes when the tunnel is down (CLAUDE.md)
    from graph_detr4d_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_state_dict(sd, args.num_decoder_layers)

    import orbax.checkpoint as ocp

    path = os.path.abspath(args.out_dir)
    ocp.StandardCheckpointer().save(path, variables)
    n = sum(np.asarray(x).size for x in _leaves(variables))
    print(f"converted {len(sd)} tensors -> {path} ({n/1e6:.2f} M params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
