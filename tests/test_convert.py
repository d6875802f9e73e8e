"""Checkpoint converter: roundtrip + structural equality with model init."""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.convert_checkpoint import convert_state_dict, export_state_dict

from graph_detr4d_tpu.config import (
    ModelConfig,
    BackboneConfig,
    NeckConfig,
    HeadConfig,
)
from graph_detr4d_tpu.models import GraphDETR4D


def small_flagship_cfg():
    """Structurally identical to the flagship (bottleneck ResNet-50 + DCN,
    FPN, PE head) but with tiny dims for CPU."""
    return ModelConfig(
        backbone=BackboneConfig(depth=50, use_dcn=True),
        neck=NeckConfig(in_channels=(256, 512, 1024, 2048), out_channels=32),
        head=HeadConfig(
            num_query=8,
            embed_dims=32,
            num_decoder_layers=2,
            num_heads=8,
            num_points=2,
            num_cams=6,
            ffn_dims=64,
            depth_num=4,
            pe_num_feats=16,
        ),
        img_size=(64, 128),
        bf16=False,
    )


def tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from tree_paths(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree).shape


def _roundtrip(cfg):
    model = GraphDETR4D(cfg)
    imgs = jnp.zeros((1, 6, 64, 128, 3))
    l2i = jnp.broadcast_to(jnp.eye(4), (1, 6, 4, 4))
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, l2i)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = export_state_dict(
        variables, cfg.head.num_decoder_layers, cfg.head.num_heads
    )
    back = convert_state_dict(
        sd, cfg.head.num_decoder_layers, cfg.head.num_heads
    )

    got = dict(tree_paths(back))
    want = dict(tree_paths(variables))
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not extra, f"extra paths: {sorted(extra)[:8]}"
    # converter covers every parameter the reference checkpoint carries;
    # nothing in the roundtrip may go missing
    assert not missing, f"missing paths: {sorted(missing)[:8]}"
    for path in want:
        assert got[path] == want[path], (path, got[path], want[path])

    # exact value roundtrip
    def get(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    for path in want:
        np.testing.assert_array_equal(
            get(back, path), get(variables, path), err_msg=str(path)
        )
    return sd


def test_converter_roundtrip_and_structure():
    cfg = small_flagship_cfg()
    sd = _roundtrip(cfg)
    # reference-layout sanity: known key shapes
    assert sd["img_backbone.conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["pts_bbox_head.cls_branches.0.6.weight"].shape == (10, 32)
    assert sd["img_backbone.layer3.0.conv2.conv_offset.weight"].shape[0] == 27
    assert sd[
        "pts_bbox_head.transformer.decoder.layers.0.attentions.0.attn.in_proj_weight"
    ].shape == (96, 32)


def test_converter_roundtrip_plain_detr3d_families():
    """with_pe=False + Detr3DCrossAtten / Detr3DCrossAttenV2 checkpoints
    (detr3d_transformer.py:230-330, 442-560) carry no position_encoder /
    adapt_pos3d / fpe and different cross-attn tensors — the converter
    must map them (it used to KeyError on the missing PE keys)."""
    import dataclasses

    for attn_type in ("detr3d", "detr3d_v2"):
        cfg = small_flagship_cfg()
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, use_dcn=False),
            head=dataclasses.replace(
                cfg.head, with_pe=False, attn_type=attn_type
            ),
        )
        sd = _roundtrip(cfg)
        assert "pts_bbox_head.position_encoder.0.weight" not in sd
        assert "pts_bbox_head.fpe.conv_reduce.weight" not in sd
        x = "pts_bbox_head.transformer.decoder.layers.0.attentions.1"
        assert f"{x}.attention_weights.weight" in sd
        assert f"{x}.position_encoder.0.weight" in sd
        if attn_type == "detr3d_v2":
            assert f"{x}.sampling_offsets.weight" in sd
        else:
            assert f"{x}.sampling_offsets.weight" not in sd
