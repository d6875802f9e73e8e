"""GraphDETR4D detector: grid-mask -> backbone -> FPN -> head.

Parity with the Detr3D detector wrapper
(projects/mmdet3d_plugin/models/detectors/detr3d.py:10-216): all cameras
fold into the batch axis for the conv stack (:62-66), then un-fold to
(B, N, ...) for the head. GridMask applies only in training (:53-54).

TPU-first: NHWC throughout, bf16 compute dtype optional, `jax.checkpoint`
on backbone stages via ResNet(remat=True).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..parallel.mesh import constrain
from .resnet import ResNet
from .fpn import FPN
from .head import Detr3DHeadPE
from .grid_mask import grid_mask


class GraphDETR4D(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.bf16 else jnp.float32
        if self.cfg.backbone_type == "vovnet":
            from .vovnet import VoVNet

            self.backbone = VoVNet(
                spec_name=self.cfg.vovnet_spec,
                out_indices=self.cfg.backbone.out_indices,
                remat=self.cfg.backbone.remat,
                dtype=dtype,
            )
        elif self.cfg.backbone_type == "mobilenetv2":
            from .mobilenet import MobileNetV2

            self.backbone = MobileNetV2(
                out_indices=self.cfg.backbone.out_indices,
                dtype=dtype,
            )
        else:
            self.backbone = ResNet(
                depth=self.cfg.backbone.depth,
                out_indices=self.cfg.backbone.out_indices,
                stage_with_dcn=self.cfg.backbone.stage_with_dcn,
                use_dcn=self.cfg.backbone.use_dcn,
                dcn_gather=self.cfg.backbone.dcn_gather,
                remat=self.cfg.backbone.remat,
                stem_s2d=self.cfg.backbone.stem_s2d,
                dtype=dtype,
            )
        if self.cfg.neck.num_outs == 0:
            # neck-less config (petr_r50dcn_gridmask_c5 has no img_neck:
            # the head's input_proj consumes the raw C5 map)
            self.neck = None
        else:
            self.neck = FPN(
                out_channels=self.cfg.neck.out_channels,
                start_level=self.cfg.neck.start_level,
                num_outs=self.cfg.neck.num_outs,
                relu_before_extra_convs=self.cfg.neck.relu_before_extra_convs,
                cp=self.cfg.neck.cp,
                dtype=dtype,
            )
        if self.cfg.head_type in ("petr", "petrv2"):
            from .petr_head import PETRHead

            is_v2 = self.cfg.head_type == "petrv2"
            self.head = PETRHead(
                cfg=self.cfg.head,
                img_shape=self.cfg.img_size,
                position_range=self.cfg.head.petr_position_range,
                lid=self.cfg.head.petr_lid,
                # PETRv2 structural deltas (petrv2_head.py): with_time,
                # fpe SE gate on the coords PE (with_fpe=True in every
                # v2 det config), grouped RegLayer (with_multi=True),
                # per-layer deepcopied branches (:297-300). PETRv1 has
                # none of these.
                with_time=is_v2,
                with_fpe=is_v2 and self.cfg.head.with_fpe,
                with_multi=is_v2,
                per_layer_branches=is_v2,
                dtype=dtype,
            )
        elif self.cfg.head_type == "petr_seg":
            from .petr_seg import PETRHeadSeg

            self.head = PETRHeadSeg(
                cfg=self.cfg.head,
                img_shape=self.cfg.img_size,
                position_range=self.cfg.head.petr_position_range,
                lid=self.cfg.head.petr_lid,
                # temporal iff the rig carries past-frame cameras
                # (petrv2_BEVseg.py:51 with_time=True, 12-cam rig)
                with_time=self.cfg.head.num_cams
                > self.cfg.head.num_frame_cams,
                # with_fpe doubles as the seg head's with_se (same
                # SELayer-on-PE gate, petrv2_BEVseg.py:50)
                with_se=self.cfg.head.with_fpe,
                dtype=dtype,
            )
        elif self.cfg.head_type == "detr4d_pe":
            self.head = Detr3DHeadPE(
                cfg=self.cfg.head, img_shape=self.cfg.img_size, dtype=dtype
            )
        else:
            raise ValueError(
                f"unknown head_type {self.cfg.head_type!r}; expected one of "
                "'detr4d_pe', 'petr', 'petrv2', 'petr_seg'"
            )

    def extract_feats(self, images, train: bool, rng: Optional[jax.Array]):
        """images (B, N, H, W, 3) -> L x (B, N, h, w, C)."""
        B, N, H, W, _ = images.shape
        if self.cfg.device_normalize:
            # images arrive as RAW pixels (uint8, or float after
            # photometric aug; already channel-reversed for BGR configs
            # by the pipeline). Normalize in fp32 BEFORE grid-mask so a
            # masked pixel is 0 in normalized space, exactly like the
            # reference's CPU-normalize -> GridMask order.
            mean = jnp.asarray(self.cfg.img_mean, jnp.float32)
            std = jnp.asarray(self.cfg.img_std, jnp.float32)
            images = (images.astype(jnp.float32) - mean) / std
        if train and self.cfg.train.use_grid_mask and rng is not None:
            images = grid_mask(rng, images, prob=self.cfg.train.grid_mask_prob)
        dtype = jnp.bfloat16 if self.cfg.bf16 else jnp.float32
        # on a (data, cam) mesh the folded conv batch splits over BOTH
        # axes, partitioning the backbone/FPN FLOPs across chips even at
        # global batch 1 (no-op on a 1-D mesh / single chip)
        images = constrain(images, "data", "cam")
        x = images.reshape(B * N, H, W, 3).astype(dtype)
        x = constrain(x, ("data", "cam"))

        def conv_stack(xc):
            f = self.backbone(xc)
            if self.neck is not None:
                f = self.neck(f)
            return f

        chunk = self.cfg.backbone.cam_chunk
        if chunk and B * N > chunk and (B * N) % chunk == 0:
            # unrolled chunking over the folded camera axis: each chunk
            # re-runs the conv stack at the well-tuned small shape (see
            # BackboneConfig.cam_chunk); flax shares params across the
            # calls. Incompatible with a 'cam'-sharded mesh (the chunk
            # split would cross the shard boundary) — callers gate it.
            groups = [
                conv_stack(x[g : g + chunk])
                for g in range(0, B * N, chunk)
            ]
            feats = [
                jnp.concatenate([g[l] for g in groups], axis=0)
                for l in range(len(groups[0]))
            ]
        else:
            feats = conv_stack(x)
        return [
            constrain(
                f.reshape(B, N, *f.shape[1:3], f.shape[-1]), "data", "cam"
            )
            for f in feats
        ]

    def aug_forward(
        self,
        images_list,  # list of (B, N, H, W, 3) augmented copies
        lidar2img,  # (B, N, 4, 4) shared, or a list of per-copy mats
        **head_kwargs,  # mean_time_stamp / intrinsics / ida_scale / ...
    ):
        """Test-time augmentation: full forward per copy, each with its
        OWN composed calibration, then average the head outputs (logits
        and normalized box preds are query-aligned across copies — the
        decoder starts from the same learned queries).

        Deliberate deviation from the reference's aug_test
        (detr3d.py:192-216), which averages FEATURE maps and reuses copy
        0's calibration: for resize TTA the copies' features are
        spatially shifted, so that average samples the wrong locations.
        The reference never exercises it (its shipped test pipelines run
        a single copy, flip=False — configs/detr4d/...12e.py:167-178);
        output averaging is exact for identical copies and geometrically
        aligned for resized ones."""
        l2is = (
            list(lidar2img)
            if isinstance(lidar2img, (list, tuple))
            or getattr(lidar2img, "ndim", 4) == 5
            else [lidar2img] * len(images_list)
        )
        outs = []
        for im, l2i in zip(images_list, l2is):
            feats = self.extract_feats(im, False, None)
            outs.append(
                self.forward_feats(
                    feats, l2i, train=False, **head_kwargs
                )
            )
        n = float(len(outs))
        return jax.tree.map(lambda *xs: sum(xs) / n, *outs)

    def forward_feats(
        self,
        feats,  # L x (B, N, h, w, C) precomputed camera features
        lidar2img: jnp.ndarray,  # (B, N, 4, 4)
        train: bool = False,
        depth_factors: Optional[jnp.ndarray] = None,
        mean_time_stamp: Optional[jnp.ndarray] = None,  # PETRv2 (B,)
        intrinsics: Optional[jnp.ndarray] = None,  # (B, N, 4, 4) cam_aware
        ida_scale: Optional[jnp.ndarray] = None,  # (B, N) cam_aware
    ):
        """Head-only forward over precomputed features.

        Streaming temporal inference: the 4D model's camera axis is
        [current 6 cams | sweep 6 cams] (data/nuscenes.py sample():
        sweeps append after the current frame). On a live stream the
        sweep frame's backbone features were already computed when that
        frame was current, so a server caches `extract_feats` of each
        frame and runs this on the concat — skipping half the backbone
        work. Exact: the backbone is per-camera (folded batch, frozen
        BN), so features computed at t-1 equal recomputing them at t
        (up to conv-scheduling float noise across batch sizes). The reference has no equivalent (its
        forward is monolithic, detr3d.py:62-66 recomputes all 12 every
        call)."""
        chunk = self.cfg.head.batch_chunk
        B = feats[0].shape[0]
        if (not train) and chunk and B > chunk and B % chunk == 0:
            # batch-chunked head (HeadConfig.batch_chunk): re-run the
            # small-batch head program per slice, unrolled; exact up to
            # per-shape scheduling float noise — no head op crosses the
            # batch axis. Every head family stacks outputs
            # (layers, B, ...), so slices concat on axis 1.
            outs = []
            for g in range(0, B, chunk):

                def sl(a):
                    return None if a is None else a[g : g + chunk]

                outs.append(
                    self._head_call(
                        [f[g : g + chunk] for f in feats],
                        sl(lidar2img),
                        train,
                        sl(depth_factors),
                        sl(mean_time_stamp),
                        sl(intrinsics),
                        sl(ida_scale),
                    )
                )
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=1), *outs
            )
        return self._head_call(
            feats, lidar2img, train, depth_factors, mean_time_stamp,
            intrinsics, ida_scale,
        )

    def _head_call(
        self, feats, lidar2img, train, depth_factors, mean_time_stamp,
        intrinsics, ida_scale,
    ):
        if self.cfg.head_type in ("petr", "petrv2", "petr_seg"):
            return self.head(
                feats,
                lidar2img,
                deterministic=not train,
                mean_time_stamp=mean_time_stamp,
            )
        return self.head(
            feats,
            lidar2img,
            deterministic=not train,
            depth_factors=depth_factors,
            intrinsics=intrinsics,
            ida_scale=ida_scale,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # (B, N, H, W, 3) normalized
        lidar2img: jnp.ndarray,  # (B, N, 4, 4)
        train: bool = False,
        rng: Optional[jax.Array] = None,
        depth_factors: Optional[jnp.ndarray] = None,
        mean_time_stamp: Optional[jnp.ndarray] = None,  # PETRv2 (B,)
        intrinsics: Optional[jnp.ndarray] = None,  # (B, N, 4, 4) cam_aware
        ida_scale: Optional[jnp.ndarray] = None,  # (B, N) cam_aware
    ):
        feats = self.extract_feats(images, train, rng)
        return self.forward_feats(
            feats,
            lidar2img,
            train=train,
            depth_factors=depth_factors,
            mean_time_stamp=mean_time_stamp,
            intrinsics=intrinsics,
            ida_scale=ida_scale,
        )
