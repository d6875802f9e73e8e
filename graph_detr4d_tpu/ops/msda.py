"""Multi-scale deformable attention sampling — pure-XLA formulation.

TPU-native replacement for mmcv's `MultiScaleDeformableAttnFunction` CUDA
kernel (invoked at deform3d_cross_attn.py:301-309). Semantics:

  * sampling locations are in [0, 1] per level; pixel coords follow
    `align_corners=False` (x_px = x * W - 0.5), bilinear, zero padding
    outside — identical to mmcv's im2col bilinear gather.
  * output = sum over (level, point) of attention_weight * sampled value,
    per head.

The formulation is four corner gathers per level (take_along_axis over the
flattened H*W axis) with corner weights folded into the attention weights,
which XLA fuses into a single gather+FMA chain. Differentiable for free
(gather has a scatter-add transpose).

Why XLA and not Pallas: Mosaic cannot lower vector gathers (dynamic
per-lane indices), so a Pallas MSDA kernel would have to serialize the
gather — measured slower than this layout-tuned XLA path. The kernel
engineering lives in the gather LAYOUT instead: TPU gathers are
row-count-bound (~7-8 ns/row up to 256 B rows), so the shift4/pair
formulations below fold bilinear corners into fewer, wider rows, and the
one-hot MXU matmul path replaces gathers entirely for small pixel tables
(<= ONEHOT_MAX_PIXELS).
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def _sample_level_shift4(value, loc, attn):
    """Gather + weight one pyramid level with the 4 bilinear corners folded
    into ONE gather row (shifted-concat layout).

    TPU gathers are row-count bound (~11-17 ns/row on v5e regardless of row
    width up to ~1 KB), so fetching each sample's 2x2 corner block as a
    single (4*hd)-wide row from a precomputed shifted copy of the feature
    map cuts the dominant cost 4x vs. four separate corner gathers.

    Args/returns identical to `_sample_level`.
    """
    B, H, W, nheads, hd = value.shape
    S = loc.shape[1]
    dtype = value.dtype

    # padded grid: index (y0+1, x0+1) is valid for all samples with any
    # in-bounds corner (x0 in [-1, W-1], y0 in [-1, H-1]); zero borders
    # implement the zero-padding bilinear convention.
    vpad = jnp.pad(value, ((0, 0), (1, 2), (1, 2), (0, 0), (0, 0)))
    # corners (dy, dx) in row-major order: (0,0), (0,1), (1,0), (1,1)
    vcat = jnp.stack(
        [
            vpad[:, 0 : H + 2, 0 : W + 2],
            vpad[:, 0 : H + 2, 1 : W + 3],
            vpad[:, 1 : H + 3, 0 : W + 2],
            vpad[:, 1 : H + 3, 1 : W + 3],
        ],
        axis=-2,
    )  # (B, H+2, W+2, nheads, 4, hd)
    Hp, Wp = H + 2, W + 2
    vflat = vcat.reshape(B, Hp * Wp, nheads, 4 * hd)

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    # per-corner bilinear weights x in-bounds masks, folded with attn
    w_y = jnp.stack([1.0 - ly, 1.0 - ly, ly, ly], axis=-1)
    w_x = jnp.stack([1.0 - lx, lx, 1.0 - lx, lx], axis=-1)
    dy = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    dx = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    cx = x0[..., None] + dx
    cy = y0[..., None] + dy
    inb = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
    w = w_y * w_x * inb.astype(jnp.float32) * attn.astype(jnp.float32)[
        ..., None
    ]  # (B, S, nheads, 4)

    iy = jnp.clip(y0 + 1, 0, Hp - 1)
    ix = jnp.clip(x0 + 1, 0, Wp - 1)
    idx = (iy * Wp + ix).astype(jnp.int32)
    g = jnp.take_along_axis(vflat, idx[..., None], axis=1)
    g = g.reshape(B, S, nheads, 4, hd)
    return jnp.einsum(
        "bsnc,bsnch->bsnh", w.astype(dtype), g
    )


def _sample_level(value, loc, attn):
    """Gather + weight one pyramid level.

    Args:
      value: (B, H, W, nheads, hd) level features.
      loc:   (B, S, nheads, 2) sampling locations in [0, 1] (x, y).
      attn:  (B, S, nheads) attention weights (already include masks).

    Returns (B, S, nheads, hd) weighted samples.
    """
    B, H, W, nheads, hd = value.shape
    S = loc.shape[1]
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    vflat = value.reshape(B, H * W, nheads, hd)
    out = jnp.zeros((B, S, nheads, hd), dtype=value.dtype)
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = (
                jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            ).astype(jnp.int32)
            gathered = jnp.take_along_axis(vflat, idx[..., None], axis=1)
            w = (wy * wx * inb.astype(value.dtype) * attn)[..., None]
            out = out + gathered * w
    return out


def _sample_level_onehot(value, loc, attn):
    """Gather-free sampling for SMALL levels: the bilinear gather is the
    linear map  out = W @ V  with W (S, HW) holding the 4 corner weights
    per row — materialized via one_hot and contracted on the MXU. Exact;
    profitable when HW is small (TPU gathers cost ~11-17 ns/row, so a
    (S, HW) x (HW, hd) matmul beats S gathers once 2*HW*hd flops per row
    is cheaper than a row fetch — true for the top pyramid levels).

    Per-head locations contract against the head's OWN hd channel slice
    ((b, n)-batched matmul). An earlier formulation contracted every
    head's one-hot row against the full nheads*hd channel row and took
    the diagonal after — 8x the FLOPs and 8x the output traffic; XLA
    fused the waste away at B=1 but materialized the full (B, S, nh, C)
    f32 intermediate at B=4 (47 ms/step, the round-3 op trace's largest
    head item).
    """
    B, H, W, nheads, hd = value.shape
    S = loc.shape[1]
    dtype = value.dtype
    vh = value.reshape(B, H * W, nheads, hd).transpose(0, 2, 1, 3)

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    # weight matrix built directly in the compute dtype (bf16 in prod);
    # the contraction accumulates in fp32 on the MXU
    onehot = jnp.zeros((B, S, nheads, H * W), dtype)
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            xi = x0 + dx
            yi = y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = (
                jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            ).astype(jnp.int32)
            w = wy * wx * inb.astype(jnp.float32) * attn.astype(jnp.float32)
            onehot = onehot + jax.nn.one_hot(
                idx, H * W, dtype=dtype
            ) * w[..., None].astype(dtype)

    out = jnp.einsum(
        "bsni,bnih->bsnh",
        onehot,
        vh,
        preferred_element_type=jnp.float32,
    )  # (B, S, nheads, hd) — head n's row sampled at head n's location
    return out.astype(dtype)


def _sample_level_pair(value, loc, attn):
    """Gather + weight one pyramid level as TWO row gathers per sample
    over a per-head, x-paired layout.

    Refinement of `_sample_level_shift4` driven by measured TPU gather
    behavior: gathers hit the fast path (~7-8 ns/row) when the gathered
    axis has a per-(batch) scalar index and a small contiguous row
    (~64-256 B); interleaved head layouts and 2 KB rows fall to 17-28
    ns/row. So: transpose values to (B, nheads, H, W, hd) (per-head tables
    are contiguous), pre-concat each pixel with its x+1 neighbor (ONE
    shifted copy, 2x memory instead of shift4's 4x), and fetch each
    bilinear sample as two 2*hd rows (top corner pair, bottom corner
    pair).

    Args/returns identical to `_sample_level`.
    """
    B, H, W, nheads, hd = value.shape
    S = loc.shape[1]
    dtype = value.dtype

    v = value.transpose(0, 3, 1, 2, 4)  # (B, nh, H, W, hd)
    # zero borders: 1 left/top (x0, y0 = -1) and 2 right/bottom
    vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 2), (1, 2), (0, 0)))
    # x-pair concat: column j holds (pixel j, pixel j+1)
    vpair = jnp.concatenate(
        [vpad[:, :, :, :-1], vpad[:, :, :, 1:]], axis=-1
    )  # (B, nh, H+3, W+2, 2*hd)
    Hp, Wp = H + 3, W + 2
    vflat = vpair.reshape(B, nheads, Hp * Wp, 2 * hd)

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    # per-corner weights x in-bounds x attn; corner order within a row is
    # (x0, x0+1)
    a = attn.astype(jnp.float32)
    dxs = jnp.asarray([0.0, 1.0])
    cx = x0[..., None] + dxs
    inb_x = (cx >= 0) & (cx < W)
    w_x = jnp.stack([1.0 - lx, lx], -1) * inb_x.astype(jnp.float32)
    inb_y0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32)
    inb_y1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32)
    w_top = w_x * ((1.0 - ly) * inb_y0 * a)[..., None]  # (B, S, nh, 2)
    w_bot = w_x * (ly * inb_y1 * a)[..., None]

    iy = jnp.clip(y0 + 1, 0, Hp - 2)
    ix = jnp.clip(x0 + 1, 0, Wp - 1)
    idx = (iy * Wp + ix).astype(jnp.int32)  # (B, S, nh)
    idx = idx.transpose(0, 2, 1)  # (B, nh, S)

    g_top = jnp.take_along_axis(
        vflat, idx[..., None], axis=2
    )  # (B, nh, S, 2*hd)
    g_bot = jnp.take_along_axis(
        vflat, (idx + Wp)[..., None], axis=2
    )
    g_top = g_top.reshape(B, nheads, S, 2, hd)
    g_bot = g_bot.reshape(B, nheads, S, 2, hd)

    wt = w_top.transpose(0, 2, 1, 3).astype(dtype)  # (B, nh, S, 2)
    wb = w_bot.transpose(0, 2, 1, 3).astype(dtype)
    out = jnp.einsum("bnsc,bnsch->bnsh", wt, g_top) + jnp.einsum(
        "bnsc,bnsch->bnsh", wb, g_bot
    )
    return out.transpose(0, 2, 1, 3)  # (B, S, nh, hd)


def build_corner_table(value):
    """Fold the 4 bilinear corners of a (B, H, W, C) map into one padded
    table (B, (H+2)*(W+2), 4, C), corner order (y0x0, y0x1, y1x0, y1x1).

    Built from RAW (pre-value_proj) features this is LAYER-INVARIANT:
    the 6 decoder layers' calls produce identical HLO that XLA CSEs into
    ONE table build per forward, eliminating the per-layer pad/concat
    layout churn (~2 ms/layer at 640x1600 level 0, round-2 op trace).
    The per-layer projection is applied to the folded table afterwards —
    exact, because corner-copying commutes with the per-channel linear
    map, and the zero-pad border picking up the projection bias is
    harmless (out-of-bounds corners always carry weight 0)."""
    B, H, W, C = value.shape
    vpad = jnp.pad(value, ((0, 0), (1, 2), (1, 2), (0, 0)))
    vcat = jnp.stack(
        [
            vpad[:, 0 : H + 2, 0 : W + 2],
            vpad[:, 0 : H + 2, 1 : W + 3],
            vpad[:, 1 : H + 3, 0 : W + 2],
            vpad[:, 1 : H + 3, 1 : W + 3],
        ],
        axis=-2,
    )  # (B, H+2, W+2, 4, C)
    return vcat.reshape(B, (H + 2) * (W + 2), 4, C)


def _sample_level_shift4h_table(table, hw, loc, attn):
    """shift4h sampling from a PRE-PROJECTED corner table.

    table: (B, (H+2)*(W+2), 4, nheads, hd) — build_corner_table output
      with the per-layer value projection already applied.
    hw: static (H, W) of the underlying level.
    loc/attn as in `_sample_level`. Returns (B, S, nheads, hd).
    """
    H, W = hw
    B, HpWp, _, nheads, hd = table.shape
    dtype = table.dtype
    # per-head contiguous rows: (B, nh, HpWp, 4*hd)
    vflat = table.transpose(0, 3, 1, 2, 4).reshape(
        B, nheads, HpWp, 4 * hd
    )
    return _shift4h_gather(vflat, H, W, loc, attn, dtype)


def _shift4h_gather(vflat, H, W, loc, attn, dtype):
    """Common shift4h core: one row gather per sample over a per-head,
    4-corner-folded (B, nh, (H+2)*(W+2), 4*hd) table."""
    B, nheads, _, row = vflat.shape
    hd = row // 4
    S = loc.shape[1]
    Hp, Wp = H + 2, W + 2

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    w_y = jnp.stack([1.0 - ly, 1.0 - ly, ly, ly], axis=-1)
    w_x = jnp.stack([1.0 - lx, lx, 1.0 - lx, lx], axis=-1)
    dy = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    dx = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    cx = x0[..., None] + dx
    cy = y0[..., None] + dy
    inb = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
    w = (
        w_y * w_x * inb.astype(jnp.float32)
        * attn.astype(jnp.float32)[..., None]
    )  # (B, S, nh, 4)

    iy = jnp.clip(y0 + 1, 0, Hp - 1)
    ix = jnp.clip(x0 + 1, 0, Wp - 1)
    idx = (iy * Wp + ix).astype(jnp.int32)  # (B, S, nh)
    idx = idx.transpose(0, 2, 1)  # (B, nh, S)
    g = jnp.take_along_axis(
        vflat, idx[..., None], axis=2
    )  # (B, nh, S, 4*hd)
    g = g.reshape(B, nheads, S, 4, hd)
    wt = w.transpose(0, 2, 1, 3).astype(dtype)  # (B, nh, S, 4)
    out = jnp.einsum("bnsc,bnsch->bnsh", wt, g)
    return out.transpose(0, 2, 1, 3)  # (B, S, nh, hd)


def _sample_level_shift4h(value, loc, attn):
    """Gather + weight one pyramid level as ONE row gather per sample over
    a per-head, 4-corner-folded layout.

    Combines the two measured wins: per-head contiguous tables (the 'pair'
    lesson — interleaved heads fall off the gather fast path) AND all four
    bilinear corners folded into a single fetched row (the 'shift4'
    lesson — gathers are row-count-bound). Row width 4*hd stays within the
    ~256 B fast-path window for hd=32 in bf16, so this halves the row
    count of 'pair' at the same bytes/row cost class. Memory: 4x table
    copies (vs pair's 2x) of one pyramid level, transient.

    Args/returns identical to `_sample_level`.
    """
    B, H, W, nheads, hd = value.shape
    dtype = value.dtype

    v = value.transpose(0, 3, 1, 2, 4)  # (B, nh, H, W, hd)
    vpad = jnp.pad(v, ((0, 0), (0, 0), (1, 2), (1, 2), (0, 0)))
    # corner order within a row: (y0x0, y0x1, y1x0, y1x1)
    vcat = jnp.concatenate(
        [
            vpad[:, :, 0 : H + 2, 0 : W + 2],
            vpad[:, :, 0 : H + 2, 1 : W + 3],
            vpad[:, :, 1 : H + 3, 0 : W + 2],
            vpad[:, :, 1 : H + 3, 1 : W + 3],
        ],
        axis=-1,
    )  # (B, nh, H+2, W+2, 4*hd)
    vflat = vcat.reshape(B, nheads, (H + 2) * (W + 2), 4 * hd)
    return _shift4h_gather(vflat, H, W, loc, attn, dtype)


# below this pixel count a level is sampled by one-hot matmul on the MXU
ONEHOT_MAX_PIXELS = 4200


def multi_scale_deformable_attention(
    values: Sequence[jnp.ndarray],
    locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "shift4h",  # fastest measured on chip: 9.34/9.33 fps vs
    # 9.32/9.30 for 'pair' across two A/B rounds (PROFILE.md); set per
    # call from HeadConfig.msda_impl
    project=None,
    nheads: int = None,
) -> jnp.ndarray:
    """Multi-scale deformable attention over a feature pyramid.

    Args:
      values: list of L arrays (B, H_l, W_l, nheads, hd), channels-last.
        With `project` given: RAW (B, H_l, W_l, C_in) maps instead.
      locations: (B, Q, nheads, L, P, 2) sampling locations in [0, 1], (x, y).
      attention_weights: (B, Q, nheads, L, P); caller is responsible for any
        softmax/masking (the reference does softmax over L*P then multiplies
        the projection-validity mask, deform3d_cross_attn.py:284).
      project: optional per-channel linear map (the caller's value_proj,
        applied to the LAST axis). When given, gather-table construction
        runs on the RAW features — identical across decoder layers, so
        XLA CSEs the 6 per-layer table builds into one — and the
        projection is folded in afterwards (exact; see
        build_corner_table). Requires `nheads`.

    Returns:
      (B, Q, nheads * hd) aggregated features.
    """
    B, Q, nh, L, P, _ = locations.shape
    assert len(values) == L, (len(values), L)
    if project is None:
        nheads = nh
    assert nheads == nh, (nheads, nh)
    impls = {
        "gather4": _sample_level,
        "shift4": _sample_level_shift4,
        "shift4h": _sample_level_shift4h,
        "pair": _sample_level_pair,
    }
    # The one-hot small-level branch keys off the same choice: selecting
    # 'gather4' yields a PURE gather baseline with no one-hot levels —
    # required for honest A/B measurements. Impl selection is config-
    # driven (HeadConfig.msda_impl); the CLI layer may rewrite config
    # from GRD4D_MSDA_IMPL (configs.apply_env_kernel_overrides) but
    # library code never reads the environment.
    base = impls[impl]
    out = None
    for lvl in range(L):
        loc = locations[:, :, :, lvl].transpose(0, 1, 3, 2, 4).reshape(
            B, Q * P, nheads, 2
        )
        attn = attention_weights[:, :, :, lvl].transpose(0, 1, 3, 2).reshape(
            B, Q * P, nheads
        )
        v = values[lvl]
        H, W = v.shape[1], v.shape[2]
        small = H * W <= ONEHOT_MAX_PIXELS
        use_onehot = small and impl != "gather4"
        if project is not None and impl == "shift4h" and not use_onehot:
            # late projection: raw corner table (CSE'd across layers),
            # project folded corners, per-head shift4h gather
            traw = build_corner_table(v.reshape(B, H, W, -1))
            t = project(traw)  # (B, HpWp, 4, nheads*hd)
            hd_l = t.shape[-1] // nheads
            t = t.reshape(*t.shape[:-1], nheads, hd_l)
            s = _sample_level_shift4h_table(t, (H, W), loc, attn)
        else:
            if project is not None:
                v = project(v)
                v = v.reshape(B, H, W, nheads, v.shape[-1] // nheads)
            # rematerialize the one-hot path: its (B, S, nheads, H*W)
            # weight matrix is cheap to recompute but multi-GB if saved
            # for backward (at 320x800 train resolution ALL four levels
            # fall under the threshold; saving them exhausted HBM and
            # crashed the worker on the 12-cam train step — same failure
            # mode as the DCN one-hot postmortem, CLAUDE.md 2026-08-17)
            sample = (
                jax.checkpoint(_sample_level_onehot)
                if use_onehot
                else base
            )
            s = sample(v, loc, attn)
        out = s if out is None else out + s
    # sum over points
    hd = out.shape[-1]
    out = out.reshape(B, Q, P, nheads, hd).sum(axis=2)
    return out.reshape(B, Q, nheads * hd)
