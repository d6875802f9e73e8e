"""Modulated deformable convolution (DCNv2) as XLA gathers + one matmul.

TPU-native replacement for mmcv's DCNv2 CUDA op, enabled on ResNet stages
3-4 in the reference (configs/detr4d/...12e.py:40-41). Semantics match
mmcv's ModulatedDeformConv2d: per output pixel and kernel tap, a learned
(dy, dx) offset shifts the tap's sampling point, sampled bilinearly with
zero padding, scaled by a sigmoid modulation mask, then contracted with the
conv weight.

Formulated as K taps x ONE gather each over a shifted-concat copy of the
input (the 4 bilinear corners of a tap live in a single gathered row — TPU
gathers are row-count-bound, so folding corners is ~4x cheaper than four
separate gathers; see ops/msda.py), plus a single (K*Cin, Cout) matmul
that lands on the MXU. The shifted copy is built once per conv and shared
by all K taps.
"""

import jax
import jax.numpy as jnp

# below this padded-grid pixel count, taps are sampled by a weighted
# one-hot matmul on the MXU instead of gathers — same measured knee as
# ops/msda.py ONEHOT_MAX_PIXELS: gathers are row-count/bandwidth-bound
# (~73 GB/s), while a (samples x pixels) matmul streams at full HBM
# bandwidth and MXU throughput. On the flagship 640x1600 input this
# routes ResNet stage 4 (22x52 padded = 1144 px) through the MXU.
ONEHOT_MAX_PIXELS = 1536


def _sample_taps_onehot(x, offsets, base_y, base_x, kernel_size, dtype):
    """All-tap bilinear sampling as one weighted one-hot matmul per tap.

    The 4 bilinear corner weights of every sample become 4 scaled
    one-hot rows summed into a (B, S, P) matrix M; sampled = M @ xflat.
    Exactly the gather path's corner weights/indices (zero outside the
    valid image)."""
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    Hp, Wp = H + 2, W + 2
    xflat = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
        B, Hp * Wp, Cin
    )
    cols = jnp.arange(Hp * Wp, dtype=jnp.int32)
    cdy = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    cdx = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    taps = []
    for k in range(K):
        ky, kx = divmod(k, kernel_size)
        py = base_y[None] + ky + offsets[..., k, 0].astype(jnp.float32)
        px = base_x[None] + kx + offsets[..., k, 1].astype(jnp.float32)
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ly = py - y0
        lx = px - x0
        w_y = jnp.stack([1.0 - ly, 1.0 - ly, ly, ly], -1)
        w_x = jnp.stack([1.0 - lx, lx, 1.0 - lx, lx], -1)
        cy = y0[..., None] + cdy
        cx = x0[..., None] + cdx
        inb = (cy >= 0) & (cy < H) & (cx >= 0) & (cx < W)
        w = (w_y * w_x * inb.astype(jnp.float32)).astype(dtype)
        iy = jnp.clip(cy + 1.0, 0, Hp - 1)
        ix = jnp.clip(cx + 1.0, 0, Wp - 1)
        idx = (iy * Wp + ix).astype(jnp.int32)  # (B, Ho, Wo, 4)
        Bq, Ho, Wo, _ = idx.shape
        idx = idx.reshape(Bq, Ho * Wo, 4)
        wf = w.reshape(Bq, Ho * Wo, 4)
        m = jnp.einsum(
            "bsc,bscp->bsp",
            wf,
            (idx[..., None] == cols).astype(dtype),
        )  # (B, S, P)
        taps.append(
            jnp.einsum("bsp,bpc->bsc", m, xflat).reshape(Bq, Ho, Wo, Cin)
        )
    return jnp.stack(taps, axis=3)  # (B, Ho, Wo, K, Cin)


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    kernel_size: int = 3,
    variant: str = "shift4",
) -> jnp.ndarray:
    """Args:
      x:       (B, H, W, Cin) input, channels-last.
      offsets: (B, Ho, Wo, K, 2) per-tap (dy, dx) offsets.
      mask:    (B, Ho, Wo, K) modulation (already sigmoid-ed).
      weight:  (K, Cin, Cout) tap-major conv weight.
      variant: large-grid tap-sampling layout, 'shift4' (exact fp folded
        corners) | 'int8' (quantized table; BackboneConfig.dcn_gather).
        Small grids take the one-hot MXU path regardless.

    Returns (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    Ho = (H + 2 * padding - kernel_size) // stride + 1
    Wo = (W + 2 * padding - kernel_size) // stride + 1
    dtype = x.dtype

    ys = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    xs = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    base_y = ys[:, None]  # (Ho, 1)
    base_x = xs[None, :]  # (1, Wo)

    if (H + 2) * (W + 2) <= ONEHOT_MAX_PIXELS:
        # rematerialize: the (B, S, P) one-hot matrices are cheap to
        # recompute but ~GBs if saved for backward across all taps and
        # DCN blocks (12-cam training OOMs the chip otherwise)
        patches = jax.checkpoint(
            _sample_taps_onehot, static_argnums=(4, 5)
        )(x, offsets, base_y, base_x, kernel_size, dtype)
        patches = patches * mask[..., None].astype(dtype)
        out = jnp.einsum(
            "bhwkc,kco->bhwo",
            patches,
            weight.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(dtype)

    if variant == "int8":
        return _deform_conv_int8(
            x, offsets, mask, weight, stride, padding, kernel_size
        )
    return _deform_conv_gather(
        x, offsets, mask, weight, stride, padding, kernel_size, variant
    )


def _deform_conv_gather(
    x, offsets, mask, weight, stride, padding, kernel_size, variant
):
    """Large-grid tap sampling via XLA gathers (see variant notes)."""
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    Ho = (H + 2 * padding - kernel_size) // stride + 1
    Wo = (W + 2 * padding - kernel_size) // stride + 1
    dtype = x.dtype
    ys = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    xs = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    base_y = ys[:, None]  # (Ho, 1)
    base_x = xs[None, :]  # (1, Wo)
    Hp, Wp = H + 2, W + 2
    dequant = None
    if variant in ("shift4", "int8"):
        # shifted-concat copy: one gathered row at (y0+1, x0+1) holds all
        # four bilinear corners; zero borders implement zero-padding
        # sampling. Rows are 4*Cin wide (2 KB at Cin=256 bf16) — in the
        # bandwidth-capped gather regime, but with 4x fewer rows.
        # 'int8' is the same layout with the table quantized to int8 at
        # per-(batch, channel) amax scales: rows go 2 KB -> 1 KB,
        # halving the bandwidth-bound gather traffic (PROFILE.md
        # roofline); values dequantize after the gather. Worst-case
        # per-element quantization error is amax/254 (~0.4% of channel
        # range); opt-in for serving via GRD4D_DCN_GATHER=int8.
        src = x
        if variant == "int8":
            xf = x.astype(jnp.float32)  # quantize in f32 even under bf16
            s = jnp.max(jnp.abs(xf), axis=(1, 2)) + 1e-12  # (B, Cin)
            src = jnp.round(xf * (127.0 / s)[:, None, None, :]).astype(
                jnp.int8
            )
            dequant = (s / 127.0).astype(dtype)
        xpad = jnp.pad(src, ((0, 0), (1, 2), (1, 2), (0, 0)))
        xcat = jnp.stack(
            [
                xpad[:, 0 : H + 2, 0 : W + 2],
                xpad[:, 0 : H + 2, 1 : W + 3],
                xpad[:, 1 : H + 3, 0 : W + 2],
                xpad[:, 1 : H + 3, 1 : W + 3],
            ],
            axis=-2,
        )  # (B, H+2, W+2, 4, Cin)
        xcat = xcat.reshape(B, Hp * Wp, 4 * Cin)
    elif variant == "pair":
        # x-pair concat (2*Cin rows, two gathers: top corners, bottom)
        xpad = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        xcat = jnp.concatenate(
            [xpad[:, :, :-1], xpad[:, :, 1:]], axis=-1
        )  # (B, H+3, W+2, 2*Cin)
        Hp = H + 3
        xcat = xcat.reshape(B, Hp * Wp, 2 * Cin)
    else:  # corner4: raw padded map, four Cin-row gathers per tap
        xcat = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
            B, Hp * Wp, Cin
        )

    cdy = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    cdx = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    cols = []
    for k in range(K):
        ky, kx = divmod(k, kernel_size)
        py = base_y[None] + ky + offsets[..., k, 0].astype(jnp.float32)
        px = base_x[None] + kx + offsets[..., k, 1].astype(jnp.float32)
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ly = py - y0
        lx = px - x0
        w_y = jnp.stack([1.0 - ly, 1.0 - ly, ly, ly], -1)
        w_x = jnp.stack([1.0 - lx, lx, 1.0 - lx, lx], -1)
        cy = y0[..., None] + cdy
        cx = x0[..., None] + cdx
        inb = (cy >= 0) & (cy < H) & (cx >= 0) & (cx < W)
        w = (w_y * w_x * inb.astype(jnp.float32)).astype(dtype)

        if variant in ("shift4", "int8"):
            iy = jnp.clip(y0 + 1, 0, Hp - 1)
            ix = jnp.clip(x0 + 1, 0, Wp - 1)
            idx = (iy * Wp + ix).astype(jnp.int32)
            g = jnp.take_along_axis(
                xcat, idx.reshape(B, Ho * Wo, 1), axis=1
            ).reshape(B, Ho, Wo, 4, Cin)
            if dequant is not None:
                g = g.astype(dtype) * dequant[:, None, None, None, :]
            acc = jnp.einsum("bhwc,bhwcd->bhwd", w, g)
        elif variant == "pair":
            iy = jnp.clip(y0 + 1, 0, Hp - 2)
            ix = jnp.clip(x0 + 1, 0, Wp - 1)
            idx = (iy * Wp + ix).astype(jnp.int32).reshape(B, Ho * Wo, 1)
            g_top = jnp.take_along_axis(xcat, idx, axis=1).reshape(
                B, Ho, Wo, 2, Cin
            )
            g_bot = jnp.take_along_axis(xcat, idx + Wp, axis=1).reshape(
                B, Ho, Wo, 2, Cin
            )
            acc = jnp.einsum(
                "bhwc,bhwcd->bhwd", w[..., :2], g_top
            ) + jnp.einsum("bhwc,bhwcd->bhwd", w[..., 2:], g_bot)
        else:  # corner4
            iy = jnp.clip(cy + 1.0, 0, Hp - 1)
            ix = jnp.clip(cx + 1.0, 0, Wp - 1)
            idx = (iy * Wp + ix).astype(jnp.int32).reshape(B, Ho * Wo, 4)
            acc = 0.0
            for c in range(4):
                g = jnp.take_along_axis(
                    xcat, idx[..., c : c + 1], axis=1
                ).reshape(B, Ho, Wo, Cin)
                acc = acc + w[..., c : c + 1] * g
        cols.append(acc * mask[..., k : k + 1].astype(dtype))
    patches = jnp.stack(cols, axis=3)  # (B, Ho, Wo, K, Cin)
    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        patches,
        weight.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _deform_conv_int8(x, offsets, mask, weight, stride, padding, kernel_size):
    """int8-table gather forward with a straight-through backward.

    The int8 round/cast is non-differentiable (and a gather of an int8
    array carries no tangent), so the backward pass is the exact vjp of
    the bf16 'shift4' formulation — the standard straight-through
    estimator. The int8 path is an opt-in serving optimization; training
    through it stays correct-to-STE rather than silently dropping the
    input gradient."""
    return _deform_conv_gather(
        x, offsets, mask, weight, stride, padding, kernel_size, "int8"
    )


def _int8_fwd(x, offsets, mask, weight, stride, padding, kernel_size):
    out = _deform_conv_gather(
        x, offsets, mask, weight, stride, padding, kernel_size, "int8"
    )
    return out, (x, offsets, mask, weight)


def _int8_bwd(stride, padding, kernel_size, res, g):
    x, offsets, mask, weight = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _deform_conv_gather(
            a, b, c, d, stride, padding, kernel_size, "shift4"
        ),
        x,
        offsets,
        mask,
        weight,
    )
    return vjp(g)


_deform_conv_int8.defvjp(_int8_fwd, _int8_bwd)
