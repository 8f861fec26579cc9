"""Pallas TPU kernel: fused spatial-neighborhood cost volume.

The XLA formulation of the SNCV (m4depth_tpu/ops/cost_volume.py
``spatial_cost_volume``) re-reads c1 and the shifted c2 from HBM for each of
the (2r+1)^2 offsets. This kernel keeps the inputs in VMEM and sweeps all
offsets on the VPU in one pass.

Layout: channels-FIRST inside the kernel — the (H, W) plane rides the
(sublane, lane) tiling, so every multiply-accumulate is a full-width
[tile_h, W] vector op instead of a lane-starved [.., C=16] op. The public
wrapper accepts/returns NHWC and performs the transposes.

Semantics identical to ``spatial_cost_volume`` (per-cut mean correlation per
offset, offset-major/cut-minor channels, leaky-relu). Differentiable via a
custom VJP whose backward is a dense shift-sum in plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sncv_kernel(c1_ref, c2pad_ref, out_ref, acc_ref, *, search_range,
                 dilation_rate, num_cuts, cc, th, w, band, leaky_slope):
    # c1_ref: [1, C, th, w]; c2pad_ref: [1, C, hp, wp] (whole image, hp
    # rounded so the band load below stays in bounds);
    # out_ref: [1, side^2*cuts, th, w]; acc_ref: VMEM scratch, same block.
    # Loop order: channels OUTER (each channel's c1 tile and c2 band are
    # loaded once, then swept over all offsets), offsets inner accumulating
    # into VMEM — ~side^2 x fewer VMEM loads than the offset-outer order.
    side = 2 * search_range + 1
    i = pl.program_id(1)
    row0 = pl.multiple_of(i * th, 8)  # aligned sublane start
    C = num_cuts * cc

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(ch, _):
        a = c1_ref[0, ch].astype(jnp.float32)
        # aligned dynamic load; the (unaligned) dy/dx shifts are static
        # slices of the loaded register value
        bb = c2pad_ref[0, ch, pl.ds(row0, band), :]
        k = ch // cc
        for dy in range(side):
            rows = jax.lax.slice(
                bb, (dy * dilation_rate, 0),
                (dy * dilation_rate + th, bb.shape[1]))
            for dx in range(side):
                sh = jax.lax.slice(rows, (0, dx * dilation_rate),
                                   (th, dx * dilation_rate + w))
                off = (dy * side + dx) * num_cuts + k
                acc_ref[0, off] = acc_ref[0, off] + a * sh.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    for off in range(side * side * num_cuts):
        cost = acc_ref[0, off] * (1.0 / cc)
        out_ref[0, off] = jnp.where(cost > 0, cost, cost * leaky_slope)


def _sncv_forward(
    c1, c2, search_range, dilation_rate=1, num_cuts=1,
    cv_dtype=jnp.bfloat16, leaky_slope=0.1, interpret=False,
) -> jnp.ndarray:
    b, h, w, C = c1.shape
    r = search_range * dilation_rate
    side = 2 * search_range + 1
    cc = C // num_cuts
    th = 8 if h % 8 == 0 else h

    band = -(-(th + 2 * r) // 8) * 8          # band load size, 8-aligned
    hp = h + max(2 * r, band - th)            # rows so the last band fits

    c1_t = c1.astype(cv_dtype).transpose(0, 3, 1, 2)      # [b, C, h, w]
    c2pad_t = jnp.pad(c2.astype(cv_dtype).transpose(0, 3, 1, 2),
                      ((0, 0), (0, 0), (r, hp - h - r), (r, r)))

    kernel = functools.partial(
        _sncv_kernel, search_range=search_range,
        dilation_rate=dilation_rate, num_cuts=num_cuts, cc=cc, th=th, w=w,
        band=band, leaky_slope=leaky_slope)

    out_t = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, C, th, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hp, w + 2 * r),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side * side * num_cuts, th, w),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, side * side * num_cuts, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, side * side * num_cuts, th, w), jnp.float32)],
        interpret=interpret,
    )(c1_t, c2pad_t)
    return out_t.transpose(0, 2, 3, 1)                    # NHWC


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def spatial_cost_volume_pallas(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    search_range: int,
    dilation_rate: int = 1,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    leaky_slope: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``spatial_cost_volume`` (fp32 accumulate)."""
    return _sncv_forward(c1, c2, search_range, dilation_rate, num_cuts,
                         cv_dtype, leaky_slope, interpret)


def _sncv_fwd(c1, c2, search_range, dilation_rate, num_cuts, cv_dtype,
              leaky_slope, interpret):
    out = _sncv_forward(c1, c2, search_range, dilation_rate, num_cuts,
                        cv_dtype, leaky_slope, interpret)
    return out, (c1, c2, out > 0)


def _sncv_bwd(search_range, dilation_rate, num_cuts, cv_dtype, leaky_slope,
              interpret, residuals, g):
    """Dense shift-sum backward: d c1 accumulates shifted c2 weighted by the
    per-offset output grads; d c2 the inverse shifts of grads x c1."""
    c1, c2, positive = residuals
    b, h, w, C = c1.shape
    cc = C // num_cuts
    r = search_range * dilation_rate
    side = 2 * search_range + 1
    gp = (g * jnp.where(positive, 1.0, leaky_slope)).astype(jnp.float32)
    c1f = c1.astype(jnp.float32)
    pad2 = jnp.pad(c2.astype(jnp.float32),
                   ((0, 0), (r, r), (r, r), (0, 0)))
    dc1 = jnp.zeros((b, h, w, num_cuts, cc), jnp.float32)
    dpad2 = jnp.zeros_like(pad2).reshape(b, h + 2 * r, w + 2 * r,
                                         num_cuts, cc)
    c1r = c1f.reshape(b, h, w, num_cuts, cc)
    for dy in range(side):
        for dx in range(side):
            y0, x0 = dy * dilation_rate, dx * dilation_rate
            off = (dy * side + dx) * num_cuts
            go = gp[..., off:off + num_cuts, None] / cc   # [b,h,w,cuts,1]
            shifted = pad2[:, y0:y0 + h, x0:x0 + w, :].reshape(
                b, h, w, num_cuts, cc)
            dc1 = dc1 + go * shifted
            dpad2 = dpad2.at[:, y0:y0 + h, x0:x0 + w].add(go * c1r)
    dc2 = dpad2.reshape(b, h + 2 * r, w + 2 * r, C)[:, r:r + h, r:r + w, :]
    return dc1.reshape(b, h, w, C).astype(c1.dtype), dc2.astype(c2.dtype)


spatial_cost_volume_pallas.defvjp(_sncv_fwd, _sncv_bwd)
