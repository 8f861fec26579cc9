"""Pallas backward kernel for the chunked DSCV expanded-map fetch.

The training-step profile (DEVELOPMENT.md "Training-step backward") shows
the VJP of the expanded-map row fetch — XLA scatter-adds of the patch
cotangent, e.g. bf16[110592,170] per chunk at level 1 — running at only
~50-70 GB/s effective, ~65-76 ms of a 245 ms step. The scattered bytes are
irreducible in XLA-land (the cotangent is dense), but the scatter TARGET is
small: in exp_y-space (the y-expanded map, [h, w+d-1, d*ch]) every pixel's
whole [d, d*ch] cotangent block lands on ONE spatial row (cy) at a
d-column window (cx..cx+d) — dy lives in the channel dim. At bf16 that
gradient map fits in VMEM (13.6 MB at 384^2 level 1), so this kernel
streams the cotangent rows once at HBM read bandwidth and performs the
accumulation as per-pixel banded read-modify-writes against the
VMEM-resident map:

  * grid (b, row-tiles) — sequential on the single v5e core, so RMW
    accumulation needs no atomics; the output block index ignores the tile
    axis, keeping the map VMEM-resident across tiles (zeroed at tile 0).
  * per pixel: concatenate the per-chunk cotangent rows to [d, d*ch], pad
    to a (7+d)-rounded-to-8 row container (24 at the default d=10), shift
    to the in-band offset with a dynamic sublane roll (cx & 7), and add
    into the 8-aligned band out[cy, cx & ~7 : +cb, :] — honoring Mosaic's
    8-aligned dynamic sublane-start rule.
  * cy/cx indices ride in SMEM blocks for scalar loop reads.

The result is grad wrt exp_y directly; the remaining adjoint back to the
padded/combined map (static pad+adds) stays in XLA.

bf16 accumulation parity: XLA's own VJP scatters accumulate in bf16 (the
cotangent dtype), so this kernel matches the autodiff path's numerics;
gradient tests compare both against the gather formulation in fp32.

Reference counterpart: the hand-written CUDA backward
``BackProjectGrad`` (/root/reference/cuda_backproject/
backproject_op_gpu.cu.cc:105-223) — same role (custom gradient for the
perf-critical resampling op), redesigned for the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grad_kernel(cy_ref, cx_ref, *refs, d, ch, cb, rows):
    cot_refs = refs[:-1]
    out_ref = refs[-1]

    @pl.when(pl.program_id(2) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, carry):
        # index blocks are [1, 1, 8, rows//8] (SMEM block-shape rules)
        cyi = cy_ref[0, 0, i // (rows // 8), i % (rows // 8)]
        cxi = cx_ref[0, 0, i // (rows // 8), i % (rows // 8)]
        parts = [r[0, i] for r in cot_refs]           # each [nd_j, d*ch]
        upd = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        upd = jnp.pad(upd, ((0, cb - d), (0, 0)))     # [cb, d*ch]
        off = jax.lax.rem(cxi, 8)
        # tpu.dynamic_rotate only handles 32-bit element types
        upd = pltpu.roll(upd.astype(jnp.float32), off, axis=0
                         ).astype(upd.dtype)          # data rows off..off+d
        band = pl.multiple_of(cxi - off, 8)
        cur = out_ref[0, cyi, pl.ds(band, cb), :]
        out_ref[0, cyi, pl.ds(band, cb), :] = cur + upd
        return carry

    jax.lax.fori_loop(0, rows, body, 0)


def fetch_grad(cots, cy, cx, *, h, w, d, ch, rows_per_tile=256,
               vmem_budget=40 << 20):
    """Accumulate chunked-fetch cotangents into the exp_y-shaped gradient.

    Args:
      cots: list of [b, n, nd_j, d*ch] bf16 chunk cotangents, dx-chunk-major
        (together covering dx in [0, d)).
      cy, cx: [b, n] int32 per-pixel fetch centers (clipped, in-bounds).

    Returns: [b, h, w + d - 1, d*ch] grad wrt the y-expanded map.

    VMEM fitting: the grid carries a lane-tile axis — the accumulation is
    lane-elementwise (the sublane roll and the banded RMW never mix lanes),
    so the gradient map splits cleanly across 128-lane blocks. The finest
    level's map padded to lane tiles exceeds the 16 MB scoped-VMEM limit
    (192*208 rows x 256 lanes = 20.4 MB at 384^2 d6); lane-splitting trades
    one extra streamed read of the cotangent per extra tile, which at HBM
    read bandwidth is noise next to the ~70 GB/s XLA scatters this replaces.
    Block sizes (lane tile, rows per tile) are chosen at trace time to fit
    ``vmem_budget`` (compiler scoped-vmem limit 16 MB minus scratch slack).
    """
    b, n = cy.shape
    dch = d * ch
    itemsize = jnp.dtype(cots[0].dtype).itemsize
    # band rows: the roll places data at sublanes (cx & 7)..(cx & 7)+d-1,
    # so the band must hold 7 + d rows, rounded to the 8-sublane grid.
    # A fixed cb=24 was only correct for d <= 17 (search_range <= 7):
    # pltpu.roll is cyclic, so a larger d silently WRAPPED the tail rows
    # onto the band start, corrupting gradients instead of failing.
    cb = -(-(d + 7) // 8) * 8          # 24 at the default d=10
    wp = ((w - 1) // 8) * 8 + cb       # band always in-bounds after padding
    assert wp >= w + d - 1

    full_lanes = -(-dch // 128) * 128
    # smallest lane-tile count whose output block (Mosaic double-buffers it)
    # leaves room for inputs
    for n_lt in range(1, full_lanes // 128 + 1):
        lb = -(-full_lanes // (128 * n_lt)) * 128
        out_bytes = 2 * h * wp * lb * itemsize
        if out_bytes <= (vmem_budget * 3) // 4 or lb == 128:
            break
    # rows per tile: input blocks are double-buffered; each chunk's nd_j
    # sublane dim pads to the dtype's sublane tile (16 for 2-byte types) —
    # a flat 8-per-chunk estimate undercounted wide chunks (e.g. a single
    # d=10 chunk really occupies 16 sublanes)
    st = 16 if itemsize == 2 else 8
    in_row_bytes = 2 * sum(-(-c.shape[2] // st) * st
                           for c in cots) * lb * itemsize
    r = min(rows_per_tile, n)
    r = ((r + 7) // 8) * 8             # SMEM fold below needs 8 | r
    while r > 8 and out_bytes + r * in_row_bytes > vmem_budget:
        r //= 2
    if n % r:
        pad = r - n % r
        cots = [jnp.pad(c, ((0, 0), (0, pad), (0, 0), (0, 0))) for c in cots]
        # zero cotangent rows scatter nothing wherever they land
        cy = jnp.pad(cy, ((0, 0), (0, pad)))
        cx = jnp.pad(cx, ((0, 0), (0, pad)))
        n += pad
    grid = (b, n_lt, n // r)

    kern = functools.partial(_grad_kernel, d=d, ch=ch, cb=cb, rows=r)
    smem = functools.partial(
        pl.BlockSpec, memory_space=pltpu.MemorySpace.SMEM)
    # SMEM block shapes must have their last two dims (8, x)-conformant;
    # fold each r-row tile to [8, r // 8]
    cy = cy.reshape(b, n // r, 8, r // 8)
    cx = cx.reshape(b, n // r, 8, r // 8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, wp, dch), cots[0].dtype),
        grid=grid,
        in_specs=[smem((1, 1, 8, r // 8), lambda bi, li, ti: (bi, ti, 0, 0)),
                  smem((1, 1, 8, r // 8), lambda bi, li, ti: (bi, ti, 0, 0))] +
                 [pl.BlockSpec((1, r, c.shape[2], lb),
                               lambda bi, li, ti: (bi, ti, 0, li))
                  for c in cots],
        out_specs=pl.BlockSpec((1, h, wp, lb),
                               lambda bi, li, ti: (bi, 0, 0, li)),
        # default scoped-vmem limit is 16 MB; the resident map block plus
        # pipeline buffers legitimately need more at the finest level (v5e
        # has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=out_bytes + r * in_row_bytes + (4 << 20)),
        interpret=jax.default_backend() == "cpu",
    )(cy, cx, *cots)
    return out[:, :, :w + d - 1, :]
