"""Pallas fused post-gather reduce for the parallax-sweeping cost volume.

Replaces the XLA reduce chain downstream of the expanded-map row gather in
``parallax_sweeping_cv_split`` (ops/cost_volume.py). Motivation (measured,
v5e, 384^2 d6 — see DEVELOPMENT.md "Streaming-step roofline"): XLA lays every
reduce/elementwise consumer of the gathered ``[N, K]`` rows out pixel-minor,
forcing a full relayout copy of the fetched patch per chunk plus reshape
copies, and the round-2 attempts to reformulate in JAX-land all got
re-transposed by layout assignment.

This kernel consumes the gather output in its NATIVE row-major ``{1,0}``
layout and performs the whole reduction in VMEM. Two hard-won design rules:

* The lane-granularity wall (the row's (dx, dy, c) blocks have period
  ch = C+1, e.g. 17 — not lane-tile aligned, so slice/broadcast VPU
  approaches waste 7/8 of the machine) is sidestepped by doing ALL
  structured lane shuffles as matmuls against small constant 0/1 matrices
  on the MXU, which has no alignment preference.
* Kernel side-operand/result layouts must not leak into the rest of the
  model: a [N, C] pixel-rows side input (and a [N, out] result) made XLA
  layout assignment flip the upstream encoder convs off the MXU and
  explode the SNCV's fusion strategy (measured 2x model regression).
  The feature map, the bilinear weights and the RESULT therefore cross the
  boundary in their natural NHWC shapes — for b=1-per-row-band tiles the
  Pallas default layout is physically identical to XLA's own choice — and
  are flattened to pixel-row tiles only INSIDE VMEM (merging sublane dims
  keeps the lane dim whole, which Mosaic supports).

Per tile of TN = th*w pixels (a band of th image rows):
  1. ``c1rep = c1 @ T + para_mask`` — tiles the feature vector across all
     (dx, dy) blocks, 1.0 at each block's temporal-parallax lane
  2. ``D = (F * c1rep) @ S``     — per-block per-cut channel sums (the
     correlation numerators) and the raw parallax lanes, one bf16 matmul
     with f32 accumulation (numerically the convert->reduce XLA performs)
  3. ``WXY = (wx @ RxAll) * (wy @ RyAll)`` — ALL s hypotheses' separable
     bilinear weights expanded to the (dx, dy, cut) grid in two matmuls
  4. ``cv = (tile_s(bs) * WXY) @ S2`` — one block-diagonal matmul contracts
     every hypothesis/cut pair at once

Every op is row-independent, so partial tiles at the grid edge are safe
(garbage rows never mix into real rows). Chunk partials along dx sum
exactly (the dx weight contraction splits), mirroring the split impl.

Parity reference: the sweeping CV math is ``get_parallax_sweeping_cv``
(/root/reference/utils/depth_operations.py:217-281); bit-level behaviour is
pinned against the in-repo implementations by tests/test_cost_volume.py.

Forward-only: ``pallas_call`` defines no VJP, so this path raises under
differentiation — training uses ``dscv_impl="split"``; this kernel serves
the streaming/eval/serving path where the forward is the whole cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


@functools.lru_cache(maxsize=None)
def _constants(C: int, cuts: int, nd: int, d: int, s: int,
               dtype: str = "bfloat16"):
    """Constant shuffle/reduce matrices for one (level, chunk-width) shape.

    Row layout of a fetched chunk row: (dx local in [0, nd), dy in [0, d),
    c in [0, ch)) with ch = C + 1 (c2 features then the temporal parallax).
    """
    ch = C + 1
    kc = nd * d * ch
    nj = nd * d                      # (dx, dy) grid positions in this chunk
    m1 = cuts * nj                   # bs columns, cut-major
    cc = C // cuts

    # T: tile c1 across every (dx, dy) block; PM: 1.0 at the parallax lanes
    T = np.zeros((C, kc), np.float32)
    PM = np.zeros((1, kc), np.float32)
    for j in range(nj):
        for c in range(C):
            T[c, j * ch + c] = 1.0
        PM[0, j * ch + C] = 1.0
    # S: per-block per-cut channel sums + raw parallax extraction
    S = np.zeros((kc, m1 + nj), np.float32)
    for j in range(nj):
        for c in range(C):
            S[j * ch + c, (c // cc) * nj + j] = 1.0
        S[j * ch + C, m1 + j] = 1.0
    # Rxy: ONE matrix expanding the stacked [wx | wy] vector to the
    # (k-major, cut, dx*d+dy) grid twice — columns [0, s*m1) give the
    # repeated dx weights, columns [s*m1, 2*s*m1) the tiled dy weights
    # (their elementwise product is the separable bilinear weight). A
    # single matmul: MXU tile-passes halve vs two separate expansions.
    Rxy = np.zeros((s * (nd + d), 2 * s * m1), np.float32)
    for k in range(s):
        for cut in range(cuts):
            for dx in range(nd):
                for dy in range(d):
                    col = k * m1 + cut * nj + dx * d + dy
                    Rxy[k * nd + dx, col] = 1.0
                    Rxy[s * nd + k * d + dy, s * m1 + col] = 1.0
    # Tile: replicate the bs block for every hypothesis  [m1] -> [s*m1]
    Tile = np.zeros((m1, s * m1), np.float32)
    for k in range(s):
        Tile[:, k * m1:(k + 1) * m1] = np.eye(m1)
    # S2: segment-sum (k, cut) blocks back to per-(k, cut) scalars
    S2 = np.zeros((s * m1, s * cuts), np.float32)
    for k in range(s):
        for cut in range(cuts):
            S2[k * m1 + cut * nj:k * m1 + (cut + 1) * nj, k * cuts + cut] = 1.0
    # bf16 by default: all matrices are 0/1 selections (exact), and the MXU
    # runs bf16 at ~8x its f32 rate — the f32 variant measured 2.4x slower.
    # f32 is used only when the caller runs the whole kernel at f32 for
    # tight parity/debug comparisons (cv_dtype="float32").
    return tuple(jnp.asarray(a, jnp.dtype(dtype))
                 for a in (T, PM, S, Rxy, Tile, S2))


def _reduce_kernel(f_ref, c1_ref, wxy_ref, t_ref, pm_ref, s_ref,
                   rxy_ref, tile_ref, s2_ref, out_ref, *,
                   C, cuts, nd, d, s, center, cdt):
    nj = nd * d
    m1 = cuts * nj
    inv_cc = np.float32(cuts / C)
    th, w_img, _ = c1_ref.shape
    tn = th * w_img

    F = f_ref[:]                                          # [TN, Kc] cdt
    c1 = c1_ref[:].reshape(tn, C)
    c1rep = jnp.dot(c1, t_ref[:],                         # 0/1 select: exact
                    preferred_element_type=jnp.float32
                    ).astype(cdt) + pm_ref[:]
    weighted = F * c1rep
    D = jnp.dot(weighted, s_ref[:],
                preferred_element_type=jnp.float32)       # [TN, M1+nj]
    bs = D[:, :m1] * inv_cc                               # block correlations
    P = D[:, m1:]                                         # raw parallax taps

    wxwy = wxy_ref[:].reshape(tn, s * (nd + d))
    ab = jnp.dot(wxwy, rxy_ref[:],
                 preferred_element_type=jnp.float32)      # [TN, 2*s*m1]
    wxy = ab[:, :s * m1] * ab[:, s * m1:]                 # [TN, s*m1]
    # cdt rounding of bs/prod matches the non-fused impls, whose corr tensor
    # is cv_dtype end-to-end (bf16 on the default path; f32 for parity runs)
    prod = (jnp.dot(bs.astype(cdt), tile_ref[:],
                    preferred_element_type=jnp.float32) * wxy)
    cv = jnp.dot(prod.astype(cdt), s2_ref[:],
                 preferred_element_type=jnp.float32)      # [TN, s*cuts]
    para = jnp.sum(P * wxy[:, center * m1:center * m1 + nj],
                   axis=1, keepdims=True)                 # [TN, 1]
    out_ref[:] = jnp.concatenate([cv, para],
                                 axis=1).reshape(th, w_img, s * cuts + 1)


def fused_reduce_chunk(fetched, c1_hw, wxy_hw, *, C, cuts, nd, d, s,
                       center):
    """Reduce one gathered chunk to (partial cv, partial center parallax).

    Args:
      fetched: [bh*w, nd*d*(C+1)] gathered rows, row-major (raster pixel
        order).
      c1_hw: [bh, w, C] — cut-normalized current features in their
        natural spatial shape (batch folded into rows).
      wxy_hw: [bh, w, s*(nd+d)] — per-hypothesis chunk-local dx
        bilinear weights stacked with the dy weights (both k-major).

    The kernel's compute dtype follows ``c1_hw.dtype`` (bf16 on the default
    serving path; f32 when the caller runs a tight-parity comparison with
    cv_dtype="float32" — 2.4x slower on the MXU, correctness-only).

    Returns: [bh, w, s*cuts + 1] f32 — per-hypothesis per-cut partial
    correlations (k-major, cut-minor) and the partial center-hypothesis
    warped parallax in the last channel. Partials over dx chunks sum
    exactly.
    """
    bh, w_img, _ = c1_hw.shape
    kc = nd * d * (C + 1)
    cdt = c1_hw.dtype
    consts = _constants(C, cuts, nd, d, s, dtype=jnp.dtype(cdt).name)
    row_budget = 1024 if kc <= 768 else (512 if kc <= 2048 else 256)
    th = min(bh, max(1, row_budget // w_img))
    tn = th * w_img
    grid = (pl.cdiv(bh, th),)
    kern = functools.partial(_reduce_kernel, C=C, cuts=cuts, nd=nd, d=d, s=s,
                             center=center, cdt=cdt)
    mo = s * cuts + 1

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bh, w_img, mo), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, kc), lambda i: (i, 0)),
            pl.BlockSpec((th, w_img, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((th, w_img, s * (nd + d)), lambda i: (i, 0, 0)),
        ] + [const_spec(a) for a in consts],
        out_specs=pl.BlockSpec((th, w_img, mo), lambda i: (i, 0, 0)),
        interpret=jax.default_backend() == "cpu",
    )(fetched, c1_hw, wxy_hw, *consts)
