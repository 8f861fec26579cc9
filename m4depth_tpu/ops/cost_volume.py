"""Cost volumes: parallax-sweeping (DSCV) and spatial-neighborhood (SNCV).

TPU-first formulation notes:
  * The DSCV vmaps the warp over the 2r+1 parallax hypotheses by folding them
    into the batch dimension — one fused gather per level instead of the
    reference's batch-tiling + reshape dance (utils/depth_operations.py:217-281).
  * Correlations run in reduced precision; the reference used fp16
    (depth_operations.py:276-278), here bf16 which is native on the TPU VPU.
  * The SNCV is a static 7x7 set of XLA slices of a padded map — no gathers,
    no dynamic shapes (parity: utils/depth_operations.py:283-313).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from m4depth_tpu.geometry.camera import Camera
from m4depth_tpu.geometry.parallax import epipolar_terms, parallax_sweep_flows
from m4depth_tpu.ops.warp import dense_image_warp

# Intermediates of the expanded-shift DSCV that scale with d^2 * ch * n —
# hundreds of MB per (frame, level) at 384^2. Under `remat_policy="dscv"`
# the decoder-level checkpoint saves everything EXCEPT these, so the
# backward re-runs only the bandwidth-cheap expansion + row fetch instead
# of recomputing the whole level body (the blanket-remat tax). The names
# are identity ops outside jax.checkpoint — no effect on the forward HLO.
DSCV_REMAT_NAMES = (
    "dscv_exp_y",       # y-expanded map [b,h,w,d*ch]
    "dscv_expanded",    # per-chunk x-expansion [b,h,w,nd*d*ch]
    "dscv_fetched",     # per-chunk gathered rows [b,n,nd*d*ch]
    "dscv_patch",       # reshape view [b,n,nd,d,ch]
    "dscv_feat",        # feature slice [b,n,nd,d,cuts,cc]
)


def _saturating_cast(x: jnp.ndarray, dtype: jnp.dtype) -> jnp.ndarray:
    """Cast clamping to the target dtype's finite range.

    The expanded-map DSCV impls store the temporal-parallax channel in the
    cost-volume dtype. Features are L2-normalized (bounded), but parallax is
    rho/depth-shaped and can exceed float16's 65504 max under degenerate
    depth estimates (e.g. random init weights): a plain cast then yields
    inf, and inf * 0 in the masked hypothesis-weight contraction poisons
    the output with NaN — caught by the seeded d6 TF-parity test. The
    reference never quantizes the parallax channel (it casts only the
    correlation inputs to fp16, depth_operations.py:276-278), so saturation
    is strictly closer to its behavior than overflow. No-op for f32/bf16
    (their finite range exceeds any parallax the clipped geometry
    produces); gradient-exact wherever the value is in range.
    """
    fin = jnp.finfo(dtype)
    return jnp.clip(x, float(fin.min), float(fin.max)).astype(dtype)


def parallax_sweeping_cv_expanded(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DSCV via channel-expanded static shifts — the TPU-native formulation.

    Mathematically identical to :func:`parallax_sweeping_cv` (the per-pixel
    bilinear sample is a linear combination of integer-grid taps, and all
    taps of all 2r+1 hypotheses lie within a radius-(r) disk of the center
    sample because the hypothesis step along the unit epipolar direction is
    exactly one pixel). Instead of gathering 4 taps x (2r+1) hypotheses per
    pixel — (2r+1)x4 serial row fetches on TPU — it:

      1. builds a channel-expanded map of c2 (and the temporal parallax)
         containing every static shift delta in [-r, r+2)^2 with edge clamp;
      2. performs ONE contiguous row fetch per output pixel at the clipped
         integer center position;
      3. reduces the fetched (2r+3)^2-neighborhood against c1 densely (VPU/
         MXU einsums) with separable bilinear hypothesis weights.

    This turns a 9x serial-gather problem into dense vector math plus a
    single gather — ~10x faster at the finest pyramid level on TPU v5e.
    """
    b, h, w, C = c1.shape
    s = 2 * search_range + 1
    d = 2 * search_range + 2          # delta range [-r, r+1] per axis
    cc = C // num_cuts
    ch = C + 1                        # c2 features + temporal parallax

    e = epipolar_terms(h, w, rot, trans, camera)
    unit = e.delta / jnp.maximum(e.rho, 1e-12)            # [b,h,w,2], |unit|=1
    disp0 = jnp.clip(para_sweep_center, 1e-6, 1e6)
    # absolute sampling position in index coords: target + c - 0.5
    grid_off = (camera.c.reshape(b, 1, 1, 2) - 0.5)
    center = e.proj + unit * disp0 + grid_off             # [b,h,w,2]
    cx = jnp.clip(jnp.floor(center[..., 0]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(center[..., 1]), 0, h - 1).astype(jnp.int32)

    # 1) all static shifts delta in [-r, r+1]^2 of (c2 | para), edge-clamped
    combined = jnp.concatenate(
        [c2.astype(cv_dtype), _saturating_cast(para_prev_t, cv_dtype)],
        axis=-1)
    padded = jnp.pad(
        combined,
        ((0, 0), (search_range, search_range + 1),
         (search_range, search_range + 1), (0, 0)),
        mode="edge")
    # hierarchical build: d large y-shift slices, then d x-shift slices of
    # the y-expanded map — 2d big contiguous copies instead of d^2 small
    # ones (the flat d^2-way concatenate ran far below HBM bandwidth)
    exp_y = jnp.concatenate(
        [padded[:, dy:dy + h, :, :] for dy in range(d)], axis=-1)
    expanded = jnp.concatenate(
        [exp_y[:, :, dx:dx + w, :] for dx in range(d)], axis=-1)
    # channel order is now (dx-major, dy, ch)           # [b,h,w,d*d*ch]

    # 2) one contiguous row fetch per pixel
    flat = expanded.reshape(b, h * w, d * d * ch)
    idx = (cy * w + cx).reshape(b, h * w, 1)
    fetched = jnp.take_along_axis(flat, idx, axis=1)
    patch = fetched.reshape(b, h, w, d, d, ch)            # (dx, dy, chan)

    # 3a) per-cut correlation of c1 with every neighborhood position
    c1c = c1.astype(cv_dtype).reshape(b, h, w, 1, 1, num_cuts, cc)
    feat = patch[..., :C].reshape(b, h, w, d, d, num_cuts, cc)
    corr = (c1c * feat).mean(axis=-1)                     # [b,h,w,dx,dy,cuts]
    para_patch = patch[..., C]                            # [b,h,w,dx,dy]

    # 3b) separable bilinear hypothesis weights over the delta grid
    offsets = jnp.arange(-search_range, search_range + 1, dtype=jnp.float32)
    disp_k = jnp.clip(para_sweep_center +          # [b,h,w,1] -> [b,h,w,s]
                      offsets.reshape(1, 1, 1, -1), 1e-6, 1e6)
    # [b,h,w,s,2] exact query per hypothesis
    q = (e.proj[..., None, :] + unit[..., None, :] * disp_k[..., None]
         + grid_off[..., None, :])
    qx, qy = q[..., 0], q[..., 1]
    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]           # in [-r, r]
    rely = y0.astype(jnp.int32) - cy[..., None]
    dgrid = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, 1, d), 4) - search_range     # [-r, r+1]
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    # 3c) contract y-weights then x-weights. Written as broadcast multiply +
    # sum (NOT einsum): with (b,h,w) as batch dims an einsum lowers to
    # per-pixel micro-matmuls, which the TPU executes terribly.
    #   corr [b,h,w,dx,dy,cut], wx/wy [b,h,w,s,d]
    t1 = (corr[:, :, :, None] * wy[..., None, :, None]).sum(axis=5)
    cv = (t1 * wx[..., None]).sum(axis=4)                 # [b,h,w,s,cuts]
    p1 = (para_patch[:, :, :, None] * wy[..., None, :]).sum(axis=-1)
    para_w = (p1 * wx).sum(axis=-1)                       # [b,h,w,s]

    # cut-major / hypothesis-minor channel layout (parity with the gather
    # implementation)
    cv = cv.transpose(0, 1, 2, 4, 3).reshape(b, h, w, num_cuts * s)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def parallax_sweeping_cv_flat(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expanded-shift DSCV, flat/channel-minor formulation: one unchunked
    fetch with minor-dim-only reshapes and in-bounds gather semantics.

    Exactly :func:`parallax_sweeping_cv_split` with a single chunk (the
    chunked form generalizes this one); kept as a named entry point for
    configs and benchmarks comparing against the gather-cliff behaviour of
    large operands.
    """
    return parallax_sweeping_cv_split(
        c1, c2, para_prev_t, para_sweep_center, rot, trans, camera,
        search_range, num_cuts=num_cuts, cv_dtype=cv_dtype, n_chunks=1)


def parallax_sweeping_cv_rows(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    row_group: int = 1,
    para_hyps: Optional[Tuple[int, ...]] = None,
    x_window: int = 0,
    x_window_dual: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expanded-shift DSCV fetched as d/G rows per pixel — the cheap-build
    formulation.

    Same tap set and weights as :func:`parallax_sweeping_cv_split` (bit-equal
    math in f32), but the d^2 shift expansion never exists in memory: the
    operand packs only ``row_group`` (G) y-shifts x d x-shifts per spatial
    row, and each pixel fetches d/G rows at bases (cy + g*G, cx). The build
    traffic drops from (d + d^2)*ch*n bytes (exp_y + chunk concats — the
    measured relayout-heavy side of the split impl, DEVELOPMENT.md "the
    layout war") to G*d*ch*n, at the cost of (d/G)x more gather rows:

        G = d : one row per pixel, (d^2*ch)-wide operand — the unchunked
                flat form;
        G = 1 : d rows per pixel from a (d*ch)-wide operand — 10x less
                build+operand traffic at 10x the (cheap, coherent) row count.

    The fetched bytes, the patch reduces, and the weight contraction are
    byte-identical to split at every G; only the build side and the gather
    row/width trade move. Replaces the same reference kernel
    (cuda_backproject/backproject_op_gpu.cu.cc:20-103).

    ``x_window`` (the direction-narrowed fetch box, the round-3/4
    "octant" lever): when dn = x_window in [2, d) is set, each dy-group
    fetches only dn of the d x-shifts, at a per-(pixel, group) dynamic
    column base derived from the epipolar direction (the min in-group tap
    offset) — the gather index is per-pixel dynamic anyway, so the
    direction-dependent base costs nothing and no lax.switch over octant
    variants is needed. Fetched bytes and operand build bytes both scale
    by dn/d. EXACT only where the per-group tap x-spread fits the window:
    spread ~ |unit_x/unit_y|*(G+1) + 2, so steep epipolar fields
    (|unit_x| <= |unit_y|) are covered by dn >= G+3 while shallow fields
    need the full d (out-of-window taps silently lose their weight mass).
    Callers must gate on the motion/field or accept the approximation;
    the shipped default keeps x_window off.

    ``x_window_dual`` removes the steep-field restriction: the narrow-fetch
    algebra is symmetric in (x, y), so a second operand built from the
    TRANSPOSED padded map (x-shift groups x dn-narrow y-windows) is
    concatenated after the first, and each pixel selects its branch with a
    plain index offset — every direction is steep in one of the two
    frames, so the window fits everywhere and the result is exact for ALL
    motions at dn >= G+3 (in-group floor positions span at most G+2
    values at slope <= 1, plus the bilinear +1 tap; the branch choice is
    by actual needed span, which also absorbs border clamping — see
    :func:`_rows_narrow_dual_loop`). Build traffic is 2*G*dn*ch*n (= the
    full rows operand at dn = d/2); fetched bytes still scale by dn/d.
    """
    b, h, w, C = c1.shape
    n = h * w
    s = 2 * search_range + 1
    d = 2 * search_range + 2
    cc = C // num_cuts
    ch = C + 1
    G = row_group
    if d % G != 0:
        raise ValueError(f"row_group must divide {d}, got {G}")
    groups = d // G

    e = epipolar_terms(h, w, rot, trans, camera)
    unit = (e.delta / jnp.maximum(e.rho, 1e-12)).reshape(b, n, 1, 2)
    proj = e.proj.reshape(b, n, 1, 2)
    disp0 = jnp.clip(para_sweep_center, 1e-6, 1e6).reshape(b, n, 1)
    grid_off = camera.c.reshape(b, 1, 1, 2) - 0.5
    offsets = jnp.arange(-search_range, search_range + 1, dtype=jnp.float32)
    disp_k = jnp.clip(disp0 + offsets.reshape(1, 1, -1), 1e-6, 1e6)
    q = proj + unit * disp_k[..., None] + grid_off        # [b,n,s,2]
    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., search_range]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., search_range]), 0, h - 1).astype(jnp.int32)

    combined = jnp.concatenate(
        [c2.astype(cv_dtype), _saturating_cast(para_prev_t, cv_dtype)],
        axis=-1)
    padded = jnp.pad(
        combined,
        ((0, 0), (search_range, search_range + 1),
         (search_range, search_range + 1), (0, 0)),
        mode="edge")

    ny = h + d - G

    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]
    rely = y0.astype(jnp.int32) - cy[..., None]
    dgrid = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, d), 3) - search_range
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    # one raster-coherent fetch per dy-group (index order must stay pixel-
    # raster within each gather: a single interleaved [n*groups] gather
    # measured 10x slower — consecutive indices then jump w rows apart)
    ks = list(para_hyps) if para_hyps is not None else list(range(s))
    wxp = wx[:, :, ks]
    c1r = c1.astype(cv_dtype).reshape(b, n, 1, 1, num_cuts, cc)
    if x_window >= d:
        # narrowing to >= the full tap width fetches everything anyway;
        # take the plain full-width path (keeps the shipped x_window=5
        # default valid for any search_range, e.g. d = 2*1+2 = 4)
        x_window = 0
    if x_window and x_window_dual and x_window < G + 3:
        # below the exactness bound the dual selector has no branch whose
        # window fits the per-group tap spread (docstring above): a valid
        # non-default row_group (e.g. 5 with d=10) would silently yield an
        # inexact cost volume (~0.02 max abs err measured) — refuse instead
        raise ValueError(
            f"dscv_x_window={x_window} with dscv_xw_dual needs x_window >= "
            f"row_group+3 (= {G + 3}) to be exact; widen the window, lower "
            f"dscv_row_group, or set dscv_x_window=0 (full width)")
    if x_window and x_window_dual:
        return _rows_narrow_dual_loop(
            b, n, h, w, C, s, d, G, groups, ch, cc, num_cuts, cv_dtype,
            x_window, search_range, padded, cy, cx, relx, rely, ax, ay,
            wx, wy, c1r, ks)
    if x_window:
        return _rows_narrow_loop(
            b, n, h, w, C, s, d, G, groups, ch, cc, num_cuts, cv_dtype,
            x_window, search_range, padded, ny, cy, cx, relx, rely, ax,
            wy, c1r, ks)
    # full-width operand: spatial row y holds y-shifts [y, y+G) x x-shifts
    # [0, d), (dy-major, dx, ch) channel order within the row — built ONCE
    # (G*d*ch wide), vs the split impl's d^2*ch of chunk concats. Built
    # AFTER the narrow-window dispatch: the narrow loops build their own
    # dn-wide operands and never read this one.
    exp = checkpoint_name(jnp.concatenate(
        [padded[:, dyl:dyl + ny, dx:dx + w, :]
         for dyl in range(G) for dx in range(d)], axis=-1), "dscv_exp_y")
    flat = checkpoint_name(exp.reshape(b, ny * w, G * d * ch), "dscv_exp_y")
    base_idx = (cy * w + cx).reshape(b, n, 1)
    cv = None
    para_w = None
    for g in range(groups):
        fetched = checkpoint_name(
            jnp.take_along_axis(flat, base_idx + (g * G) * w, axis=1,
                                mode="promise_in_bounds"), "dscv_fetched")
        patch = checkpoint_name(fetched.reshape(b, n, G, d, ch),
                                "dscv_patch")
        feat = checkpoint_name(
            patch[..., :C].reshape(b, n, G, d, num_cuts, cc), "dscv_feat")
        corr_g = (c1r * feat).mean(axis=-1)               # [b,n,G,dx,cuts]
        para_g = patch[..., C]                            # [b,n,G,dx]
        wy_g = wy[:, :, :, g * G:(g + 1) * G]             # [b,n,s,G]
        # contract BOTH weight axes within the group (the sums are
        # separable in any order): the running accumulators are the tiny
        # [b,n,s,cuts] / [b,n,K] outputs, not a [b,n,s,d,cuts] partial —
        # a [.,s,d,.] accumulator measured ~25 fps of extra HBM traffic
        tg = (corr_g[:, :, None] * wx[:, :, :, None, :, None]).sum(axis=4)
        cv_g = (tg * wy_g[..., None]).sum(axis=3)         # [b,n,s,cuts]
        pg = (para_g[:, :, None] * wxp[:, :, :, None]).sum(axis=-1)
        pw_g = (pg * wy_g[:, :, ks]).sum(axis=-1)         # [b,n,K]
        cv = cv_g if cv is None else cv + cv_g
        para_w = pw_g if para_w is None else para_w + pw_g

    cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
    para_w = para_w.reshape(b, h, w, -1)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def _rows_narrow_loop(b, n, h, w, C, s, d, G, groups, ch, cc, num_cuts,
                      cv_dtype, dn, r, padded, ny, cy, cx, relx, rely, ax,
                      wy, c1r, ks):
    """x_window narrow-fetch body of :func:`parallax_sweeping_cv_rows`.

    Operand packs only ``dn`` x-shifts per dy-group row, built over the
    extended column range [0, w + d - dn) of the padded map so a dynamic
    per-(pixel, group) column base ``bxo`` in [0, d - dn] can slide the
    window onto the taps the epipolar direction actually touches. The
    x-weights are recomputed per group against the shifted tap grid; a
    group whose hypothesis mass lies outside its window loses that mass
    (see the caller's docstring for the exactness condition).
    """
    if not 2 <= dn <= d:
        raise ValueError(f"x_window must be in [2, {d}], got {dn}")
    wext = w + d - dn
    exp = checkpoint_name(jnp.concatenate(
        [padded[:, dyl:dyl + ny, dx:dx + wext, :]
         for dyl in range(G) for dx in range(dn)], axis=-1), "dscv_exp_y")
    flat = checkpoint_name(exp.reshape(b, ny * wext, G * dn * ch),
                           "dscv_exp_y")

    jgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, dn), 3)
    big = jnp.int32(2 ** 30)
    cv = None
    para_w = None
    for g in range(groups):
        # hypotheses whose wy mass can land in this dy-group
        lo, hi = g * G - r - 1, g * G - r + G - 1
        m = (rely >= lo) & (rely <= hi)                    # [b,n,s]
        minr = jnp.where(m, relx, big).min(axis=-1)
        bxo = jnp.clip(minr + r, 0, d - dn)                # [b,n]
        idx_g = ((cy + g * G) * wext + cx + bxo).reshape(b, n, 1)
        fetched = checkpoint_name(
            jnp.take_along_axis(flat, idx_g, axis=1,
                                mode="promise_in_bounds"), "dscv_fetched")
        patch = checkpoint_name(fetched.reshape(b, n, G, dn, ch),
                                "dscv_patch")
        feat = checkpoint_name(
            patch[..., :C].reshape(b, n, G, dn, num_cuts, cc), "dscv_feat")
        corr_g = (c1r * feat).mean(axis=-1)                # [b,n,G,dx,cuts]
        para_g = patch[..., C]                             # [b,n,G,dx]
        # tap j of this window sits at x-offset (bxo - r + j): remap the
        # bilinear x-weights onto the shifted grid
        rel_j = relx - (bxo[..., None] - r)                # [b,n,s]
        wx_g = ((jgrid == rel_j[..., None]) * (1.0 - ax[..., None])
                + (jgrid == rel_j[..., None] + 1)
                * ax[..., None]).astype(cv_dtype)          # [b,n,s,dn]
        wy_g = wy[:, :, :, g * G:(g + 1) * G]              # [b,n,s,G]
        tg = (corr_g[:, :, None] * wx_g[:, :, :, None, :, None]).sum(axis=4)
        cv_g = (tg * wy_g[..., None]).sum(axis=3)          # [b,n,s,cuts]
        pg = (para_g[:, :, None] * wx_g[:, :, ks][:, :, :, None]).sum(axis=-1)
        pw_g = (pg * wy_g[:, :, ks]).sum(axis=-1)          # [b,n,K]
        cv = cv_g if cv is None else cv + cv_g
        para_w = pw_g if para_w is None else para_w + pw_g

    cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
    para_w = para_w.reshape(b, h, w, -1)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def _rows_narrow_dual_loop(b, n, h, w, C, s, d, G, groups, ch, cc, num_cuts,
                           cv_dtype, dn, r, padded, cy, cx, relx, rely, ax,
                           ay, wx, wy, c1r, ks):
    """Dual-operand (exact-everywhere) x_window body of
    :func:`parallax_sweeping_cv_rows`.

    Two narrow operands are built and concatenated row-wise: the y-group
    operand of :func:`_rows_narrow_loop` (G y-shifts x dn x-shifts per
    row) and its transpose (G x-shifts x dn y-shifts per row, built from
    the transposed padded map). Each pixel fetches all its d/G groups
    from ONE of the two, chosen by epipolar steepness — the per-pixel
    gather index is dynamic anyway, so the branch is a plain index offset
    plus a jnp.where on the two (otherwise identical-shaped) weight
    tensors; no lax.switch, no extra compile, no double fetch. Exact for
    all motions at dn >= G+3 (see the caller's docstring). Replaces the
    same reference kernel (cuda_backproject/backproject_op_gpu.cu.cc:
    20-103) — this is the "direction-bucketed fetch box" design with two
    buckets that provably cover every octant.
    """
    if not 2 <= dn <= d:
        raise ValueError(f"x_window must be in [2, {d}], got {dn}")
    wext = w + d - dn                  # y-operand: slideable column range
    hext = h + d - dn                  # x-operand: slideable row range
    ny = h + d - G
    nx = w + d - G
    exp_y = checkpoint_name(jnp.concatenate(
        [padded[:, dyl:dyl + ny, dx:dx + wext, :]
         for dyl in range(G) for dx in range(dn)], axis=-1), "dscv_exp_y")
    padded_t = padded.transpose(0, 2, 1, 3)
    exp_x = checkpoint_name(jnp.concatenate(
        [padded_t[:, dxl:dxl + nx, dy:dy + hext, :]
         for dxl in range(G) for dy in range(dn)], axis=-1), "dscv_exp_x")
    flat = checkpoint_name(jnp.concatenate(
        [exp_y.reshape(b, ny * wext, G * dn * ch),
         exp_x.reshape(b, nx * hext, G * dn * ch)], axis=1), "dscv_exp_y")
    t_off = ny * wext

    jgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, dn), 3)
    big = jnp.int32(2 ** 30)
    # branch choice: the epipolar steepness |ux|<=|uy| is the interior
    # criterion, but border clamping decouples the two coordinates (the
    # clamped one saturates while the other keeps moving — a 45-degree
    # line can need an 8-wide x-window in one y-group at the bottom edge
    # while the transposed branch needs only 5). So choose per pixel by
    # the ACTUAL worst-group window span each branch needs, computed from
    # the weight-relevant (clipped to [-r, r+1]) tap offsets.
    rxc = jnp.clip(relx, -r, r + 1)
    ryc = jnp.clip(rely, -r, r + 1)
    mins_y, maxs_y, mins_x, maxs_x = [], [], [], []
    for g in range(groups):
        lo, hi = g * G - r - 1, g * G - r + G - 1
        m_y = (rely >= lo) & (rely <= hi)                  # [b,n,s]
        m_x = (relx >= lo) & (relx <= hi)
        mins_y.append(jnp.where(m_y, rxc, big).min(axis=-1))
        maxs_y.append(jnp.where(m_y, rxc, -big).max(axis=-1))
        mins_x.append(jnp.where(m_x, ryc, big).min(axis=-1))
        maxs_x.append(jnp.where(m_x, ryc, -big).max(axis=-1))
    span_y = functools.reduce(jnp.maximum,
                              [jnp.maximum(mx - mn, 0)
                               for mn, mx in zip(mins_y, maxs_y)])
    span_x = functools.reduce(jnp.maximum,
                              [jnp.maximum(mx - mn, 0)
                               for mn, mx in zip(mins_x, maxs_x)])
    steep = span_y <= span_x                               # [b,n]
    steep_g = steep[..., None]                             # [b,n,1] / bcast

    cv = None
    para_w = None
    for g in range(groups):
        # steep branch: dy-group membership, x-window base
        bxo = jnp.clip(mins_y[g] + r, 0, d - dn)           # [b,n]
        idx_y = (cy + g * G) * wext + cx + bxo
        # shallow branch: dx-group membership, y-window base
        byo = jnp.clip(mins_x[g] + r, 0, d - dn)
        idx_x = t_off + (cx + g * G) * hext + cy + byo
        idx_g = jnp.where(steep, idx_y, idx_x).reshape(b, n, 1)
        fetched = checkpoint_name(
            jnp.take_along_axis(flat, idx_g, axis=1,
                                mode="promise_in_bounds"), "dscv_fetched")
        patch = fetched.reshape(b, n, G, dn, ch)
        feat = checkpoint_name(
            patch[..., :C].reshape(b, n, G, dn, num_cuts, cc), "dscv_feat")
        corr_g = (c1r * feat).mean(axis=-1)                # [b,n,G,dn,cuts]
        para_g = patch[..., C]                             # [b,n,G,dn]
        # group-axis weights: wy columns (steep) vs wx columns (shallow)
        wA = jnp.where(steep_g[..., None],
                       wy[:, :, :, g * G:(g + 1) * G],
                       wx[:, :, :, g * G:(g + 1) * G])     # [b,n,s,G]
        # window-axis weights: remapped onto the slid tap grid per branch
        rel_jy = relx - (bxo[..., None] - r)               # [b,n,s]
        rel_jx = rely - (byo[..., None] - r)
        rel_j = jnp.where(steep_g, rel_jy, rel_jx)
        aB = jnp.where(steep_g, ax, ay)
        wB = ((jgrid == rel_j[..., None]) * (1.0 - aB[..., None])
              + (jgrid == rel_j[..., None] + 1)
              * aB[..., None]).astype(cv_dtype)            # [b,n,s,dn]
        tg = (corr_g[:, :, None] * wB[:, :, :, None, :, None]).sum(axis=4)
        cv_g = (tg * wA[..., None]).sum(axis=3)            # [b,n,s,cuts]
        pg = (para_g[:, :, None] * wB[:, :, ks][:, :, :, None]).sum(axis=-1)
        pw_g = (pg * wA[:, :, ks]).sum(axis=-1)            # [b,n,K]
        cv = cv_g if cv is None else cv + cv_g
        para_w = pw_g if para_w is None else para_w + pw_g

    cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
    para_w = para_w.reshape(b, h, w, -1)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def parallax_sweeping_cv_rows_fused(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    row_group: int = 2,
    x_window: int = 5,
    x_window_dual: bool = True,
    min_rows_for_kernel: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rows DSCV with the post-gather reduce fused into the Pallas kernel.

    Build + gather are identical to :func:`parallax_sweeping_cv_rows`
    (including the dual-operand narrow fetch); the per-group correlation /
    bilinear-weight contraction runs in
    ``ops/dscv_pallas.py::fused_reduce_chunk``, consuming each group's
    gather output in its native row-major layout. The algebra maps onto the
    split-formulation kernel by relabeling its (dx-chunk, dy) block grid to
    this formulation's (dy-group, x-window) grid — per fetched row the
    blocks are (dyl in [0,G), dxl in [0,dn)) with separable weights
    wA[s,G] (group axis) x wB[s,dn] (window axis), which is exactly the
    kernel's (nd=G, d=dn) shape with the stacked weight vector [wA | wB].

    The round-3 fused kernel lost end-to-end against the SPLIT operand
    (DEVELOPMENT.md "Round-3 DSCV campaign"): its per-chunk bilinear weight
    expansion cost ~matched the XLA reduce chain it replaced at the split
    operand's nd*d*ch width. The dual-narrow operand is G*dn*ch wide —
    nd*d -> G*dn = 10 blocks/row and the weight expansion K shrinks from
    s*(nd+d) to s*(G+dn) — which re-opens the lane-economics question this
    variant exists to measure (VERDICT round-4 directive #3).

    The build/gather stages deliberately mirror the rows helpers line-for-
    line rather than sharing a factored body: the rows path is the shipped
    hot default and a pluggable-reduce indirection was not worth perturbing
    its measured fusion behavior for a kept-as-record variant. Divergence
    is guarded twice — op/model parity vs rows (tests/test_cost_volume.py)
    and the d6 TF-parity matrix includes this impl head-on.

    Forward-only (no VJP — serving/eval path, like ``dscv_impl="fused"``);
    returns the center hypothesis' warped parallax only (the model consumes
    only that, m4depth_network.py:238-241). Levels with fewer than
    ``min_rows_for_kernel`` pixels fall back to the plain rows impl.
    Replaces the same reference kernel
    (cuda_backproject/backproject_op_gpu.cu.cc:20-103).
    """
    b, h, w, C = c1.shape
    n = h * w
    s = 2 * search_range + 1
    d = 2 * search_range + 2
    G = row_group
    if d % G != 0:
        raise ValueError(f"row_group must divide {d}, got {G}")
    if x_window >= d:
        x_window = 0                       # full fetch anyway (rows parity)
    if x_window and x_window < 2:
        # mirror _rows_narrow_loop's bound: a 1-tap window cannot hold both
        # bilinear x-taps, so the +1 tap's weight mass would silently vanish
        raise ValueError(f"x_window must be in [2, {d}], got {x_window}")
    if b * n < min_rows_for_kernel:
        return parallax_sweeping_cv_rows(
            c1, c2, para_prev_t, para_sweep_center, rot, trans, camera,
            search_range, num_cuts=num_cuts, cv_dtype=cv_dtype,
            row_group=G, para_hyps=(search_range,), x_window=x_window,
            x_window_dual=x_window_dual)
    if x_window and x_window_dual and x_window < G + 3:
        raise ValueError(
            f"dscv_x_window={x_window} with dscv_xw_dual needs x_window >= "
            f"row_group+3 (= {G + 3}) to be exact")

    from m4depth_tpu.ops.dscv_pallas import fused_reduce_chunk

    groups = d // G
    ch = C + 1
    r = search_range
    dn = x_window if x_window else d

    e = epipolar_terms(h, w, rot, trans, camera)
    unit = (e.delta / jnp.maximum(e.rho, 1e-12)).reshape(b, n, 1, 2)
    proj = e.proj.reshape(b, n, 1, 2)
    disp0 = jnp.clip(para_sweep_center, 1e-6, 1e6).reshape(b, n, 1)
    grid_off = camera.c.reshape(b, 1, 1, 2) - 0.5
    offsets = jnp.arange(-r, r + 1, dtype=jnp.float32)
    disp_k = jnp.clip(disp0 + offsets.reshape(1, 1, -1), 1e-6, 1e6)
    q = proj + unit * disp_k[..., None] + grid_off        # [b,n,s,2]
    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., r]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., r]), 0, h - 1).astype(jnp.int32)

    combined = jnp.concatenate(
        [c2.astype(cv_dtype), _saturating_cast(para_prev_t, cv_dtype)],
        axis=-1)
    padded = jnp.pad(
        combined, ((0, 0), (r, r + 1), (r, r + 1), (0, 0)), mode="edge")

    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]
    rely = y0.astype(jnp.int32) - cy[..., None]
    dgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, d), 3) - r
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    # kernel compute dtype: bf16 for any 16-bit cv_dtype (the MXU's native
    # fast type; the fp16 weight rounding upstream keeps parity with the
    # rows impl), f32 when the caller pins cv_dtype="float32" for tight
    # parity runs — previously the kernel silently stayed bf16 and could
    # not face the f32 TF-parity bound
    kdt = (jnp.float32 if jnp.dtype(cv_dtype) == jnp.float32
           else jnp.bfloat16)
    c1_hw = c1.astype(kdt).reshape(b * h, w, C)
    big = jnp.int32(2 ** 30)
    kc = G * dn * ch
    ws = s * (G + dn)

    if not x_window:
        # full-width rows: operand/index as the plain rows loop
        ny = h + d - G
        exp = jnp.concatenate(
            [padded[:, dyl:dyl + ny, dx:dx + w, :]
             for dyl in range(G) for dx in range(d)], axis=-1)
        flat = exp.reshape(b, ny * w, kc)
        base_idx = (cy * w + cx).reshape(b, n, 1)
        wxf = wx.reshape(b * n, s * d)
        acc = None
        for g in range(groups):
            fetched = jnp.take_along_axis(flat, base_idx + (g * G) * w,
                                          axis=1, mode="promise_in_bounds")
            w_stack = jnp.concatenate(
                [wy[:, :, :, g * G:(g + 1) * G].reshape(b * n, s * G), wxf],
                axis=-1).astype(kdt).reshape(b * h, w, ws)
            part = fused_reduce_chunk(
                fetched.reshape(b * n, kc), c1_hw, w_stack,
                C=C, cuts=num_cuts, nd=G, d=d, s=s, center=r)
            acc = part if acc is None else acc + part
    elif not x_window_dual:
        # single-operand narrow (steep-field approximation, as
        # _rows_narrow_loop)
        ny = h + d - G
        wext = w + d - dn
        exp = jnp.concatenate(
            [padded[:, dyl:dyl + ny, dx:dx + wext, :]
             for dyl in range(G) for dx in range(dn)], axis=-1)
        flat = exp.reshape(b, ny * wext, kc)
        jgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, dn), 3)
        acc = None
        for g in range(groups):
            lo, hi = g * G - r - 1, g * G - r + G - 1
            m = (rely >= lo) & (rely <= hi)
            minr = jnp.where(m, relx, big).min(axis=-1)
            bxo = jnp.clip(minr + r, 0, d - dn)
            idx_g = ((cy + g * G) * wext + cx + bxo).reshape(b, n, 1)
            fetched = jnp.take_along_axis(flat, idx_g, axis=1,
                                          mode="promise_in_bounds")
            rel_j = relx - (bxo[..., None] - r)
            wx_g = ((jgrid == rel_j[..., None]) * (1.0 - ax[..., None])
                    + (jgrid == rel_j[..., None] + 1)
                    * ax[..., None]).astype(cv_dtype)
            w_stack = jnp.concatenate(
                [wy[:, :, :, g * G:(g + 1) * G].reshape(b * n, s * G),
                 wx_g.reshape(b * n, s * dn)],
                axis=-1).astype(kdt).reshape(b * h, w, ws)
            part = fused_reduce_chunk(
                fetched.reshape(b * n, kc), c1_hw, w_stack,
                C=C, cuts=num_cuts, nd=G, d=dn, s=s, center=r)
            acc = part if acc is None else acc + part
    else:
        # dual-operand narrow (the shipped-default composition, as
        # _rows_narrow_dual_loop — see there for the branch-choice math)
        wext = w + d - dn
        hext = h + d - dn
        ny = h + d - G
        nx = w + d - G
        exp_y = jnp.concatenate(
            [padded[:, dyl:dyl + ny, dx:dx + wext, :]
             for dyl in range(G) for dx in range(dn)], axis=-1)
        padded_t = padded.transpose(0, 2, 1, 3)
        exp_x = jnp.concatenate(
            [padded_t[:, dxl:dxl + nx, dy:dy + hext, :]
             for dxl in range(G) for dy in range(dn)], axis=-1)
        flat = jnp.concatenate(
            [exp_y.reshape(b, ny * wext, kc),
             exp_x.reshape(b, nx * hext, kc)], axis=1)
        t_off = ny * wext

        jgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, dn), 3)
        rxc = jnp.clip(relx, -r, r + 1)
        ryc = jnp.clip(rely, -r, r + 1)
        mins_y, maxs_y, mins_x, maxs_x = [], [], [], []
        for g in range(groups):
            lo, hi = g * G - r - 1, g * G - r + G - 1
            m_y = (rely >= lo) & (rely <= hi)
            m_x = (relx >= lo) & (relx <= hi)
            mins_y.append(jnp.where(m_y, rxc, big).min(axis=-1))
            maxs_y.append(jnp.where(m_y, rxc, -big).max(axis=-1))
            mins_x.append(jnp.where(m_x, ryc, big).min(axis=-1))
            maxs_x.append(jnp.where(m_x, ryc, -big).max(axis=-1))
        span_y = functools.reduce(jnp.maximum,
                                  [jnp.maximum(mx - mn, 0)
                                   for mn, mx in zip(mins_y, maxs_y)])
        span_x = functools.reduce(jnp.maximum,
                                  [jnp.maximum(mx - mn, 0)
                                   for mn, mx in zip(mins_x, maxs_x)])
        steep = span_y <= span_x
        steep_g = steep[..., None]

        acc = None
        for g in range(groups):
            bxo = jnp.clip(mins_y[g] + r, 0, d - dn)
            idx_y = (cy + g * G) * wext + cx + bxo
            byo = jnp.clip(mins_x[g] + r, 0, d - dn)
            idx_x = t_off + (cx + g * G) * hext + cy + byo
            idx_g = jnp.where(steep, idx_y, idx_x).reshape(b, n, 1)
            fetched = jnp.take_along_axis(flat, idx_g, axis=1,
                                          mode="promise_in_bounds")
            wA = jnp.where(steep_g[..., None],
                           wy[:, :, :, g * G:(g + 1) * G],
                           wx[:, :, :, g * G:(g + 1) * G])
            rel_jy = relx - (bxo[..., None] - r)
            rel_jx = rely - (byo[..., None] - r)
            rel_j = jnp.where(steep_g, rel_jy, rel_jx)
            aB = jnp.where(steep_g, ax, ay)
            wB = ((jgrid == rel_j[..., None]) * (1.0 - aB[..., None])
                  + (jgrid == rel_j[..., None] + 1)
                  * aB[..., None]).astype(cv_dtype)
            w_stack = jnp.concatenate(
                [wA.reshape(b * n, s * G), wB.reshape(b * n, s * dn)],
                axis=-1).astype(kdt).reshape(b * h, w, ws)
            part = fused_reduce_chunk(
                fetched.reshape(b * n, kc), c1_hw, w_stack,
                C=C, cuts=num_cuts, nd=G, d=dn, s=s, center=r)
            acc = part if acc is None else acc + part

    # kernel channels are (k-major, cut-minor) + the parallax channel; the
    # model wants cut-major / hypothesis-minor
    cv = acc[..., :s * num_cuts].reshape(b, h, w, s, num_cuts)
    cv = cv.transpose(0, 1, 2, 4, 3).reshape(b, h, w, num_cuts * s)
    para_w = acc[..., -1:].reshape(b, h, w, 1)
    return cv, para_w


def _chunked_fetch(exp_y, idx, w, bounds, d, ch):
    """Chunked x-expansion + per-pixel row fetch.

    For each dx-range chunk, concatenate the x-shifted slices of the
    y-expanded map and take one contiguous row per pixel (chunking keeps
    each gather operand in the fast row-gather regime, see DEVELOPMENT.md
    "gather cliff"). Autodiff emits one scatter-add per chunk in the
    backward; a round-3 experiment consolidating them into a single
    full-width scatter via custom_vjp measured WORSE in-model (245 -> 277
    ms/step): the scatters are bytes-bound (~70 GB/s effective regardless
    of row width), so consolidation saves nothing while the cotangent
    concatenate adds a full-size materialization. See DEVELOPMENT.md
    "Training-step backward".
    """
    b = exp_y.shape[0]
    n = idx.shape[1]
    outs = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        nd = hi - lo
        expanded = checkpoint_name(jnp.concatenate(
            [exp_y[:, :, dx:dx + w, :] for dx in range(lo, hi)], axis=-1),
            "dscv_expanded")
        flat = checkpoint_name(expanded.reshape(b, n, nd * d * ch),
                               "dscv_expanded")
        outs.append(checkpoint_name(
            jnp.take_along_axis(flat, idx, axis=1,
                                mode="promise_in_bounds"), "dscv_fetched"))
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _chunked_fetch_k(exp_y, idx, w, bounds, d, ch):
    """_chunked_fetch with the backward done by the Pallas scatter kernel.

    Forward identical to :func:`_chunked_fetch`; the VJP routes the patch
    cotangent through ``ops/dscv_bwd_pallas.py::fetch_grad`` (VMEM-resident
    accumulation) instead of XLA's HBM scatter-adds. Gradients are
    accumulated in the cotangent dtype, same as the autodiff scatters.
    """
    return _chunked_fetch(exp_y, idx, w, bounds, d, ch)


def _chunked_fetch_k_fwd(exp_y, idx, w, bounds, d, ch):
    # residuals must be JAX types; exp_y's shape is derivable from idx and
    # the statics, only its dtype needs carrying (via a zero-size token)
    return (_chunked_fetch(exp_y, idx, w, bounds, d, ch),
            (idx, jnp.zeros((0,), exp_y.dtype)))


def _chunked_fetch_k_bwd(w, bounds, d, ch, res, cots):
    from m4depth_tpu.ops.dscv_bwd_pallas import fetch_grad

    idx, tok = res
    b, n = idx.shape[0], idx.shape[1]
    h = n // w
    lin = idx[..., 0]
    cy = lin // w
    cx = lin - cy * w
    cots4 = [c.astype(tok.dtype).reshape(b, n, hi - lo, d * ch)
             for c, (lo, hi) in zip(cots, zip(bounds[:-1], bounds[1:]))]
    gey = fetch_grad(cots4, cy, cx, h=h, w=w, d=d, ch=ch)
    idx_ct = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return gey, idx_ct


_chunked_fetch_k.defvjp(_chunked_fetch_k_fwd, _chunked_fetch_k_bwd)


def _sweep_weight_parts(qx, qy, cx, cy, r, d, w, h):
    """Separable bilinear hypothesis-weight ingredients (f32).

    Returns (x0, y0, ax, ay, m0x, m1x, m0y, m1y): integer corner bases,
    fractional weights, and the in-delta-grid masks. The forward weights are
    wx = m0x*(1-ax) + m1x*ax (same for y); the masks zero hypotheses whose
    taps fall outside the [-r, r+1] expanded-shift window of the fetched
    patch (equivalently: outside the clamped border handling).
    """
    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]
    rely = y0.astype(jnp.int32) - cy[..., None]
    m0x = (relx >= -r) & (relx <= r + 1)
    m1x = (relx + 1 >= -r) & (relx + 1 <= r + 1)
    m0y = (rely >= -r) & (rely <= r + 1)
    m1y = (rely + 1 >= -r) & (rely + 1 <= r + 1)
    return x0, y0, ax, ay, relx, rely, m0x, m1x, m0y, m1y


def _corner_statics(r, num_cuts, cv_dtype, bounds, ks, h, w, C):
    s = 2 * r + 1
    d = 2 * r + 2
    return s, d, C // num_cuts, C + 1, h + d - 1, w + d - 1


def _dscv_corner_impl(r, num_cuts, cv_dtype, bounds, ks, h, w, c1, padded, q):
    """Forward of the corner-VJP DSCV: identical math to the split impl's
    para-in-map branch, taking the padded combined map and the sweep query
    positions q [b,n,s,2] as inputs (their construction — and therefore the
    gradients wrt camera motion and the sweep center — stays outside the
    custom VJP, handled by XLA)."""
    b, _, _, C = c1.shape
    n = h * w
    s, d, cc, ch, Hp, Wp = _corner_statics(r, num_cuts, cv_dtype, bounds,
                                           ks, h, w, C)
    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., r]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., r]), 0, h - 1).astype(jnp.int32)
    exp_y = jnp.concatenate(
        [padded[:, dy:dy + h, :, :] for dy in range(d)], axis=-1)
    idx = (cy * w + cx).reshape(b, n, 1)
    fetched = _chunked_fetch(exp_y, idx, w, bounds, d, ch)

    c1r = c1.astype(cv_dtype).reshape(b, n, 1, 1, num_cuts, cc)
    corr_parts, para_parts = [], []
    for (lo, hi), f in zip(zip(bounds[:-1], bounds[1:]), fetched):
        nd = hi - lo
        patch = f.reshape(b, n, nd, d, ch)
        feat = patch[..., :C].reshape(b, n, nd, d, num_cuts, cc)
        corr_parts.append((c1r * feat).mean(axis=-1))
        para_parts.append(patch[..., C])
    corr = jnp.concatenate(corr_parts, axis=2)            # [b,n,dx,dy,cuts]
    para_patch = jnp.concatenate(para_parts, axis=2)      # [b,n,dx,dy]

    x0, y0, ax, ay, relx, rely, m0x, m1x, m0y, m1y = _sweep_weight_parts(
        qx, qy, cx, cy, r, d, w, h)
    dgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, d), 3) - r
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    t1 = (corr[:, :, None] * wy[:, :, :, None, :, None]).sum(axis=4)
    cv = (t1 * wx[..., None]).sum(axis=3)
    kl = list(ks)
    wxp, wyp = wx[:, :, kl], wy[:, :, kl]
    p1 = (para_patch[:, :, None] * wyp[:, :, :, None]).sum(axis=-1)
    para_w = (p1 * wxp).sum(axis=-1)

    cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
    para_w = para_w.reshape(b, h, w, -1)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _dscv_corner(r, num_cuts, cv_dtype, bounds, ks, h, w, c1, padded, q):
    """Split DSCV with a hand-derived corner-scatter backward.

    XLA's autodiff of the split DSCV materializes the dense d^2-expanded
    patch cotangent ([b,n,d,d,ch] — 376 MB at 384^2 level 1) and scatters
    all of it at ~50-70 GB/s (DEVELOPMENT.md "Training-step backward").
    But that cotangent is factored — dpatch = dcorr (x) c1 with dcorr built
    from separable bilinear weights that have at most 2 nonzeros per axis
    per hypothesis — so in padded-map coordinates every hypothesis
    contributes to exactly its 4 bilinear corner rows (y0+j, x0+i): the
    per-pixel fetch center drops out entirely. The backward therefore
    scatters s*4 rows of ch values per pixel (2.8x fewer bytes at r=4) and
    never forms the dense patch cotangent at all.

    This is the reference CUDA backward's structure — 4 corner atomicAdds
    per (pixel, hypothesis), cuda_backproject/backproject_op_gpu.cu.cc:
    108-197 — re-expressed as XLA batch scatter-adds.
    """
    return _dscv_corner_impl(r, num_cuts, cv_dtype, bounds, ks, h, w,
                             c1, padded, q)


def _dscv_corner_fwd(r, num_cuts, cv_dtype, bounds, ks, h, w, c1, padded, q):
    out = _dscv_corner_impl(r, num_cuts, cv_dtype, bounds, ks, h, w,
                            c1, padded, q)
    # residual is the small padded map, not the d^2-expanded fetched patch
    # XLA's autodiff would keep: the backward rebuilds the y-expansion and
    # re-fetches — row gathers are cheap (DEVELOPMENT.md)
    return out, (c1, padded, q)


def _dscv_corner_bwd(r, num_cuts, cv_dtype, bounds, ks, h, w, res, cots):
    c1, padded, q = res
    dcv_out, dpw_out = cots
    b, _, _, C = c1.shape
    n = h * w
    s, d, cc, ch, Hp, Wp = _corner_statics(r, num_cuts, cv_dtype, bounds,
                                           ks, h, w, C)
    kl = list(ks)

    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., r]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., r]), 0, h - 1).astype(jnp.int32)
    x0, y0, ax, ay, relx, rely, m0x, m1x, m0y, m1y = _sweep_weight_parts(
        qx, qy, cx, cy, r, d, w, h)
    dgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, d), 3) - r
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    # output adjoints back to [b,n,s,*] layout
    dCV = dcv_out.reshape(b, n, num_cuts, s).transpose(0, 1, 3, 2)
    dCV = dCV.astype(cv_dtype)                            # [b,n,s,cuts]
    dpw = dpw_out.reshape(b, n, len(kl)).astype(cv_dtype)
    wxp, wyp = wx[:, :, kl], wy[:, :, kl]

    # re-fetch the patch (gathers are cheap; the dense cotangent is not)
    exp_y = jnp.concatenate(
        [padded[:, dy:dy + h, :, :] for dy in range(d)], axis=-1)
    idx = (cy * w + cx).reshape(b, n, 1)
    fetched = _chunked_fetch(exp_y, idx, w, bounds, d, ch)

    c1r = c1.astype(cv_dtype).reshape(b, n, 1, 1, num_cuts, cc)
    dc1 = jnp.zeros((b, n, num_cuts, cc), cv_dtype)
    t1y = jnp.zeros((b, n, s, d, num_cuts), cv_dtype)
    p1y = jnp.zeros((b, n, len(kl), d), cv_dtype)
    dwx_cols, p1x_cols = [], []
    for (lo, hi), f in zip(zip(bounds[:-1], bounds[1:]), fetched):
        nd = hi - lo
        patch = f.reshape(b, n, nd, d, ch)
        feat = patch[..., :C].reshape(b, n, nd, d, num_cuts, cc)
        para_part = patch[..., C]                         # [b,n,nd,d]
        corr_j = (c1r * feat).mean(axis=-1)               # [b,n,nd,d,cuts]
        wx_j = wx[..., lo:hi]                             # [b,n,s,nd]
        # dcorr_j[p,dx,dy,cut] = sum_s dCV * wx_j * wy  (XLA fuses the
        # s-reduction into the multiplies; no [.,s,nd,d,.] materialization)
        dcorr_j = (dCV[:, :, :, None, None, :]
                   * wx_j[..., None, None]
                   * wy[:, :, :, None, :, None]).sum(axis=2)
        dc1 = dc1 + (dcorr_j[..., None] * feat).sum(axis=(2, 3)) / cc
        t1x_j = (corr_j[:, :, None] * wy[:, :, :, None, :, None]).sum(axis=4)
        dwx_cols.append((dCV[:, :, :, None, :] * t1x_j).sum(-1))
        t1y = t1y + (wx_j[..., None, None] * corr_j[:, :, None]).sum(axis=3)
        wxp_j = wxp[..., lo:hi]
        p1x_cols.append(
            (para_part[:, :, None] * wyp[:, :, :, None]).sum(axis=-1))
        p1y = p1y + (para_part[:, :, None] * wxp_j[..., None]).sum(axis=3)
    dwx = jnp.concatenate(dwx_cols, axis=-1)              # [b,n,s,d]
    dwy = (dCV[:, :, :, None, :] * t1y).sum(-1)           # [b,n,s,d]
    p1x = jnp.concatenate(p1x_cols, axis=-1)              # [b,n,K,d]
    for t, k in enumerate(kl):
        dwx = dwx.at[:, :, k, :].add(dpw[:, :, t, None] * p1x[:, :, t, :])
        dwy = dwy.at[:, :, k, :].add(dpw[:, :, t, None] * p1y[:, :, t, :])

    # weights -> fractional offsets -> query positions (clip subgradients)
    dax_sel = ((dwx.astype(jnp.float32)
                * ((dgrid == relx[..., None] + 1).astype(jnp.float32)
                   - (dgrid == relx[..., None]).astype(jnp.float32)))
               .sum(-1))
    day_sel = ((dwy.astype(jnp.float32)
                * ((dgrid == rely[..., None] + 1).astype(jnp.float32)
                   - (dgrid == rely[..., None]).astype(jnp.float32)))
               .sum(-1))
    tx, ty = qx - x0, qy - y0
    dqx = dax_sel * ((tx > 0) & (tx < 1)).astype(jnp.float32)
    dqy = day_sel * ((ty > 0) & (ty < 1)).astype(jnp.float32)
    dq = jnp.stack([dqx, dqy], axis=-1).astype(q.dtype)

    # corner scatter: per (pixel, hypothesis), 4 rows of ch values into the
    # padded map at the bilinear corners (the irreducible information)
    gfeat = (dCV[..., None]
             * c1.astype(cv_dtype).reshape(b, n, 1, num_cuts, cc)
             ).reshape(b, n, s, C) / cc
    gpara = jnp.zeros((b, n, s), cv_dtype)
    for t, k in enumerate(kl):
        gpara = gpara.at[:, :, k].add(dpw[:, :, t])
    gfull = jnp.concatenate([gfeat, gpara[..., None]], axis=-1)

    f32 = jnp.float32
    wxc0 = ((1.0 - ax) * m0x.astype(f32)).astype(cv_dtype)
    wxc1 = (ax * m1x.astype(f32)).astype(cv_dtype)
    wyc0 = ((1.0 - ay) * m0y.astype(f32)).astype(cv_dtype)
    wyc1 = (ay * m1y.astype(f32)).astype(cv_dtype)
    wc = jnp.stack([wxc0 * wyc0, wxc1 * wyc0,
                    wxc0 * wyc1, wxc1 * wyc1], axis=-1)   # [b,n,s,4]
    base = (y0.astype(jnp.int32) + r) * Wp + (x0.astype(jnp.int32) + r)
    rows = jnp.stack([base, base + 1, base + Wp, base + Wp + 1], axis=-1)
    vals = gfull[:, :, :, None, :] * wc[..., None]        # [b,n,s,4,ch]
    # express the scatter-add as the transpose of a take_along_axis gather:
    # batched advanced-index .at[].add lowers through XLA's sort-based
    # scatter expander (measured 58.8 ms + 5.7 ms sorts per frame at 384^2
    # level 1); the gather-transpose form emits the same native scatter HLO
    # the chunked-fetch VJP uses (~30x faster per row)
    _, scat = jax.vjp(
        lambda flat: jnp.take_along_axis(
            flat, rows.reshape(b, -1, 1), axis=1, mode="promise_in_bounds"),
        jnp.zeros((b, Hp * Wp, ch), cv_dtype))
    dpadded = scat(vals.reshape(b, -1, ch))[0].reshape(b, Hp, Wp, ch)

    dc1_out = dc1.reshape(b, h, w, C).astype(c1.dtype)
    return dc1_out, dpadded, dq


_dscv_corner.defvjp(_dscv_corner_fwd, _dscv_corner_bwd)


def parallax_sweeping_cv_split(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    n_chunks: int = 0,
    chunk_bytes: int = 60 << 20,
    para_hyps: Optional[Tuple[int, ...]] = None,
    store_int8: bool = False,
    para_direct_warp: bool = False,
    bwd_impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expanded-shift DSCV with the fetch split into dx-chunks.

    ``bwd_impl``: backward-pass strategy — the training-step hot spot (see
    DEVELOPMENT.md "Training-step backward"). Forward results identical:
      * "xla": autodiff (dense patch-cotangent materialization + per-chunk
        HBM scatter-adds);
      * "corner": hand-derived VJP scattering only the 4 bilinear corner
        rows per (pixel, hypothesis) into the small padded map — the
        reference CUDA backward's structure (:func:`_dscv_corner`);
        requires the standard training config (no int8 store / direct warp);
      * "pallas": autodiff with the fetch VJP routed through the Pallas
        VMEM-accumulator scatter kernel (ops/dscv_bwd_pallas.py).

    ``para_direct_warp``: keep the expanded map features-only (ch = C, a
    power of two — every expansion/gather width becomes 32-aligned instead
    of the lane-hostile C+1) and bilinearly warp the temporal-parallax
    channel directly per requested hypothesis, exactly as the int8 path
    always does. Numerically only drops the one extra bf16 rounding the
    patch contraction applied to the parallax channel.

    ``store_int8``: store the expanded c2 map as int8 (features are per-cut
    L2-normalized so every element is exactly in [-1, 1] — a 127-scale
    quantization whose rounding noise (~0.4%) matches bf16's own epsilon).
    HALVES every build/gather/read byte of the dominant expanded-map
    traffic. The temporal-parallax channel (unbounded range) then leaves
    the expanded map entirely and is bilinearly warped directly instead —
    numerically it only loses the bf16 rounding the patch path had.
    Forward-path option for serving/eval; training keeps bf16.

    ``para_hyps``: optionally restrict the returned warped-parallax channels
    to these hypothesis indices (the model only consumes the center one,
    m4depth_network.py:238-241) — skips most of the parallax weight
    contraction. None returns all 2r+1 (parity with the other impls).

    Same math as :func:`parallax_sweeping_cv_expanded` (v2 flat form), but
    the expanded map and its per-pixel row fetch are split into ``n_chunks``
    dx-ranges. Motivation: profiled XLA row-gathers show a strongly
    size-dependent throughput regime (61 MB operand at ~640 GB/s vs 125 MB at
    ~110 GB/s on v5e) — splitting the finest level's fetch may keep each
    chunk in the fast regime. The dx weight contraction splits exactly, so
    results are bit-identical in structure to v2.
    """
    b, h, w, C = c1.shape
    n = h * w
    s = 2 * search_range + 1
    d = 2 * search_range + 2
    cc = C // num_cuts
    para_in_map = not (store_int8 or para_direct_warp)
    ch = C + 1 if para_in_map else C
    if n_chunks <= 0:                 # auto: keep each fetch operand under
        itemsize = 1 if store_int8 else jnp.dtype(cv_dtype).itemsize
        total = b * n * d * d * ch * itemsize
        n_chunks = min(d, max(1, -(-total // chunk_bytes)))

    e = epipolar_terms(h, w, rot, trans, camera)
    unit = (e.delta / jnp.maximum(e.rho, 1e-12)).reshape(b, n, 1, 2)
    proj = e.proj.reshape(b, n, 1, 2)
    disp0 = jnp.clip(para_sweep_center, 1e-6, 1e6).reshape(b, n, 1)
    grid_off = camera.c.reshape(b, 1, 1, 2) - 0.5
    offsets = jnp.arange(-search_range, search_range + 1, dtype=jnp.float32)
    disp_k = jnp.clip(disp0 + offsets.reshape(1, 1, -1), 1e-6, 1e6)
    q = proj + unit * disp_k[..., None] + grid_off        # [b,n,s,2]
    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., search_range]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., search_range]), 0, h - 1).astype(jnp.int32)

    if store_int8:
        combined = jnp.round(
            jnp.clip(c2.astype(jnp.float32), -1.0, 1.0) * 127.0
        ).astype(jnp.int8)
    elif para_direct_warp:
        combined = c2.astype(cv_dtype)
    else:
        combined = jnp.concatenate(
            [c2.astype(cv_dtype), _saturating_cast(para_prev_t, cv_dtype)],
            axis=-1)
    padded = jnp.pad(
        combined,
        ((0, 0), (search_range, search_range + 1),
         (search_range, search_range + 1), (0, 0)),
        mode="edge")

    if bwd_impl == "corner":
        if not para_in_map:
            raise ValueError(
                "bwd_impl='corner' requires the standard training config "
                "(no store_int8 / para_direct_warp)")
        bounds = tuple(round(i * d / n_chunks) for i in range(n_chunks + 1))
        ks = tuple(para_hyps) if para_hyps is not None else tuple(range(s))
        # q's construction stays outside the custom VJP: grads wrt the sweep
        # center (and rot/trans/camera) flow through it via XLA autodiff
        return _dscv_corner(search_range, num_cuts, jnp.dtype(cv_dtype),
                            bounds, ks, h, w, c1, padded, q)
    if bwd_impl not in ("xla", "pallas"):
        raise ValueError(f"unknown bwd_impl: {bwd_impl!r}")

    exp_y = checkpoint_name(jnp.concatenate(
        [padded[:, dy:dy + h, :, :] for dy in range(d)], axis=-1),
        "dscv_exp_y")

    idx = (cy * w + cx).reshape(b, n, 1)

    # chunked x-expansion + fetch: (dx-major, dy, ch) within each chunk
    # (NOTE round 3: a flat-2D {1,0} rebuild of this expansion — chunk
    # pieces as contiguous row-shifted slabs — measured SLOWER end-to-end
    # (188 vs 196 fps): the relayout this avoids on the build side
    # reappears in front of the pixel-minor reduce chain.)
    bounds = tuple(round(i * d / n_chunks) for i in range(n_chunks + 1))
    corr_parts, para_parts = [], []
    c1r = c1.astype(cv_dtype).reshape(b, n, 1, 1, num_cuts, cc)
    if store_int8:
        c1r = c1r * jnp.asarray(1.0 / 127.0, cv_dtype)    # fold dequant in
    fetch = _chunked_fetch_k if bwd_impl == "pallas" else _chunked_fetch
    fetched_chunks = fetch(exp_y, idx, w, bounds, d, ch)
    for (lo, hi), fetched in zip(zip(bounds[:-1], bounds[1:]),
                                 fetched_chunks):
        nd = hi - lo
        patch = checkpoint_name(fetched.reshape(b, n, nd, d, ch),
                                "dscv_patch")
        feat = checkpoint_name(patch[..., :C], "dscv_feat")
        if store_int8:
            feat = feat.astype(cv_dtype)
        feat = checkpoint_name(feat.reshape(b, n, nd, d, num_cuts, cc),
                               "dscv_feat")
        corr_parts.append((c1r * feat).mean(axis=-1))     # [b,n,nd,d,cuts]
        if para_in_map:
            para_parts.append(patch[..., C])              # [b,n,nd,d]
    corr = jnp.concatenate(corr_parts, axis=2)            # [b,n,dx,dy,cuts]
    para_patch = jnp.concatenate(para_parts, axis=2) if para_in_map else None

    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]
    rely = y0.astype(jnp.int32) - cy[..., None]
    dgrid = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, d), 3) - search_range
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None]).astype(cv_dtype)
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None]).astype(cv_dtype)

    t1 = (corr[:, :, None] * wy[:, :, :, None, :, None]).sum(axis=4)
    cv = (t1 * wx[..., None]).sum(axis=3)
    ks = list(para_hyps) if para_hyps is not None else list(range(s))
    if not para_in_map:
        # the parallax channel left the expanded map (int8 store or
        # para_direct_warp); warp it directly per requested hypothesis
        # (same clamped-bilinear taps the patch contraction applies, minus
        # one bf16 rounding)
        gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
        gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
        qs = q.reshape(b, h, w, s, 2)
        pw = [dense_image_warp(
                  _saturating_cast(para_prev_t, cv_dtype),
                  jnp.stack([qs[..., k, 0] - gx, qs[..., k, 1] - gy],
                            axis=-1))[..., 0]
              for k in ks]
        para_w = jnp.stack(pw, axis=-1)                   # [b,h,w,len(ks)]
        cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
        return cv.astype(jnp.float32), para_w.astype(jnp.float32)
    wxp, wyp = wx[:, :, ks], wy[:, :, ks]
    p1 = (para_patch[:, :, None] * wyp[:, :, :, None]).sum(axis=-1)
    para_w = (p1 * wxp).sum(axis=-1)

    cv = cv.transpose(0, 1, 3, 2).reshape(b, h, w, num_cuts * s)
    para_w = para_w.reshape(b, h, w, -1)
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def parallax_sweeping_cv_fused(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    chunk_bytes: int = 30 << 20,
    min_rows_for_kernel: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split DSCV with the post-gather reduce fused into a Pallas kernel.

    Build + gather are identical to :func:`parallax_sweeping_cv_split`; the
    per-chunk correlation/weight contraction runs in
    ``ops/dscv_pallas.py::fused_reduce_chunk``, consuming the gather's
    native row-major layout (kills the pixel-minor relayout + reshape copies
    XLA inserts around the reduce chain — see DEVELOPMENT.md). Returns the
    center hypothesis' warped parallax only (the model consumes only that,
    m4depth_network.py:238-241). Forward-only (no VJP): serving/eval path.

    Levels with fewer than ``min_rows_for_kernel`` pixels fall back to the
    split implementation (their reduce cost is negligible and tiny grids
    waste kernel overhead).
    """
    b, h, w, C = c1.shape
    n = h * w
    s = 2 * search_range + 1
    if b * n < min_rows_for_kernel:
        return parallax_sweeping_cv_split(
            c1, c2, para_prev_t, para_sweep_center, rot, trans, camera,
            search_range, num_cuts=num_cuts, cv_dtype=cv_dtype,
            chunk_bytes=chunk_bytes, para_hyps=(search_range,))

    from m4depth_tpu.ops.dscv_pallas import fused_reduce_chunk

    d = 2 * search_range + 2
    ch = C + 1
    # bytes rule as split, plus a VMEM bound on the kernel's constant
    # matrices: Kc = nd*d*ch small enough that S [Kc, ~(cuts+1)*nd*d] and a
    # tile of fetched rows fit comfortably
    total = b * n * d * d * ch * jnp.dtype(cv_dtype).itemsize
    n_chunks = min(d, max(1, -(-total // chunk_bytes),
                          -(-d // max(1, 3400 // (d * ch)))))

    e = epipolar_terms(h, w, rot, trans, camera)
    unit = (e.delta / jnp.maximum(e.rho, 1e-12)).reshape(b, n, 1, 2)
    proj = e.proj.reshape(b, n, 1, 2)
    disp0 = jnp.clip(para_sweep_center, 1e-6, 1e6).reshape(b, n, 1)
    grid_off = camera.c.reshape(b, 1, 1, 2) - 0.5
    offsets = jnp.arange(-search_range, search_range + 1, dtype=jnp.float32)
    disp_k = jnp.clip(disp0 + offsets.reshape(1, 1, -1), 1e-6, 1e6)
    q = proj + unit * disp_k[..., None] + grid_off        # [b,n,s,2]
    qx, qy = q[..., 0], q[..., 1]
    cx = jnp.clip(jnp.floor(qx[..., search_range]), 0, w - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(qy[..., search_range]), 0, h - 1).astype(jnp.int32)
    idx = (cy * w + cx).reshape(b, n, 1)

    x0 = jnp.clip(jnp.floor(qx), 0, w - 2)
    y0 = jnp.clip(jnp.floor(qy), 0, h - 2)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    relx = x0.astype(jnp.int32) - cx[..., None]
    rely = y0.astype(jnp.int32) - cy[..., None]
    dgrid = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, d), 3) - search_range
    wx = ((dgrid == relx[..., None]) * (1.0 - ax[..., None])
          + (dgrid == relx[..., None] + 1) * ax[..., None])   # [b,n,s,d]
    wy = ((dgrid == rely[..., None]) * (1.0 - ay[..., None])
          + (dgrid == rely[..., None] + 1) * ay[..., None])

    combined = jnp.concatenate(
        [c2.astype(cv_dtype), _saturating_cast(para_prev_t, cv_dtype)],
        axis=-1)
    padded = jnp.pad(
        combined,
        ((0, 0), (search_range, search_range + 1),
         (search_range, search_range + 1), (0, 0)),
        mode="edge")
    exp_y = jnp.concatenate(
        [padded[:, dy:dy + h, :, :] for dy in range(d)], axis=-1)

    # NHWC-shaped side inputs/outputs so the kernel's operand layout
    # requirements cannot leak pixel-rows layouts into the encoder convs
    # (see ops/dscv_pallas.py module docstring)
    c1_hw = c1.astype(jnp.bfloat16).reshape(b * h, w, C)
    wy16 = wy.astype(jnp.bfloat16)                       # [b,n,s,d] k-major
    bounds = [round(i * d / n_chunks) for i in range(n_chunks + 1)]
    acc = None
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        nd = hi - lo
        expanded = jnp.concatenate(
            [exp_y[:, :, dx:dx + w, :] for dx in range(lo, hi)], axis=-1)
        flat = expanded.reshape(b, n, nd * d * ch)
        fetched = jnp.take_along_axis(flat, idx, axis=1,
                                      mode="promise_in_bounds")
        wxy_hw = jnp.concatenate(
            [wx[..., lo:hi].astype(jnp.bfloat16).reshape(b * n, s * nd),
             wy16.reshape(b * n, s * d)],
            axis=-1).reshape(b * h, w, s * (nd + d))
        part = fused_reduce_chunk(
            fetched.reshape(b * n, nd * d * ch), c1_hw, wxy_hw,
            C=C, cuts=num_cuts, nd=nd, d=d, s=s, center=search_range)
        acc = part if acc is None else acc + part

    # channels are (k-major, cut-minor) then the parallax channel; the
    # model wants cut-major / hypothesis-minor
    cv = acc[..., :s * num_cuts].reshape(b, h, w, s, num_cuts)
    cv = cv.transpose(0, 1, 2, 4, 3).reshape(b, h, w, num_cuts * s)
    para_w = acc[..., -1:].reshape(b, h, w, 1)
    return cv, para_w


def parallax_sweeping_cv(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    para_prev_t: jnp.ndarray,
    para_sweep_center: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    camera: Camera,
    search_range: int,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disparity(parallax)-Sweeping Cost Volume.

    Args:
      c1: [b,h,w,C] current-frame features (cut-normalized).
      c2: [b,h,w,C] previous-frame features (cut-normalized).
      para_prev_t: [b,h,w,1] parallax derived from the previous depth estimate;
        warped alongside c2 so each hypothesis also carries a reprojected
        temporal parallax.
      para_sweep_center: [b,h,w,1] sweep center (upsampled deeper-level
        parallax estimate).
      search_range: r; hypotheses are center + {-r..r}, i.e. s = 2r+1.

    Returns:
      cv: [b,h,w,num_cuts*s] per-cut mean correlations, fp32, channel order
          cut-major / hypothesis-minor (parity: depth_operations.py:276-278).
      para_prev_t_warped: [b,h,w,s] the temporal parallax under each
          hypothesis' warp.
    """
    b, h, w, C = c1.shape
    s = 2 * search_range + 1
    flows = parallax_sweep_flows(para_sweep_center, rot, trans, camera,
                                 search_range)            # [b,s,h,w,2]

    combined = jnp.concatenate([c2, para_prev_t.astype(c2.dtype)], axis=-1)
    tiled = jnp.broadcast_to(combined[:, None], (b, s, h, w, C + 1))
    warped = dense_image_warp(tiled, flows)               # [b,s,h,w,C+1]

    c2w = warped[..., :C]
    para_w = warped[..., C]                               # [b,s,h,w]

    prod = c1[:, None].astype(cv_dtype) * c2w.astype(cv_dtype)
    cv = prod.reshape(b, s, h, w, num_cuts, C // num_cuts).mean(axis=-1)
    # -> [b,h,w,num_cuts,s] -> cut-major channel layout
    cv = cv.transpose(0, 2, 3, 4, 1).reshape(b, h, w, num_cuts * s)
    para_w = para_w.transpose(0, 2, 3, 1)                 # [b,h,w,s]
    return cv.astype(jnp.float32), para_w.astype(jnp.float32)


def spatial_cost_volume(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    search_range: int,
    dilation_rate: int = 1,
    num_cuts: int = 1,
    cv_dtype: jnp.dtype = jnp.bfloat16,
    leaky_slope: float = 0.1,
) -> jnp.ndarray:
    """Spatial-Neighborhood Cost Volume (auto-correlation when c1 is c2).

    For every spatial offset (dy, dx) in a (2r+1)^2 window and every feature
    cut, the per-pixel mean correlation between c1 and the shifted c2, passed
    through leaky-relu. Channel order offset-major / cut-minor (parity:
    utils/depth_operations.py:283-313).

    Returns: [b,h,w,(2r+1)^2 * num_cuts] fp32.
    """
    b, h, w, C = c1.shape
    r = search_range * dilation_rate
    side = 2 * search_range + 1
    n_off = side * side
    cc = C // num_cuts

    pad = jnp.pad(c2, ((0, 0), (r, r), (r, r), (0, 0)))
    c1r = c1.reshape(b, h, w, num_cuts, cc).astype(cv_dtype)

    def cost_at(o):
        dy, dx = divmod(o, side)
        y0, x0 = dy * dilation_rate, dx * dilation_rate
        shifted = pad[:, y0:y0 + h, x0:x0 + w, :]
        prod = c1r * shifted.reshape(b, h, w, num_cuts, cc).astype(cv_dtype)
        return prod.mean(axis=-1)                         # [b,h,w,num_cuts]

    if c2 is c1:
        # autocorrelation symmetry: cost at offset -delta is the +delta cost
        # map shifted by delta (exact, incl. the zero-padded borders) — only
        # (n_off+1)/2 of the correlation maps need computing
        half = (n_off + 1) // 2
        costs = [cost_at(o) for o in range(half)]
        for o in range(half, n_off):
            mirror = costs[n_off - 1 - o]
            dy, dx = divmod(o, side)
            y0, x0 = dy * dilation_rate, dx * dilation_rate
            costs.append(jnp.pad(
                mirror, ((0, 0), (r, r), (r, r), (0, 0))
            )[:, y0:y0 + h, x0:x0 + w, :])
    else:
        costs = [cost_at(o) for o in range(n_off)]
    cv = jnp.concatenate(costs, axis=-1).astype(jnp.float32)
    return jnp.where(cv > 0, cv, cv * leaky_slope)
