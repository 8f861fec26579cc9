"""Decoder pyramid level: parallax refinement with temporal memory.

Parity reference: ``DispRefiner`` (m4depth_network.py:93-135) and
``DepthEstimatorLevel`` (m4depth_network.py:138-262).

TPU-first redesign (SURVEY.md §7):
  * Temporal memory is an explicit ``LevelState`` pytree passed in/out — the
    reference's eval-time mutable TF variables and train-time python lists
    collapse into one functional path.
  * Trajectory reset is a per-batch-element ``jnp.where`` mask, not a
    batch-global python conditional (fixes the reference's batch-global
    ``new_traj[0]`` limitation, m4depth_network.py:206-208).
  * The vestigial duplicated refiner branch of the reference (both branches
    share weights and only branch 0 is consumed, m4depth_network.py:125-135)
    is a single sequential stack here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from m4depth_tpu.config import ModelConfig
from m4depth_tpu.geometry import (
    Camera,
    parallax_to_depth,
    prev_depth_to_parallax,
    resize_bilinear_v1,
)
from m4depth_tpu.models.encoder import leaky_relu
from m4depth_tpu.ops.cost_volume import (
    parallax_sweeping_cv,
    parallax_sweeping_cv_expanded,
    parallax_sweeping_cv_flat,
    parallax_sweeping_cv_fused,
    parallax_sweeping_cv_rows,
    parallax_sweeping_cv_rows_fused,
    parallax_sweeping_cv_split,
    spatial_cost_volume,
)


class LevelState(NamedTuple):
    """Per-level temporal memory carried between frames.

    f_maps: [b, h_l, w_l, C_l] raw encoder features of the previous frame.
    depth:  [b, h_l, w_l, 1]   this level's previous depth estimate.

    (The reference stores *normalized* features at eval,
    m4depth_network.py:211,259 — cut-normalization is idempotent, so storing
    raw features keeps train/eval numerically identical on one code path.)
    """

    f_maps: jnp.ndarray
    depth: jnp.ndarray


class LevelEstimate(NamedTuple):
    """Per-level per-frame outputs (all fp32)."""

    depth: jnp.ndarray     # [b, h_l, w_l, 1]
    parallax: jnp.ndarray  # [b, h_l, w_l, 1]
    other: jnp.ndarray     # [b, h_l, w_l, 4] inter-level memory


def prep_features(f: jnp.ndarray, num_cuts: int, normalize: bool) -> jnp.ndarray:
    """Per-cut L2 normalization of feature sub-vectors.

    Parity: m4depth_network.py:173-189 — the reshape/unstack/concat there is
    a pure reshape; only the per-block normalization has effect.
    """
    if not normalize:
        return f
    b, h, w, c = f.shape
    blocks = f.reshape(b, h, w, num_cuts, c // num_cuts).astype(jnp.float32)
    sq = jnp.sum(blocks * blocks, axis=-1, keepdims=True)
    blocks = blocks * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    return blocks.reshape(b, h, w, c).astype(f.dtype)


class DispRefiner(nn.Module):
    """Parallax refinement subnetwork: 3 prep convs + 4 estimation convs."""

    cfg: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        init = nn.initializers.he_normal()
        self.prep_convs = [
            nn.Conv(ch, (3, 3), padding="SAME", kernel_init=init,
                    dtype=dtype, name=f"prep_{i}")
            for i, ch in enumerate(self.cfg.refiner_prep_channels)
        ]
        self.est_convs = [
            nn.Conv(ch, (3, 3), padding="SAME", kernel_init=init,
                    dtype=dtype, name=f"est_{i}")
            for i, ch in enumerate(self.cfg.refiner_est_channels)
        ]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.dtype(self.cfg.compute_dtype))
        for conv in self.prep_convs:
            x = leaky_relu(conv(x), self.cfg.leaky_slope)
        n_est = len(self.est_convs)
        for i, conv in enumerate(self.est_convs):
            x = conv(x)
            if i < n_est - 1:
                x = leaky_relu(x, self.cfg.leaky_slope)
        return x


class DecoderLevel(nn.Module):
    """One stackable decoder level (1-indexed ``level``; 1 = finest)."""

    cfg: ModelConfig
    level: int

    def setup(self):
        self.refiner = DispRefiner(self.cfg, name="refiner")

    @property
    def lvl_mul(self) -> float:
        # parallax scale: para = exp(clip(x, -7, 7)) / 2**(level-3)
        return 2.0 ** (self.level - 3)

    def initial_deeper_estimate(self, b: int, h: int, w: int) -> LevelEstimate:
        """Deepest-level stand-in for the (absent) deeper level's estimate.

        Parity: m4depth_network.py:196-200 (parallax 1, depth 1000, other 0).
        """
        return LevelEstimate(
            depth=jnp.full((b, h, w, 1), 1000.0, jnp.float32),
            parallax=jnp.ones((b, h, w, 1), jnp.float32),
            other=jnp.zeros((b, h, w, 4), jnp.float32),
        )

    def upsample_deeper(self, deeper: LevelEstimate, h: int, w: int) -> LevelEstimate:
        """Bring the deeper level's estimate to this level's resolution.

        Parity: legacy v1 bilinear grid + parallax doubling
        (m4depth_network.py:202-204).
        """
        return LevelEstimate(
            depth=resize_bilinear_v1(deeper.depth, (h, w)),
            parallax=resize_bilinear_v1(deeper.parallax, (h, w)) * 2.0,
            other=resize_bilinear_v1(deeper.other, (h, w)),
        )

    def __call__(
        self,
        curr_f: jnp.ndarray,
        deeper_est: Optional[LevelEstimate],
        state: Optional[LevelState],
        rot: jnp.ndarray,
        trans: jnp.ndarray,
        camera: Camera,
        new_traj: Optional[jnp.ndarray],
    ) -> Tuple[LevelEstimate, LevelState]:
        """Run one level for one frame.

        Args:
          curr_f: [b,h,w,C] this level's encoder features (raw).
          deeper_est: next-deeper level's estimate this frame, or None at the
            deepest level.
          state: previous-frame memory, or None if this is statically the
            first frame of every sequence in the batch (training windows).
          new_traj: [b] bool — per-element dynamic trajectory reset — or None
            when resets are statically known (training).

        Returns: (estimate, new_state).
        """
        b, h, w, _ = curr_f.shape
        cuts = self.cfg.num_cuts(self.level)
        abl = self.cfg.ablation

        if deeper_est is None:
            prev_l = self.initial_deeper_estimate(b, h, w)
        else:
            prev_l = self.upsample_deeper(deeper_est, h, w)

        reset_est = prev_l  # what this level emits on a trajectory reset
        reset_state = lambda: LevelState(  # noqa: E731
            f_maps=curr_f,
            depth=jnp.full((b, h, w, 1), 1000.0, jnp.float32),
        )

        if state is None:
            return reset_est, reset_state()

        curr_p = prep_features(curr_f, cuts, abl.normalize_features)
        prev_p = prep_features(state.f_maps, cuts, abl.normalize_features)

        para_prev_t = prev_depth_to_parallax(state.depth, rot, trans, camera)
        center = self.cfg.search_range
        # the model only consumes the center hypothesis' warped parallax
        # (parity: m4depth_network.py:238-241); "split" supports skipping the
        # weight contraction for the rest, the other impls return all 2r+1
        para_hyps = ((center,)
                     if self.cfg.dscv_impl in ("split", "fused", "rows",
                                               "rows_fused")
                     else tuple(range(2 * center + 1)))
        dscv = {
            "split": functools.partial(
                parallax_sweeping_cv_split,
                chunk_bytes=self.cfg.dscv_chunk_bytes,
                para_hyps=para_hyps,
                store_int8=self.cfg.dscv_store_int8,
                para_direct_warp=self.cfg.dscv_para_direct,
                bwd_impl=self.cfg.dscv_bwd),
            "rows": functools.partial(
                parallax_sweeping_cv_rows,
                row_group=self.cfg.dscv_row_group,
                para_hyps=para_hyps,
                x_window=self.cfg.dscv_x_window,
                x_window_dual=self.cfg.dscv_xw_dual),
            "fused": functools.partial(
                parallax_sweeping_cv_fused,
                chunk_bytes=self.cfg.dscv_chunk_bytes),
            "rows_fused": functools.partial(
                parallax_sweeping_cv_rows_fused,
                row_group=self.cfg.dscv_row_group,
                x_window=self.cfg.dscv_x_window,
                x_window_dual=self.cfg.dscv_xw_dual),
            "flat": parallax_sweeping_cv_flat,
            "expanded": parallax_sweeping_cv_expanded,
            "gather": parallax_sweeping_cv,
        }[self.cfg.dscv_impl]
        dscv_call = functools.partial(
            dscv, search_range=self.cfg.search_range, num_cuts=cuts,
            cv_dtype=jnp.dtype(self.cfg.cv_dtype))
        if self.cfg.remat and self.cfg.remat_policy == "dscv":
            # selective remat: checkpoint ONLY the DSCV so its d^2-expanded
            # build/gather temps (hundreds of MB per frame+level at 384^2,
            # the residuals that OOM T >= 6 windows) are recomputed in the
            # backward from the op's small inputs, while every conv/SNCV
            # activation outside stays stored. Cheaper than blanket level
            # remat (remat_policy="all"): the re-run is the bandwidth-bound
            # expansion+fetch, not the whole level body.
            dscv_call = jax.checkpoint(dscv_call)
        cv, para_reproj = dscv_call(
            curr_p, prev_p, para_prev_t, prev_l.parallax, rot, trans, camera)

        log_safe = lambda x: jnp.log(jnp.maximum(x, 1e-12))  # noqa: E731
        inputs = [cv, log_safe(prev_l.parallax * self.lvl_mul)]
        if abl.level_memory:
            inputs.append(prev_l.other)
        if abl.sncv:
            if self.cfg.sncv_impl == "pallas":
                from m4depth_tpu.ops.sncv_pallas import (
                    spatial_cost_volume_pallas as sncv_fn,
                )
            else:
                sncv_fn = spatial_cost_volume
            inputs.append(sncv_fn(
                curr_p, curr_p, self.cfg.sncv_search_range, num_cuts=cuts,
                cv_dtype=jnp.dtype(self.cfg.cv_dtype),
                leaky_slope=self.cfg.leaky_slope,
            ))
        if abl.time_recurr:
            # index of the center hypothesis within whatever channels the
            # chosen impl actually returned
            c0 = para_hyps.index(center)
            inputs.append(log_safe(
                para_reproj[..., c0:c0 + 1] * self.lvl_mul))

        f_input = jnp.concatenate(
            [x.astype(jnp.dtype(self.cfg.compute_dtype)) for x in inputs], axis=-1)

        out = self.refiner(f_input).astype(jnp.float32)
        para_raw = out[..., :1]
        other = out[..., 1:]

        parallax = jnp.exp(jnp.clip(para_raw, -7.0, 7.0)) / self.lvl_mul
        depth = parallax_to_depth(parallax, rot, trans, camera)

        est = LevelEstimate(depth=depth, parallax=parallax, other=other)
        new_state = LevelState(f_maps=curr_f, depth=depth)

        if new_traj is not None:
            mask = new_traj.reshape(b, 1, 1, 1)
            rst, rst_state = reset_est, reset_state()
            est = LevelEstimate(
                depth=jnp.where(mask, rst.depth, est.depth),
                parallax=jnp.where(mask, rst.parallax, est.parallax),
                other=jnp.where(mask, rst.other, est.other),
            )
            # rst_state.f_maps == new_state.f_maps == curr_f: the feature
            # memory needs no masking, only the depth memory does
            new_state = LevelState(
                f_maps=new_state.f_maps,
                depth=jnp.where(mask, rst_state.depth, new_state.depth),
            )
        return est, new_state
