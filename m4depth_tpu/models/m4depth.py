"""M4Depth top-level model: recurrent encoder/decoder pyramid.

Parity reference: ``M4Depth`` + ``DepthEstimatorPyramid``
(m4depth_network.py:265-369). The time axis is handled functionally: the
per-level temporal memory is an explicit tuple of ``LevelState`` threaded
through the sequence — one code path serves training windows, windowed eval
and O(1)-memory streaming inference (``step``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from m4depth_tpu.config import ModelConfig
from m4depth_tpu.geometry import Camera, resize_nearest, scale_camera
from m4depth_tpu.models.decoder import DecoderLevel, LevelEstimate, LevelState
from m4depth_tpu.models.encoder import Encoder

ModelState = Tuple[LevelState, ...]
Pyramid = List[LevelEstimate]  # finest level first


def level_shape(h: int, w: int, idx: int) -> Tuple[int, int]:
    """Spatial shape of encoder output ``idx`` (stride 2**(idx+1), SAME)."""
    for _ in range(idx + 1):
        h = -(-h // 2)
        w = -(-w // 2)
    return h, w


def init_state(cfg: ModelConfig, batch: int, h: int, w: int,
               dtype=jnp.float32) -> ModelState:
    """Zero-filled temporal memory (overwritten on the first new_traj frame)."""
    states = []
    for idx in range(cfg.num_levels):
        hl, wl = level_shape(h, w, idx)
        states.append(LevelState(
            f_maps=jnp.zeros((batch, hl, wl, cfg.channels[idx]),
                             jnp.dtype(cfg.compute_dtype)),
            depth=jnp.full((batch, hl, wl, 1), 1000.0, dtype),
        ))
    return tuple(states)


class M4Depth(nn.Module):
    """Metric depth from a monocular video stream + known 6-DoF motion."""

    cfg: ModelConfig

    def setup(self):
        if self.cfg.remat and self.cfg.remat_policy == "all":
            # blanket: recompute the full level body in the backward
            level_cls = nn.remat(DecoderLevel, static_argnums=())
        elif self.cfg.remat and self.cfg.remat_policy == "dscv":
            # selective: DecoderLevel wraps ONLY its DSCV call in
            # jax.checkpoint (decoder.py), so the multi-GB d^2-expanded
            # build/gather temps — the very tensors that force remat at
            # T >= 6, DEVELOPMENT.md "Time-axis scan" — are recomputed in
            # the backward while conv/SNCV activations stay stored.
            # (A names-based save_anything_except policy does NOT work
            # here: XLA saves the named value's producer instead — same
            # bytes, measured OOM at T=8.)
            level_cls = DecoderLevel
        elif self.cfg.remat:
            raise ValueError(
                f"remat_policy must be 'dscv' or 'all', "
                f"got {self.cfg.remat_policy!r}")
        else:
            level_cls = DecoderLevel
        self.encoder = Encoder(self.cfg, name="encoder")
        self.levels = [
            level_cls(self.cfg, level=i + 1, name=f"level_{i + 1}")
            for i in range(self.cfg.num_levels)
        ]

    def forward_frame(
        self,
        state: Optional[ModelState],
        rgb: jnp.ndarray,
        rot: jnp.ndarray,
        trans: jnp.ndarray,
        camera: Camera,
        new_traj: Optional[jnp.ndarray],
        first: bool,
    ) -> Tuple[ModelState, Pyramid]:
        """One frame through encoder + decoder pyramid (deepest -> finest).

        ``first=True`` statically marks the frame as a trajectory start for
        the whole batch (training windows); ``new_traj`` is the per-element
        dynamic reset mask used in streaming.
        """
        L = self.cfg.num_levels
        f_pyr = self.encoder(rgb)
        new_states: List[Optional[LevelState]] = [None] * L
        ests: List[Optional[LevelEstimate]] = [None] * L
        deeper: Optional[LevelEstimate] = None
        for idx in reversed(range(L)):
            cam_l = scale_camera(camera, 2.0 ** (idx + 1))
            st = None if first else state[idx]
            est, new_st = self.levels[idx](
                f_pyr[idx], deeper, st, rot, trans, cam_l, new_traj)
            deeper = est
            new_states[idx] = new_st
            ests[idx] = est
        return tuple(new_states), ests  # finest first

    def __call__(
        self,
        rgb_seq: jnp.ndarray,     # [b, T, h, w, 3]
        rot_seq: jnp.ndarray,     # [b, T, 3|4]
        trans_seq: jnp.ndarray,   # [b, T, 3]
        camera: Camera,
    ) -> List[Pyramid]:
        """Process a training/eval window where frame 0 starts the sequence.

        Parity: the reference's train-time functional recurrence
        (m4depth_network.py:278-323) with batch-synchronized resets.
        Initialize the model with T >= 2 so the refiner parameters exist.

        The time axis is either unrolled or a ``lax.scan`` with the
        per-level ``LevelState`` tuple as carry (SURVEY.md §7). Scan keeps
        trace/compile cost at one frame body regardless of T; unroll lets
        XLA fuse across frame boundaries. Measured on v5e at the reference
        config (b=3, 384^2, d6 — DEVELOPMENT.md "Time-axis scan"): plain
        scan is ~2x slower per step than unroll; ``scan_unroll=2`` (the
        default) recovers cross-frame fusion within pairs and closes that
        to 1.09x (T=4) / 1.18x (T=5). Default "auto" unrolls windows up to
        the legacy training length (T <= 5, where unroll still measures
        ~15% faster and compile time stays moderate) and scans longer ones
        (db_seq_len 8) where unrolled compile becomes prohibitive; T >= 6
        at 384^2 batch 3 additionally needs ``remat`` to fit HBM (the
        stacked per-frame DSCV residuals exceed 16 GB either way —
        DEVELOPMENT.md). Frame 0 always runs outside the scan — its reset
        path is a statically different computation.
        """
        T = rgb_seq.shape[1]
        dispatch = {"auto": T <= 5, "unroll": True, "scan": False}
        if self.cfg.time_axis not in dispatch:
            raise ValueError(
                f"time_axis must be one of {sorted(dispatch)}, "
                f"got {self.cfg.time_axis!r}")
        unroll = dispatch[self.cfg.time_axis]
        if unroll or T <= 2:
            state: Optional[ModelState] = None
            outs: List[Pyramid] = []
            for t in range(T):
                state, pyr = self.forward_frame(
                    state, rgb_seq[:, t], rot_seq[:, t], trans_seq[:, t],
                    camera, new_traj=None, first=(t == 0))
                outs.append(pyr)
            return outs

        state, pyr0 = self.forward_frame(
            None, rgb_seq[:, 0], rot_seq[:, 0], trans_seq[:, 0],
            camera, new_traj=None, first=True)

        def body(mdl: "M4Depth", carry: ModelState, xs):
            rgb, rot, trans = xs
            new_state, pyr = mdl.forward_frame(
                carry, rgb, rot, trans, camera, new_traj=None, first=False)
            return new_state, tuple(pyr)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
            unroll=max(1, min(self.cfg.scan_unroll, T - 1)))
        # time-major xs: [T-1, b, ...]
        xs = (
            jnp.moveaxis(rgb_seq[:, 1:], 1, 0),
            jnp.moveaxis(rot_seq[:, 1:], 1, 0),
            jnp.moveaxis(trans_seq[:, 1:], 1, 0),
        )
        _, stacked = scan(self, state, xs)
        outs = [pyr0]
        for t in range(T - 1):
            outs.append([jax.tree_util.tree_map(lambda x: x[t], lvl)
                         for lvl in stacked])
        return outs

    # -- model contract (parity: the legacy PipelineModel interface,
    # .legacy/multi_gpu_pipeline/pipeline_model.py:19-121) ---------------
    def loss(self, gt_depth_seq: jnp.ndarray, preds) -> jnp.ndarray:
        from m4depth_tpu.losses import m4depth_loss

        return m4depth_loss(gt_depth_seq, preds, self.cfg.depth_type)

    @staticmethod
    def final_depth(preds, hw) -> jnp.ndarray:
        """Full-resolution depth of the last frame (nearest upsampling of
        the finest level, m4depth_network.py:368)."""
        return resize_nearest(preds[-1][0].depth, hw)

    def step(
        self,
        state: ModelState,
        rgb: jnp.ndarray,        # [b, h, w, 3]
        rot: jnp.ndarray,        # [b, 3|4]
        trans: jnp.ndarray,      # [b, 3]
        camera: Camera,
        new_traj: jnp.ndarray,   # [b] bool
    ) -> Tuple[ModelState, jnp.ndarray]:
        """Streaming inference: one frame in, full-resolution depth out.

        The caller owns the state (create with ``init_state``; pass
        new_traj=True on each trajectory's first frame). Parity: the
        reference's eval-time stateful path (m4depth_network.py:153-214)
        but with per-batch-element resets.
        """
        h, w = rgb.shape[1:3]
        state, pyr = self.forward_frame(
            state, rgb, rot, trans, camera, new_traj=new_traj, first=False)
        depth = resize_nearest(pyr[0].depth, (h, w))
        return state, depth
