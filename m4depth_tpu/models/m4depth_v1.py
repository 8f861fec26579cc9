"""M4Depth-V1: the original (arXiv 2021) architecture as a second model
family.

Parity reference: ``.legacy/m4depth_model.py`` — differences from the
Sensors-2022 model (models/m4depth.py):
  * encoder convs are stride-2-first then stride-1 (:37-52);
  * the decoder is DEPTH-recurrent, not parallax-recurrent: the previous
    frame's same-level depth is carried through ``recompute_depth`` (:54-82)
    and the previous-frame features + that depth are warped by the deeper
    level's estimate through a plain reprojection (:140-152);
  * a plain (2r+1)^2 spatial cost volume between current features and the
    warped previous features (:153, .legacy/utils/custom_layers.py:22-53);
  * the refiner consumes the raw features, cost volume, log-depths, and
    broadcast motion/pixel-location maps (:156-165), runs 7 convs
    [128,128,96,64,32,16,1] all leaky-activated, inverts the last leaky
    activation, clips to [-7, 7] and outputs depth = exp(x) * 10 (:167-178);
  * rotations are small-angle 3-vectors and the camera has a single focal
    length with a centered principal point (a standard ``Camera`` with
    c = (w/2, h/2) reproduces the legacy centered grid exactly);
  * ``single_frame=True`` reproduces the legacy ``special_case 1``
    (no temporal recurrence; current features correlate with themselves).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from m4depth_tpu.config import ModelConfig
from m4depth_tpu.geometry import (
    Camera,
    pixel_grid,
    recompute_depth,
    reprojection_flow,
    resize_bilinear_v1,
    resize_nearest,
    scale_camera,
)
from m4depth_tpu.models.decoder import LevelState
from m4depth_tpu.models.encoder import leaky_relu
from m4depth_tpu.models.m4depth import ModelState
from m4depth_tpu.ops.cost_volume import spatial_cost_volume
from m4depth_tpu.ops.warp import dense_image_warp

V1_REFINER_CHANNELS = (128, 128, 96, 64, 32, 16, 1)


def inverse_leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    """Invert a leaky-relu activation (legacy ``deactivate_leaky_relu``,
    .legacy/utils/custom_layers.py:18-20)."""
    return jnp.where(x > 0, x, x / jnp.asarray(slope, x.dtype))


class EncoderV1(nn.Module):
    """Stride-2-first feature pyramid (.legacy/m4depth_model.py:37-52)."""

    cfg: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        init = nn.initializers.he_normal()
        from m4depth_tpu.models.encoder import FirstConv

        # level 0 sees the 3-channel input: the shifts+matmul form avoids
        # the lane-starved direct conv (see FirstConv)
        self.convs_s2 = [
            (FirstConv(c, dtype=dtype, stride=2, name=f"conv_s2_{i}")
             if i == 0 else
             nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                     kernel_init=init, dtype=dtype, name=f"conv_s2_{i}"))
            for i, c in enumerate(self.cfg.channels)
        ]
        self.convs_s1 = [
            nn.Conv(c, (3, 3), strides=(1, 1), padding="SAME",
                    kernel_init=init, dtype=dtype, name=f"conv_s1_{i}")
            for i, c in enumerate(self.cfg.channels)
        ]

    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        x = images.astype(jnp.dtype(self.cfg.compute_dtype))
        outputs = []
        for conv_s2, conv_s1 in zip(self.convs_s2, self.convs_s1):
            x = leaky_relu(conv_s2(x), self.cfg.leaky_slope)
            x = leaky_relu(conv_s1(x), self.cfg.leaky_slope)
            outputs.append(x)
        return outputs


class DecoderLevelV1(nn.Module):
    """Depth-recurrent decoder level (.legacy ``RIDEN``, :127-178)."""

    cfg: ModelConfig
    level: int  # 1-indexed

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        init = nn.initializers.he_normal()
        self.convs = [
            nn.Conv(c, (3, 3), padding="SAME", kernel_init=init,
                    dtype=dtype, name=f"conv_{i}")
            for i, c in enumerate(V1_REFINER_CHANNELS)
        ]

    def __call__(
        self,
        curr_f: jnp.ndarray,
        prev_f: jnp.ndarray,
        prev_t_depth: Optional[jnp.ndarray],
        deeper_depth: Optional[jnp.ndarray],
        rot: jnp.ndarray,       # small-angle [b, 3]
        trans: jnp.ndarray,
        camera: Camera,
        new_traj: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (depth, depth) — estimate and the next temporal memory."""
        b, h, w, _ = curr_f.shape

        if prev_t_depth is None:
            d_0 = jnp.ones((b, h, w, 1), jnp.float32)
        else:
            # legacy recompute_depth uses the TRANSPOSED small-angle row
            # [ry, -rx, 1] (.legacy/m4depth_model.py:62) where the current
            # generation uses R's last row [-ry, rx, 1] (the fossil is
            # commented out at utils/depth_operations.py:118). For the
            # I+skew small-angle form R(-w) == R(w)^T exactly, so negating
            # rot reproduces the legacy convention bit-for-bit.
            d_0 = recompute_depth(prev_t_depth, -rot, trans, camera)
            if new_traj is not None:
                mask = new_traj.reshape(b, 1, 1, 1)
                d_0 = jnp.where(mask, jnp.ones_like(d_0), d_0)

        if deeper_depth is None:
            d_prev_l = jnp.full((b, h, w, 1), 100.0, jnp.float32)
        else:
            d_prev_l = resize_bilinear_v1(deeper_depth, (h, w))

        # warp (previous depth | previous features) into the current frame
        # using the deeper-level estimate (gradient detached, legacy :150)
        fmap = jnp.concatenate(
            [d_0.astype(curr_f.dtype), prev_f], axis=-1)
        flow = reprojection_flow(jax.lax.stop_gradient(d_prev_l), rot, trans,
                                 camera)
        warped = dense_image_warp(fmap, flow)
        d0_w = warped[..., :1].astype(jnp.float32)
        f0_w = warped[..., 1:]

        cv = spatial_cost_volume(
            curr_f, f0_w, self.cfg.search_range, num_cuts=1,
            cv_dtype=jnp.dtype(self.cfg.cv_dtype),
            leaky_slope=self.cfg.leaky_slope)

        rc = rot.shape[-1]  # 3 (small angle, legacy) or 4 (quaternion)
        rot_map = jnp.broadcast_to(rot.reshape(b, 1, 1, rc), (b, h, w, rc))
        trans_map = jnp.broadcast_to(trans.reshape(b, 1, 1, 3), (b, h, w, 3))
        coords, _ = pixel_grid(h, w, camera)
        log_safe = lambda x: jnp.log(jnp.maximum(x, 1e-12))  # noqa: E731

        x = jnp.concatenate([
            curr_f,
            cv.astype(curr_f.dtype),
            log_safe(d0_w / 10.0).astype(curr_f.dtype),
            log_safe(d_prev_l / 10.0).astype(curr_f.dtype),
            rot_map.astype(curr_f.dtype),
            trans_map.astype(curr_f.dtype),
            coords[..., :2].astype(curr_f.dtype),
        ], axis=-1)

        for conv in self.convs:
            x = leaky_relu(conv(x), self.cfg.leaky_slope)
        x = inverse_leaky_relu(x.astype(jnp.float32), self.cfg.leaky_slope)
        depth = jnp.exp(jnp.clip(x, -7.0, 7.0)) * 10.0
        return depth, depth


class M4DepthV1(nn.Module):
    """Legacy model family with the same functional-state API as M4Depth."""

    cfg: ModelConfig
    single_frame: bool = False   # legacy special_case 1

    def setup(self):
        self.encoder = EncoderV1(self.cfg, name="encoder")
        self.levels = [
            DecoderLevelV1(self.cfg, level=i + 1, name=f"level_{i + 1}")
            for i in range(self.cfg.num_levels)
        ]

    def forward_frame(self, state: Optional[ModelState], rgb, rot, trans,
                      camera: Camera, new_traj, first: bool):
        L = self.cfg.num_levels
        f_pyr = self.encoder(rgb)
        new_states: List[Optional[LevelState]] = [None] * L
        ests: List[Optional[jnp.ndarray]] = [None] * L
        deeper = None
        for idx in reversed(range(L)):
            cam_l = scale_camera(camera, 2.0 ** (idx + 1))
            if self.single_frame:
                prev_f, prev_d = f_pyr[idx], None
            elif first:
                prev_f, prev_d = f_pyr[idx], None
            else:
                prev_f, prev_d = state[idx].f_maps, state[idx].depth
                if new_traj is not None:
                    mask = new_traj.reshape(-1, 1, 1, 1)
                    prev_f = jnp.where(mask, f_pyr[idx], prev_f)
            depth, mem = self.levels[idx](
                f_pyr[idx], prev_f, prev_d, deeper, rot, trans, cam_l,
                new_traj)
            deeper = depth
            ests[idx] = depth
            new_states[idx] = LevelState(f_maps=f_pyr[idx], depth=mem)
        return tuple(new_states), ests  # finest first

    def __call__(self, rgb_seq, rot_seq, trans_seq, camera: Camera):
        """[b, T, ...] window; returns per-frame depth pyramids (finest
        first). Frame 0 runs without temporal memory (legacy init_network)."""
        T = rgb_seq.shape[1]
        state: Optional[ModelState] = None
        outs = []
        for t in range(T):
            state, pyr = self.forward_frame(
                state, rgb_seq[:, t], rot_seq[:, t], trans_seq[:, t],
                camera, new_traj=None, first=(t == 0))
            outs.append(pyr)
        return outs

    def step(self, state: ModelState, rgb, rot, trans, camera: Camera,
             new_traj):
        """Streaming inference with caller-owned state."""
        h, w = rgb.shape[1:3]
        state, pyr = self.forward_frame(
            state, rgb, rot, trans, camera, new_traj=new_traj, first=False)
        return state, resize_nearest(pyr[0], (h, w))

    # -- model contract (see models/m4depth.py) --------------------------
    def loss(self, gt_depth_seq: jnp.ndarray, preds) -> jnp.ndarray:
        return m4depth_v1_loss(gt_depth_seq, preds,
                               single_frame=self.single_frame)

    @staticmethod
    def final_depth(preds, hw) -> jnp.ndarray:
        return resize_nearest(preds[-1][0], hw)


def m4depth_v1_loss(gt_depth_seq: jnp.ndarray, preds,
                    single_frame: bool = False) -> jnp.ndarray:
    """Legacy pyramid log-L1: clip depths to [0.1, 200], weight level j
    (finest first) by 0.64/2**(j-1), average over frames
    (.legacy/m4depth_pipeline.py:108-131)."""
    T = gt_depth_seq.shape[1]
    total = jnp.asarray(0.0, jnp.float32)
    # single-frame ("special case 1") scores frames 0..T-2 — the last
    # frame's prediction is never scored — with the same 1/max(1,T-1)
    # normalization as the temporal case (legacy loop
    # `range(max(self.seq_len - 1, 1))`, m4depth_pipeline.py:111)
    frames = range(max(T - 1, 1)) if single_frame else range(1, T)
    for t in frames:
        gt = jnp.clip(gt_depth_seq[:, t].astype(jnp.float32), 0.1, 200.0)
        gt_log = jnp.log(gt)
        for j, depth in enumerate(preds[t]):
            hj, wj = depth.shape[1:3]
            gt_r = resize_bilinear_v1(gt_log, (hj, wj))
            d = jnp.log(jnp.clip(depth, 0.1, 200.0))
            total = total + (0.64 / 2.0 ** (j - 1)) * jnp.mean(
                jnp.abs(d - gt_r))
    return total / jnp.maximum(float(len(list(frames))), 1.0)
