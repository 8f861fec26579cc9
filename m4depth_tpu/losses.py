"""Training loss.

Parity reference: ``m4depth_loss`` (m4depth_network.py:491-536) — L1 on
log-depth ``log(clip(d, 0.01, 200))``, pyramid level i (finest first)
weighted ``0.64 / 2**(i-1)``, averaged over frames 1..T-1; the "velodyne"
variant block-pools sparse ground truth with hole-aware masked means.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from m4depth_tpu.geometry.resize import resize_bilinear
from m4depth_tpu.models.decoder import LevelEstimate


def _preprocess(d: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(jnp.clip(d, 0.01, 200.0))


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + 1e-12)


def m4depth_loss(
    gt_depth_seq: jnp.ndarray,          # [b, T, H, W, 1]
    preds: Sequence[List[LevelEstimate]],  # per frame, finest level first
    depth_type: str = "map",
) -> jnp.ndarray:
    """Sequence loss over frames 1..T-1 (frame 0 has no temporal context)."""
    T = gt_depth_seq.shape[1]
    total = jnp.asarray(0.0, jnp.float32)
    for t in range(1, T):
        gt = gt_depth_seq[:, t].astype(jnp.float32)
        gt_log = _preprocess(gt)
        b, hg, wg = gt.shape[:3]
        for i, pred in enumerate(preds[t]):
            pd = _preprocess(pred.depth)
            h, w = pd.shape[1:3]
            weight = 0.64 / (2.0 ** (i - 1))
            if depth_type == "velodyne":
                if hg % h or wg % w:
                    raise ValueError(
                        f"velodyne loss requires the gt resolution "
                        f"({hg}x{wg}) to be an integer multiple of every "
                        f"level resolution (got {h}x{w}) — "
                        f"see m4depth_network.py:516-530")
                blocks = (b, h, hg // h, w, wg // w, 1)
                gt_blocks = gt.reshape(blocks)
                mask = (gt_blocks > 0).astype(jnp.float32)
                gt_resized = _masked_mean(gt_log.reshape(blocks), mask,
                                          axis=(2, 4))
                valid = (jnp.sum(mask, axis=(2, 4)) > 0).astype(jnp.float32)
                term = weight * _masked_mean(jnp.abs(gt_resized - pd), valid)
            else:
                gt_resized = resize_bilinear(gt_log, (h, w))
                term = weight * jnp.mean(jnp.abs(gt_resized - pd))
            total = total + term / float(T - 1)
    return total


def l1_param_regularization(params, weight: float) -> jnp.ndarray:
    """Optional L1 kernel regularization (the reference wires it but
    instantiates the model with weight 0 — m4depth_network.py:344-346)."""
    if weight == 0.0:
        return jnp.asarray(0.0, jnp.float32)
    import jax

    leaves = [jnp.abs(x).sum() for x in jax.tree_util.tree_leaves(params)
              if x.ndim >= 2]
    return weight * sum(leaves)
