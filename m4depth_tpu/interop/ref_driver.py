"""External driver for the reference model's recurrent pyramid.

Keras 3 (bundled with modern TF) forbids the non-tensor positional layer
arguments the 2022-era reference uses internally
(``self.d_estimator(f_maps_pyrs, traj_samples, camera, training)``), so the
reference's ``M4Depth.call`` cannot be invoked directly anymore. This driver
replicates the orchestration of ``DepthEstimatorPyramid.call`` +
``M4Depth.call`` (m4depth_network.py:278-369) externally, invoking the
reference's *own* encoder and level layers — the computation compared
against in the parity tests is entirely the reference's.
"""

from __future__ import annotations

import numpy as np


def run_reference_window(ref, model, rgb, rot, trans, camera, new_traj=None):
    """Drive a reference ``M4Depth`` over a [b, T, h, w, 3] window.

    Args:
      ref: namespace from ``load_reference()``.
      model: a reference ``M4Depth`` instance (train or eval mode).
      rgb/rot/trans: numpy [b,T,...] sequence inputs.
      camera: reference-style dict ``{"f": [b,2], "c": [b,2]}``.
      new_traj: per-frame python bools; defaults to frame 0 only.

    Returns:
      list over frames of list over levels (finest first) of estimate dicts
      — the reference's training-path output structure.
    """
    tf = ref.tf
    b, T = rgb.shape[:2]
    if new_traj is None:
        new_traj = [t == 0 for t in range(T)]
    is_training = model.model_settings["is_training"]

    f_pyrs = [model.encoder(tf.constant(rgb[:, t])) for t in range(T)]
    levels = model.d_estimator.levels
    L = len(levels)

    d_seq = []
    for t in range(T):
        d_curr = []
        cnter = float(L)
        for l, (f_maps, level) in enumerate(zip(f_pyrs[t][::-1],
                                                levels[::-1])):
            f_prev = None
            d_prev = None
            if is_training and t != 0:
                f_prev = f_pyrs[t - 1][-l - 1]
                d_prev = d_seq[-1][-l - 1]["depth"]
            local_cam = {"f": camera["f"] / 2.0 ** cnter,
                         "c": camera["c"] / 2.0 ** cnter}
            d_est = dict(d_curr[-1]) if d_curr else None
            out = level(
                f_maps,
                prev_l_est=d_est,
                rot=tf.constant(rot[:, t]),
                trans=tf.constant(trans[:, t]),
                camera=local_cam,
                new_traj=np.array([new_traj[t]] * b),
                prev_f_maps=f_prev,
                prev_t_depth=d_prev,
            )
            d_curr.append(out)
            cnter -= 1.0
        d_seq.append(d_curr[::-1])
    return d_seq


def final_depth(ref, est_pyramid, hw):
    """Full-resolution depth of one frame's pyramid (m4depth_network.py:368)."""
    return ref.tf.image.resize(
        est_pyramid[0]["depth"], list(hw),
        method=ref.tf.image.ResizeMethod.NEAREST_NEIGHBOR).numpy()
