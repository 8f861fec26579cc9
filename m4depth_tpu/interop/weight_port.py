"""Port reference Keras M4Depth weights into flax parameters.

Layer correspondence (reference -> this package):

  FeaturePyramid.conv_layers_s1[i]        -> encoder/conv_s1_{i}
  FeaturePyramid.conv_layers_s2[i]        -> encoder/conv_s2_{i}
  FeaturePyramid.dn_layers[0]             -> encoder/dinl        (level 0 only;
                                             the other DINL instances are never
                                             called and own no variables,
                                             m4depth_network.py:79-83)
  DepthEstimatorPyramid.levels[l]
      .disp_refiner.prep_conv_layers[i]   -> level_{l+1}/refiner/prep_{i}
      .disp_refiner.est_d_conv_layers[i]  -> level_{l+1}/refiner/est_{i}

Both stacks use 3x3 HWIO conv kernels, so tensors copy verbatim. The
reference's duplicated refiner estimation branch shares weights
(m4depth_network.py:125-135), so the single-branch port is lossless.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(layer) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.asarray(layer.kernel),
        "bias": np.asarray(layer.bias),
    }


def port_reference_model(tf_model) -> Dict[str, Any]:
    """Convert a *built* reference ``M4Depth`` Keras model to flax params.

    Returns a ``{"params": {...}}`` pytree loadable by this package's
    ``M4Depth.apply``. Raises if the model was never called (Keras builds
    variables lazily).
    """
    enc = tf_model.encoder
    try:
        built = bool(enc.conv_layers_s1) and enc.conv_layers_s1[0].kernel is not None
    except AttributeError:  # Keras 3 raises on unbuilt .kernel access
        built = False
    if not built:
        raise ValueError(
            "reference model has no built weights; call it on a sample first")

    encoder: Dict[str, Any] = {}
    for i, layer in enumerate(enc.conv_layers_s1):
        encoder[f"conv_s1_{i}"] = _conv(layer)
    for i, layer in enumerate(enc.conv_layers_s2):
        encoder[f"conv_s2_{i}"] = _conv(layer)
    if enc.use_dinl:
        dn = enc.dn_layers[0]
        encoder["dinl"] = {
            "scale": np.asarray(dn.scale),
            "bias": np.asarray(dn.bias),
        }

    params: Dict[str, Any] = {"encoder": encoder}
    for l, level in enumerate(tf_model.d_estimator.levels):
        refiner: Dict[str, Any] = {}
        for i, layer in enumerate(level.disp_refiner.prep_conv_layers):
            refiner[f"prep_{i}"] = _conv(layer)
        for i, layer in enumerate(level.disp_refiner.est_d_conv_layers):
            refiner[f"est_{i}"] = _conv(layer)
        params[f"level_{l + 1}"] = {"refiner": refiner}
    return {"params": params}


def port_reference_checkpoint(
    weights_path: str,
    nbre_levels: int = 6,
    depth_type: str = "map",
    sample_hw=(384, 384),
    reference_path: str = None,
) -> Dict[str, Any]:
    """Load released reference weights and port them to flax params.

    ``weights_path`` accepts anything ``keras.Model.load_weights`` does (the
    reference distributes ``latest_ckpt.h5`` / ``cp-XXXX.ckpt``,
    callbacks.py:119-129). The model is built on a 2-frame dummy sequence at
    ``sample_hw`` before restoring, exactly as the reference's predict path
    builds weights before ``load_weights`` (main.py:157-158).
    """
    from m4depth_tpu.interop.tf_ref import (
        DEFAULT_REFERENCE_PATH,
        load_reference,
    )

    ref = load_reference(reference_path or DEFAULT_REFERENCE_PATH)
    from m4depth_tpu.interop.ref_driver import run_reference_window

    model = ref.network.M4Depth(
        depth_type=depth_type, nbre_levels=nbre_levels, is_training=True)
    h, w = sample_hw
    # random (not zero) frames: an all-zero build pass collapses the
    # reference's depth estimate to 0 and its warp coordinates to NaN
    rgb = np.random.RandomState(0).rand(1, 2, h, w, 3).astype(np.float32)
    rot = np.tile(np.array([1.0, 0, 0, 0], np.float32), (1, 2, 1))
    trans = np.tile(np.array([0.0, 0, 0.3], np.float32), (1, 2, 1))
    camera = {"f": np.array([[w * 0.6, h * 0.6]], np.float32),
              "c": np.array([[w * 0.5, h * 0.5]], np.float32)}
    run_reference_window(ref, model, rgb, rot, trans, camera)  # build vars
    # Keras 3 gates save/load_weights on the outer `built` flag, which stays
    # False when sublayers are driven directly (ref_driver cannot call the
    # original fit/predict path, see ref_driver.py). All variables exist at
    # this point, so the flag is safe to set.
    model.built = True
    model.load_weights(weights_path)
    return port_reference_model(model)
