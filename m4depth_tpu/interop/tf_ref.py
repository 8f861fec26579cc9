"""Loader for the TensorFlow reference implementation.

The reference (michael-fonder/M4Depth) is a flat script repo, not an
installable package; this module puts its checkout on ``sys.path`` and
imports the modules needed for golden-parity testing and weight porting.
TensorFlow is forced onto CPU so the reference never contends with the TPU.
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace
from typing import Optional

DEFAULT_REFERENCE_PATH = os.environ.get(
    "M4DEPTH_REFERENCE_PATH", "/root/reference")

_cache: Optional[SimpleNamespace] = None
_cache_key = None


def reference_available(path: str = DEFAULT_REFERENCE_PATH) -> bool:
    """True when the reference checkout (and TensorFlow) are importable."""
    if not os.path.isfile(os.path.join(path, "m4depth_network.py")):
        return False
    try:
        import tensorflow  # noqa: F401
    except ImportError:
        return False
    return True


def load_reference(path: str = DEFAULT_REFERENCE_PATH,
                   eager: bool = True) -> SimpleNamespace:
    """Import the reference modules; returns a namespace with
    ``tf, network, depth_ops, warp, metrics``.

    ``eager=True`` runs the reference's ``tf.function``s eagerly — required
    for its python-bool trajectory-reset conditionals
    (m4depth_network.py:206-214) when driving the model directly with numpy
    inputs, and harmless for op-level goldens.
    """
    global _cache, _cache_key
    if _cache is not None:
        if _cache_key != (path, eager):
            raise RuntimeError(
                "load_reference was already initialized with "
                f"{_cache_key}; cannot reload with {(path, eager)} in the "
                "same process (TF module state is global)")
        return _cache

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    if eager:
        tf.config.run_functions_eagerly(True)

    if path not in sys.path:
        sys.path.insert(0, path)
    import importlib

    network = importlib.import_module("m4depth_network")
    ref_metrics = importlib.import_module("metrics")
    depth_ops = importlib.import_module("utils.depth_operations")
    warp_module = importlib.import_module("utils.dense_image_warp")

    # The vendored warp (a TF-1.x-era copy) references TF-internal aliases
    # that no longer exist in modern TF (array_ops.stack/unstack). Shim them
    # inside the reference module's namespace only — the public tf.* ops have
    # identical semantics.
    real_array_ops = warp_module.array_ops

    class _ArrayOpsShim:
        def __getattr__(self, name):
            if hasattr(real_array_ops, name):
                return getattr(real_array_ops, name)
            return getattr(tf, name)  # e.g. stack/unstack removed in TF>=2.16

    warp_module.array_ops = _ArrayOpsShim()

    # Keras 3 compat shims for the 2022-era reference layers:
    #  * ``add_weight`` lost the ``use_resource`` kwarg
    #    (m4depth_network.py:160-163 passes it);
    #  * ``build`` now receives a plain tuple, but the reference concatenates
    #    ``input_shapes[:3] + [1]`` (list semantics).
    level_cls = network.DepthEstimatorLevel
    orig_add_weight = level_cls.add_weight
    orig_build = level_cls.build

    def add_weight(self, *args, **kwargs):
        kwargs.pop("use_resource", None)
        return orig_add_weight(self, *args, **kwargs)

    def build(self, input_shapes):
        return orig_build(self, list(input_shapes))

    level_cls.add_weight = add_weight
    level_cls.build = build

    # Keras 3 variables don't expose ``get_shape``; the reference's eval path
    # feeds its state variables straight into geometry ops that call it
    # (m4depth_network.py:191-194 -> depth_operations.py:198,228). Tensorize
    # variable arguments at those entry points.
    def _tensorized(fn):
        def wrapped(*args, **kwargs):
            args = tuple(
                tf.convert_to_tensor(a)
                if hasattr(a, "assign") and not hasattr(a, "get_shape")
                else a
                for a in args)
            return fn(*args, **kwargs)

        return wrapped

    for fname in ("prev_d2para", "get_parallax_sweeping_cv", "cost_volume"):
        patched = _tensorized(getattr(depth_ops, fname))
        setattr(depth_ops, fname, patched)
        setattr(network, fname, patched)  # star-imported copy

    _cache_key = (path, eager)
    _cache = SimpleNamespace(
        tf=tf,
        network=network,
        depth_ops=depth_ops,
        warp=warp_module,
        metrics=ref_metrics,
    )
    return _cache
