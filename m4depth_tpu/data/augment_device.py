"""On-device (jitted) sequence-consistent augmentation.

The host-numpy augmentations (data/augment.py) cost ~0.25 s per 384^2
window on a small host and bottleneck real-data training (DEVELOPMENT.md
io_bench: 70.8 -> 4.5 windows/s with augmentation on). The reference ran
its augmentations inside the input graph on the accelerator
(dataloaders/generic.py:189-259); this module is the TPU-native
equivalent: a pure jitted batch transform folded into the train step, so
the host pipeline only decodes and the augmentation costs a few hundred
microseconds of device time.

Semantics mirror data/augment.py exactly (the deterministic transform
math is unit-tested against the numpy version given identical draws):

  * one random draw per SEQUENCE (batch element), consistent across the
    [T, h, w, c] frames;
  * color: brightness/contrast/saturation/hue jitter + 0.5-prob inversion
    (parity: dataloaders/generic.py:189-212);
  * geometric (square inputs, non-finetune): vertical/horizontal flips and
    h/w transpose with quaternion/translation/principal-point fixups
    (parity: generic.py:215-259, midair.py:75-89);
  * finetune crop: random crop of the square intermediate to the output
    size with a principal-point shift (parity: midair.py:91-106).

Flips/transposes evaluate both branches and select (data-independent
shapes keep XLA happy); a [b, T, h, w, 3] select costs one elementwise
pass — microseconds at training sizes.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from m4depth_tpu.data.augment import color_param_ranges

Batch = Dict[str, jnp.ndarray]


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """Vectorized RGB->HSV on [..., 3] arrays in [0, 1] (jnp port of
    augment.rgb_to_hsv)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    conds = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    r = g = b = jnp.zeros_like(h)
    for k, (rr, gg, bb) in enumerate(conds):
        m = i == k
        r = jnp.where(m, rr, r)
        g = jnp.where(m, gg, g)
        b = jnp.where(m, bb, b)
    return jnp.stack([r, g, b], axis=-1)


def apply_color(rgb: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """jnp twin of augment.apply_color. rgb [T, h, w, 3]; p holds scalar
    draws (invert is 0/1 float)."""
    out = rgb.astype(jnp.float32)
    out = out + p["brightness"]
    mean = out.mean(axis=(1, 2), keepdims=True)
    out = (out - mean) * p["contrast"] + mean
    hsv = rgb_to_hsv(jnp.clip(out, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * p["saturation"], 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + p["hue"]) % 1.0)
    out = hsv_to_rgb(hsv)
    return jnp.where(p["invert"] > 0.5, 1.0 - out, out)


def sample_color_params(key: jax.Array, finetune: bool,
                        invert_color: bool) -> Dict[str, jnp.ndarray]:
    lo, hi, max_hue = color_param_ranges(finetune)
    kb, kc, ks, kh, ki = jax.random.split(key, 5)
    return {
        "brightness": jax.random.uniform(kb, minval=-0.2, maxval=0.2),
        "contrast": jax.random.uniform(kc, minval=lo, maxval=hi),
        "saturation": jax.random.uniform(ks, minval=lo, maxval=hi),
        "hue": jax.random.uniform(kh, minval=-max_hue, maxval=max_hue),
        "invert": (jax.random.uniform(ki) < 0.5).astype(jnp.float32)
        if invert_color else jnp.float32(0.0),
    }


def _flip_v(seq: Batch) -> Batch:
    h = seq["rgb"].shape[-3]
    return {
        **seq,
        "rgb": seq["rgb"][..., ::-1, :, :],
        "depth": seq["depth"][..., ::-1, :, :],
        "rot": seq["rot"] * jnp.array([1, -1, 1, -1], jnp.float32),
        "trans": seq["trans"] * jnp.array([1, -1, 1], jnp.float32),
        "camera_c": jnp.stack(
            [seq["camera_c"][0], h - seq["camera_c"][1]]),
    }


def _flip_h(seq: Batch) -> Batch:
    w = seq["rgb"].shape[-2]
    return {
        **seq,
        "rgb": seq["rgb"][..., :, ::-1, :],
        "depth": seq["depth"][..., :, ::-1, :],
        "rot": seq["rot"] * jnp.array([1, 1, -1, -1], jnp.float32),
        "trans": seq["trans"] * jnp.array([-1, 1, 1], jnp.float32),
        "camera_c": jnp.stack(
            [w - seq["camera_c"][0], seq["camera_c"][1]]),
    }


def _transpose(seq: Batch) -> Batch:
    q, t = seq["rot"], seq["trans"]
    return {
        **seq,
        "rgb": jnp.swapaxes(seq["rgb"], -3, -2),
        "depth": jnp.swapaxes(seq["depth"], -3, -2),
        "rot": jnp.stack([q[:, 0], -q[:, 2], -q[:, 1], -q[:, 3]], axis=1),
        "trans": jnp.stack([t[:, 1], t[:, 0], t[:, 2]], axis=1),
        "camera_c": seq["camera_c"][::-1],
        "camera_f": seq["camera_f"][::-1],
    }


def _select(flag: jnp.ndarray, a: Batch, b: Batch) -> Batch:
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            flag.reshape((1,) * x.ndim).astype(bool), x, y), a, b)


def _crop(seq: Batch, key: jax.Array, out_size: Tuple[int, int]) -> Batch:
    """Random crop of a square intermediate, principal point shifted.

    Exclusive upper bound on the offset is reference parity
    (midair.py:95,101 samples maxval=diff)."""
    T, h, w, _ = seq["rgb"].shape
    oh, ow = out_size
    if h == oh and w == ow:
        return seq
    if oh >= ow:
        off = jax.random.randint(key, (), 0, max(w - ow, 1))
        oy, ox = jnp.int32(0), off
    else:
        off = jax.random.randint(key, (), 0, max(h - oh, 1))
        oy, ox = off, jnp.int32(0)
    sl = lambda x, c: jax.lax.dynamic_slice(  # noqa: E731
        x, (jnp.int32(0), oy, ox, jnp.int32(0)), (T, oh, ow, c))
    return {
        **seq,
        "rgb": sl(seq["rgb"], 3),
        "depth": sl(seq["depth"], 1),
        "camera_c": jnp.stack([seq["camera_c"][0] - ox,
                               seq["camera_c"][1] - oy]),
    }


def augment_sequence(seq: Batch, key: jax.Array, *, usecase: str,
                     geometric: bool, invert_color: bool,
                     crop_to: Tuple[int, int] = None) -> Batch:
    """Augment ONE sequence ([T, h, w, c] tensors + [T, 4]/[T, 3] motion +
    [2] intrinsics). Mirrors DatasetAdapter.augment_sequence draw-for-draw
    in structure (not in RNG stream — jax PRNG vs numpy)."""
    kv, kh_, kt, kcrop, kcol = jax.random.split(key, 5)
    finetune = usecase == "finetune"
    if geometric and not finetune:
        seq = _select(jax.random.uniform(kv) < 0.5, _flip_v(seq), seq)
        seq = _select(jax.random.uniform(kh_) < 0.5, _flip_h(seq), seq)
        if seq["rgb"].shape[-3] == seq["rgb"].shape[-2]:
            seq = _select(jax.random.uniform(kt) < 0.5, _transpose(seq), seq)
    if crop_to is not None:
        seq = _crop(seq, kcrop, crop_to)
    p = sample_color_params(kcol, finetune, invert_color)
    return {**seq, "rgb": apply_color(seq["rgb"], p)}


def make_batch_augment(*, dataset: str, usecase: str = "train",
                       crop_to: Tuple[int, int] = None):
    """Batched augment: vmap of augment_sequence over the leading batch dim
    with independent per-sequence keys. Matches each adapter's host
    augment_sequence policy (datasets.py): Mid-Air/TartanAir get geometric
    + inverting color; KITTI gets color only, no inversion."""
    geometric = dataset in ("midair", "tartanair")
    invert_color = dataset != "kitti-raw"

    def batch_augment(batch: Batch, key: jax.Array) -> Batch:
        b = batch["rgb"].shape[0]
        keys = jax.random.split(key, b)
        seq_keys = {"rgb", "depth", "rot", "trans", "camera_c", "camera_f"}
        sub = {k: v for k, v in batch.items() if k in seq_keys}
        fn = functools.partial(augment_sequence, usecase=usecase,
                               geometric=geometric,
                               invert_color=invert_color, crop_to=crop_to)
        out = jax.vmap(fn)(sub, keys)
        return {**batch, **out}

    return batch_augment
