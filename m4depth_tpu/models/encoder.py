"""Feature pyramid encoder.

Parity reference: ``FeaturePyramid`` + ``DomainNormalization``
(m4depth_network.py:24-90). Six levels; each level is a stride-1 3x3 conv
(with domain-invariant normalization at level 0), leaky-relu(0.1), then a
stride-2 3x3 conv + leaky-relu. Channels (16, 32, 64, 96, 128, 192). Output i
has stride 2**(i+1).

TPU notes: NHWC layout, HeNormal init, params fp32, compute dtype
configurable (bf16 recommended on TPU — conv FLOPs ride the MXU). Modules use
``setup`` (not ``nn.compact``) because they are invoked once per frame of a
sequence within a single apply.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from m4depth_tpu.config import ModelConfig


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x > 0, x, x * jnp.asarray(slope, x.dtype))


class DomainNorm(nn.Module):
    """Domain-invariant normalization (after Zhang et al., DSMNet).

    Spatially standardize each channel (note: the reference divides by the
    *variance*, not the std — kept for parity, m4depth_network.py:44-48),
    L2-normalize along channels (eps 1e-12, as tf.math.l2_normalize), then
    apply a learned scale and bias.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (1, 1, 1, self.features), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (1, 1, 1, self.features), jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # reductions accumulate in f32 (the converts fuse into the reduces);
        # the large elementwise tensors stay in the compute dtype — at bf16
        # this avoids materializing two f32 copies of the level-0 map
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        inv = (1.0 / (var + 1e-12)).astype(x.dtype)
        standardized = (x - mean.astype(x.dtype)) * inv
        sq = jnp.sum(
            jnp.square(standardized.astype(jnp.float32)),
            axis=-1, keepdims=True)
        normed = standardized * jax.lax.rsqrt(
            jnp.maximum(sq, 1e-12)).astype(x.dtype)
        return (self.scale.astype(x.dtype) * normed
                + self.bias.astype(x.dtype)).astype(self.dtype)


class FirstConv(nn.Module):
    """3x3 stride-1 conv on the 3-channel input, as shifts + 1x1 matmul.

    A direct conv with C_in=3 lane-starves the TPU (XLA pads 3 -> 8/128
    lanes and inserts an im2col relayout, ~170 us at 384^2). Concatenating
    the 9 static shifts (27 channels) and contracting with the SAME [3,3,3,C]
    kernel reshaped to [27, C] is mathematically identical (zero 'SAME'
    padding == zero-filled shifts), keeps the checkpoint layout, and rides
    the MXU as one matmul.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    stride: int = 1

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (3, 3, 3, self.features), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cin = x.shape
        s = self.stride

        def same_pad(n):
            # TF-style 'SAME': out = ceil(n/s), pad split before/after
            out = -(-n // s)
            total = max(0, (out - 1) * s + 3 - n)
            return out, (total // 2, total - total // 2)

        ho, (pt, pb) = same_pad(h)
        wo, (pl, pr) = same_pad(w)
        pad = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        shifts = jnp.concatenate(
            [pad[:, dy:dy + s * (ho - 1) + 1:s, dx:dx + s * (wo - 1) + 1:s, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        k = self.kernel.reshape(9 * cin, self.features).astype(self.dtype)
        out = jax.lax.dot_general(
            shifts.astype(self.dtype), k, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (out + self.bias).astype(self.dtype)


class Encoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        init = nn.initializers.he_normal()
        self.convs_s1 = [
            (FirstConv(ch, dtype=dtype, name=f"conv_s1_{i}") if i == 0 else
             nn.Conv(ch, (3, 3), strides=(1, 1), padding="SAME",
                     kernel_init=init, dtype=dtype, name=f"conv_s1_{i}"))
            for i, ch in enumerate(self.cfg.channels)
        ]
        self.convs_s2 = [
            nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=init, dtype=dtype, name=f"conv_s2_{i}")
            for i, ch in enumerate(self.cfg.channels)
        ]
        if self.cfg.ablation.dinl:
            self.dinl = DomainNorm(self.cfg.channels[0], dtype=dtype, name="dinl")

    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        """images: [b, h, w, 3] in [0, 1] -> list of per-level feature maps."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = images.astype(dtype)
        outputs = []
        for i, (conv_s1, conv_s2) in enumerate(zip(self.convs_s1, self.convs_s2)):
            x = conv_s1(x)
            if self.cfg.ablation.dinl and i == 0:
                x = self.dinl(x)
            x = leaky_relu(x, self.cfg.leaky_slope)
            x = conv_s2(x)
            x = leaky_relu(x, self.cfg.leaky_slope)
            outputs.append(x)
        return outputs
