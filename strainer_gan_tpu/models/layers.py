"""Shared layers (components C4-C8 building blocks).

Everything is NHWC — the TPU-native layout — while replicating torch layer
semantics exactly (the reference is built on ``nn.Conv2d`` /
``nn.ConvTranspose2d`` / ``nn.BatchNorm2d``, `#%basic.py:106-182`):

* ``Conv2dTorch``: ``nn.Conv2d(in, out, k, s, p)`` == strided ``lax`` conv.
* ``ConvTranspose2dTorch``: ``nn.ConvTranspose2d`` via the input-dilated conv
  identity ``convT(x, W, s, p) = conv(dilate(x, s), flip(W), pad=k-1-p)``,
  including ``output_padding`` as extra right/bottom padding.
* ``MaskedBatchNorm``: ``nn.BatchNorm2d`` (eps 1e-5, momentum 0.1, biased batch
  var for normalization, unbiased var for the running update) extended with a
  per-sample weight vector so masked/concatenated static-shape batches
  reproduce the reference's variable-size BN statistics (SURVEY §7
  "BatchNorm with masked batches").

Initializers replicate ``weights_init`` (`#%basic.py:93-99`):
conv/convT weights ~ N(0, 0.02); BN scale ~ N(1, 0.02), bias = 0.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

dcgan_conv_init = nn.initializers.normal(stddev=0.02)


def dcgan_bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv2dTorch(nn.Module):
    """NHWC conv matching ``nn.Conv2d(features_in, features, k, stride, pad)``.

    ``kernel_size``/``padding`` accept ints or (h, w) pairs (InceptionV3's
    1x7/7x1 factorized convs need the asymmetric forms)."""

    features: int
    kernel_size: Any = 4
    stride: int = 2
    padding: Any = 1
    use_bias: bool = False
    kernel_init: Any = dcgan_conv_init
    s2d: bool = False  # space-to-depth decomposition for k=4/s=2 (see below)
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features), self.param_dtype
        )
        xc = x.astype(self.compute_dtype)
        kc = kernel.astype(self.compute_dtype)
        if self.s2d and (kh, kw) == (4, 4) and self.stride == 2:
            # stride-2 4x4 conv == 2x2-space-to-depth then a stride-1 2x2
            # conv over 4x the input channels.  Measured on v5e: the FORWARD
            # is ~25% faster than the direct form, but the BACKWARD's
            # depth-to-space relayouts make full training ~2.5x slower —
            # keep this OFF for training; useful for inference-only paths.
            xp = jnp.pad(xc, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
            n, h, w, c = xp.shape
            x4 = (
                xp.reshape(n, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // 2, w // 2, 4 * c)
            )
            k4 = (
                kc.reshape(2, 2, 2, 2, in_ch, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(2, 2, 4 * in_ch, self.features)
            )
            y = jax.lax.conv_general_dilated(
                x4, k4, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                xc, kc,
                window_strides=(self.stride, self.stride),
                padding=[(ph, ph), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.compute_dtype)
        return y


class ConvTranspose2dTorch(nn.Module):
    """NHWC transposed conv matching ``nn.ConvTranspose2d``.

    Implemented as an input-dilated forward conv so XLA lowers it to the same
    MXU convolution path as a regular conv (no gradient-of-conv rewrite
    needed): output size = (in-1)*stride - 2*padding + k + output_padding.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = False
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", dcgan_conv_init, (k, k, in_ch, self.features), self.param_dtype
        )
        flipped = kernel[::-1, ::-1, :, :]
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            flipped.astype(self.compute_dtype),
            window_strides=(1, 1),
            padding=[(lo, hi)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.compute_dtype)
        return y


class MaskedBatchNorm(nn.Module):
    """``nn.BatchNorm1d/2d`` with optional per-sample weights.

    * normalization uses biased batch variance (torch semantics),
    * running stats update uses the unbiased variance (torch semantics),
    * ``sample_weights`` (N,) restricts statistics to the weighted lanes so a
      zero-weighted (masked-out) sample influences neither stats nor, through
      the weighted loss, gradients — equivalent to torch on the shrunk batch.
    """

    use_running_average: bool = False
    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init: Any = dcgan_bn_scale_init
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sample_weights: Optional[jnp.ndarray] = None,
                 use_running_average: Optional[bool] = None):
        # call-time override lets setup()-style modules (Discriminator64's
        # stem/head split) pick train/eval per call instead of per instance
        if use_running_average is None:
            use_running_average = self.use_running_average
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))  # all but channel

        scale = self.param("scale", self.scale_init, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if sample_weights is None:
                n = jnp.float32(1)
                for ax in reduce_axes:
                    n = n * x.shape[ax]
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean((xf - mean) ** 2, axis=reduce_axes)
            else:
                w = sample_weights.astype(jnp.float32)
                wshape = (x.shape[0],) + (1,) * (x.ndim - 1)
                wx = w.reshape(wshape)
                per_sample = x.shape[1:-1]
                spatial = 1
                for s in per_sample:
                    spatial *= s
                n = jnp.maximum(jnp.sum(w) * spatial, 1.0)
                mean = jnp.sum(xf * wx, axis=reduce_axes) / n
                var = jnp.sum(wx * (xf - mean) ** 2, axis=reduce_axes) / n
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        # fold normalization into one fused multiply-add per element:
        # y = x*A + B, with per-channel A/B computed in f32 and the big
        # elementwise pass running in compute_dtype (bf16 on TPU: halves the
        # VPU work vs the sub/mul/mul/add f32 chain)
        a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        b = bias.astype(jnp.float32) - mean * a
        y = x.astype(self.compute_dtype) * a.astype(self.compute_dtype) + b.astype(
            self.compute_dtype
        )
        return y


class DenseTorch(nn.Module):
    """``nn.Linear`` with torch's default Kaiming-uniform init
    (fan_in-based U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias)."""

    features: int
    use_bias: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_features)

        def uniform_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", uniform_init, (in_features, self.features), self.param_dtype
        )
        y = jnp.dot(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=self.compute_dtype,
        )
        if self.use_bias:
            b = self.param("bias", uniform_init, (self.features,), self.param_dtype)
            y = y + b.astype(self.compute_dtype)
        return y


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)
