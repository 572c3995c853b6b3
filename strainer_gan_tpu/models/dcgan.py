"""DCGAN 64x64 generator/discriminator (components C4, C5).

Architecture parity with the reference (`#%basic.py:106-134` generator,
`#%basic.py:156-182` discriminator): same channel widths (ngf/ndf=64), kernel
4, bias-free convs, BatchNorm placement, ReLU / LeakyReLU(0.2), Tanh output.

TPU-first differences from the torch original:
* NHWC layout end-to-end (TPU-native; torch is NCHW),
* bfloat16 compute with float32 params/BN stats,
* the discriminator returns **logits**; sigmoid+BCE is fused into the loss
  (`strainer_gan_tpu.ops.losses.bce_from_logits`) for numerical stability and
  XLA fusion — mathematically identical to the reference's Sigmoid+BCELoss,
* every BatchNorm accepts per-sample weights so masked/concatenated
  static-shape batches reproduce variable-size reference batch statistics.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Conv2dTorch,
    ConvTranspose2dTorch,
    MaskedBatchNorm,
    leaky_relu,
)


class Generator64(nn.Module):
    """z (N, nz) -> image (N, 64, 64, nc) in [-1, 1]."""

    nz: int = 100
    ngf: int = 64
    nc: int = 3
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True, sample_weights=None):
        dt = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        g = self.ngf
        x = z.reshape(z.shape[0], 1, 1, self.nz).astype(self.compute_dtype)
        # (1,1,nz) -> (4,4,8g): ConvT(nz, ngf*8, 4, 1, 0)
        for features, stride, pad in (
            (g * 8, 1, 0), (g * 4, 2, 1), (g * 2, 2, 1), (g, 2, 1),
        ):
            x = ConvTranspose2dTorch(
                features, 4, stride, pad, use_bias=False, **dt
            )(x)
            x = MaskedBatchNorm(use_running_average=not train, **dt)(
                x, sample_weights
            )
            x = nn.relu(x)
        x = ConvTranspose2dTorch(self.nc, 4, 2, 1, use_bias=False, **dt)(x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.compute_dtype)


class Discriminator64(nn.Module):
    """image (N, 64, 64, nc) -> logits (N,).  Sigmoid lives in the loss.

    ``s2d``: space-to-depth conv decomposition — forward-only win on v5e
    (~25% faster), used by the strain scoring passes; training keeps the
    direct form (see models.layers.Conv2dTorch).

    The network is split into ``stem`` (conv0 -> LeakyReLU -> conv1, the
    prefix with NO batch norm) and ``head`` (BN -> ... -> logits).  Because
    convs are per-sample and BatchNorm only starts in the head, the stem
    output is identical between the in-step strain *scoring* forward
    (unweighted batch stats) and the *training* real forward (masked batch
    stats) — the fused train step computes it once and shares it between
    both (train/steps.py), saving ~35% of one D forward per masked step.
    Attribute names replicate the former ``nn.compact`` auto-names so the
    parameter tree (checkpoints, torch ports, parity tests) is unchanged.
    """

    ndf: int = 64
    nc: int = 3
    s2d: bool = False
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        dt = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        d = self.ndf
        self.Conv2dTorch_0 = Conv2dTorch(d, 4, 2, 1, use_bias=False,
                                         s2d=self.s2d, **dt)
        self.Conv2dTorch_1 = Conv2dTorch(d * 2, 4, 2, 1, use_bias=False,
                                         s2d=self.s2d, **dt)
        self.Conv2dTorch_2 = Conv2dTorch(d * 4, 4, 2, 1, use_bias=False,
                                         s2d=self.s2d, **dt)
        self.Conv2dTorch_3 = Conv2dTorch(d * 8, 4, 2, 1, use_bias=False,
                                         s2d=self.s2d, **dt)
        self.Conv2dTorch_4 = Conv2dTorch(1, 4, 1, 0, use_bias=False, **dt)
        self.MaskedBatchNorm_0 = MaskedBatchNorm(**dt)
        self.MaskedBatchNorm_1 = MaskedBatchNorm(**dt)
        self.MaskedBatchNorm_2 = MaskedBatchNorm(**dt)

    def stem(self, x):
        """conv0 -> LeakyReLU -> conv1 (raw, pre-BN): mask-independent."""
        x = x.astype(self.compute_dtype)
        x = self.Conv2dTorch_0(x)
        x = leaky_relu(x)
        return self.Conv2dTorch_1(x)

    def head(self, h, train: bool = True, sample_weights=None):
        ura = not train
        x = self.MaskedBatchNorm_0(h, sample_weights, use_running_average=ura)
        x = leaky_relu(x)
        x = self.Conv2dTorch_2(x)
        x = self.MaskedBatchNorm_1(x, sample_weights, use_running_average=ura)
        x = leaky_relu(x)
        x = self.Conv2dTorch_3(x)
        x = self.MaskedBatchNorm_2(x, sample_weights, use_running_average=ura)
        x = leaky_relu(x)
        x = self.Conv2dTorch_4(x)  # (N,1,1,1)
        return x.reshape(x.shape[0]).astype(jnp.float32)

    def __call__(self, x, train: bool = True, sample_weights=None):
        return self.head(self.stem(x), train, sample_weights)
