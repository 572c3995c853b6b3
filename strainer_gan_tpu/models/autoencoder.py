"""Convolutional AutoEncoder strainer backbone (component C7).

Architecture parity with `#autoencoder.py:269-291`:
encoder Conv(3,16,3,s2,p1) - ReLU - Conv(16,32,3,s2,p1) - ReLU - Conv(32,64,7)
decoder ConvT(64,32,7) - ReLU - ConvT(32,16,3,s2,p1,op1) - ReLU -
        ConvT(16,3,3,s2,p1,op1) - Tanh
Input 64x64 -> latent 64x10x10 -> output 64x64 (NHWC here).
Trained with MSE; per-sample reconstruction error feeds the mean+2*sigma
strainer (`#autoencoder.py:307-322`).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2dTorch, ConvTranspose2dTorch


class ConvAutoEncoder(nn.Module):
    nc: int = 3
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        x = x.astype(self.compute_dtype)
        x = nn.relu(Conv2dTorch(16, 3, 2, 1, use_bias=True, **dt)(x))
        x = nn.relu(Conv2dTorch(32, 3, 2, 1, use_bias=True, **dt)(x))
        x = Conv2dTorch(64, 7, 1, 0, use_bias=True, **dt)(x)
        x = nn.relu(ConvTranspose2dTorch(32, 7, 1, 0, use_bias=True, **dt)(x))
        x = nn.relu(
            ConvTranspose2dTorch(16, 3, 2, 1, output_padding=1, use_bias=True, **dt)(x)
        )
        x = ConvTranspose2dTorch(self.nc, 3, 2, 1, output_padding=1, use_bias=True, **dt)(x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.compute_dtype)


def reconstruction_errors(recon: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean MSE (`#autoencoder.py:315`): (N,H,W,C) -> (N,)."""
    diff = (recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2
    return jnp.mean(diff.reshape(diff.shape[0], -1), axis=1)
