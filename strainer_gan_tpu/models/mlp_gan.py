"""MNIST MLP GAN (component C6).

Two variants, matching the reference family:
* plain (`#8.py:62-95`): G 100-256-512-1024-784 ReLU/Tanh;
  D 784-1024-512-256-1 LeakyReLU(0.2) (+ sigmoid folded into the loss).
* full-pipeline (`# 1,2,8.py:90-128`): G uses LeakyReLU(0.2)+BatchNorm1d after
  each hidden Linear; D adds Dropout(0.3) after each hidden activation.

Layouts are already MXU-shaped (pure matmuls); Linear init matches torch's
default Kaiming-uniform so fixed-seed runs are comparable.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import DenseTorch, MaskedBatchNorm, leaky_relu


class MLPGenerator(nn.Module):
    noise_size: int = 100
    hidden: Tuple[int, ...] = (256, 512, 1024)
    img_size: int = 784
    batchnorm: bool = False  # `# 1,2,8.py:90-108`
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True, sample_weights=None):
        dt = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        x = z.astype(self.compute_dtype)
        for h in self.hidden:
            x = DenseTorch(h, **dt)(x)
            if self.batchnorm:
                # `# 1,2,8.py`: LeakyReLU *then* BatchNorm1d (that ordering)
                x = leaky_relu(x)
                x = MaskedBatchNorm(
                    use_running_average=not train,
                    scale_init=nn.initializers.ones,
                    **dt,
                )(x, sample_weights)
            else:
                x = nn.relu(x)
        x = DenseTorch(self.img_size, **dt)(x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.compute_dtype)


class MLPDiscriminator(nn.Module):
    img_size: int = 784
    hidden: Tuple[int, ...] = (256, 512, 1024)  # used reversed, like reference
    dropout: float = 0.0  # `# 1,2,8.py:110-128` uses 0.3
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, sample_weights=None):
        dt = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        x = x.reshape(x.shape[0], -1).astype(self.compute_dtype)
        for h in reversed(self.hidden):
            x = DenseTorch(h, **dt)(x)
            x = leaky_relu(x)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = DenseTorch(1, **dt)(x)
        return x.reshape(x.shape[0]).astype(jnp.float32)
