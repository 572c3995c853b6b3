"""InceptionV3 pool-2048 feature extractor (component C22's backbone).

The reference computes FID activations with torchvision's
``inception_v3(pretrained=True, transform_input=False)`` with ``fc`` replaced
by Identity (`#strainer gan.py:447-449`, `Untitled-5.py:378-410`,
`# 1,2,8.py:259-260`), feeding 299x299 bilinear-resized images.

This is the same architecture in NHWC flax (BasicConv2d = bias-free conv +
BN(eps=1e-3) + ReLU; Inception A/B/C/D/E mixed blocks; global average pool
-> 2048 features).  Aux classifier and fc are omitted — only the pooled
features are ever used.  Weights: deterministic init, or a torchvision
state_dict ported via ``load_torch_inception_state_dict``; as with the
resnets, FID comparisons are performed with a *fixed* embedding shared by
both sides, so relative FID orderings are weight-consistent.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Conv2dTorch, MaskedBatchNorm


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 0
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2dTorch(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            compute_dtype=self.compute_dtype,
        )(x)
        x = MaskedBatchNorm(
            use_running_average=True, epsilon=1e-3,
            scale_init=nn.initializers.ones, compute_dtype=self.compute_dtype,
        )(x)
        return nn.relu(x)


def _maxpool(x, k=3, s=2):
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _avgpool_3x3_s1_p1(x):
    # torch F.avg_pool2d(x, 3, 1, 1) with count_include_pad=True
    s = jax.lax.reduce_window(
        x, jnp.asarray(0, x.dtype), jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / jnp.asarray(9, x.dtype)


class InceptionA(nn.Module):
    pool_features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        b1 = BasicConv2d(64, 1, compute_dtype=dt)(x)
        b5 = BasicConv2d(48, 1, compute_dtype=dt)(x)
        b5 = BasicConv2d(64, 5, padding=2, compute_dtype=dt)(b5)
        b3 = BasicConv2d(64, 1, compute_dtype=dt)(x)
        b3 = BasicConv2d(96, 3, padding=1, compute_dtype=dt)(b3)
        b3 = BasicConv2d(96, 3, padding=1, compute_dtype=dt)(b3)
        bp = BasicConv2d(self.pool_features, 1, compute_dtype=dt)(_avgpool_3x3_s1_p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        b3 = BasicConv2d(384, 3, stride=2, compute_dtype=dt)(x)
        bd = BasicConv2d(64, 1, compute_dtype=dt)(x)
        bd = BasicConv2d(96, 3, padding=1, compute_dtype=dt)(bd)
        bd = BasicConv2d(96, 3, stride=2, compute_dtype=dt)(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, 1, compute_dtype=dt)(x)
        b7 = BasicConv2d(c7, 1, compute_dtype=dt)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), compute_dtype=dt)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), compute_dtype=dt)(b7)
        bd = BasicConv2d(c7, 1, compute_dtype=dt)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), compute_dtype=dt)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), compute_dtype=dt)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), compute_dtype=dt)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), compute_dtype=dt)(bd)
        bp = BasicConv2d(192, 1, compute_dtype=dt)(_avgpool_3x3_s1_p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        b3 = BasicConv2d(192, 1, compute_dtype=dt)(x)
        b3 = BasicConv2d(320, 3, stride=2, compute_dtype=dt)(b3)
        b7 = BasicConv2d(192, 1, compute_dtype=dt)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), compute_dtype=dt)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), compute_dtype=dt)(b7)
        b7 = BasicConv2d(192, 3, stride=2, compute_dtype=dt)(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


class InceptionE(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        b1 = BasicConv2d(320, 1, compute_dtype=dt)(x)
        b3 = BasicConv2d(384, 1, compute_dtype=dt)(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), compute_dtype=dt)(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), compute_dtype=dt)(b3),
        ], axis=-1)
        bd = BasicConv2d(448, 1, compute_dtype=dt)(x)
        bd = BasicConv2d(384, 3, padding=1, compute_dtype=dt)(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), compute_dtype=dt)(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), compute_dtype=dt)(bd),
        ], axis=-1)
        bp = BasicConv2d(192, 1, compute_dtype=dt)(_avgpool_3x3_s1_p1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(N, 299, 299, 3) in [-1, 1]-ish -> (N, 2048) pooled features."""

    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        x = x.astype(dt)
        x = BasicConv2d(32, 3, stride=2, compute_dtype=dt)(x)   # Conv2d_1a
        x = BasicConv2d(32, 3, compute_dtype=dt)(x)             # Conv2d_2a
        x = BasicConv2d(64, 3, padding=1, compute_dtype=dt)(x)  # Conv2d_2b
        x = _maxpool(x)
        x = BasicConv2d(80, 1, compute_dtype=dt)(x)             # Conv2d_3b
        x = BasicConv2d(192, 3, compute_dtype=dt)(x)            # Conv2d_4a
        x = _maxpool(x)
        x = InceptionA(32, dt)(x)   # Mixed_5b
        x = InceptionA(64, dt)(x)   # Mixed_5c
        x = InceptionA(64, dt)(x)   # Mixed_5d
        x = InceptionB(dt)(x)       # Mixed_6a
        x = InceptionC(128, dt)(x)  # Mixed_6b
        x = InceptionC(160, dt)(x)  # Mixed_6c
        x = InceptionC(160, dt)(x)  # Mixed_6d
        x = InceptionC(192, dt)(x)  # Mixed_6e
        x = InceptionD(dt)(x)       # Mixed_7a
        x = InceptionE(dt)(x)       # Mixed_7b
        x = InceptionE(dt)(x)       # Mixed_7c
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool
        return x.astype(jnp.float32)


def resize_bilinear_299(images: jnp.ndarray) -> jnp.ndarray:
    """``F.interpolate(images, (299, 299), mode='bilinear',
    align_corners=False)`` (`#strainer gan.py:465-466`) on NHWC batches —
    jax.image 'linear' with half-pixel centers matches torch's
    align_corners=False convention."""
    n, _, _, c = images.shape
    return jax.image.resize(images, (n, 299, 299, c), method="linear")


def inception_name_pairs():
    """Ordered (flax scope path, torchvision module prefix) pairs for every
    BasicConv2d unit — shared by the state_dict port and the synthetic-weight
    fixture generator (models/synth_weights.py)."""
    tv_units = []  # ordered (conv_key_prefix)
    def unit(p):
        tv_units.append(p)

    for p in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
              "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        unit(p)
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        for b in ("branch1x1", "branch5x5_1", "branch5x5_2",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                  "branch_pool"):
            unit(f"{m}.{b}")
    for b in ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
              "branch3x3dbl_3"):
        unit(f"Mixed_6a.{b}")
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        for b in ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"):
            unit(f"{m}.{b}")
    for b in ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
              "branch7x7x3_3", "branch7x7x3_4"):
        unit(f"Mixed_7a.{b}")
    for m in ("Mixed_7b", "Mixed_7c"):
        for b in ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool"):
            unit(f"{m}.{b}")

    # our flax scopes in the same order
    ours = [(f"BasicConv2d_{i}",) for i in range(5)]
    blocks = (
        [("InceptionA_0", 7), ("InceptionA_1", 7), ("InceptionA_2", 7),
         ("InceptionB_0", 4),
         ("InceptionC_0", 10), ("InceptionC_1", 10), ("InceptionC_2", 10),
         ("InceptionC_3", 10), ("InceptionD_0", 6),
         ("InceptionE_0", 9), ("InceptionE_1", 9)]
    )
    for scope, n in blocks:
        ours += [(scope, f"BasicConv2d_{i}") for i in range(n)]
    assert len(ours) == len(tv_units), (len(ours), len(tv_units))
    return list(zip(ours, tv_units))


def load_torch_inception_state_dict(variables, state_dict):
    """Port torchvision ``inception_v3`` weights (aux/fc ignored).

    torchvision module paths (Conv2d_1a_3x3, ..., Mixed_7c.branch...) are
    matched to our flax scopes by architecture order within each block; both
    sides declare branches in the same sequence, so the per-block zip of
    BasicConv2d units is exact.
    """
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))

    def node(tree, path):
        for part in path:
            tree = tree[part]
        return tree

    def arr(key):
        v = state_dict[key]
        return np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    for path, tv in inception_name_pairs():
        p = node(params, path)
        st = node(stats, path)
        w = arr(tv + ".conv.weight")
        p["Conv2dTorch_0"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        p["MaskedBatchNorm_0"]["scale"] = arr(tv + ".bn.weight")
        p["MaskedBatchNorm_0"]["bias"] = arr(tv + ".bn.bias")
        st["MaskedBatchNorm_0"]["mean"] = arr(tv + ".bn.running_mean")
        st["MaskedBatchNorm_0"]["var"] = arr(tv + ".bn.running_var")
    return {"params": params, "batch_stats": stats}
