"""ResNet18/50 feature extractors (component C2 of the strainer stack).

The reference uses torchvision's pretrained ``resnet18`` with ``fc=Identity``
as the z-score feature extractor (`#z_score.py:270-274`), a 1-channel-stem
variant for MNIST (`# 1,2,8.py:141-151`), and ``resnet50`` for the eval
suite's mean-feature distance (`#strainer gan.py:473-486`).

This is a faithful torchvision-architecture implementation in NHWC flax
(BasicBlock / Bottleneck, 7x7 stem, maxpool, stage strides 1/2/2/2, global
average pool -> features).  Weights:

* ``load_torch_resnet_state_dict`` ports a torchvision ``state_dict`` (from a
  user-supplied file — this environment has no network, so "pretrained"
  weights must be provided on disk; see ``try_load_pretrained``).
* otherwise deterministic He-init weights are used.  Feature-space strainers
  only need a *fixed discriminative* embedding, and the parity tests feed the
  same weights to both frameworks, so mask agreement is weight-independent.
"""
from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Conv2dTorch, MaskedBatchNorm


class _ConvBN(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2dTorch(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=False,
            kernel_init=nn.initializers.he_normal(),  # torchvision kaiming
            compute_dtype=self.compute_dtype,
        )(x)
        x = MaskedBatchNorm(
            use_running_average=not train,
            scale_init=nn.initializers.ones,
            compute_dtype=self.compute_dtype,
        )(x)
        return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, 1, self.compute_dtype)(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, 1, self.compute_dtype)(out, train)
        if self.downsample:
            identity = _ConvBN(
                self.features, 1, self.stride, 0, self.compute_dtype
            )(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = features * 4
    stride: int = 1
    downsample: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(_ConvBN(self.features, 1, 1, 0, self.compute_dtype)(x, train))
        out = nn.relu(
            _ConvBN(self.features, 3, self.stride, 1, self.compute_dtype)(out, train)
        )
        out = _ConvBN(self.features * 4, 1, 1, 0, self.compute_dtype)(out, train)
        if self.downsample:
            identity = _ConvBN(
                self.features * 4, 1, self.stride, 0, self.compute_dtype
            )(x, train)
        return nn.relu(out + identity)


def _maxpool_3x3_s2_p1(x):
    """torch MaxPool2d(3, stride=2, padding=1) — pad with -inf, not zeros."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


class ResNetFeatures(nn.Module):
    """Stem + stages + global avg pool -> (N, feat_dim) features."""

    block: str = "basic"  # 'basic' (resnet18) | 'bottleneck' (resnet50)
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    in_channels: int = 3  # 1 for the MNIST variant (`# 1,2,8.py:145`)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        x = _ConvBN(64, 7, 2, 3, self.compute_dtype)(x, train)
        x = nn.relu(x)
        x = _maxpool_3x3_s2_p1(x)
        widths = (64, 128, 256, 512)
        blk = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        for stage, (w, n_blocks) in enumerate(zip(widths, self.stage_sizes)):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                need_ds = i == 0 and (
                    stride != 1 or x.shape[-1] != w * expansion
                )
                x = blk(w, stride, need_ds, self.compute_dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return x.astype(jnp.float32)


def resnet18_features(in_channels: int = 3) -> ResNetFeatures:
    return ResNetFeatures("basic", (2, 2, 2, 2), in_channels)


def resnet50_features(in_channels: int = 3) -> ResNetFeatures:
    return ResNetFeatures("bottleneck", (3, 4, 6, 3), in_channels)


# ---------------------------------------------------------------------------
# weight port (torchvision state_dict -> our param tree)


def torch_name_map(block: str, stage_sizes: Sequence[int]):
    """Explicit (flax ConvBN path, torchvision prefix) pairs, in architecture
    order.  flax auto-names: stem = _ConvBN_0; blocks = {Basic,Bottleneck}
    Block_{k} counted across stages, each containing _ConvBN_0.._ConvBN_{n}
    with the downsample ConvBN last."""
    blk_name = "BasicBlock" if block == "basic" else "Bottleneck"
    n_main = 2 if block == "basic" else 3
    pairs = [(("_ConvBN_0",), ("conv1", "bn1"))]
    k = 0
    expansion = 1 if block == "basic" else 4
    in_ch = 64
    for stage, n_blocks in enumerate(stage_sizes):
        width = 64 * (2**stage)
        for i in range(n_blocks):
            stride = 2 if (stage > 0 and i == 0) else 1
            prefix = f"layer{stage + 1}.{i}"
            scope = f"{blk_name}_{k}"
            for c in range(n_main):
                pairs.append(
                    ((scope, f"_ConvBN_{c}"),
                     (f"{prefix}.conv{c + 1}", f"{prefix}.bn{c + 1}"))
                )
            if i == 0 and (stride != 1 or in_ch != width * expansion):
                pairs.append(
                    ((scope, f"_ConvBN_{n_main}"),
                     (f"{prefix}.downsample.0", f"{prefix}.downsample.1"))
                )
            in_ch = width * expansion
            k += 1
    return pairs


def load_torch_resnet_state_dict(variables, state_dict, block: str = "basic",
                                 stage_sizes: Sequence[int] = (2, 2, 2, 2)):
    """Port a torchvision resnet ``state_dict`` into our variables pytree.

    Uses the explicit architecture name map (no ordering heuristics); returns
    a new ``{"params", "batch_stats"}`` dict with float32 numpy leaves.
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

    for path, (conv_name, bn_name) in torch_name_map(block, stage_sizes):
        p = node(params, path)
        st = node(stats, path)
        w = arr(conv_name + ".weight")  # (out,in,kh,kw)
        p["Conv2dTorch_0"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        p["MaskedBatchNorm_0"]["scale"] = arr(bn_name + ".weight")
        p["MaskedBatchNorm_0"]["bias"] = arr(bn_name + ".bias")
        st["MaskedBatchNorm_0"]["mean"] = arr(bn_name + ".running_mean")
        st["MaskedBatchNorm_0"]["var"] = arr(bn_name + ".running_var")
    return {"params": params, "batch_stats": stats}


def export_torch_resnet_state_dict(variables, block: str = "basic",
                                   stage_sizes: Sequence[int] = (2, 2, 2, 2)):
    """Inverse of ``load_torch_resnet_state_dict``: our variables pytree ->
    a torchvision-named state_dict of float32 numpy arrays.

    Lets parity tests run the REFERENCE's torch-side scoring
    (`#z_score.py:276-294` detect_outliers) on OUR backbone weights — the
    cross-framework golden chain for the feature-space strainers.  BN
    ``num_batches_tracked`` entries are omitted (eval-mode forwards never
    read them); load with ``strict=False`` or into a module without them.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def node(tree, path):
        for part in path:
            tree = tree[part]
        return tree

    out = {}
    for path, (conv_name, bn_name) in torch_name_map(block, stage_sizes):
        p = node(params, path)
        st = node(stats, path)
        k = np.asarray(p["Conv2dTorch_0"]["kernel"], np.float32)  # (kh,kw,in,out)
        out[conv_name + ".weight"] = np.transpose(k, (3, 2, 0, 1))
        out[bn_name + ".weight"] = np.asarray(p["MaskedBatchNorm_0"]["scale"], np.float32)
        out[bn_name + ".bias"] = np.asarray(p["MaskedBatchNorm_0"]["bias"], np.float32)
        out[bn_name + ".running_mean"] = np.asarray(st["MaskedBatchNorm_0"]["mean"], np.float32)
        out[bn_name + ".running_var"] = np.asarray(st["MaskedBatchNorm_0"]["var"], np.float32)
    return out


def try_load_pretrained(name: str):
    """Load a torch state_dict for ``name`` ('resnet18'/'resnet50') from disk
    if the user staged one (STRAINER_WEIGHTS_DIR or ./weights); else None.
    This environment has no network access, so pretrained weights can only
    ever arrive as files."""
    for root in (os.environ.get("STRAINER_WEIGHTS_DIR", ""), "./weights",
                 "/root/data/weights"):
        if not root:
            continue
        p = os.path.join(root, f"{name}.pt")
        if os.path.exists(p):
            import torch

            return torch.load(p, map_location="cpu")
    return None
