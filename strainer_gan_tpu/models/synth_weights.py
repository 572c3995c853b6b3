"""Deterministic synthetic torch-layout state_dicts for the backbone ports.

The reference runs its feature-space strainers and FID on *pretrained*
torchvision weights (`#z_score.py:270-274`, `#strainer gan.py:447`), which
cannot be downloaded in this environment.  What CAN be regression-locked is
the weight-port itself: generate a synthetic state_dict whose values are a
pure function of each torchvision parameter name (crc32-seeded numpy), feed
it to a torch-side oracle once (scripts/make_backbone_fixtures.py), commit
the resulting activations as npz fixtures, and have the torch-free test
(tests/test_backbone_fixtures.py) rebuild the SAME state_dict, load it
through ``load_torch_*_state_dict``, and reproduce the fixture activations.
Any drift in the port mapping, conv/BN translation, resize, or FID math then
fails the fixture test without torch installed.

Value distributions are chosen so deep forwards stay well-scaled: conv
kernels are He-normal in fan_in, BN scales sit near 1, running vars in
[0.5, 1.5].
"""
from __future__ import annotations

import zlib

import numpy as np


def synth_value(name: str, shape) -> np.ndarray:
    """Deterministic value for torchvision parameter ``name`` of ``shape``."""
    rng = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFFFFFF)
    shape = tuple(int(s) for s in shape)
    if name.endswith("running_var"):
        v = rng.uniform(0.5, 1.5, shape)
    elif name.endswith("running_mean"):
        v = rng.normal(0.0, 0.1, shape)
    elif name.endswith(".bias"):
        v = rng.normal(0.0, 0.05, shape)
    elif len(shape) == 1:  # BN weight (scale)
        v = rng.normal(1.0, 0.1, shape)
    else:  # conv kernel, torch layout (out, in, kh, kw): He in fan_in
        fan_in = int(np.prod(shape[1:]))
        v = rng.normal(0.0, np.sqrt(2.0 / fan_in), shape)
    return np.asarray(v, np.float32)


def _torch_conv_shape(jax_kernel_shape):
    """flax (kh, kw, in, out) -> torch (out, in, kh, kw)."""
    kh, kw, cin, cout = jax_kernel_shape
    return (cout, cin, kh, kw)


def _node(tree, path):
    for part in path:
        tree = tree[part]
    return tree


def synth_resnet_state_dict(variables, block: str = "basic",
                            stage_sizes=(2, 2, 2, 2)) -> dict:
    """Torchvision-named synthetic state_dict matching ``variables`` shapes."""
    from .resnet import torch_name_map

    out = {}
    for path, (conv_name, bn_name) in torch_name_map(block, stage_sizes):
        p = _node(variables["params"], path)
        kshape = _torch_conv_shape(np.shape(p["Conv2dTorch_0"]["kernel"]))
        n_feat = kshape[0]
        out[conv_name + ".weight"] = synth_value(conv_name + ".weight", kshape)
        out[bn_name + ".weight"] = synth_value(bn_name + ".weight", (n_feat,))
        out[bn_name + ".bias"] = synth_value(bn_name + ".bias", (n_feat,))
        out[bn_name + ".running_mean"] = synth_value(
            bn_name + ".running_mean", (n_feat,)
        )
        out[bn_name + ".running_var"] = synth_value(
            bn_name + ".running_var", (n_feat,)
        )
    return out


def synth_inception_state_dict(variables) -> dict:
    """Torchvision-named synthetic inception_v3 state_dict (trunk only)."""
    from .inception import inception_name_pairs

    out = {}
    for path, tv in inception_name_pairs():
        p = _node(variables["params"], path)
        kshape = _torch_conv_shape(np.shape(p["Conv2dTorch_0"]["kernel"]))
        n_feat = kshape[0]
        out[tv + ".conv.weight"] = synth_value(tv + ".conv.weight", kshape)
        out[tv + ".bn.weight"] = synth_value(tv + ".bn.weight", (n_feat,))
        out[tv + ".bn.bias"] = synth_value(tv + ".bn.bias", (n_feat,))
        out[tv + ".bn.running_mean"] = synth_value(
            tv + ".bn.running_mean", (n_feat,)
        )
        out[tv + ".bn.running_var"] = synth_value(
            tv + ".bn.running_var", (n_feat,)
        )
    return out
