"""Feature-extractor registry: config name -> jitted apply fn.

Wraps the ResNet/Inception backbones as fixed eval-mode embeddings for the
strainers (`#z_score.py:270-274` resnet18; `# 1,2,8.py:141-151` 1-channel
resnet18; `#strainer gan.py:474-486` resnet50; FID inception).  Weights load
from a staged torchvision state_dict when available (no network in this
environment), else deterministic init — see models.resnet docstring for why
mask parity is weight-independent.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .inception import InceptionV3Features, load_torch_inception_state_dict
from .resnet import (
    load_torch_resnet_state_dict,
    resnet18_features,
    resnet50_features,
    try_load_pretrained,
)

_cache = {}
_wrapper_cache = {}


def _build(name: str, in_channels: int, seed: int = 0,
           compute_dtype: str = "float32"):
    key = (name, in_channels, compute_dtype)
    if key in _cache:
        return _cache[key]
    dt = jnp.dtype(compute_dtype)
    if name.startswith("resnet18"):
        model = resnet18_features(in_channels).clone(compute_dtype=dt)
        block, stages, sd_name = "basic", (2, 2, 2, 2), "resnet18"
    elif name.startswith("resnet50"):
        model = resnet50_features(in_channels).clone(compute_dtype=dt)
        block, stages, sd_name = "bottleneck", (3, 4, 6, 3), "resnet50"
    elif name == "inception_v3":
        model = InceptionV3Features(compute_dtype=dt)
        block = stages = sd_name = None
    else:
        raise ValueError(f"unknown feature extractor {name!r}")

    k = jax.random.PRNGKey(seed)
    size = 299 if name == "inception_v3" else 64
    dummy = jnp.zeros((1, size, size, in_channels), jnp.float32)
    variables = model.init({"params": k}, dummy)

    if name == "inception_v3":
        sd = try_load_pretrained("inception_v3")
        if sd is not None:
            variables = load_torch_inception_state_dict(variables, sd)
    else:
        sd = try_load_pretrained(sd_name)
        if sd is not None and in_channels == 3:
            variables = load_torch_resnet_state_dict(variables, sd, block, stages)

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False) if name != "inception_v3" \
            else model.apply(variables, x)

    _cache[key] = apply_fn
    return apply_fn


def build_feature_fn(name: str, channels: int = 3,
                     flatten_input_hw: Optional[tuple] = None,
                     compute_dtype: str = "float32") -> Callable:
    """Return ``f(batch_images_normalized) -> (N, D) features``.

    ``flatten_input_hw``: reshape (N, H*W*C) MLP-path batches back to images
    (the MNIST pipeline scores images, `# 1,2,8.py:158-161`).

    ``compute_dtype``: conv/BN compute precision.  Feature-space strain
    DECISIONS stay on the default f32 (the mask-parity invariant —
    docs/PARITY.md); "bfloat16" is the eval-throughput option for metric
    pipelines that tolerate ~1e-2 relative feature drift (EvalConfig
    selects it explicitly, never the strainers).
    """
    in_ch = 1 if name.endswith("_1ch") else channels
    wkey = (name, in_ch, flatten_input_hw, compute_dtype)
    if wkey in _wrapper_cache:  # stable identity: callers key caches on id()
        return _wrapper_cache[wkey]
    fn = _build(name, in_ch, compute_dtype=compute_dtype)

    def f(x):
        if flatten_input_hw is not None and x.ndim == 2:
            h, w = flatten_input_hw
            x = x.reshape(x.shape[0], h, w, in_ch)
        return fn(x)

    _wrapper_cache[wkey] = f
    return f
