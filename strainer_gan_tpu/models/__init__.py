"""Model zoo (components C4-C8) and the config -> module factory."""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from .autoencoder import ConvAutoEncoder, reconstruction_errors  # noqa: F401
from .dcgan import Discriminator64, Generator64  # noqa: F401
from .mlp_gan import MLPDiscriminator, MLPGenerator  # noqa: F401

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
_MODEL_CACHE = {}


def build_models(cfg: ModelConfig):
    """Return (generator, discriminator) linen modules for a config.

    Memoized per config: linen modules are immutable, and sharing instances
    lets jit caches (train steps, scoring passes) hit across Trainer
    instances with equal configs instead of recompiling."""
    if cfg in _MODEL_CACHE:
        return _MODEL_CACHE[cfg]
    pair = _build_models_uncached(cfg)
    _MODEL_CACHE[cfg] = pair
    return pair


def _build_models_uncached(cfg: ModelConfig):
    cd = _DTYPES[cfg.compute_dtype]
    pd = _DTYPES[cfg.param_dtype]
    if cfg.arch == "dcgan64":
        gen = Generator64(nz=cfg.nz, ngf=cfg.ngf, nc=cfg.nc,
                          compute_dtype=cd, param_dtype=pd)
        disc = Discriminator64(ndf=cfg.ndf, nc=cfg.nc,
                               compute_dtype=cd, param_dtype=pd)
    elif cfg.arch == "mlp":
        gen = MLPGenerator(noise_size=cfg.nz, hidden=cfg.hidden,
                           img_size=cfg.img_size, batchnorm=cfg.g_batchnorm,
                           compute_dtype=cd, param_dtype=pd)
        disc = MLPDiscriminator(img_size=cfg.img_size, hidden=cfg.hidden,
                                dropout=cfg.d_dropout,
                                compute_dtype=cd, param_dtype=pd)
    else:
        raise ValueError(f"unknown arch {cfg.arch!r}")
    return gen, disc
