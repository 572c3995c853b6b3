"""Training state (components C9, C25).

One pytree holds both networks' params, BN running stats, Adam states and the
PRNG key — the unit of checkpointing and of data-parallel replication.

Optimizers: Adam with betas (0.5, 0.999) (`#%basic.py:211-216`) or torch
defaults (0.9, 0.999) for the MNIST scripts (`#8.py:103-104`).  The learning
rate is NOT baked into the optax chain: the reference mutates
``param_group['lr']`` mid-training (`# final.py:377-380`), so the step takes
lr as a traced scalar and scales ``scale_by_adam`` updates itself.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ExperimentConfig


@struct.dataclass
class GANState:
    g_params: Any
    g_stats: Any
    g_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    step: jnp.ndarray

    def params_count(self) -> int:
        return sum(p.size for p in jax.tree.leaves((self.g_params, self.d_params)))


def make_optimizer(beta1: float, beta2: float) -> optax.GradientTransformation:
    # eps matches torch Adam (1e-8)
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8)


def create_state(cfg: ExperimentConfig, gen, disc, key: jax.Array) -> GANState:
    kg, kd, kz = jax.random.split(key, 3)
    if cfg.model.arch == "dcgan64":
        dummy_z = jnp.zeros((2, cfg.model.nz), jnp.float32)
        dummy_x = jnp.zeros(
            (2, cfg.data.image_size, cfg.data.image_size, cfg.model.nc), jnp.float32
        )
    else:
        dummy_z = jnp.zeros((2, cfg.model.nz), jnp.float32)
        dummy_x = jnp.zeros((2, cfg.model.img_size), jnp.float32)

    g_vars = gen.init({"params": kg}, dummy_z, train=True)
    d_vars = disc.init({"params": kd, "dropout": kd}, dummy_x, train=True)

    if cfg.train.adam_defaults:
        beta1, beta2 = 0.9, 0.999
    else:
        beta1, beta2 = cfg.train.beta1, cfg.train.beta2
    tx = make_optimizer(beta1, beta2)

    return GANState(
        g_params=g_vars["params"],
        g_stats=g_vars.get("batch_stats", {}),
        g_opt=tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_stats=d_vars.get("batch_stats", {}),
        d_opt=tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
