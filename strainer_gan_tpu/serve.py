"""Inference/serving path (new capability; the reference has no serving story).

``Sampler`` wraps a trained generator (live state or a checkpoint directory)
behind a jitted, fixed-batch-size sampling function — the deployment-facing
API: stable latency, device-resident params, uint8 NHWC outputs ready for
encoding.

    sampler = Sampler.from_checkpoint("runs/final/ckpt")
    imgs = sampler.sample(64, seed=0)            # (64, 64, 64, 3) uint8
    grid = sampler.sample_grid(64)               # PNG-ready grid array
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig
from .models import build_models
from .obs.images import make_grid


class Sampler:
    def __init__(self, cfg: ExperimentConfig, g_params, g_stats,
                 batch_size: int = 64):
        self.cfg = cfg
        self.gen, _ = build_models(cfg.model)
        self.g_params = g_params
        self.g_stats = g_stats
        self.batch_size = batch_size
        self._jit = jax.jit(self._sample_batch)

    @classmethod
    def from_checkpoint(cls, path: str, epoch: Optional[int] = None,
                        batch_size: int = 64) -> "Sampler":
        import orbax.checkpoint as ocp

        with open(os.path.join(path, "config.json")) as f:
            cfg = ExperimentConfig.from_json(f.read())
        if epoch is None:
            epochs = [int(d.split("_", 1)[1]) for d in os.listdir(path)
                      if d.startswith("epoch_")]
            epoch = max(epochs)
        with ocp.StandardCheckpointer() as ckptr:
            # restore untyped (nested dicts) — serving only needs G's subtree
            payload = ckptr.restore(os.path.join(path, f"epoch_{epoch}"))
        st = payload["state"]
        return cls(cfg, st["g_params"], st["g_stats"], batch_size)

    def _sample_batch(self, key):
        z = jax.random.normal(key, (self.batch_size, self.cfg.model.nz))
        imgs = self.gen.apply(
            {"params": self.g_params, "batch_stats": self.g_stats}, z,
            train=False,
        ).astype(jnp.float32)
        if imgs.ndim == 2:  # MLP path: (N, H*W*C) -> image
            s = self.cfg.data.image_size
            imgs = imgs.reshape(-1, s, s, self.cfg.model.nc)
        # [-1, 1] -> uint8
        return jnp.clip((imgs + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    def sample(self, n: int, seed: int = 0) -> np.ndarray:
        """n uint8 NHWC images (batched through the jitted path)."""
        outs = []
        key = jax.random.PRNGKey(seed)
        for i in range(-(-n // self.batch_size)):
            outs.append(np.asarray(self._jit(jax.random.fold_in(key, i))))
        return np.concatenate(outs)[:n]

    def sample_grid(self, n: int = 64, seed: int = 0, nrow: int = 8) -> np.ndarray:
        imgs = self.sample(n, seed).astype(np.float32) / 255.0
        return make_grid(imgs, nrow=nrow, normalize=False)
