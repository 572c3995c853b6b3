"""Checkpoint/resume (component C26 — new capability, absent in reference).

The reference never saves models (SURVEY §5: no torch.save anywhere); this is
a required subsystem for production use.  Orbax persists the full GANState
(both nets' params, BN stats, Adam states), the strainer's masks, the PRNG
key, and the config JSON — enough to resume mid-run with identical behavior.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp



def save_checkpoint(path: str, trainer, epoch: int) -> str:
    """Save trainer state at an epoch boundary; returns the directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        payload = dict(
            state=trainer.state,
            active=trainer.engine.active,
            base_active=trainer.engine.base_active,
            key=trainer.key,
            epoch=jnp.asarray(epoch),
        )
        if trainer.pool is not None:
            payload["pool"] = trainer.pool
        if trainer.engine.ae_params is not None:
            # the AE strainer trains its net once at ae_train_epoch
            # (`#autoencoder.py:296-305`); resuming past that epoch without
            # these params would silently disable straining forever.
            payload["ae_params"] = trainer.engine.ae_params
        if trainer.engine.last_mask is not None:
            # the last strain decision mask: one-shot strainers (zscore preset,
            # strain once at epoch 3 `#z_score.py:309-321`) never re-strain, so
            # a resume that lost this mask would let the epoch sampler take its
            # all-active fast path and train on strained-out samples.
            payload["last_mask"] = trainer.engine.last_mask
        if trainer.engine.last_scores is not None:
            # the decision's evidence travels with the decision: without it a
            # resumed `--parity-check` (or score histogram) would pair the
            # restored mask with whatever scores the fresh trainer last
            # computed — e.g. the prefilter pass at setup() — and report a
            # meaningless agreement number.
            payload["last_scores"] = trainer.engine.last_scores
        ckptr.save(os.path.join(path, f"epoch_{epoch}"), payload, force=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(trainer.cfg.to_json())
    meta = dict(
        epoch=epoch,
        d_bn_eval=trainer.engine.d_bn_eval,
        iters=trainer._iters,
        has_ae=trainer.engine.ae_params is not None,
        has_last_mask=trainer.engine.last_mask is not None,
        has_last_scores=trainer.engine.last_scores is not None,
        last_threshold=(
            None if trainer.engine.last_threshold is None
            else float(trainer.engine.last_threshold)
        ),
        band_cooloff=trainer.engine.band_cooloff,
    )
    # Per-epoch state (iters, strain-evidence flags, band_cooloff) must travel
    # with its epoch: a single latest-wins meta.json would pair an explicitly
    # restored earlier epoch's payload with the LAST save's metadata — e.g. a
    # has_last_scores template key the earlier payload lacks (orbax restore
    # failure) or a silently mismatched last_threshold.
    with open(os.path.join(path, f"meta_epoch_{epoch}.json"), "w") as f:
        json.dump(meta, f)
    # meta.json stays as the latest-epoch view (backwards compat + at-a-glance)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def restore_checkpoint(path: str, trainer, epoch: Optional[int] = None) -> int:
    """Restore into an existing trainer (built from the same config);
    returns the epoch to resume FROM (i.e. the next epoch index)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if epoch is None:
        epochs = [
            int(d.split("_", 1)[1])
            for d in os.listdir(path)
            if d.startswith("epoch_")
        ]
        epoch = max(epochs)
    meta = {}
    # prefer the restored epoch's own metadata; meta.json (latest-epoch view)
    # is the fallback for checkpoints written before per-epoch metas existed
    for meta_p in (
        os.path.join(path, f"meta_epoch_{epoch}.json"),
        os.path.join(path, "meta.json"),
    ):
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            break
    with ocp.StandardCheckpointer() as ckptr:
        template = dict(
            state=trainer.state,
            active=trainer.engine.active,
            base_active=trainer.engine.base_active,
            key=trainer.key,
            epoch=jnp.asarray(epoch),
        )
        if trainer.pool is not None:
            template["pool"] = trainer.pool
        if meta.get("has_ae"):
            # rebuild the AE module so the params template has its structure
            template["ae_params"] = trainer.engine.build_ae(
                jax.random.PRNGKey(0)
            )
        if meta.get("has_last_mask"):
            template["last_mask"] = trainer.engine.active
        if meta.get("has_last_scores"):
            template["last_scores"] = jnp.zeros(
                (int(trainer.dataset.n),), jnp.float32
            )
        payload = ckptr.restore(os.path.join(path, f"epoch_{epoch}"), template)
    trainer.state = payload["state"]
    trainer.engine.active = payload["active"]
    # _set_base also rebuilds the compacted scoring subset for the base mask
    trainer.engine._set_base(payload["base_active"])
    trainer.key = payload["key"]
    if "pool" in payload and payload["pool"] is not None:
        trainer.pool = payload["pool"]
    if meta.get("has_ae"):
        trainer.engine.ae_params = payload["ae_params"]
    if meta.get("has_last_mask"):
        trainer.engine.last_mask = payload["last_mask"]
    if meta.get("has_last_scores"):
        trainer.engine.last_scores = payload["last_scores"]
    if meta.get("last_threshold") is not None:
        trainer.engine.last_threshold = meta["last_threshold"]
    trainer.engine.band_cooloff = meta.get("band_cooloff", 0)
    trainer.engine.d_bn_eval = meta.get("d_bn_eval", False)
    trainer._iters = meta.get("iters", 0)
    return epoch + 1
