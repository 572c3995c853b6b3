"""Device-resident input pipeline (component C2, the BASELINE.json north star).

The reference's DataLoader re-decodes and re-normalizes every image every epoch
in host worker processes (`#%basic.py:76-77`).  Here the whole (contaminated)
dataset lives in HBM as uint8; each jitted step gathers its batch with a
device-side ``take`` and fuses the ``(x/255 - 0.5)/0.5`` normalization
(`#%basic.py:73`) into the step.  The only per-epoch host crossing is one
scalar (the surviving-sample count, to fix the step count).

Strained "subsets" are never materialized: the strainer produces a boolean
``active`` mask over the full dataset, and the epoch sampler permutes indices
and stably partitions active-first — equivalent to shuffling the Subset
(`# final.py:421-427`) but entirely on device with static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .mixers import Mixture


def normalize_u8(batch_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [0,255] -> dtype [-1,1]; matches ToTensor+Normalize(0.5,0.5)."""
    x = batch_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("num", "batch_size", "all_active"))
def epoch_batch_indices(
    key: jax.Array, active: jnp.ndarray, num: int, batch_size: int,
    all_active: bool = False,
) -> jnp.ndarray:
    """Device-side epoch sampler.

    Permute all N indices, stably sort actives first, take the first
    ``num*batch_size`` into (num, batch_size).  With ``num`` <=
    floor(n_active/batch_size) (drop_last semantics) every batch contains
    only active samples, each at most once — exactly
    ``DataLoader(Subset(...), shuffle=True, drop_last=True)``.  When ``num``
    is the ceiling (drop_last=False), the first ``n_active`` positions cover
    every active sample exactly once and positions past the active count
    wrap around to the start of the shuffled actives — the wrapped lanes are
    the zero-weight PADDING of the exact partial tail batch (the step masks
    them out via ``lane_count``; see train/steps.py), so drop_last=False
    epochs reproduce the reference DataLoader's partial final batch.

    ONE composite-key argsort does both the shuffle and the actives-first
    partition (a permutation is itself a sort of random bits, so a
    permutation + stable-argsort would spend two 66k sorts per epoch where
    one suffices).  Key = inactive-bit << 31 | 31 random bits: actives land
    first in uniformly random order.  The ~1-per-4-billion random-bit
    collision resolves by index order — immaterial next to the documented
    RNG-stream deviation from torch's RandomSampler (docs/PARITY.md).

    ``all_active``: static promise that ``active`` is all-True (no strain
    decision exists).  Skips the mask/where/sum work but sorts the SAME
    random keys, so the returned indices are bitwise identical to the
    general path on an all-True mask — callers that derive the promise
    differently (blocking vs deferred epochs, train/loop.py) can never
    diverge on the sampled indices.
    """
    n = active.shape[0]
    r = jax.random.bits(key, (n,), jnp.uint32) >> jnp.uint32(1)
    if all_active:
        shuffled = jnp.argsort(r)
        pos = jnp.arange(num * batch_size) % n
        return shuffled[pos].reshape(num, batch_size)
    composite = jnp.where(
        active, jnp.uint32(0), jnp.uint32(1) << jnp.uint32(31)
    ) | r
    shuffled = jnp.argsort(composite)
    n_active = jnp.maximum(jnp.sum(active), 1)
    pos = jnp.arange(num * batch_size) % n_active
    return shuffled[pos].reshape(num, batch_size)


@partial(jax.jit, static_argnames=("batch_size",))
def device_full_and_tail(active: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """``[n_active // batch, n_active % batch]`` as ONE device vector.

    The deferred-stats path (train/loop.py) runs full batches through the
    gated chunked executor and the drop_last=False partial tail through the
    gated tail step — both counts stay device scalars so no host fetch
    serializes the strain event against the first training dispatch."""
    n_active = jnp.sum(active.astype(jnp.int32))
    return jnp.stack([n_active // batch_size, n_active % batch_size])


@partial(jax.jit, static_argnames=("batch_size", "drop_last"))
def device_step_count(
    active: jnp.ndarray, batch_size: int, drop_last: bool = True
) -> jnp.ndarray:
    """Per-epoch step count as a DEVICE scalar (no host fetch).

    The deferred-stats path (train/loop.py) feeds this to the gated chunked
    executor so training can dispatch before the host learns ``n_active``."""
    n_active = jnp.sum(active.astype(jnp.int32))
    if drop_last:
        return n_active // batch_size
    return (n_active + batch_size - 1) // batch_size


class DeviceDataset:
    """uint8 images + source ids resident on device."""

    def __init__(self, mixture: Mixture, sharding=None):
        self.images = jax.device_put(mixture.images, sharding)
        self.source_id = jax.device_put(mixture.source_id, sharding)
        self.labels = jnp.asarray(mixture.labels)
        self.n = mixture.images.shape[0]
        self.image_shape = mixture.images.shape[1:]

    @classmethod
    def from_process_local(cls, local_mixture: Mixture, mesh,
                           axis_name: str = "dp") -> "DeviceDataset":
        """Multi-host staging (C27 DCN side): each process stages ONLY its
        local sample shard; the returned dataset's arrays are one GLOBAL
        jax.Array sharded over ``axis_name`` (samples), assembled with
        ``jax.make_array_from_process_local_data``.  In-scan gathers then
        ride GSPMD collectives (DCN between hosts) — correct at any scale,
        chosen over replication so no host ever loads the full dataset.
        """
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis_name))
        self = cls.__new__(cls)
        self.images = jax.make_array_from_process_local_data(
            sh, np.asarray(local_mixture.images)
        )
        self.source_id = jax.make_array_from_process_local_data(
            sh, np.asarray(local_mixture.source_id)
        )
        self.labels = jnp.asarray(local_mixture.labels)  # local (eval-only)
        self.n = self.images.shape[0]
        self.image_shape = self.images.shape[1:]
        return self

    def put_on_mesh(self, mesh) -> None:
        """Re-place the HBM arrays replicated over a dp mesh (in place, so
        a StrainerEngine holding this dataset sees the move).  Replication
        keeps every in-scan gather local to its device; CelebA-64 uint8
        (~3 GB) fits per chip, so sample-sharding is not worth the gather
        collectives it would force (parallel/mesh.dp_chunked_shardings)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        self.images = jax.device_put(self.images, rep)
        self.source_id = jax.device_put(self.source_id, rep)

    def steps_per_epoch(self, active: Optional[jnp.ndarray], batch_size: int,
                        drop_last: bool = True) -> int:
        n_active = self.n if active is None else int(jnp.sum(active))
        if drop_last:
            return n_active // batch_size
        return -(-n_active // batch_size)

    def epoch_indices(self, key, active: Optional[jnp.ndarray], batch_size: int,
                      drop_last: bool = True) -> jnp.ndarray:
        if active is None:
            active = jnp.ones((self.n,), bool)
        num = self.steps_per_epoch(active, batch_size, drop_last)
        return epoch_batch_indices(key, active, num, batch_size)

    def gather(self, idx: jnp.ndarray) -> jnp.ndarray:
        """Gather a uint8 batch (stays on device; call inside jit)."""
        return jnp.take(self.images, idx, axis=0)
