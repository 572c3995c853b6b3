"""Device mesh + data-parallel sharding (component C27 — new capability).

The reference has no working multi-device path (dead ``nn.DataParallel``
scaffolding behind ``ngpu=1``, `#%basic.py:143-144`).  Here data parallelism
is first-class and idiomatic JAX: one global ``Mesh`` with a ``dp`` axis,
``NamedSharding`` annotations on the jitted train step, and XLA GSPMD
inserting the gradient all-reduce over ICI.  The same wrapper shards the
full-dataset strain scoring pass over the batch axis; masks stay sharded in
HBM (BASELINE.json: strain decisions never leave the device).

Largest reference model is a ~3.5M-param DCGAN, so no tensor/pipeline
parallelism is required for capability parity (SURVEY §2.4); the mesh helpers
accept extra axes for forward-compatibility.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "dp",
    devices: Optional[Sequence] = None,
    backend: Optional[str] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    dp: int, tp: int, axis_names=("dp", "tp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """dp x tp mesh.  Lay tp innermost so its collectives ride the
    fastest links (adjacent devices; ICI neighbors on real topologies)."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def dp_shardings(mesh: Mesh, axis_name: str = "dp"):
    """(in_shardings, out_shardings) for ``train.steps.make_train_step``'s
    dynamic step arguments (mask_on at position 6 is static):
    (state, batch_u8, source_id, key, lr_g, lr_d, concat_on, pool).

    State and pool are replicated; the batch and per-sample outputs are
    sharded along ``dp``.  XLA inserts psum for the grads automatically.
    """
    rep = replicated(mesh)
    bat = batch_sharded(mesh, axis_name)
    in_shardings = (rep, bat, bat, rep, rep, rep, rep, rep)
    # outputs: (state, metrics-dict); per-sample metrics end up sharded.
    out_shardings = (
        rep,
        dict(
            errD=rep, errG=rep, errD_real=rep, errD_fake=rep,
            D_x=rep, D_G_z1=rep, D_G_z2=rep,
            real_loss_per_sample=bat, keep_mask=bat, score_probs=bat,
            n_contam=rep, n_filtered_contam=rep,
        ),
    )
    return in_shardings, out_shardings


def dp_chunked_shardings(mesh: Mesh, axis_name: str = "dp",
                         data_sharded: bool = False,
                         with_lanes: bool = False):
    """(in_shardings, out_shardings) for the scan-chunked executor
    (``train.steps.make_chunked_train_step``) under a dp mesh.

    The HBM dataset and state are replicated; the per-chunk index matrix is
    sharded along its BATCH axis, so each device gathers its own batch shard
    locally inside the scan (no cross-device data movement) and the step
    runs exactly as the per-step dp path — XLA inserts the gradient
    all-reduce.  Dynamic args (mask_on at 7 / d_train at 10 are static):
    (state, data_u8, source_id_all, idx, keys, lr_g, lr_d, concat_on, pool).
    Stacked per-sample metrics come back sharded along their batch axis.

    ``data_sharded``: the HBM dataset is sample-sharded over ``axis_name``
    (multi-host staging, DeviceDataset.from_process_local) instead of
    replicated — the in-scan gather then goes through GSPMD collectives.
    """
    rep = replicated(mesh)
    bat2 = NamedSharding(mesh, P(None, axis_name))  # (chunk, batch) / (chunk, b)
    data_sh = NamedSharding(mesh, P(axis_name)) if data_sharded else rep
    in_shardings = (rep, data_sh, data_sh, bat2, rep, rep, rep, rep, rep)
    if with_lanes:
        in_shardings = in_shardings + (rep,)  # (chunk,) lane_counts
    out_shardings = (
        rep,
        dict(
            errD=rep, errG=rep, errD_real=rep, errD_fake=rep,
            D_x=rep, D_G_z1=rep, D_G_z2=rep,
            real_loss_per_sample=bat2, keep_mask=bat2, score_probs=bat2,
            n_contam=rep, n_filtered_contam=rep,
        ),
    )
    return in_shardings, out_shardings


def dp_gated_shardings(mesh: Mesh, axis_name: str = "dp",
                       data_sharded: bool = False):
    """Shardings for ``train.steps.make_gated_chunked_train_step`` under a dp
    mesh: (state, data_u8, source_id_all, idx, keys, c0, n_valid, lr_g, lr_d,
    concat_on, pool) — mask_on at 9 / d_train at 12 are static.  Identical to
    the chunked executor's layout plus the two replicated gate scalars."""
    rep = replicated(mesh)
    bat2 = NamedSharding(mesh, P(None, axis_name))
    data_sh = NamedSharding(mesh, P(axis_name)) if data_sharded else rep
    in_shardings = (rep, data_sh, data_sh, bat2, rep, rep, rep, rep, rep,
                    rep, rep)
    out_shardings = (
        rep,
        dict(
            errD=rep, errG=rep, errD_real=rep, errD_fake=rep,
            D_x=rep, D_G_z1=rep, D_G_z2=rep,
            real_loss_per_sample=bat2, keep_mask=bat2, score_probs=bat2,
            n_contam=rep, n_filtered_contam=rep,
        ),
    )
    return in_shardings, out_shardings


def dp_gated_tail_shardings(mesh: Mesh, axis_name: str = "dp",
                            data_sharded: bool = False):
    """Shardings for ``train.steps.make_gated_tail_step`` under a dp mesh:
    (state, data_u8, source_id_all, idx, keys, n_full, tail_count, lr_g,
    lr_d, concat_on, pool) — mask_on at 9 / d_train at 12 are static.  The
    full index/key stacks are sharded exactly as the chunked executor's; the
    per-step metrics come back batch-sharded."""
    rep = replicated(mesh)
    bat2 = NamedSharding(mesh, P(None, axis_name))
    bat = batch_sharded(mesh, axis_name)
    data_sh = NamedSharding(mesh, P(axis_name)) if data_sharded else rep
    in_shardings = (rep, data_sh, data_sh, bat2, rep, rep, rep, rep, rep,
                    rep, rep)
    out_shardings = (
        rep,
        dict(
            errD=rep, errG=rep, errD_real=rep, errD_fake=rep,
            D_x=rep, D_G_z1=rep, D_G_z2=rep,
            real_loss_per_sample=bat, keep_mask=bat, score_probs=bat,
            n_contam=rep, n_filtered_contam=rep,
        ),
    )
    return in_shardings, out_shardings


def tp_sharding_for(leaf, mesh: Mesh, axis_name: str = "tp") -> NamedSharding:
    """Tensor-parallel sharding spec for one parameter/optimizer-state leaf.

    Shards the output-feature (last) axis of conv/dense kernels and the
    feature axis of 1-D vectors (BN scale/bias/stats, biases) over
    ``axis_name`` when divisible by the axis size; replicates otherwise.
    Output-feature sharding keeps every conv/matmul local (the tp all-reduce
    happens on the *input*-feature contraction of the NEXT layer, inserted by
    GSPMD), which is the standard Megatron-style column split.
    """
    size = mesh.shape[axis_name]
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] % size == 0:
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1)), axis_name)
        )
    if len(shape) == 1 and shape[0] % size == 0:
        return NamedSharding(mesh, P(axis_name))
    return NamedSharding(mesh, P())


def put_state_tp(state, mesh: Mesh, axis_name: str = "tp"):
    """Place a GANState with every param/opt/stat leaf tp-sharded (or
    replicated when indivisible).  Model-parallel forward-compatibility for
    models that outgrow one chip's HBM; at DCGAN scale this is exercised by
    ``__graft_entry__.dryrun_multichip`` and tests, not the default path
    (SURVEY §2.4: no model parallelism *required* by the reference family).
    """
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, tp_sharding_for(leaf, mesh, axis_name)),
        state,
    )


def put_global_batch(local_x, mesh: Mesh, axis_name: str = "dp"):
    """Multi-host batch staging: each process contributes its local shard of
    a globally-sharded batch.  Single-process: plain sharded device_put.

    ``local_x``'s leading dim is the PER-PROCESS batch; the returned global
    array has leading dim ``local * process_count``, sharded over ``dp``
    (DCN between hosts, ICI within — XLA sees one global array either way).
    """
    if jax.process_count() == 1:
        return put_batch_sharded(local_x, mesh, axis_name)
    return jax.make_array_from_process_local_data(
        batch_sharded(mesh, axis_name), np.asarray(local_x)
    )


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_batch_sharded(x, mesh: Mesh, axis_name: str = "dp"):
    return jax.device_put(x, batch_sharded(mesh, axis_name))
