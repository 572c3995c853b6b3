"""The epoch driver (components C11, C21, C24 wiring).

``Trainer`` turns an ExperimentConfig into a run: builds the mixture, stages
it in HBM, constructs models/state, wires the StrainerEngine and fake pool,
and drives the per-epoch schedule exactly as the reference scripts do
(prefilter -> [lr adjust] -> [re-strain] -> batch loop -> [reset]).

The whole batch loop runs as jitted steps over device-resident data —
``steps_per_dispatch`` of them per device dispatch via the scan-chunked
executor, which also carries dp-mesh runs (state/dataset replicated, batch
axis sharded; remainders execute as length-1 chunks).  Per-epoch host
crossings: ONE packed strain-stats fetch (step count + strain accounting,
identity-cached while the mask is unchanged), the epoch-end
contamination/loss-history fetches (one each), and the bounded
``log_every`` console prints; per-step metric collection stays on device
(obs.metrics buffers device arrays).

Deferred-stats epochs (TrainConfig.defer_epoch_stats, on by default): when a
strain event makes the step count data-dependent and the epoch needs no
console step prints or mid-epoch sampling, the Trainer dispatches a STATIC
number of device-gated chunks (make_gated_chunked_train_step) and performs
the packed stats fetch while they execute — the ~28 ms remote round trip
rides under training compute instead of serializing the strain scoring pass
against the first dispatch.  Results are bitwise identical to the blocking
path (tests/test_deferred.py).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data import DeviceDataset, build_mixture
from ..models import build_models
from ..obs.metrics import MetricsLogger
from ..strain.engine import StrainerEngine
from ..strain.pool import build_fake_pool
from .schedules import lr_at
from .state import create_state
from .steps import (
    StepConfig,
    make_chunked_train_step,
    make_gated_chunked_train_step,
    make_train_step,
)


def step_config_from(cfg: ExperimentConfig) -> StepConfig:
    t, s, m = cfg.train, cfg.strain, cfg.model
    if t.adam_defaults:
        beta1, beta2 = 0.9, 0.999
    else:
        beta1, beta2 = t.beta1, t.beta2
    return StepConfig(
        d_loss_reduction=t.d_loss_reduction,
        g_before_d=t.g_before_d,
        real_label=t.real_label,
        fake_label=t.fake_label,
        batch_mask=s.method == "batch_quantile_mask",
        mask_quantile=s.mask_quantile,
        in_batch_recycle=s.fake_concat == "in_batch",
        recycle_quantile=s.in_batch_recycle_quantile,
        pool_concat=s.fake_concat == "pool",
        has_dropout=m.d_dropout > 0,
        flatten=cfg.data.flatten,
        beta1=beta1,
        beta2=beta2,
        nz=m.nz,
    )


_STEP_CACHE = {}


@jax.jit
def _epoch_stats(active, source_id, band_overflow):
    """[n_active, true-positive removals, n_contaminants, band_overflowed] —
    everything the epoch driver needs from the strain mask, packed so the
    host pays ONE ~28 ms remote fetch per strain event instead of four.
    ``band_overflow`` piggybacks the band scorer's fallback flag (scalar 0/1,
    already on device) so the band-cooloff policy costs no extra fetch."""
    contam = source_id != 0
    dropped = jnp.logical_not(active)
    return jnp.stack([
        jnp.sum(active),
        jnp.sum(jnp.logical_and(dropped, contam)),
        jnp.sum(contam),
        band_overflow.astype(jnp.int32),
    ]).astype(jnp.int32)


def _cached_train_step(gen, disc, scfg: StepConfig, mesh=None):
    """One compiled step per (model pair, step config, mesh): build_models
    memoizes module instances, so equal experiment configs share the jit
    cache instead of re-tracing/compiling per Trainer."""
    key = (id(gen), id(disc), scfg, id(mesh) if mesh is not None else None)
    if key not in _STEP_CACHE:
        # strong refs to the modules/mesh ride along: the keys use id(),
        # which CPython may reuse after garbage collection (eval/fid.py's
        # _BATCH_PROG_CACHE guard, applied uniformly)
        _STEP_CACHE[key] = (make_train_step(gen, disc, scfg, mesh=mesh),
                            gen, disc, mesh)
    return _STEP_CACHE[key][0]


def _cached_chunked_step(gen, disc, scfg: StepConfig, mesh=None,
                         data_sharded: bool = False, unroll: int = 1,
                         with_lanes: bool = False):
    """Same sharing for the scan-chunked executor — without it every Trainer
    (the test suite builds dozens with identical configs) would re-trace and
    recompile the chunked program."""
    key = ("chunk", id(gen), id(disc), scfg,
           id(mesh) if mesh is not None else None, data_sharded, unroll,
           with_lanes)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = (make_chunked_train_step(
            gen, disc, scfg, mesh=mesh, data_sharded=data_sharded,
            unroll=unroll, with_lanes=with_lanes,
        ), gen, disc, mesh)
    return _STEP_CACHE[key][0]


def _cached_gated_tail(gen, disc, scfg: StepConfig, mesh=None,
                       data_sharded: bool = False):
    key = ("gated_tail", id(gen), id(disc), scfg,
           id(mesh) if mesh is not None else None, data_sharded)
    if key not in _STEP_CACHE:
        from .steps import make_gated_tail_step

        _STEP_CACHE[key] = (make_gated_tail_step(
            gen, disc, scfg, mesh=mesh, data_sharded=data_sharded
        ), gen, disc, mesh)
    return _STEP_CACHE[key][0]


def _cached_gated_step(gen, disc, scfg: StepConfig, unroll: int = 1,
                       mesh=None, data_sharded: bool = False):
    key = ("gated", id(gen), id(disc), scfg, unroll,
           id(mesh) if mesh is not None else None, data_sharded)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = (make_gated_chunked_train_step(
            gen, disc, scfg, unroll=unroll, mesh=mesh,
            data_sharded=data_sharded,
        ), gen, disc, mesh)
    return _STEP_CACHE[key][0]


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        feature_fn: Optional[Callable] = None,
        max_synth: Optional[int] = None,
        logger: Optional[MetricsLogger] = None,
        dataset: Optional[DeviceDataset] = None,
    ):
        self.cfg = cfg
        self.mixture = None
        # the dp mesh is resolved FIRST: multi-host runs stage each process's
        # dataset shard directly into one global sharded array (C27 DCN side)
        self.mesh = None
        self.multihost = False
        dp = cfg.parallel.dp
        if dp == -1:
            dp = len(jax.devices())
        if dp and dp > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(dp, axis_name=cfg.parallel.mesh_axis_name)
            if cfg.data.batch_size % dp:
                raise ValueError(
                    f"batch_size {cfg.data.batch_size} not divisible by dp={dp}"
                )
            self.multihost = jax.process_count() > 1
        if dataset is None:
            self.mixture = build_mixture(cfg.data, max_synth=max_synth)
            if self.multihost:
                # per-process source staging: this process keeps only its
                # contiguous sample shard; the DeviceDataset assembles the
                # GLOBAL sharded array (a real deployment's loaders would
                # read only these rows — the synthetic mixture is built
                # deterministically on every process, then sliced)
                import dataclasses as _dc

                pid, np_ = jax.process_index(), jax.process_count()
                n = self.mixture.images.shape[0]
                n = (n // np_) * np_  # equal shards
                lo, hi = pid * n // np_, (pid + 1) * n // np_
                local = _dc.replace(
                    self.mixture,
                    images=self.mixture.images[lo:hi],
                    source_id=self.mixture.source_id[lo:hi],
                    labels=self.mixture.labels[lo:hi],
                )
                dataset = DeviceDataset.from_process_local(
                    local, self.mesh, cfg.parallel.mesh_axis_name
                )
            else:
                dataset = DeviceDataset(self.mixture)
        if cfg.data.auto_batch_divisor:
            # `#8.py:43`: batch = min(max(n // divisor, 16), 64)
            bs = min(max(dataset.n // cfg.data.auto_batch_divisor, 16), 64)
            import dataclasses as _dc

            cfg = cfg.replace(data=_dc.replace(cfg.data, batch_size=bs))
            self.cfg = cfg
        self.dataset = dataset
        self.gen, self.disc = build_models(cfg.model)
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.key, k_init = jax.random.split(self.key)
        self.state = create_state(cfg, self.gen, self.disc, k_init)
        needs_features = (
            cfg.strain.method.startswith("zscore")
            or cfg.strain.fake_concat == "pool"
            or (cfg.strain.method == "loss_percentile" and cfg.strain.prefilter)
        )
        if feature_fn is None and needs_features:
            from ..models.features import build_feature_fn

            feature_fn = build_feature_fn(
                cfg.strain.feature_extractor, channels=cfg.model.nc,
                flatten_input_hw=(cfg.data.image_size, cfg.data.image_size)
                if cfg.data.flatten else None,
            )
        self.engine = StrainerEngine(
            cfg, self.disc, self.dataset, feature_fn=feature_fn,
            score_batch=cfg.strain.score_batch,
        )
        # data parallelism (C27): ParallelConfig.dp > 1 (or -1 = all devices)
        # replicates state over the mesh built above and shards each batch;
        # XLA inserts the gradient all-reduce over ICI (DCN across hosts).
        if self.mesh is not None:
            from ..parallel.mesh import put_replicated

            self.state = put_replicated(self.state, self.mesh)
            if not self.multihost:
                # single-host: replicate the HBM dataset over the mesh so
                # in-scan gathers stay local and the strain scoring scans
                # see mesh-consistent inputs (multi-host datasets are
                # already staged globally sample-sharded)
                self.dataset.put_on_mesh(self.mesh)
        self.scfg = step_config_from(cfg)
        # the per-step fn serves the no-mesh path; dp meshes execute through
        # the chunked executor (length-1 slices for remainders)
        self.step_fn = _cached_train_step(self.gen, self.disc, self.scfg)
        style = "mnist" if cfg.model.arch == "mlp" else "dcgan"
        self.logger = logger or MetricsLogger(
            log_every=cfg.train.log_every, style=style
        )
        self.pool: Optional[jnp.ndarray] = None
        self.fixed_noise = jax.random.normal(
            jax.random.PRNGKey(cfg.train.seed + 7),
            (cfg.train.fixed_noise_n, cfg.model.nz),
        )
        self.epoch_loss_history: List[np.ndarray] = []
        self.mask_history: List[np.ndarray] = []
        self.fid_history: List = []
        self.img_list: List[np.ndarray] = []  # fixed-noise grids (`#%basic.py:226`)
        self.strain_quality: List[Dict] = []  # per-strain precision/recall
        self._iters = 0
        self._chunk_fn = None  # lazily-built scan-chunked executor
        self._gated_fn = None  # device-gated executor (deferred-stats path)
        self._partial_fn = None  # lane-masked executor (partial tail batch)
        self._gated_tail_fn = None  # device-gated partial tail (deferred)
        self._stats_cache = None  # (n_active, tp, n_contam, band_overflow)
        self._last_steps = None  # deferred path's dispatch-count guess

    # ------------------------------------------------------------------- run
    def setup(self):
        """Pre-training strain + pool staging."""
        s = self.cfg.strain
        self.key, k1, k2 = jax.random.split(self.key, 3)
        if s.prefilter and s.method != "none":
            self.engine.prefilter(k1)
        if s.fake_concat == "pool":
            outliers = self.engine.outlier_mask()
            self.pool = build_fake_pool(
                self.dataset, outliers, s.fake_pool_fraction, k2
            )

    def _dispatch_epoch_stats(self, active, strain_event: bool):
        """Enqueue the packed stats program (no fetch).  The dispatch queue
        is FIFO, so this must run BEFORE the training chunks are enqueued
        for the fetch in ``_fetch_epoch_stats`` to overlap their compute."""
        if not strain_event:
            return None
        bstats = self.engine.last_band_stats
        overflow = bstats[1] if bstats is not None else jnp.int32(0)
        return _epoch_stats(active, self.dataset.source_id, overflow)

    def _fetch_epoch_stats(self, active, strain_event: bool, stats_dev=None):
        """ONE packed stats fetch per strain event (identity-cached across
        epochs whose mask didn't change) covers the step count, the strain
        report, and the ground-truth quality accounting."""
        if strain_event:
            if stats_dev is None:
                stats_dev = self._dispatch_epoch_stats(active, strain_event)
            self._stats_cache = tuple(int(v) for v in np.asarray(stats_dev))
            if self._stats_cache[3] and self.engine.last_score_path == "band":
                # band overflowed (weakly-separating D): score plain-f32 for
                # the next few strain events before retrying the band — the
                # overflow path costs bf16 bulk + full f32 (worse than f32
                # alone), so persistent concentration must not pay it every
                # epoch (see StrainerEngine.band_cooloff)
                self.engine.band_cooloff = 5
        return self._stats_cache

    def _log_strain_event(self, epoch, active, prev_active, n_active,
                          strain_tp, n_contam_ds):
        if active is not prev_active:
            removed = self.dataset.n - n_active
            self.logger.log_strain(epoch, removed, n_active)
            # ground-truth strain quality (the reference's contamination
            # accounting generalized): of the removed samples, how many were
            # actually contaminants?
            if removed and n_contam_ds:
                self.strain_quality.append(
                    dict(epoch=epoch, removed=removed,
                         precision=strain_tp / removed,
                         recall=strain_tp / n_contam_ds)
                )

    def _warn_no_batches(self, epoch, n_active, bs):
        self.logger.stream.write(
            f"[strainer] WARNING epoch {epoch}: 0 full batches "
            f"({n_active} active samples < batch_size {bs}) — "
            "no training this epoch\n"
        )

    def run_epoch(self, epoch: int) -> Dict:
        cfg, s, t = self.cfg, self.cfg.strain, self.cfg.train
        self.key, k_strain, k_perm, k_steps = jax.random.split(self.key, 4)

        # stale-state guard: without this, a gate-off epoch would leave the
        # previous gated epoch's in-step scores in place and the parity
        # report's batch_quantile_mask branch would silently use them
        if not (
            s.method == "batch_quantile_mask" and epoch >= s.mask_start_epoch
        ) and not (
            s.fake_concat == "in_batch" and epoch >= s.fake_concat_start_epoch
        ):
            self.engine.last_batch_scores = None
            self.engine.last_batch_mask = None
            self.engine.last_batch_valid = None

        prev_active = self.engine.active
        active = self.engine.on_epoch_start(epoch, self.state, k_strain)
        strain_event = self._stats_cache is None or active is not prev_active

        lr_g = lr_at(t.lr_g, epoch, t)
        lr_d = lr_at(t.lr_d, epoch, t)
        bs = cfg.data.batch_size
        from ..data.pipeline import epoch_batch_indices

        mask_on = s.method == "batch_quantile_mask" and epoch >= s.mask_start_epoch
        recycle_on = s.fake_concat == "in_batch" and epoch >= s.fake_concat_start_epoch
        concat_on = s.fake_concat == "pool" and epoch >= s.fake_concat_start_epoch
        d_train = not self.engine.d_bn_eval
        gate = bool(mask_on or recycle_on)
        concat_gate = jnp.asarray(concat_on)
        chunk = max(1, t.steps_per_dispatch)
        sampling = bool(t.sample_every and self.logger.collect)
        loss_parts = []  # per-sample real losses, device, (b,) or (chunk, b)
        contam_parts = []  # device scalars / (chunk,) arrays
        filtered_parts = []
        last_metrics = None
        last_was_chunk = False
        last_valid = bs  # valid lanes in the last executed step (tail-aware)

        # Deferred-stats epochs (strain event + no mid-epoch sampling): the
        # step count stays a device scalar and the gated chunked executor
        # dispatches a STATIC number of chunks, so the packed stats fetch
        # below overlaps training compute instead of serializing the scoring
        # pass against the first dispatch (~28 ms saved per strain event on
        # a remote-attached chip).  Results are bitwise identical: live steps
        # run the same step program with the same per-step keys
        # (split(k, n)[:m] == split(k, m)), and all accounting is trimmed to
        # the live rows once the count arrives.  Console ``log_every`` prints
        # are served from the stacked chunk metrics after the count arrives
        # (same text, same order); dp-mesh runs use the gated executor with
        # the chunked executor's shardings.  Multi-host runs stay on the
        # blocking path (per-process dispatch sequencing depends on the
        # host-known step count).
        deferred = (
            t.defer_epoch_stats and strain_event and not self.multihost
            and chunk > 1 and not sampling
        )

        if not deferred:
            if self.logger.collect:
                self.mask_history.append(np.asarray(active))
            n_active, strain_tp, n_contam_ds = self._fetch_epoch_stats(
                active, strain_event
            )[:3]
            self._log_strain_event(
                epoch, active, prev_active, n_active, strain_tp, n_contam_ds
            )
            if cfg.data.drop_last:
                steps, tail = n_active // bs, 0
            else:
                # exact partial final batch (`#%basic.py:76` — the CelebA
                # loaders keep torch's drop_last=False default): the last
                # step runs the lane-masked program on ``tail`` valid lanes
                steps, tail = -(-n_active // bs), n_active % bs
            self._last_steps = n_active // bs
            # all_active derived from the fetched count, not from strain-state
            # bookkeeping: a resumed one-shot strainer has a non-trivial
            # restored mask, and keying the fast path on `last_mask is None`
            # (as before) would train on strained-out samples (round-3 VERDICT
            # confirmed bug).  n_active == n is exact and already paid for.
            idx = epoch_batch_indices(
                k_perm, active, steps, bs,
                all_active=n_active == self.dataset.n,
            )
            if steps == 0:
                self._warn_no_batches(epoch, n_active, bs)
            step_keys = jax.random.split(k_steps, max(steps, 1))

            def run_one(i):
                # no-mesh per-step execution; dp runs route through run_chunk
                # (length 1) so the chunked executor's shardings apply
                nonlocal last_metrics, last_was_chunk, last_valid
                last_valid = bs
                batch = self.dataset.gather(idx[i])
                src = jnp.take(self.dataset.source_id, idx[i], axis=0)
                self.state, metrics = self.step_fn(
                    self.state, batch, src, step_keys[i], lr_g, lr_d,
                    gate, concat_gate, self.pool, d_train,
                )
                self.logger.log_step(epoch, t.epochs, i, steps, metrics)
                if mask_on:
                    contam_parts.append(metrics["n_contam"])
                    filtered_parts.append(metrics["n_filtered_contam"])
                if self.logger.collect:
                    loss_parts.append(metrics["real_loss_per_sample"])
                last_metrics = metrics
                last_was_chunk = False

            def run_chunk(c0, n):
                nonlocal last_metrics, last_was_chunk, last_valid
                last_valid = bs
                sl = slice(c0, c0 + n)
                idx_sl, keys_sl = idx[sl], step_keys[sl]
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    # shard the index matrix along its batch axis; each
                    # device gathers its own batch shard inside the scan
                    idx_sl = jax.device_put(
                        idx_sl,
                        NamedSharding(
                            self.mesh, P(None, self.mesh.axis_names[0])
                        ),
                    )
                    keys_sl = jax.device_put(
                        keys_sl, NamedSharding(self.mesh, P())
                    )
                self.state, metrics = self._chunk_fn(
                    self.state, self.dataset.images, self.dataset.source_id,
                    idx_sl, keys_sl, lr_g, lr_d, gate, concat_gate,
                    self.pool, d_train,
                )
                self.logger.log_chunk(epoch, t.epochs, c0, steps, metrics, n)
                if mask_on:
                    contam_parts.append(metrics["n_contam"])
                    filtered_parts.append(metrics["n_filtered_contam"])
                if self.logger.collect:
                    loss_parts.append(metrics["real_loss_per_sample"])
                last_metrics = metrics
                last_was_chunk = True

            def run_partial(i):
                # the epoch's final, partial batch: a length-1 lane-masked
                # chunk whose step body zero-weights lanes >= ``tail`` —
                # loss means, BN statistics (G and D), in-step quantiles and
                # contamination counters all see exactly the ``tail``-sample
                # batch the reference's drop_last=False DataLoader yields
                nonlocal last_metrics, last_was_chunk, last_valid
                last_valid = tail
                if self._partial_fn is None:
                    self._partial_fn = _cached_chunked_step(
                        self.gen, self.disc, self.scfg, mesh=self.mesh,
                        data_sharded=self.multihost, with_lanes=True,
                    )
                idx_sl, keys_sl = idx[i:i + 1], step_keys[i:i + 1]
                lanes = jnp.full((1,), tail, jnp.int32)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    idx_sl = jax.device_put(
                        idx_sl,
                        NamedSharding(
                            self.mesh, P(None, self.mesh.axis_names[0])
                        ),
                    )
                    keys_sl = jax.device_put(
                        keys_sl, NamedSharding(self.mesh, P())
                    )
                    lanes = jax.device_put(
                        lanes, NamedSharding(self.mesh, P())
                    )
                self.state, m = self._partial_fn(
                    self.state, self.dataset.images, self.dataset.source_id,
                    idx_sl, keys_sl, lr_g, lr_d, gate, concat_gate,
                    self.pool, d_train, lanes,
                )
                self.logger.log_chunk(epoch, t.epochs, i, steps, m, 1)
                if mask_on:
                    contam_parts.append(m["n_contam"])
                    filtered_parts.append(m["n_filtered_contam"])
                if self.logger.collect:
                    # only the valid lanes enter the per-sample loss history
                    loss_parts.append(m["real_loss_per_sample"][:, :tail])
                last_metrics = m
                last_was_chunk = True

            # Scan-chunked execution (steps_per_dispatch steps per device
            # dispatch; see make_chunked_train_step), segmented so that every
            # fixed-noise sample point is hit EXACTLY: the epoch's [0, steps)
            # is split into segments ending right after each sample-point
            # iteration (`#%basic.py:300-304` samples per-iter mid-epoch);
            # each segment runs as full chunks plus a per-step remainder.
            # Only two compiled shapes exist (`chunk` and single-step).
            # Under a dp mesh the remainder reuses the chunked executor at
            # length 1 (its shardings are declared once; the plain per-step
            # fn stays the no-mesh path).
            use_chunk_exec = chunk > 1 or self.mesh is not None
            if use_chunk_exec and self._chunk_fn is None:
                self._chunk_fn = _cached_chunked_step(
                    self.gen, self.disc, self.scfg, mesh=self.mesh,
                    data_sharded=self.multihost, unroll=max(1, t.scan_unroll),
                )
            step_exec = (
                (lambda i: run_chunk(i, 1)) if self.mesh is not None else run_one
            )
            pos = 0
            while pos < steps:
                if sampling:
                    # next step index whose global iter is a sample point
                    until = (-(self._iters + pos)) % t.sample_every
                    boundary = min(pos + until + 1, steps)
                    sample_here = pos + until < steps
                else:
                    boundary, sample_here = steps, False
                # full chunks must stop short of the partial tail step
                limit = boundary - (1 if (tail and boundary == steps) else 0)
                if chunk > 1:
                    while pos + chunk <= limit:
                        run_chunk(pos, chunk)
                        pos += chunk
                while pos < boundary:
                    if tail and pos == steps - 1:
                        run_partial(pos)
                    else:
                        step_exec(pos)
                    pos += 1
                if sample_here:
                    self.img_list.append(self.sample())
        else:
            # ---- deferred-stats dispatch: static chunk count, device-gated
            # step capacity from the permanent base (host-known: _set_base
            # materialized the subset length at the last permanent strain)
            sub = self.engine._base_subset
            cap_n = int(sub.shape[0]) if sub is not None else self.dataset.n
            if cfg.data.drop_last:
                max_steps = cap_n // bs
            else:
                max_steps = -(-cap_n // bs)
            cap_chunks = max(1, -(-max_steps // chunk))
            # enqueue the stats program FIRST (FIFO queue): it executes right
            # after the strain scoring, so its fetch below completes while
            # the training chunks are still crunching
            stats_dev = self._dispatch_epoch_stats(active, strain_event)
            # n_active is not host-known yet here (that's the point of the
            # deferred path), so the static fast-path promise must be
            # conservative: only when no strain decision exists at all.
            # last_mask survives checkpoint restore (checkpoint.py), so a
            # resumed one-shot strainer cannot take this branch.
            idx = epoch_batch_indices(
                k_perm, active, cap_chunks * chunk, bs,
                all_active=self.engine.last_mask is None
                and self.engine._base_subset is None,
            )
            step_keys = jax.random.split(k_steps, cap_chunks * chunk)
            from ..data.pipeline import device_full_and_tail

            # gated chunks run FULL batches only; a drop_last=False partial
            # tail runs as one device-gated lane-masked dispatch below
            ft = device_full_and_tail(active, bs)
            n_valid, tail_dev = ft[0], ft[1]
            if self.mesh is not None:
                # shard the whole epoch's index matrix along its batch axis
                # once; chunk slices and the gated tail inherit the layout
                from jax.sharding import NamedSharding, PartitionSpec as P

                idx = jax.device_put(
                    idx,
                    NamedSharding(self.mesh, P(None, self.mesh.axis_names[0])),
                )
                step_keys = jax.device_put(
                    step_keys, NamedSharding(self.mesh, P())
                )
            if self._gated_fn is None:
                self._gated_fn = _cached_gated_step(
                    self.gen, self.disc, self.scfg,
                    unroll=max(1, t.scan_unroll),
                    mesh=self.mesh, data_sharded=self.multihost,
                )

            def dispatch_chunk(c):
                sl = slice(c * chunk, (c + 1) * chunk)
                self.state, m = self._gated_fn(
                    self.state, self.dataset.images, self.dataset.source_id,
                    idx[sl], step_keys[sl], c * chunk, n_valid,
                    lr_g, lr_d, gate, concat_gate, self.pool, d_train,
                )
                chunk_ms.append(m)

            # Dispatch only the chunks the PREVIOUS epoch's step count
            # suggests (even a fully-dead gated dispatch costs ~14 ms on a
            # remote-attached chip); the stats fetch below overlaps their
            # compute, and any shortfall is covered by gated catch-up
            # dispatches — correctness never depends on the guess, which in
            # the steady state is exact.
            guess = self._last_steps if self._last_steps is not None else max_steps
            guess = min(max(guess, 1), max_steps)
            n_disp = -(-guess // chunk)
            chunk_ms = []
            for c in range(n_disp):
                dispatch_chunk(c)
            # the packed stats fetch now rides under the chunks' device time
            n_active, strain_tp, n_contam_ds = self._fetch_epoch_stats(
                active, strain_event, stats_dev
            )[:3]
            if self.logger.collect:
                self.mask_history.append(np.asarray(active))
            self._log_strain_event(
                epoch, active, prev_active, n_active, strain_tp, n_contam_ds
            )
            full_host = n_active // bs
            if cfg.data.drop_last:
                steps, tail = full_host, 0
            else:
                steps, tail = -(-n_active // bs), n_active % bs
            if steps == 0:
                self._warn_no_batches(epoch, n_active, bs)
            self._last_steps = full_host
            # catch-up: the guess undershot (mask grew since last epoch) —
            # dispatch the remaining chunks now (still ahead of any fetch of
            # their results, so the pipeline stays full)
            while n_disp * chunk < full_host:
                dispatch_chunk(n_disp)
                n_disp += 1
            # drop_last=False: ONE gated lane-masked dispatch runs the exact
            # partial tail batch (dead when tail == 0); it must follow every
            # live full chunk so the state order matches the blocking path
            m_tail = None
            if not cfg.data.drop_last and tail:
                if self._gated_tail_fn is None:
                    self._gated_tail_fn = _cached_gated_tail(
                        self.gen, self.disc, self.scfg,
                        mesh=self.mesh, data_sharded=self.multihost
                    )
                self.state, m_tail = self._gated_tail_fn(
                    self.state, self.dataset.images, self.dataset.source_id,
                    idx, step_keys, n_valid, tail_dev,
                    lr_g, lr_d, gate, concat_gate, self.pool, d_train,
                )
            # account only the live rows (dead rows carry the previous step's
            # metrics by construction — see make_gated_chunked_train_step)
            for c, m in enumerate(chunk_ms):
                v = min(max(full_host - c * chunk, 0), chunk)
                if v == 0:
                    break
                if self.logger.collect:
                    tm = {k: val[:v] for k, val in m.items()}
                    loss_parts.append(tm["real_loss_per_sample"])
                else:
                    # dead rows carry live values and nothing downstream
                    # reads past row v-1 (last_metrics indexes [-1], which
                    # the carry makes equal to row v-1), so skip the
                    # per-metric device slices — each is a ~1 ms dispatch
                    # on a remote-attached chip
                    tm = m
                self.logger.log_chunk(epoch, t.epochs, c * chunk, steps, tm, v)
                if mask_on:
                    contam_parts.append(m["n_contam"][:v])
                    filtered_parts.append(m["n_filtered_contam"][:v])
                last_metrics = tm
                last_was_chunk = True
                last_valid = bs
            if m_tail is not None:
                self.logger.log_step(epoch, t.epochs, full_host, steps, m_tail)
                if mask_on:
                    contam_parts.append(m_tail["n_contam"])
                    filtered_parts.append(m_tail["n_filtered_contam"])
                if self.logger.collect:
                    loss_parts.append(m_tail["real_loss_per_sample"][:tail])
                last_metrics = m_tail
                last_was_chunk = False
                last_valid = tail
        self._iters += steps
        if last_was_chunk:
            last_metrics = {k: v[-1] for k, v in last_metrics.items()}

        # final-iteration grid (`#%basic.py:301`): the reference ALSO captures
        # a fixed-noise grid after the last iteration of the last epoch —
        # `(epoch == num_epochs-1) and (i == len(dataloader)-1)` — unless that
        # iteration was already a sample point (the condition is an `or`)
        if (
            sampling and steps > 0 and epoch == t.epochs - 1
            and (self._iters - 1) % t.sample_every != 0
        ):
            self.img_list.append(self.sample())

        n_contam_total = n_filtered_total = 0
        if mask_on and contam_parts:
            # one host fetch per epoch, not one per step (both sums packed)
            totals = np.asarray(jnp.stack([
                jnp.sum(jnp.concatenate([jnp.atleast_1d(p) for p in contam_parts])),
                jnp.sum(jnp.concatenate([jnp.atleast_1d(p) for p in filtered_parts])),
            ]))
            n_contam_total, n_filtered_total = int(totals[0]), int(totals[1])
        if mask_on:
            self.logger.log_contamination(epoch, n_filtered_total, n_contam_total)
        if gate and last_metrics is not None:
            # last batch's in-step scores + mask, for the runtime parity
            # report (parity/agreement.py batch_quantile_mask branch); on a
            # drop_last=False epoch the last step is the lane-masked partial
            # tail, so record how many leading lanes are real samples
            self.engine.last_batch_scores = last_metrics["score_probs"]
            self.engine.last_batch_mask = last_metrics["keep_mask"]
            self.engine.last_batch_valid = last_valid

        # periodic FID (`# 1,2,8.py:333-359`: every fid_every_epochs vs the
        # clean-class-only real set, L2-normalized activations variant)
        ev = cfg.eval
        if (
            ev.fid and ev.fid_every_epochs
            and (epoch + 1) % ev.fid_every_epochs == 0
        ):
            from ..eval.suite import evaluate_run

            metrics = evaluate_run(
                cfg, self.gen, self.state, self.dataset,
                n_samples=min(ev.fid_n_samples, self.dataset.n),
            )
            self.fid_history.append((epoch, metrics.get("fid_real")))
            self.logger.stream.write(
                f"Epoch {epoch + 1}: FID = {metrics.get('fid_real')}\n"
            )

        if self.logger.collect and loss_parts:
            # per-epoch record of per-sample real losses (the reference's
            # ``epoch_losses`` list, `# 1,2,8.py:300-303`) — concatenated on
            # device, fetched once
            self.epoch_loss_history.append(
                np.asarray(
                    jnp.concatenate([p.reshape(-1) for p in loss_parts])
                )
            )

        if t.check_finite:
            from ..utils.trees import finite_check

            if not finite_check((self.state.g_params, self.state.d_params)):
                raise FloatingPointError(
                    f"non-finite parameters detected after epoch {epoch} — "
                    "training diverged (enable smaller lr or f32 compute)"
                )

        self.engine.on_epoch_end(epoch)
        return dict(
            steps=steps,
            active=n_active,
            lr_g=lr_g,
            lr_d=lr_d,
            filtered_contam=n_filtered_total,
            total_contam=n_contam_total,
            last=last_metrics,
        )

    def run(self, epochs: Optional[int] = None) -> List[Dict]:
        self.setup()
        out = []
        for epoch in range(epochs or self.cfg.train.epochs):
            out.append(self.run_epoch(epoch))
        return out

    # ------------------------------------------------------------- sampling
    def sample(self, n: Optional[int] = None,
               train_bn: Optional[bool] = None) -> np.ndarray:
        """Fixed-noise generator output (`#%basic.py:301-304`).

        The reference never calls ``netG.eval()``, so its grids are generated
        with BatchNorm in TRAIN mode (statistics of the fixed-noise batch
        itself) under no_grad.  ``train_bn=True`` (the default via
        ``TrainConfig.sample_train_bn``) replicates that; the running-stat
        update torch performs during that forward is discarded — the
        reference never consumes G's running stats (no eval-mode G use
        exists), so the drop is unobservable (docs/PARITY.md ledger).
        """
        if train_bn is None:
            train_bn = self.cfg.train.sample_train_bn
        z = self.fixed_noise if n is None else self.fixed_noise[:n]
        variables = {
            "params": self.state.g_params, "batch_stats": self.state.g_stats,
        }
        if train_bn:
            imgs, _ = self.gen.apply(
                variables, z, train=True, mutable=["batch_stats"]
            )
        else:
            imgs = self.gen.apply(variables, z, train=False)
        return np.asarray(imgs.astype(jnp.float32))
