"""Jitted GAN train steps (components C10, C11, C19, C20).

One fused step = [optional in-step strain] + D update + G update, all on
device.  Faithful to the reference's update algebra:

* D-first ordering (`#%basic.py:237-288`): D sees real then fake (two BN stat
  updates), D's Adam step applies, THEN the G loss re-scores the same fakes
  through the *updated* D.
* G-first ordering (`#8.py:118-132`, MNIST baselines): G updates first; the D
  step reuses the fakes from the pre-update G.
* Per-batch quantile mask (`# 상위 10%...X.py:280-318`): a no-grad scoring
  forward (train mode — torch updates BN running stats under no_grad too)
  masks the bottom ``mask_quantile`` of D scores; real AND fake sides then run
  at the masked size.  Static-shape translation: per-sample weights drive both
  the weighted BCE mean and masked BatchNorm — mathematically identical to
  torch's variable-size batch.
* In-batch recycle (`# 상위 10% 제거해서 fake image에 concate.py:238-287`):
  the masked-out reals replace their G-fake slots in the fake batch (same
  multiset as the reference's cat([fake[:b-k], strained_reals])).
* Pool concat (`# fake concate.py:604-641`, `# strainer gan + concate.py:
  601-650`): a pre-staged device-resident outlier pool contributes a full
  extra fake batch; D_G_z1 is logged over the generated half only and the G
  step uses only generated fakes.

All losses use logits + `ops.losses.bce_from_logits` (== Sigmoid+BCELoss).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops import stats as S
from .state import GANState, make_optimizer


class StepConfig(NamedTuple):
    d_loss_reduction: str = "sum"  # 'sum' | 'half_mean'
    g_before_d: bool = False
    real_label: float = 1.0
    fake_label: float = 0.0
    batch_mask: bool = False  # C19
    mask_quantile: float = 0.1
    in_batch_recycle: bool = False  # C20a
    recycle_quantile: float = 0.1
    pool_concat: bool = False  # C20b/c
    has_dropout: bool = False
    flatten: bool = False  # MNIST MLP path
    beta1: float = 0.5
    beta2: float = 0.999
    nz: int = 100


def normalize_u8(batch_u8, dtype):
    x = batch_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x.astype(dtype)


def _build_step_body(gen, disc, scfg: StepConfig, stem_share: bool = True):
    """The raw (unjitted) train step — shared by the per-step jit wrapper
    (`make_train_step`) and the scan-chunked executor
    (`make_chunked_train_step`).

    ``stem_share``: on masked-step configs with a stem/head-split
    discriminator (DCGAN), compute D's BN-free stem ONCE for the real batch
    and share it between the strain scoring forward and the training real
    forward via a captured VJP — exact (convs are per-sample; the mask only
    enters at the head's BatchNorms), saves ~35% of one D forward per step.
    Disable only for A/B equivalence tests.
    """
    tx = make_optimizer(scfg.beta1, scfg.beta2)
    cdtype = gen.compute_dtype
    stem_share = stem_share and hasattr(disc, "stem") and not scfg.has_dropout

    def d_apply(d_params, d_stats, x, weights, train, drop_key):
        variables = {"params": d_params, "batch_stats": d_stats}
        rngs = {"dropout": drop_key} if scfg.has_dropout else None
        out, mut = disc.apply(
            variables, x, train=train, sample_weights=weights,
            mutable=["batch_stats"], rngs=rngs,
        )
        return out, mut.get("batch_stats", d_stats)

    def g_apply(g_params, g_stats, z, weights):
        variables = {"params": g_params, "batch_stats": g_stats}
        out, mut = gen.apply(
            variables, z, train=True, sample_weights=weights,
            mutable=["batch_stats"],
        )
        return out, mut.get("batch_stats", g_stats)

    def adam_step(params, opt_state, grads, lr):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(
            lambda p, u: p - lr * u.astype(p.dtype), params, updates
        )
        return new_params, new_opt

    def step(state: GANState, batch_u8, source_id, key, lr_g, lr_d,
             mask_on=False, concat_on=False, pool_u8=None, d_train=True,
             lane_count=None):
        b = batch_u8.shape[0]
        # torch samples an independent dropout mask per forward — the real and
        # fake D passes inside the D step get distinct keys.
        (k_noise, k_score_drop, k_d_drop_real, k_d_drop_fake, k_g_drop,
         k_pool) = jax.random.split(key, 6)
        x = normalize_u8(batch_u8, cdtype)
        if scfg.flatten:
            x = x.reshape(b, -1)

        real_t = scfg.real_label
        fake_t = scfg.fake_label

        # ``lane_count`` (traced int32 scalar, or None = full batch): the
        # number of VALID leading lanes.  This is the exact partial final
        # batch of a drop_last=False DataLoader (`#%basic.py:76` — the CelebA
        # scripts keep torch's default): lanes >= lane_count are zero-weight
        # padding excluded from every loss mean, every BatchNorm statistic
        # (G's and D's), the in-step strain quantile, and the contamination
        # accounting — mathematically identical to torch's smaller tail
        # batch (tests/test_partial_batch.py pins this against torch).
        valid = None
        valid_w = None
        if lane_count is not None:
            valid = jnp.arange(b) < lane_count
            valid_w = valid.astype(jnp.float32)

        # ------------------------------------------------------ in-step strain
        # NOTE: mask_on is a *static* bool — when the gate is off, the whole
        # scoring forward below is dead code that XLA eliminates, so pre-gate
        # epochs (< mask_start_epoch) run at full unstrained speed.
        # (Compacting survivors into a 0.9b sub-batch was tried and measured
        # SLOWER than full-shape weighted lanes on v5e — odd batch sizes pad
        # back to tile multiples and the gather costs extra; see git history.)
        d_stats = state.d_stats
        keep = valid if valid is not None else jnp.ones((b,), bool)
        real_stem = None  # (stem_out, stem_vjp) when stem sharing is active
        if (scfg.batch_mask or scfg.in_batch_recycle) and mask_on:
            q = scfg.mask_quantile if scfg.batch_mask else scfg.recycle_quantile
            if stem_share:
                # one BN-free stem forward serves BOTH the scoring pass and
                # the training real forward; the captured VJP later pulls the
                # training loss's stem cotangent back to conv0/conv1 params.
                def stem_fwd(p):
                    return disc.apply({"params": p}, x, method="stem")

                h_real, stem_vjp = jax.vjp(stem_fwd, state.d_params)
                h_real = jax.lax.stop_gradient(h_real)
                real_stem = (h_real, stem_vjp)
                logits_s, mut = disc.apply(
                    {"params": state.d_params, "batch_stats": d_stats},
                    h_real, d_train, valid_w,
                    method="head", mutable=["batch_stats"],
                )
                scored_stats = mut["batch_stats"]
            else:
                logits_s, scored_stats = d_apply(
                    state.d_params, d_stats, x, valid_w, d_train, k_score_drop
                )
            probs_s = jax.nn.sigmoid(logits_s)
            if valid is None:
                thr = S.quantile(probs_s, q)
                keep = probs_s >= thr  # `# 상위 10%...X.py:284`
            else:
                # partial tail batch: the quantile is over the valid lanes
                # only, exactly torch.quantile on the smaller batch
                thr = S.masked_quantile(probs_s, valid, q)
                keep = jnp.logical_and(probs_s >= thr, valid)
            # torch updates BN running stats during the no-grad scoring pass
            d_stats = scored_stats
        w = keep.astype(jnp.float32)
        masked_any = (scfg.batch_mask or scfg.in_batch_recycle) and mask_on
        w_real = w if masked_any else valid_w
        # C19 generates noise at the masked size, and in recycle mode G only
        # produces b - b_fake fakes (`# 상위 10% 제거해서...py:265-266`) — in
        # both cases G's BN statistics cover only the surviving fake slots,
        # expressed here as sample weights on the full-shape forward.
        w_fake = w if masked_any else valid_w

        z = jax.random.normal(k_noise, (b, scfg.nz), jnp.float32)

        # ----------------------------------------------------------- G forward
        # One forward with a captured VJP: the reference stores the autograd
        # graph of this single G pass and reuses it for the G step
        # (`#%basic.py:259,277-288`) — the vjp is the jax equivalent and
        # avoids re-running G's forward in the G loss (~8% of step FLOPs).
        def g_fwd(p):
            out, mut = gen.apply(
                {"params": p, "batch_stats": state.g_stats}, z, train=True,
                sample_weights=w_fake, mutable=["batch_stats"],
            )
            return out, mut.get("batch_stats", state.g_stats)

        (fake, g_stats_new), g_vjp = jax.vjp(g_fwd, state.g_params, has_aux=False)
        zero_stats = jax.tree.map(jnp.zeros_like, g_stats_new)

        def build_fake_batch(fake_imgs):
            """D's fake-side batch + its weights + generated-slot mask."""
            if scfg.in_batch_recycle:
                use_real = jnp.logical_and(jnp.logical_not(keep), mask_on)
                if valid is not None:
                    # pad lanes are never recycled reals; they stay zero-
                    # weight fake slots (excluded below via valid weights)
                    use_real = jnp.logical_and(use_real, valid)
                um = use_real.reshape((b,) + (1,) * (x.ndim - 1))
                combined = jnp.where(um, x.astype(fake_imgs.dtype), fake_imgs)
                return combined, valid_w, jnp.logical_not(use_real)
            if scfg.pool_concat:
                pool_n = pool_u8.shape[0]
                perm = jax.random.permutation(k_pool, pool_n)
                # wrap around if the pool is smaller than the batch (the
                # reference's pool DataLoader would just starve; we resample)
                idx = perm[jnp.arange(b) % pool_n]
                pool_x = normalize_u8(jnp.take(pool_u8, idx, axis=0), cdtype)
                if scfg.flatten:
                    pool_x = pool_x.reshape(b, -1)
                combined = jnp.concatenate([fake_imgs, pool_x], axis=0)
                # before the gate epoch the pool contributes nothing: weight 0.
                # On a partial tail batch both halves shrink to the valid
                # lanes — the "fast" pool variant samples randperm[:b_size]
                # of the ACTUAL batch size (`# strainer gan + concate.py:622`).
                gen_w = jnp.ones((b,)) if valid_w is None else valid_w
                pw = jnp.concatenate(
                    [gen_w, jnp.where(concat_on, 1.0, 0.0) * gen_w]
                )
                gen_slot = jnp.concatenate(
                    [jnp.ones((b,), bool), jnp.zeros((b,), bool)]
                )
                if valid is not None:
                    gen_slot = jnp.concatenate(
                        [valid, jnp.zeros((b,), bool)]
                    )
                return combined, pw, gen_slot
            gen_slot = jnp.ones((b,), bool) if valid is None else valid
            return fake_imgs, w_fake, gen_slot

        # ------------------------------------------------------------- D update
        def d_loss_fn(d_params, fake_detached, stats0, h_real_in=None):
            stats = stats0
            if h_real_in is not None:
                # training real forward from the shared stem output; grads
                # w.r.t. h_real_in flow back through stem_vjp in d_update.
                out_r, mut = disc.apply(
                    {"params": d_params, "batch_stats": stats},
                    h_real_in, d_train, w_real,
                    method="head", mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
            else:
                out_r, stats = d_apply(
                    d_params, stats, x, w_real, d_train, k_d_drop_real
                )
            per_real = L.bce_from_logits(out_r, real_t)
            err_real = L.weighted_mean(per_real, w_real)

            fake_b, fw, gen_slot = build_fake_batch(fake_detached)
            out_f, stats = d_apply(d_params, stats, fake_b, fw, d_train, k_d_drop_fake)
            per_fake = L.bce_from_logits(out_f, fake_t)
            err_fake = L.weighted_mean(per_fake, fw)

            errD = L.d_loss(per_real, per_fake, scfg.d_loss_reduction, w_real, fw)
            p_r = jax.nn.sigmoid(out_r)
            p_f = jax.nn.sigmoid(out_f)
            d_x = L.weighted_mean(p_r, w_real)
            d_g_z1 = (
                L.weighted_mean(p_f, gen_slot.astype(jnp.float32))
                if scfg.pool_concat
                else L.weighted_mean(p_f, fw)
            )
            aux = dict(
                stats=stats, errD=errD, err_real=err_real, err_fake=err_fake,
                D_x=d_x, D_G_z1=d_g_z1, real_loss_per_sample=per_real,
            )
            return errD, aux

        def g_loss_from_fake(fake_in, d_params_now, d_stats_now):
            """G loss as a function of the generated images; its input
            cotangent feeds the captured g_vjp."""
            fake_b, fw, _ = build_fake_batch(fake_in)
            if scfg.pool_concat:
                fake_b, fw = fake_in, w_fake  # G trains on generated fakes only
            out, stats = d_apply(d_params_now, d_stats_now, fake_b, fw, d_train, k_g_drop)
            per = L.bce_from_logits(out, real_t)
            errG = L.weighted_mean(per, fw)
            d_g_z2 = L.weighted_mean(jax.nn.sigmoid(out), fw)
            return errG, dict(stats=stats, D_G_z2=d_g_z2)

        def g_update(d_params_now, d_stats_now):
            (errG_val, g_aux), fake_grad = jax.value_and_grad(
                g_loss_from_fake, has_aux=True
            )(fake, d_params_now, d_stats_now)
            (g_grads,) = g_vjp((fake_grad.astype(fake.dtype), zero_stats))
            g_params, g_opt = adam_step(state.g_params, state.g_opt, g_grads, lr_g)
            return errG_val, g_aux, g_params, g_opt

        def d_update(fake_detached, stats_in):
            if real_stem is not None:
                h_real, stem_vjp = real_stem
                (errD_val, d_aux), (d_grads, h_grad) = jax.value_and_grad(
                    d_loss_fn, argnums=(0, 3), has_aux=True
                )(state.d_params, fake_detached, stats_in, h_real)
                # pull the real-side head cotangent back through the shared
                # stem; the fake side's stem grads already flowed directly.
                (stem_grads,) = stem_vjp(h_grad)
                d_grads = jax.tree.map(jnp.add, d_grads, stem_grads)
            else:
                (errD_val, d_aux), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True
                )(state.d_params, fake_detached, stats_in)
            d_params, d_opt = adam_step(state.d_params, state.d_opt, d_grads, lr_d)
            return errD_val, d_aux, d_params, d_opt

        if not scfg.g_before_d:
            fake_sg = jax.lax.stop_gradient(fake)
            errD_val, d_aux, d_params, d_opt = d_update(fake_sg, d_stats)
            d_stats_after = d_aux["stats"]

            errG_val, g_aux, g_params, g_opt = g_update(d_params, d_stats_after)
            d_stats_final = g_aux["stats"]
        else:
            # `#8.py:118-132`: G first (through current D), then D on the same
            # pre-update-G fakes.
            errG_val, g_aux, g_params, g_opt = g_update(state.d_params, d_stats)

            fake_sg = jax.lax.stop_gradient(fake)
            # torch's G-first forward mutates D's BN running stats before the
            # D step sees them — thread g_aux's stats in, not the pre-G ones.
            errD_val, d_aux, d_params, d_opt = d_update(fake_sg, g_aux["stats"])
            d_stats_final = d_aux["stats"]

        # ----------------------------------------------------- ground-truth acct
        contam = source_id != 0
        if valid is not None:
            contam = jnp.logical_and(contam, valid)  # pads never counted
        n_contam = jnp.sum(contam)
        n_filtered_contam = jnp.where(
            mask_on, jnp.sum(jnp.logical_and(contam, jnp.logical_not(keep))), 0
        )

        new_state = GANState(
            g_params=g_params, g_stats=g_stats_new, g_opt=g_opt,
            d_params=d_params, d_stats=d_stats_final, d_opt=d_opt,
            step=state.step + 1,
        )
        metrics = dict(
            errD=errD_val, errG=errG_val,
            errD_real=d_aux["err_real"], errD_fake=d_aux["err_fake"],
            D_x=d_aux["D_x"], D_G_z1=d_aux["D_G_z1"], D_G_z2=g_aux["D_G_z2"],
            real_loss_per_sample=d_aux["real_loss_per_sample"],
            keep_mask=keep,
            # the D scores the in-step quantile mask was derived from — fed to
            # the runtime parity report (parity/agreement.py) so the oracle can
            # recompute the mask from the same scores with numpy quantile
            score_probs=(
                probs_s.astype(jnp.float32) if masked_any else jnp.zeros((b,))
            ),
            n_contam=n_contam, n_filtered_contam=n_filtered_contam,
        )
        return new_state, metrics

    return step


def make_train_step(gen, disc, scfg: StepConfig, donate: bool = True, mesh=None,
                    stem_share: bool = True):
    """Build the jitted step.  Returns
    ``step(state, batch_u8, source_id, key, lr_g, lr_d, mask_on, concat_on,
    pool_u8) -> (state, metrics)``.  ``mask_on`` is a STATIC python bool (the
    pre-gate program DCEs the scoring forward); ``concat_on`` stays traced
    (the pool gate is weight-only, no shape change).
    """
    step = _build_step_body(gen, disc, scfg, stem_share=stem_share)
    donate_argnums = (0,) if donate else ()
    # mask_on is static: with the gate off the scoring forward is dead code
    # XLA eliminates, so pre-gate epochs run at full speed (one extra compile
    # when the gate flips, like the reference's behavioral switch).
    if mesh is not None:
        from ..parallel.mesh import dp_shardings

        in_sh, out_sh = dp_shardings(mesh, mesh.axis_names[0])
        # d_train is static positionally (argnum 9): pjit forbids kwargs when
        # in_shardings is given.
        return jax.jit(
            step, donate_argnums=donate_argnums, static_argnums=(6, 9),
            in_shardings=in_sh, out_shardings=out_sh,
        )
    return jax.jit(step, donate_argnums=donate_argnums, static_argnums=(6, 9))


def make_chunked_train_step(gen, disc, scfg: StepConfig, donate: bool = True,
                            mesh=None, data_sharded: bool = False,
                            unroll: int = 1, with_lanes: bool = False):
    """Scan-fused multi-step executor: runs ``chunk`` consecutive train steps
    in ONE device dispatch, gathering each batch on-device from the
    HBM-resident dataset.

    Per-dispatch host overhead on a remote-attached TPU is ~1 ms; at a ~20 ms
    step that is ~5% of wall clock, and the per-step Python loop additionally
    forces a host round-trip whenever metrics are read.  Scanning the step
    body keeps the whole chunk on device: the step function is byte-for-byte
    the same body `make_train_step` jits (so results are bitwise identical —
    asserted by tests/test_chunked.py), metrics come back stacked
    ``(chunk, ...)`` and are fetched at most once per chunk.

    Returns ``chunked(state, data_u8, source_id_all, idx, keys, lr_g, lr_d,
    mask_on, concat_on, pool_u8, d_train) -> (state, stacked_metrics)`` where
    ``idx`` is ``(chunk, batch)`` int32 and ``keys`` is ``(chunk,)`` PRNG
    keys.  The chunk length is a trace-time constant taken from ``idx``'s
    leading dimension — one compile per distinct chunk length.

    With ``mesh``, the executor runs data-parallel (C27): state/dataset
    replicated, ``idx`` sharded along its batch axis so each device gathers
    its own batch shard locally inside the scan, gradients all-reduced by
    GSPMD — the chunked analog of ``make_train_step(mesh=...)``.

    ``with_lanes``: the returned callable takes a trailing ``lane_counts``
    ``(chunk,)`` int32 argument giving each step's valid-lane count (see the
    step body's ``lane_count``) — the executor form of the exact partial
    final batch (drop_last=False).  The Trainer only dispatches length-1
    lane chunks (the tail step), so the full-speed path never pays the
    lane-masking program.
    """
    step = _build_step_body(gen, disc, scfg, stem_share=True)

    if with_lanes:
        def chunked(state, data_u8, source_id_all, idx, keys, lr_g, lr_d,
                    mask_on=False, concat_on=False, pool_u8=None,
                    d_train=True, lane_counts=None):
            def body(st, inp):
                ix, k, lc = inp
                batch = jnp.take(data_u8, ix, axis=0)
                src = jnp.take(source_id_all, ix, axis=0)
                return step(st, batch, src, k, lr_g, lr_d,
                            mask_on, concat_on, pool_u8, d_train,
                            lane_count=lc)

            return jax.lax.scan(
                body, state, (idx, keys, lane_counts), unroll=unroll
            )
    else:
        def chunked(state, data_u8, source_id_all, idx, keys, lr_g, lr_d,
                    mask_on=False, concat_on=False, pool_u8=None,
                    d_train=True):
            def body(st, inp):
                ix, k = inp
                batch = jnp.take(data_u8, ix, axis=0)
                src = jnp.take(source_id_all, ix, axis=0)
                return step(st, batch, src, k, lr_g, lr_d,
                            mask_on, concat_on, pool_u8, d_train)

            # ``unroll`` is an executor knob only (identical results, the
            # scan body is replicated so XLA can overlap adjacent steps' HBM
            # traffic with MXU work); >1 roughly doubles the chunked
            # program's compile time, so it is opt-in via
            # TrainConfig.scan_unroll.
            return jax.lax.scan(body, state, (idx, keys), unroll=unroll)

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        from ..parallel.mesh import dp_chunked_shardings

        in_sh, out_sh = dp_chunked_shardings(
            mesh, mesh.axis_names[0], data_sharded=data_sharded,
            with_lanes=with_lanes,
        )
        return jax.jit(
            chunked, donate_argnums=donate_argnums, static_argnums=(7, 10),
            in_shardings=in_sh, out_shardings=out_sh,
        )
    return jax.jit(chunked, donate_argnums=donate_argnums,
                   static_argnums=(7, 10))


def make_gated_chunked_train_step(gen, disc, scfg: StepConfig,
                                  donate: bool = True, unroll: int = 1,
                                  mesh=None, data_sharded: bool = False):
    """Scan-chunked executor whose step count is a DEVICE value.

    The per-epoch step count is data-dependent (``n_active // batch``), and
    on a remote-attached TPU fetching it costs a ~28 ms round trip that
    serializes the strain scoring pass against the first training dispatch.
    This variant takes the count as a traced scalar instead: the Trainer
    dispatches a static number of chunks covering the *maximum* possible
    step count and each scan iteration whose global position ``c0 + i`` is
    past ``n_valid`` skips the step body behind a ``lax.cond`` (the state
    and the previous step's metrics pass through, so row ``v`` of the
    stacked metrics is the last live step's values for every dead row
    ``v >= n_valid``).  The host then fetches the packed epoch stats WHILE
    the chunks execute, hiding the round trip under device compute
    (train/loop.py's deferred-stats path).

    Live steps are bitwise identical to ``make_chunked_train_step`` — the
    scan body calls the same ``_build_step_body`` program — and dead
    iterations cost only the conditional (no gather, no matmuls); asserted
    by tests/test_chunked.py.

    Returns ``gated(state, data_u8, source_id_all, idx, keys, c0, n_valid,
    lr_g, lr_d, mask_on, concat_on, pool_u8, d_train)`` with ``c0`` the
    chunk's global starting step index and ``n_valid`` the epoch's live
    step count (both traced int32 scalars).
    """
    step = _build_step_body(gen, disc, scfg, stem_share=True)

    def gated(state, data_u8, source_id_all, idx, keys, c0, n_valid,
              lr_g, lr_d, mask_on=False, concat_on=False, pool_u8=None,
              d_train=True):
        b_sh = jax.ShapeDtypeStruct(
            (idx.shape[1],) + data_u8.shape[1:], data_u8.dtype
        )
        s_sh = jax.ShapeDtypeStruct((idx.shape[1],), source_id_all.dtype)
        # metrics skeleton for dead rows before the first live step (the
        # deferred path never reads rows past n_valid, so zeros are fine)
        m_shapes = jax.eval_shape(
            lambda st, bx, sx, k: step(st, bx, sx, k, lr_g, lr_d,
                                       mask_on, concat_on, pool_u8, d_train),
            state, b_sh, s_sh, keys[0],
        )[1]
        zeros_m = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), m_shapes
        )
        positions = c0 + jnp.arange(idx.shape[0], dtype=jnp.int32)

        def body(carry, inp):
            st, last_m = carry
            ix, k, pos = inp

            def live(_):
                batch = jnp.take(data_u8, ix, axis=0)
                src = jnp.take(source_id_all, ix, axis=0)
                return step(st, batch, src, k, lr_g, lr_d,
                            mask_on, concat_on, pool_u8, d_train)

            st2, m = jax.lax.cond(
                pos < n_valid, live, lambda _: (st, last_m), None
            )
            return (st2, m), m

        def run_chunk(st):
            (st, _), ms = jax.lax.scan(
                body, (st, zeros_m), (idx, keys, positions), unroll=unroll
            )
            return st, ms

        def skip_chunk(st):
            # a fully-dead chunk must not pay the per-iteration carry copies
            # of 32 false conds (~17 ms measured on v5e at the DCGAN-64
            # state size) — one outer cond skips the whole scan
            dead = jax.tree.map(
                lambda z: jnp.zeros((idx.shape[0],) + z.shape, z.dtype),
                zeros_m,
            )
            return st, dead

        state, metrics = jax.lax.cond(
            positions[0] < n_valid, run_chunk, skip_chunk, state
        )
        return state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        from ..parallel.mesh import dp_gated_shardings

        in_sh, out_sh = dp_gated_shardings(
            mesh, mesh.axis_names[0], data_sharded=data_sharded
        )
        return jax.jit(gated, donate_argnums=donate_argnums,
                       static_argnums=(9, 12),
                       in_shardings=in_sh, out_shardings=out_sh)
    return jax.jit(gated, donate_argnums=donate_argnums,
                   static_argnums=(9, 12))


def make_gated_tail_step(gen, disc, scfg: StepConfig, donate: bool = True,
                         mesh=None, data_sharded: bool = False):
    """Device-gated PARTIAL tail step for the deferred-stats path.

    With drop_last=False (the reference CelebA loaders' default,
    `#%basic.py:76`) every epoch ends in one partial batch of
    ``n_active % batch`` samples.  On the deferred path both the full-step
    count and the tail size are device values, so the tail runs as one
    dispatch that (a) gates on ``tail_count > 0`` behind a ``lax.cond``,
    (b) gathers its batch row ``idx[n_full]`` dynamically, and (c) executes
    the step body with ``lane_count = tail_count`` — the exact-partial-batch
    program.  Dead (no-tail) dispatches cost only the cond.

    Returns ``tail(state, data_u8, source_id_all, idx, keys, n_full,
    tail_count, lr_g, lr_d, mask_on, concat_on, pool_u8, d_train)`` with
    ``idx``/``keys`` the epoch's FULL index/key stacks (the tail row is
    selected on device) and ``n_full``/``tail_count`` traced int32 scalars.
    """
    step = _build_step_body(gen, disc, scfg, stem_share=True)

    def tail(state, data_u8, source_id_all, idx, keys, n_full, tail_count,
             lr_g, lr_d, mask_on=False, concat_on=False, pool_u8=None,
             d_train=True):
        row = jnp.minimum(n_full, idx.shape[0] - 1)
        b_sh = jax.ShapeDtypeStruct(
            (idx.shape[1],) + data_u8.shape[1:], data_u8.dtype
        )
        s_sh = jax.ShapeDtypeStruct((idx.shape[1],), source_id_all.dtype)
        m_shapes = jax.eval_shape(
            lambda st, bx, sx, k: step(st, bx, sx, k, lr_g, lr_d,
                                       mask_on, concat_on, pool_u8, d_train,
                                       lane_count=tail_count),
            state, b_sh, s_sh, keys[0],
        )[1]
        zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shapes)

        def live(st):
            ix = jnp.take(idx, row, axis=0)
            k = jnp.take(keys, row, axis=0)
            batch = jnp.take(data_u8, ix, axis=0)
            src = jnp.take(source_id_all, ix, axis=0)
            return step(st, batch, src, k, lr_g, lr_d,
                        mask_on, concat_on, pool_u8, d_train,
                        lane_count=tail_count)

        return jax.lax.cond(tail_count > 0, live, lambda st: (st, zeros_m),
                            state)

    donate_argnums = (0,) if donate else ()
    if mesh is not None:
        from ..parallel.mesh import dp_gated_tail_shardings

        in_sh, out_sh = dp_gated_tail_shardings(
            mesh, mesh.axis_names[0], data_sharded=data_sharded
        )
        return jax.jit(tail, donate_argnums=donate_argnums,
                       static_argnums=(9, 12),
                       in_shardings=in_sh, out_shardings=out_sh)
    return jax.jit(tail, donate_argnums=donate_argnums,
                   static_argnums=(9, 12))
