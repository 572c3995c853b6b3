"""Full-dataset scoring passes (components C12, C15, C7-scoring).

The reference's per-epoch strain re-scores every surviving sample with an
extra forward pass, gathering scores to host numpy (`# final.py:343-374`,
`#z_score.py:276-294`).  Here the pass is a ``lax.scan`` over HBM-resident
uint8 batches: gather -> fused normalize -> forward -> per-sample score, with
scores staying in HBM.  BASELINE.json's "filtering decisions never leave HBM".

Scoring runs over the FULL dataset every time (static shapes); the caller
intersects with the current ``active`` mask.  All loss scorers put D in eval
mode (`#clean 분포...py:275` — BN running stats, dropout off), which makes
scores batch-independent, so scanning the full set in order is exactly
equivalent to the reference's subset DataLoader pass.

Precision policy: filtering *decisions* carry f32 rounding.  Distribution-
shaped deciders (GMM, ensemble) score all-f32 (``score_d_losses``).  The
percentile decider only needs exact scores NEAR its order statistic, so
``fused_percentile_refine`` scores the bulk in bf16 and re-scores the
threshold band in f32 — same mask, a fraction of the cost.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..data.pipeline import DeviceDataset, normalize_u8
from ..ops import losses as L


def _scan_batches(apply_fn: Callable, images_u8: jnp.ndarray, batch_size: int,
                  subset: jnp.ndarray | None = None,
                  unroll: int = 1) -> jnp.ndarray:
    """Run ``apply_fn(batch_normalized) -> (b,) or (b, d)`` over all samples.

    With ``subset`` (int32 indices), scores only those samples — each scan
    step gathers its batch from the HBM dataset, so no compacted copy of the
    image array is ever materialized.  Returns ``(len(subset), ...)`` scores
    aligned with ``subset``.

    ``unroll``: scoring iterations carry no state (eval-mode forwards are
    per-sample), so unrolling lets XLA overlap one iteration's HBM gather
    with the previous iteration's MXU work while keeping live activations
    bounded at ``unroll`` batches.  Results are identical.
    """
    if subset is not None:
        n = subset.shape[0]
        nb = -(-n // batch_size)
        pad = nb * batch_size - n
        idx = jnp.concatenate([subset, jnp.zeros((pad,), subset.dtype)]) if pad else subset
        idx = idx.reshape(nb, batch_size)

        def body(_, ib):
            return _, apply_fn(jnp.take(images_u8, ib, axis=0))

        _, outs = jax.lax.scan(body, None, idx, unroll=unroll)
        outs = outs.reshape((nb * batch_size,) + outs.shape[2:])
        return outs[:n]

    n = images_u8.shape[0]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n

    def body(_, idx):
        batch = jax.lax.dynamic_index_in_dim(padded, idx, axis=0, keepdims=False)
        return _, apply_fn(batch)

    padded = jnp.concatenate(
        [images_u8, jnp.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)]
    ) if pad else images_u8
    padded = padded.reshape((nb, batch_size) + images_u8.shape[1:])
    _, outs = jax.lax.scan(body, None, jnp.arange(nb), unroll=unroll)
    outs = outs.reshape((nb * batch_size,) + outs.shape[2:])
    return outs[:n]


def score_d_losses(
    disc, d_params, d_stats, dataset: DeviceDataset, real_label: float = 1.0,
    batch_size: int = 64, flatten: bool = False,
    subset: jnp.ndarray | None = None, unroll: int = 1,
) -> jnp.ndarray:
    """Per-sample BCE(D(x), real_label) with D in eval mode.

    Replicates `refine_dataset_by_loss`'s scoring loop (`# final.py:343-356`)
    and `evaluate_dataset` (`#clean 분포...py:272-287`; that script's BCE is
    over D's (N,1) output then ``.mean(dim=1)`` — identical per-sample value).

    ``subset``: optional int32 indices; scores only those samples (the
    reference scores the *prefiltered* Subset, `# final.py:440-443` — after
    a prefilter there is no reason to pay the forward for permanently-dropped
    samples).  Returns scores aligned with ``subset``.

    The forward runs in float32 regardless of the training compute dtype:
    training rides the MXU in bf16, but filtering *decisions* must carry the
    reference's f32 rounding (bf16 scoring drifts scores ~1% and flips
    borderline percentile decisions — measured in
    tests/test_golden_mask_agreement.py).

    The jitted pass is cached per (disc, batch_size, flatten, real_label) —
    without this, every epoch's re-strain would rebuild and recompile the
    scan.
    """
    key = (id(disc), batch_size, flatten, float(real_label), unroll)
    if key not in _D_SCORE_CACHE:
        # (s2d conv form was also tried here: slower for the f32 scan on
        # v5e despite the isolated-forward microbench win — direct convs.)
        disc_f32 = disc.clone(compute_dtype=jnp.float32)

        def _apply_fn(d_params, d_stats):
            def apply_fn(batch_u8):
                x = normalize_u8(batch_u8, jnp.float32)
                if flatten:
                    x = x.reshape(x.shape[0], -1)
                logits = disc_f32.apply(
                    {"params": d_params, "batch_stats": d_stats}, x, train=False
                )
                return L.bce_from_logits(logits, real_label)

            return apply_fn

        @jax.jit
        def scorer(d_params, d_stats, images):
            return _scan_batches(
                _apply_fn(d_params, d_stats), images, batch_size, unroll=unroll
            )

        @jax.jit
        def scorer_subset(d_params, d_stats, images, subset):
            return _scan_batches(
                _apply_fn(d_params, d_stats), images, batch_size, subset,
                unroll=unroll,
            )

        # hold a strong ref to disc: the key uses id(), which CPython may
        # reuse after garbage collection (same hazard eval/fid.py guards
        # against in _BATCH_PROG_CACHE)
        _D_SCORE_CACHE[key] = (scorer, scorer_subset, disc)
    scorer, scorer_subset = _D_SCORE_CACHE[key][:2]
    if subset is not None:
        return scorer_subset(d_params, d_stats, dataset.images, subset)
    return scorer(d_params, d_stats, dataset.images)


_D_SCORE_CACHE = {}


def score_features(
    extractor_apply: Callable[[jnp.ndarray], jnp.ndarray],
    dataset: DeviceDataset, batch_size: int = 64,
) -> jnp.ndarray:
    """Feature pass for the z-score strainers (`#z_score.py:276-283`).

    ``extractor_apply``: normalized image batch -> (b, D) features (eval mode).
    """

    def apply_fn(batch_u8):
        x = normalize_u8(batch_u8, jnp.float32)
        return extractor_apply(x)

    return _scan_batches(apply_fn, dataset.images, batch_size)


_BAND_CACHE = {}


def fused_percentile_refine(
    disc, d_params, d_stats, dataset: DeviceDataset,
    loss_ratio, valid: jnp.ndarray,
    real_label: float = 1.0, batch_size: int = 512, flatten: bool = False,
    subset: jnp.ndarray | None = None,
    band_eps: float = 0.05, band_capacity_frac: float = 0.0625,
    unroll: int = 1,
):
    """Percentile loss-refinement (`# final.py:343-374`) with band-exact
    mixed-precision scoring, fused into ONE device dispatch.

    The flagship pipeline re-scores every surviving sample once per epoch;
    a full-f32 pass is ~30% of `final`'s end-to-end step budget.  The mask,
    however, only needs f32 *decisions*: per-sample BCE is scored in bf16
    for the bulk, the percentile threshold is estimated on those scores,
    and every sample within ``band_eps * max(1, |thr|)`` of it is re-scored
    in exact f32 (bf16 drift is relative to score magnitude, so the band
    scales with the decision value).  Samples outside the band cannot flip
    (measured normalized drift p100 is ~7x below the half-band — see
    scripts/tolerance_analysis.py; pinned by tests/test_band_scoring.py and
    tests/test_tolerance.py), so the final mask is identical to the all-f32
    mask.  When the empty-keep fallback engages (a RANK cut at the median,
    `# final.py:365-367`), the median value-neighborhood is re-scored too —
    behind a ``lax.cond``, so non-fallback epochs never pay it.  If any band
    overflows its static capacity (``band_capacity_frac`` of the scored
    set), an in-graph ``lax.cond`` falls back to re-scoring everything in
    f32 — exactness never depends on the band being big enough.

    Everything — both scans, band selection, threshold, mask, stats —
    lives in one jitted program: no eager threshold ops, no host round
    trips.  Returns ``(mask, thr, scores, band_stats)`` where ``scores``
    are the hybrid per-sample losses (+inf outside ``subset``) and
    ``band_stats = [n_rescored, fell_back_to_f32, max_normalized_drift]``
    (f32, device; normalized drift = |bf16-f32| / max(1, |f32|)).

    ``loss_ratio`` semantics match thresholds.percentile_refine_mask
    (which this calls verbatim on the hybrid scores): keep
    ``loss < percentile(losses, (1-loss_ratio)*100)`` with the
    bottom-half empty-set fallback (`# final.py:361-367`).
    """
    n = dataset.n
    sub_len = None if subset is None else int(subset.shape[0])
    m = n if sub_len is None else sub_len
    cap = min(m, max(256, int(m * band_capacity_frac)))
    cap = -(-cap // batch_size) * batch_size  # whole scan batches
    key = (id(disc), batch_size, flatten, float(real_label), sub_len, cap,
           float(band_eps), n, unroll)
    if key not in _BAND_CACHE:
        from ..ops import stats as S
        from . import thresholds as TH

        disc_lo = disc.clone(compute_dtype=jnp.bfloat16)
        disc_hi = disc.clone(compute_dtype=jnp.float32)

        @jax.jit
        def refine(d_params, d_stats, images, valid, ratio, subset_idx):
            def mk_apply(dc):
                def apply_fn(batch_u8):
                    x = normalize_u8(batch_u8, dc.compute_dtype)
                    if flatten:
                        x = x.reshape(x.shape[0], -1)
                    logits = dc.apply(
                        {"params": d_params, "batch_stats": d_stats},
                        x, train=False,
                    )
                    return L.bce_from_logits(logits, real_label)

                return apply_fn

            scan_subset = subset_idx if sub_len is not None else None

            def to_full(vals):
                if sub_len is None:
                    return vals
                # +inf outside the permanent base: never kept, sorts last
                return (
                    jnp.full((n,), jnp.inf, jnp.float32)
                    .at[subset_idx].set(vals)
                )

            s_bulk = to_full(
                _scan_batches(mk_apply(disc_lo), images, batch_size,
                              scan_subset, unroll=unroll)
            )
            q = (1.0 - ratio) * 100.0
            # ONE argsort of the bulk scores serves the threshold estimate
            # (gather-sorted values interpolated exactly as masked_percentile)
            # and the rank windows below — 66k sorts are ~15 ms each on v5e.
            big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
            order = jnp.argsort(jnp.where(valid, s_bulk, big))
            xs = jnp.where(valid, s_bulk, big)[order]
            nv = jnp.sum(valid)
            pos = q / 100.0 * jnp.maximum(nv - 1, 0)
            pos_lo = jnp.floor(pos).astype(jnp.int32)
            frac = pos - pos_lo
            x_lo = xs[jnp.clip(pos_lo, 0, n - 1)]
            x_hi = xs[jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, n - 1)]
            thr0 = x_lo + (x_hi - x_lo) * frac
            # bf16 drift is RELATIVE to score magnitude (mantissa rounding),
            # so the band half-width scales with the decision value
            eps_thr = band_eps * jnp.maximum(1.0, jnp.abs(thr0))
            band = jnp.logical_and(valid, jnp.abs(s_bulk - thr0) <= eps_thr)
            # Distance alone is not enough when scores are SPARSE near a
            # decision point: an interpolation endpoint of the percentile
            # (sorted ranks floor/ceil of pos) or the bottom-half fallback
            # boundary (rank n_valid//2, `# final.py:365-367`) can sit
            # outside the eps-band and would keep its bf16 value.  Union
            # small rank windows around both positions so every value a
            # decision interpolates at is re-scored in exact f32.
            r = 8
            win = jnp.arange(-r, r + 2)

            def rank_window(p):
                return order[jnp.clip(p + win, 0, n - 1)]

            pos_half = (nv // 2).astype(jnp.int32)
            in_window = (
                jnp.zeros((n,), bool)
                .at[rank_window(pos_lo)].set(True)
                .at[rank_window(pos_half)].set(True)
            )
            band = jnp.logical_and(jnp.logical_or(band, in_window), valid)
            n_band = jnp.sum(band)
            overflow = n_band > cap

            def rescore(base_scores, members):
                """f32 re-score of ``members`` scattered over base_scores;
                returns (hybrid, normalized max drift over real lanes)."""
                (b_idx,) = jnp.nonzero(members, size=cap, fill_value=n)
                safe = jnp.minimum(b_idx, n - 1)  # pad lanes score row n-1
                vals = _scan_batches(mk_apply(disc_hi), images, batch_size, safe)
                hybrid = base_scores.at[b_idx].set(vals, mode="drop")
                real = b_idx < n
                norm = jnp.maximum(1.0, jnp.abs(vals))
                d = jnp.max(
                    jnp.where(real, jnp.abs(vals - base_scores[safe]) / norm, 0.0)
                )
                return hybrid, d

            s_hybrid, drift = rescore(s_bulk, band)
            mask1, thr1 = TH.percentile_refine_mask(s_hybrid, ratio, valid=valid)
            # Did the empty-keep fallback engage (`# final.py:365-367`)?  Its
            # mask is a RANK cut at the median, where bf16 ordering can be
            # wrong in dense score regions — re-score the median value
            # neighborhood too, but only when actually needed (the extra scan
            # + sort live behind the cond).
            n_kept1 = jnp.sum(jnp.logical_and(s_hybrid < thr1, valid))
            m0 = xs[jnp.clip(pos_half, 0, n - 1)]
            eps_med = band_eps * jnp.maximum(1.0, jnp.abs(m0))
            band_med = jnp.logical_and(
                jnp.logical_and(valid, jnp.abs(s_bulk - m0) <= eps_med),
                jnp.logical_not(band),
            )
            n_med = jnp.sum(band_med)
            need_med = n_kept1 == 0
            full_needed = jnp.logical_or(
                overflow, jnp.logical_and(need_med, n_med > cap)
            )

            def full_f32(_):
                s = to_full(
                    _scan_batches(
                        mk_apply(disc_hi), images, batch_size, scan_subset,
                        unroll=unroll,
                    )
                )
                m, t = TH.percentile_refine_mask(s, ratio, valid=valid)
                return m, t, s, jnp.float32(0.0)

            def banded(_):
                def with_median(_):
                    s2, d2 = rescore(s_hybrid, band_med)
                    m2, t2 = TH.percentile_refine_mask(s2, ratio, valid=valid)
                    return m2, t2, s2, jnp.maximum(drift, d2)

                return jax.lax.cond(
                    need_med, with_median,
                    lambda _: (mask1, thr1, s_hybrid, drift), None,
                )

            mask, thr, s_final, drift_f = jax.lax.cond(
                full_needed, full_f32, banded, None
            )
            stats = jnp.stack([
                (n_band + jnp.where(need_med, n_med, 0)).astype(jnp.float32),
                full_needed.astype(jnp.float32),
                drift_f,
            ])
            return mask, thr, s_final, stats

        # strong disc ref: id()-keyed caches must outlive id reuse (see
        # _D_SCORE_CACHE / eval/fid.py)
        _BAND_CACHE[key] = (refine, disc)
    refine = _BAND_CACHE[key][0]
    subset_arg = subset if subset is not None else jnp.zeros((0,), jnp.int32)
    return refine(
        d_params, d_stats, dataset.images, valid,
        jnp.asarray(loss_ratio, jnp.float32), subset_arg,
    )


_AE_SCORE_CACHE = {}


def score_ae_errors(
    ae, ae_params, dataset: DeviceDataset, batch_size: int = 64
) -> jnp.ndarray:
    """Per-sample AE reconstruction MSE (`#autoencoder.py:307-322`).

    Jitted once per (ae, batch_size) — the AE strainer re-scores the full
    dataset every epoch (`:346-351`)."""
    from ..models.autoencoder import reconstruction_errors

    key = (id(ae), batch_size)
    if key not in _AE_SCORE_CACHE:

        @jax.jit
        def scorer(params, images):
            def apply_fn(batch_u8):
                x = normalize_u8(batch_u8, ae.compute_dtype)
                recon = ae.apply({"params": params}, x)
                return reconstruction_errors(recon, x)

            return _scan_batches(apply_fn, images, batch_size)

        # strong ae ref: id()-keyed caches must outlive id reuse
        _AE_SCORE_CACHE[key] = (scorer, ae)
    return _AE_SCORE_CACHE[key][0](ae_params, dataset.images)
