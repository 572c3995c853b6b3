"""Operational filter-mask agreement reporting (the BASELINE headline metric).

Given a live trainer, recompute the current strain decision BOTH ways — the
device engine and the numpy/sklearn oracle with the reference's exact
conventions — from the same scores, and report per-sample agreement.  This is
the runtime counterpart of tests/test_golden_mask_agreement.py, usable on any
run via ``python -m strainer_gan_tpu.cli ... --parity-check``.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from . import oracle


def agreement_report(trainer, epoch: Optional[int] = None) -> Dict:
    """Compare the engine's latest mask against the oracle on shared scores.

    Returns {} when the run has no maskable strainer or no strain has
    happened yet.
    """
    eng = trainer.engine
    method = trainer.cfg.strain.method
    sc = trainer.cfg.strain

    if method == "batch_quantile_mask":
        # in-step mask (C19): compare the device quantile mask against the
        # reference's host-side torch.quantile semantics on the same recorded
        # D scores (`# 상위 10%...X.py:283-284`)
        if eng.last_batch_scores is None or eng.last_batch_mask is None:
            return {}
        scores = np.asarray(eng.last_batch_scores, np.float64)
        ours = np.asarray(eng.last_batch_mask)
        # drop_last=False epochs end in a lane-masked partial tail: only the
        # first ``last_batch_valid`` lanes are real samples — the reference's
        # torch.quantile ran on that smaller final batch, so the oracle must
        # too (pad lanes carry garbage scores and keep=False by construction)
        nv = getattr(eng, "last_batch_valid", None)
        if nv is not None and nv < len(ours):
            scores, ours = scores[:nv], ours[:nv]
        want, _ = oracle.batch_quantile_keep(scores, sc.mask_quantile)
        agree = oracle.mask_agreement(ours, want)
        return dict(
            method=method, agreement=agree, ours_kept=int(ours.sum()),
            oracle_kept=int(np.asarray(want).sum()), n=len(ours),
        )

    if eng.last_scores is None or eng.last_mask is None or method == "none":
        return {}

    scores = np.asarray(eng.last_scores, np.float64).astype(np.float32)
    ours = np.asarray(eng.last_mask)  # mask at strain time (pre epoch-reset)

    if method == "zscore_fixed":
        want = scores < sc.z_threshold if sc.strict_less else scores <= sc.z_threshold
    elif method == "zscore_elbow":
        thr, _, _ = oracle.find_elbow_threshold(scores)
        want = scores < thr
    elif method == "zscore_dbscan":
        # full independent oracle chain: sklearn StandardScaler+DBSCAN on the
        # cached features estimates the clean ratio, then numpy quantile on
        # the max-|z| scores (`# z_score + DBSCAN.py:272-326`) — no reuse of
        # the device decision
        if eng._features is None:
            return {}
        feats = np.asarray(eng._features, np.float32)
        ratio = oracle.dbscan_clean_ratio(
            feats, sc.dbscan_eps, sc.dbscan_min_samples
        )
        want, _ = oracle.zscore_quantile_mask(feats, ratio, sc.z_std_mode)
        # zero-variance feature dims make the torch-exact oracle NaN every
        # z-score (0/0) and drop ALL samples — cannot happen with pretrained
        # backbone weights, but random-init fallback backbones can have dead
        # dims; the device intentionally maps them to z=0 (PARITY.md).  Tag
        # the report so a low number in that synthetic regime is explainable.
        n_dead = int((feats.std(axis=0, ddof=1) == 0.0).sum())
        extra = {"degenerate_dims": n_dead} if n_dead else {}
        agree = oracle.mask_agreement(ours, want)
        return dict(
            method=method, agreement=agree, ours_kept=int(ours.sum()),
            oracle_kept=int(np.asarray(want).sum()), n=len(ours), **extra,
        )
    elif method == "loss_percentile":
        base = np.asarray(eng.base_active)
        ratio = None
        if sc.final_py_ratio_inversion:
            from ..train.schedules import clean_ratio_at

            ratio = clean_ratio_at(
                epoch if epoch is not None else trainer.cfg.train.epochs - 1,
                sc.clean_ratio_schedule,
            )
        lr_ = ratio if ratio is not None else sc.loss_ratio
        sub_mask, _ = oracle.percentile_refine_mask(scores[base], lr_)
        want = np.zeros_like(ours)
        want[np.nonzero(base)[0][sub_mask]] = True
    elif method == "loss_gmm":
        want, _ = oracle.gmm_mask(scores, seed=0)
    elif method == "loss_ensemble":
        from ..train.schedules import clean_ratio_at

        ratio = clean_ratio_at(
            epoch if epoch is not None else trainer.cfg.train.epochs - 1,
            sc.clean_ratio_schedule,
        )
        idx, _ = oracle.ensemble_truncated_indices(scores, ratio, seed=0)
        want = np.zeros_like(ours)
        want[idx] = True
    elif method == "autoencoder":
        want, _ = oracle.ae_error_mask(scores, sc.ae_sigma)
    else:
        return {}

    agree = oracle.mask_agreement(ours, want)
    return dict(
        method=method,
        agreement=agree,
        ours_kept=int(ours.sum()),
        oracle_kept=int(np.asarray(want).sum()),
        n=len(ours),
    )
