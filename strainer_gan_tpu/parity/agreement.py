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
    if (
        eng.last_scores is None or eng.last_mask is None
        or method in ("none", "batch_quantile_mask")
    ):
        return {}

    scores = np.asarray(eng.last_scores, np.float64).astype(np.float32)
    ours = np.asarray(eng.last_mask)  # mask at strain time (pre epoch-reset)
    sc = trainer.cfg.strain

    if method == "zscore_fixed":
        want = scores < sc.z_threshold if sc.strict_less else scores <= sc.z_threshold
    elif method == "zscore_elbow":
        thr, _, _ = oracle.find_elbow_threshold(scores)
        want = scores < thr
    elif method == "zscore_dbscan":
        # ratio came from the device DBSCAN; re-threshold with numpy quantile
        thr = float(np.quantile(scores, ours.mean())) if ours.any() else np.inf
        want = scores <= thr
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
