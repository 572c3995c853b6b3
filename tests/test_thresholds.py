"""Mask agreement: device strainers vs numpy parity oracles.

The BASELINE.json headline requires >=99% filter-mask agreement; for
deterministic formulas (z-score, percentile, IQR, elbow, AE, quantile) we
require 100% here.  GMM/DBSCAN (estimator-initialized in sklearn) are held to
the 99% bar on well-separated synthetic data.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.parity import oracle
from strainer_gan_tpu.strain import thresholds as TH


@pytest.fixture(scope="module")
def features(rng=None):
    rng = np.random.default_rng(1)
    clean = rng.standard_normal((400, 32)).astype(np.float32)
    noisy = rng.standard_normal((60, 32)).astype(np.float32) * 4.0 + 3.0
    return np.concatenate([clean, noisy])


@pytest.fixture(scope="module")
def losses():
    rng = np.random.default_rng(2)
    clean = np.abs(rng.normal(0.3, 0.1, 700)).astype(np.float32)
    noisy = np.abs(rng.normal(1.5, 0.3, 120)).astype(np.float32)
    return np.concatenate([clean, noisy])


def agreement(a, b):
    return oracle.mask_agreement(np.asarray(a), np.asarray(b))


def test_zscore_fixed(features):
    for std_mode in ("torch", "numpy_eps"):
        for strict in (True, False):
            got, _ = TH.zscore_fixed_mask(
                jnp.asarray(features), 3.0, std_mode, strict
            )
            if std_mode == "torch":
                want = oracle.zscore_fixed_mask(features, 3.0, "torch", strict)
            else:
                want = oracle.zscore_fixed_mask(features, 3.0, "numpy", strict)
            assert agreement(got, want) == 1.0


def test_zscore_elbow(features):
    got, thr = TH.zscore_elbow_mask(jnp.asarray(features))
    want, wthr = oracle.zscore_elbow_mask(features)
    np.testing.assert_allclose(float(thr), wthr, rtol=1e-4)
    assert agreement(got, want) == 1.0


def test_zscore_dbscan_quantile(features):
    ratio = oracle.dbscan_clean_ratio(features, eps=6.0, min_samples=3)
    got_ratio = float(
        TH.dbscan_clean_ratio(jnp.asarray(features), 6.0, 3)
    )
    np.testing.assert_allclose(got_ratio, ratio, atol=1e-6)
    got, _ = TH.zscore_quantile_mask(jnp.asarray(features), got_ratio)
    want, _ = oracle.zscore_quantile_mask(features, ratio)
    assert agreement(got, want) >= 0.99


def test_gmm_mask(losses):
    got, gthr = TH.gmm_mask(jnp.asarray(losses))
    want, wthr = oracle.gmm_mask(losses, seed=0)
    assert agreement(got, want) >= 0.99, (float(gthr), wthr)


def test_ensemble_mask(losses):
    got, gthr = TH.ensemble_mask(jnp.asarray(losses))
    want, wthr = oracle.ensemble_mask(losses, seed=0)
    assert agreement(got, want) >= 0.99, (float(gthr), wthr)


def test_percentile_refine(losses):
    got, gthr = TH.percentile_refine_mask(jnp.asarray(losses), 0.2)
    want, wthr = oracle.percentile_refine_mask(losses, 0.2)
    np.testing.assert_allclose(float(gthr), wthr, rtol=1e-5)
    assert agreement(got, want) == 1.0


def test_percentile_refine_fallback():
    # identical losses: nothing < threshold -> bottom-half fallback
    losses = np.full(64, 0.7, np.float32)
    got, _ = TH.percentile_refine_mask(jnp.asarray(losses), 0.2)
    want, _ = oracle.percentile_refine_mask(losses, 0.2)
    assert int(np.asarray(got).sum()) == 32
    assert agreement(got, want) == 1.0


def test_percentile_refine_masked_subset(losses):
    valid = np.zeros(len(losses), bool)
    valid[::2] = True
    got, gthr = TH.percentile_refine_mask(
        jnp.asarray(losses), 0.2, valid=jnp.asarray(valid)
    )
    want_sub, wthr = oracle.percentile_refine_mask(losses[valid], 0.2)
    np.testing.assert_allclose(float(gthr), wthr, rtol=1e-5)
    got_np = np.asarray(got)
    assert not got_np[~valid].any()
    assert agreement(got_np[valid], want_sub) == 1.0


def test_ae_error_mask():
    rng = np.random.default_rng(3)
    errors = np.abs(rng.normal(0.1, 0.02, 500)).astype(np.float32)
    errors[:20] += 0.5
    got, gthr = TH.ae_error_mask(jnp.asarray(errors), 2.0)
    want, wthr = oracle.ae_error_mask(errors, 2.0)
    np.testing.assert_allclose(float(gthr), wthr, rtol=1e-4)
    assert agreement(got, want) == 1.0


def test_ensemble_truncation(losses):
    from strainer_gan_tpu.strain.engine import _truncate_in_order

    mask, _ = TH.ensemble_mask(jnp.asarray(losses))
    ratio = 0.8
    num = int(np.asarray(jnp.sum(mask)) * ratio)
    got = np.asarray(_truncate_in_order(mask, jnp.asarray(num)))
    want_idx, _ = oracle.ensemble_truncated_indices(losses, ratio, seed=0)
    got_idx = np.where(got)[0]
    # identical first-k-in-order truncation given agreeing base masks
    base_agree = oracle.mask_agreement(np.asarray(mask), oracle.ensemble_mask(losses, 0)[0])
    if base_agree == 1.0:
        np.testing.assert_array_equal(got_idx, want_idx)
    else:
        # GMM thresholds from different inits: still require the headline bar
        want_mask = np.zeros(len(losses), bool)
        want_mask[want_idx] = True
        assert oracle.mask_agreement(got, want_mask) >= 0.99


def test_gmm_agreement_across_separation_regimes():
    """Hard-regime GMM quantification (VERDICT r1 #6): the deterministic
    Lloyd+hard-label init must track seeded sklearn within the 99% bar from
    well-separated bimodal down to overlapping and fully unimodal losses —
    the epoch-0 `loss_gmm` condition (`config.py` loss_gmm start_epoch=0)
    where D is untrained and the loss distribution has no second mode."""
    from strainer_gan_tpu.ops.gmm import gmm_threshold

    rng = np.random.default_rng(0)
    n = 2000
    for sep in (4.0, 2.0, 1.5, 1.0, 0.5, 0.0):
        clean = np.abs(rng.normal(0.3, 0.12, int(n * 0.8)))
        noisy = np.abs(rng.normal(0.3 + sep * 0.25, 0.15, n - len(clean)))
        x = np.concatenate([clean, noisy]).astype(np.float32)
        ours = x < float(gmm_threshold(jnp.asarray(x)))
        agrees = [
            oracle.mask_agreement(ours, oracle.gmm_mask(x, seed=s)[0])
            for s in range(5)
        ]
        assert min(agrees) >= 0.99, (sep, agrees)
