"""ops.stats vs numpy/torch conventions (SURVEY §2.4 items 5-6)."""
import numpy as np
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.ops import stats as S


def test_std_torch_is_bessel(rng):
    x = rng.standard_normal((64, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(S.std_torch(jnp.asarray(x))), x.std(axis=0, ddof=1), rtol=1e-5
    )


def test_std_numpy_is_population(rng):
    x = rng.standard_normal((64, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(S.std_numpy(jnp.asarray(x))), x.std(axis=0), rtol=1e-5
    )


def test_max_abs_zscores_matches_oracles(rng):
    from strainer_gan_tpu.parity import oracle

    x = rng.standard_normal((200, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(S.max_abs_zscores(jnp.asarray(x), "torch")),
        oracle.max_abs_zscores_torch(x), rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(S.max_abs_zscores(jnp.asarray(x), "numpy_eps")),
        oracle.max_abs_zscores_numpy(x), rtol=1e-4,
    )


def test_percentile_matches_numpy(rng):
    x = rng.standard_normal(101).astype(np.float32)
    for q in (10.0, 25.0, 75.0, 80.0, 99.0):
        np.testing.assert_allclose(
            float(S.percentile(jnp.asarray(x), q)), np.percentile(x, q), rtol=1e-5
        )


def test_masked_percentile_equals_subset_percentile(rng):
    x = rng.standard_normal(97).astype(np.float32)
    valid = rng.random(97) > 0.3
    for q in (10.0, 50.0, 80.0):
        got = float(S.masked_percentile(jnp.asarray(x), jnp.asarray(valid), q))
        want = np.percentile(x[valid], q)
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_iqr_threshold(rng):
    x = rng.standard_normal(300).astype(np.float32)
    q1, q3 = np.percentile(x, 25), np.percentile(x, 75)
    np.testing.assert_allclose(
        float(S.iqr_threshold(jnp.asarray(x))), q3 + 1.5 * (q3 - q1), rtol=1e-4
    )


def test_histogram_density_matches_numpy(rng):
    x = (rng.standard_normal(500) ** 2).astype(np.float32)
    hist, edges = S.histogram_density(jnp.asarray(x), bins=100)
    want_hist, want_edges = np.histogram(x, bins=100, density=True)
    np.testing.assert_allclose(np.asarray(edges), want_edges, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hist), want_hist, rtol=1e-3, atol=1e-6)


def test_elbow_threshold_matches_oracle(rng):
    from strainer_gan_tpu.parity import oracle

    # bimodal z-score-like distribution
    z = np.concatenate([
        np.abs(rng.standard_normal(900)) + 1.0,
        np.abs(rng.standard_normal(100)) + 6.0,
    ]).astype(np.float32)
    got, _, _ = S.elbow_threshold(jnp.asarray(z))
    want, _, _ = oracle.find_elbow_threshold(z)
    # exact |density-0.01| ties are broken by float64-vs-32 last-bit noise in
    # the reference formula itself; the contract is the MASK agreement metric
    got_mask = z < float(got)
    want_mask = z < want
    assert oracle.mask_agreement(got_mask, want_mask) >= 0.99


def test_elbow_threshold_exact_when_tie_free():
    from strainer_gan_tpu.parity import oracle

    # smooth unimodal density: |hist-0.01| has a unique minimizer
    rng = np.random.default_rng(5)
    z = np.abs(rng.normal(2.0, 0.6, 20000)).astype(np.float32)
    got, _, _ = S.elbow_threshold(jnp.asarray(z))
    want, _, _ = oracle.find_elbow_threshold(z)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_masked_mean_std(rng):
    x = rng.standard_normal(80).astype(np.float32)
    valid = rng.random(80) > 0.4
    mean, std = S.masked_mean_std(jnp.asarray(x), jnp.asarray(valid), bessel=True)
    np.testing.assert_allclose(float(mean), x[valid].mean(), rtol=1e-5)
    np.testing.assert_allclose(float(std), x[valid].std(ddof=1), rtol=1e-4)
