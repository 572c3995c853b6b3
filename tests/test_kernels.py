"""Pallas kernels vs jnp references (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.kernels.bce import bce_scores_pallas
from strainer_gan_tpu.kernels.pairwise import (
    dbscan_non_noise_pallas,
    neighbor_counts_pallas,
)
from strainer_gan_tpu.kernels.zscore import column_stats, max_abs_zscores_pallas
from strainer_gan_tpu.ops import dbscan as DB
from strainer_gan_tpu.ops import losses as L
from strainer_gan_tpu.ops import stats as S


def test_column_stats_matches(rng):
    f = rng.standard_normal((300, 70)).astype(np.float32)
    mean, std = column_stats(jnp.asarray(f), bessel=True, block_rows=64,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(mean), f.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), f.std(0, ddof=1), atol=1e-4)


@pytest.mark.parametrize("std_mode", ["torch", "numpy_eps"])
def test_max_abs_zscores_matches(rng, std_mode):
    f = rng.standard_normal((200, 50)).astype(np.float32)
    got = np.asarray(
        max_abs_zscores_pallas(jnp.asarray(f), std_mode, block_rows=64,
                               interpret=True)
    )
    want = np.asarray(S.max_abs_zscores(jnp.asarray(f), std_mode))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("target", [1.0, 0.0, 0.9])
def test_bce_scores_matches(rng, target):
    logits = (rng.standard_normal(500) * 5).astype(np.float32)
    got = np.asarray(bce_scores_pallas(jnp.asarray(logits), target,
                                       interpret=True))
    want = np.asarray(L.bce_from_logits(jnp.asarray(logits), target))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_neighbor_counts_matches_bruteforce(rng):
    x = rng.standard_normal((100, 12)).astype(np.float32)
    eps = 1.5
    got = np.asarray(
        neighbor_counts_pallas(jnp.asarray(x), eps, bm=64, bn=64,
                               interpret=True)
    )
    d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    want = (d2 <= eps**2).sum(1).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_dbscan_pallas_matches_sklearn(rng):
    from sklearn.cluster import DBSCAN

    x = np.concatenate([
        rng.standard_normal((80, 8)) * 0.3,
        rng.standard_normal((20, 8)) * 5 + 8,
    ]).astype(np.float32)
    got = np.asarray(
        dbscan_non_noise_pallas(jnp.asarray(x), 0.8, 3, interpret=True)
    )
    want = DBSCAN(eps=0.8, min_samples=3).fit_predict(x) != -1
    np.testing.assert_array_equal(got, want)


def test_neighbor_counts_valid_mask(rng):
    x = rng.standard_normal((60, 6)).astype(np.float32)
    valid = np.r_[np.ones(40, bool), np.zeros(20, bool)]
    got = np.asarray(
        neighbor_counts_pallas(jnp.asarray(x), 1.2, jnp.asarray(valid),
                               bm=64, bn=64, interpret=True)
    )
    d2 = ((x[:40, None] - x[None, :40]) ** 2).sum(-1)
    want = (d2 <= 1.2**2).sum(1).astype(np.float32)
    np.testing.assert_array_equal(got[:40], want)
    assert (got[40:] == 0).all()
