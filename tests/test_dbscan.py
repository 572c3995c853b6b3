"""On-device DBSCAN noise detection vs sklearn (component C14)."""
import numpy as np
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.ops import dbscan as DB


def sklearn_non_noise(x, eps, min_samples):
    from sklearn.cluster import DBSCAN

    labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(x)
    return labels != -1


@pytest.mark.parametrize("eps,min_samples", [(0.8, 3), (1.5, 5), (3.0, 2)])
def test_non_noise_matches_sklearn(eps, min_samples):
    rng = np.random.default_rng(7)
    blob1 = rng.standard_normal((120, 8)) * 0.3
    blob2 = rng.standard_normal((80, 8)) * 0.3 + 4.0
    scattered = rng.standard_normal((25, 8)) * 6.0
    x = np.concatenate([blob1, blob2, scattered]).astype(np.float32)

    want = sklearn_non_noise(x, eps, min_samples)
    got = np.asarray(DB.dbscan_non_noise(jnp.asarray(x), eps, min_samples, block=64))
    np.testing.assert_array_equal(got, want)


def test_standardize_matches_sklearn():
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(8)
    x = (rng.standard_normal((50, 6)) * 3 + 1).astype(np.float32)
    got = np.asarray(DB.standardize(jnp.asarray(x)))
    want = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clean_ratio_matches_oracle():
    from strainer_gan_tpu.parity import oracle

    rng = np.random.default_rng(9)
    x = np.concatenate([
        rng.standard_normal((200, 16)) * 0.5,
        rng.standard_normal((30, 16)) * 8 + 10,
    ]).astype(np.float32)
    got = float(DB.dbscan_clean_ratio(jnp.asarray(x), eps=4.0, min_samples=3))
    want = oracle.dbscan_clean_ratio(x, eps=4.0, min_samples=3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_valid_mask_excludes_padding():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((60, 4)).astype(np.float32) * 0.2
    pad = np.zeros((20, 4), np.float32)
    xp = np.concatenate([x, pad])
    valid = np.concatenate([np.ones(60, bool), np.zeros(20, bool)])
    got = np.asarray(
        DB.dbscan_non_noise(jnp.asarray(xp), 0.5, 3, jnp.asarray(valid), block=32)
    )
    want = sklearn_non_noise(x, 0.5, 3)
    np.testing.assert_array_equal(got[:60], want)
    assert not got[60:].any()
