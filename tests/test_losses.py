"""BCE parity with torch nn.BCELoss (component C10)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from strainer_gan_tpu.ops import losses as L


def test_bce_from_logits_matches_torch_bceloss(rng):
    logits = rng.standard_normal(256).astype(np.float32) * 6.0
    probs = torch.sigmoid(torch.from_numpy(logits))
    for target in (1.0, 0.0, 0.9, 0.1):
        want = torch.nn.BCELoss(reduction="none")(
            probs, torch.full_like(probs, target)
        ).numpy()
        got = np.asarray(L.bce_from_logits(jnp.asarray(logits), target))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bce_from_probs_matches_torch(rng):
    probs = rng.random(128).astype(np.float32)
    want = torch.nn.BCELoss(reduction="none")(
        torch.from_numpy(probs), torch.ones(128)
    ).numpy()
    got = np.asarray(L.bce_from_probs(jnp.asarray(probs), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bce_clamp_at_minus_100():
    # extreme logits: torch clamps log terms at -100
    logits = jnp.asarray([200.0, -200.0])
    got0 = float(L.bce_from_logits(logits, 0.0)[0])  # -log(1-sigmoid(200))
    got1 = float(L.bce_from_logits(logits, 1.0)[1])  # -log(sigmoid(-200))
    assert got0 == 100.0
    assert got1 == 100.0


def test_weighted_mean_equals_subset_mean(rng):
    x = rng.standard_normal(64).astype(np.float32)
    w = (rng.random(64) > 0.3).astype(np.float32)
    got = float(L.weighted_mean(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x[w > 0].mean(), rtol=1e-5)


def test_d_loss_reductions(rng):
    r = jnp.asarray(rng.random(8).astype(np.float32))
    f = jnp.asarray(rng.random(8).astype(np.float32))
    s = float(L.d_loss(r, f, "sum"))
    h = float(L.d_loss(r, f, "half_mean"))
    np.testing.assert_allclose(s, float(r.mean() + f.mean()), rtol=1e-6)
    np.testing.assert_allclose(h, float((r.mean() + f.mean()) / 2), rtol=1e-6)


def test_bce_gradient_matches_torch_and_is_finite_at_saturation(rng):
    logits = np.array([-200.0, -5.0, 0.0, 5.0, 200.0], np.float32)

    def loss_fn(x):
        return jnp.sum(L.bce_from_logits(x, 1.0))

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))
    assert np.isfinite(g).all(), g  # saturated lanes must not NaN

    xt = torch.tensor(logits, requires_grad=True)
    lt = torch.nn.BCELoss(reduction="sum")(
        torch.sigmoid(xt), torch.ones(5)
    )
    lt.backward()
    np.testing.assert_allclose(g, xt.grad.numpy(), atol=1e-5)
