"""Numerical parity of the flax models vs torch implementations.

A torch oracle (standard DCGAN/MLP-GAN modules, written here from the
published architecture, CPU-only) receives the flax parameters and must
produce the same outputs — validating the NHWC conv/convT/BN/linear
translations in strainer_gan_tpu.models.layers.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from strainer_gan_tpu.models import (
    ConvAutoEncoder,
    Discriminator64,
    Generator64,
    MLPDiscriminator,
    MLPGenerator,
)


def to_t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_generator64(nz=100, ngf=64, nc=3):
    return tnn.Sequential(
        tnn.ConvTranspose2d(nz, ngf * 8, 4, 1, 0, bias=False),
        tnn.BatchNorm2d(ngf * 8), tnn.ReLU(True),
        tnn.ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf * 4), tnn.ReLU(True),
        tnn.ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf * 2), tnn.ReLU(True),
        tnn.ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ngf), tnn.ReLU(True),
        tnn.ConvTranspose2d(ngf, nc, 4, 2, 1, bias=False),
        tnn.Tanh(),
    )


def torch_discriminator64(ndf=64, nc=3):
    return tnn.Sequential(
        tnn.Conv2d(nc, ndf, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2),
        tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2),
        tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ndf * 4), tnn.LeakyReLU(0.2),
        tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
        tnn.BatchNorm2d(ndf * 8), tnn.LeakyReLU(0.2),
        tnn.Conv2d(ndf * 8, 1, 4, 1, 0, bias=False),
    )


def copy_g_params(flax_params, tg):
    convs = [m for m in tg if isinstance(m, tnn.ConvTranspose2d)]
    bns = [m for m in tg if isinstance(m, tnn.BatchNorm2d)]
    with torch.no_grad():
        for i, m in enumerate(convs):
            k = flax_params[f"ConvTranspose2dTorch_{i}"]["kernel"]
            # flax (kH,kW,in,out) -> torch convT (in,out,kH,kW)
            m.weight.copy_(to_t(np.transpose(np.asarray(k), (2, 3, 0, 1))))
        for i, m in enumerate(bns):
            p = flax_params[f"MaskedBatchNorm_{i}"]
            m.weight.copy_(to_t(p["scale"]))
            m.bias.copy_(to_t(p["bias"]))


def copy_d_params(flax_params, td):
    convs = [m for m in td if isinstance(m, tnn.Conv2d)]
    bns = [m for m in td if isinstance(m, tnn.BatchNorm2d)]
    with torch.no_grad():
        for i, m in enumerate(convs):
            k = flax_params[f"Conv2dTorch_{i}"]["kernel"]
            # flax (kH,kW,in,out) -> torch conv (out,in,kH,kW)
            m.weight.copy_(to_t(np.transpose(np.asarray(k), (3, 2, 0, 1))))
        for i, m in enumerate(bns):
            p = flax_params[f"MaskedBatchNorm_{i}"]
            m.weight.copy_(to_t(p["scale"]))
            m.bias.copy_(to_t(p["bias"]))


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(42), 4)


def test_generator64_matches_torch(keys):
    gen = Generator64(compute_dtype=jnp.float32)
    z = jax.random.normal(keys[0], (4, 100))
    gvars = gen.init({"params": keys[1]}, z, train=True)
    out_flax, _ = gen.apply(gvars, z, train=True, mutable=["batch_stats"])

    tg = torch_generator64().train()
    copy_g_params(gvars["params"], tg)
    zt = to_t(z).reshape(4, 100, 1, 1)
    out_t = tg(zt).detach().numpy().transpose(0, 2, 3, 1)  # NCHW->NHWC
    np.testing.assert_allclose(np.asarray(out_flax), out_t, atol=2e-4)


def test_discriminator64_matches_torch(keys):
    disc = Discriminator64(compute_dtype=jnp.float32)
    x = jax.random.uniform(keys[0], (4, 64, 64, 3), minval=-1, maxval=1)
    dvars = disc.init({"params": keys[2]}, x, train=True)
    logits_flax, _ = disc.apply(dvars, x, train=True, mutable=["batch_stats"])

    td = torch_discriminator64().train()
    copy_d_params(dvars["params"], td)
    xt = to_t(x).permute(0, 3, 1, 2)
    logits_t = td(xt).reshape(-1).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(logits_flax), logits_t, atol=3e-4
    )
    # the reference applies Sigmoid in the model; we fold it into the loss
    probs_t = torch.sigmoid(torch.from_numpy(logits_t)).numpy()
    np.testing.assert_allclose(
        jax.nn.sigmoid(logits_flax), probs_t, atol=1e-5
    )


def test_bn_running_stats_match_torch(keys):
    """BN momentum-0.1 running-stat updates (train forward) match torch."""
    disc = Discriminator64(compute_dtype=jnp.float32)
    x = jax.random.uniform(keys[0], (8, 64, 64, 3), minval=-1, maxval=1)
    dvars = disc.init({"params": keys[2]}, x, train=True)
    _, mut = disc.apply(dvars, x, train=True, mutable=["batch_stats"])

    td = torch_discriminator64().train()
    copy_d_params(dvars["params"], td)
    with torch.no_grad():
        td(to_t(x).permute(0, 3, 1, 2))
    bns = [m for m in td if isinstance(m, tnn.BatchNorm2d)]
    for i, m in enumerate(bns):
        got_mean = np.asarray(mut["batch_stats"][f"MaskedBatchNorm_{i}"]["mean"])
        got_var = np.asarray(mut["batch_stats"][f"MaskedBatchNorm_{i}"]["var"])
        np.testing.assert_allclose(got_mean, m.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(got_var, m.running_var.numpy(), atol=1e-4)


def test_masked_bn_equals_subset_bn(keys):
    """Weighted BN stats on a padded batch == torch BN on the subset —
    the static-shape masking equivalence (SURVEY §7)."""
    from strainer_gan_tpu.models.layers import MaskedBatchNorm

    x = np.asarray(jax.random.normal(keys[0], (8, 4, 4, 5)), np.float32)
    wmask = np.array([1, 1, 0, 1, 0, 1, 1, 0], np.float32)
    bn = MaskedBatchNorm(compute_dtype=jnp.float32)
    variables = bn.init({"params": keys[1]}, jnp.asarray(x))
    y, _ = bn.apply(
        variables, jnp.asarray(x), jnp.asarray(wmask), mutable=["batch_stats"]
    )
    tbn = tnn.BatchNorm2d(5).train()
    with torch.no_grad():
        tbn.weight.copy_(to_t(variables["params"]["scale"]))
        tbn.bias.copy_(to_t(variables["params"]["bias"]))
    sub = to_t(x[wmask > 0]).permute(0, 3, 1, 2)
    want = tbn(sub).detach().numpy().transpose(0, 2, 3, 1)
    got = np.asarray(y)[wmask > 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mlp_gan_matches_torch(keys):
    gen = MLPGenerator(compute_dtype=jnp.float32)
    disc = MLPDiscriminator(compute_dtype=jnp.float32)
    z = jax.random.normal(keys[0], (6, 100))
    gvars = gen.init({"params": keys[1]}, z, train=True)
    img = gen.apply(gvars, z, train=True)
    dvars = disc.init({"params": keys[2]}, img, train=True)
    logits = disc.apply(dvars, img, train=True)

    tg = tnn.Sequential(
        tnn.Linear(100, 256), tnn.ReLU(), tnn.Linear(256, 512), tnn.ReLU(),
        tnn.Linear(512, 1024), tnn.ReLU(), tnn.Linear(1024, 784), tnn.Tanh(),
    )
    td = tnn.Sequential(
        tnn.Linear(784, 1024), tnn.LeakyReLU(0.2), tnn.Linear(1024, 512),
        tnn.LeakyReLU(0.2), tnn.Linear(512, 256), tnn.LeakyReLU(0.2),
        tnn.Linear(256, 1),
    )
    with torch.no_grad():
        for i, m in enumerate(m for m in tg if isinstance(m, tnn.Linear)):
            p = gvars["params"][f"DenseTorch_{i}"]
            m.weight.copy_(to_t(np.asarray(p["kernel"]).T))
            m.bias.copy_(to_t(p["bias"]))
        for i, m in enumerate(m for m in td if isinstance(m, tnn.Linear)):
            p = dvars["params"][f"DenseTorch_{i}"]
            m.weight.copy_(to_t(np.asarray(p["kernel"]).T))
            m.bias.copy_(to_t(p["bias"]))
    with torch.no_grad():
        img_t = tg(to_t(z))
        logits_t = td(img_t).reshape(-1)
    np.testing.assert_allclose(np.asarray(img), img_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), logits_t.numpy(), atol=1e-5)


def test_autoencoder_shapes_and_torch_parity(keys):
    ae = ConvAutoEncoder(compute_dtype=jnp.float32)
    x = jax.random.uniform(keys[0], (2, 64, 64, 3), minval=-1, maxval=1)
    avars = ae.init({"params": keys[1]}, x)
    out = ae.apply(avars, x)
    assert out.shape == (2, 64, 64, 3)

    tae = tnn.Sequential(
        tnn.Conv2d(3, 16, 3, stride=2, padding=1), tnn.ReLU(),
        tnn.Conv2d(16, 32, 3, stride=2, padding=1), tnn.ReLU(),
        tnn.Conv2d(32, 64, 7),
        tnn.ConvTranspose2d(64, 32, 7), tnn.ReLU(),
        tnn.ConvTranspose2d(32, 16, 3, stride=2, padding=1, output_padding=1),
        tnn.ReLU(),
        tnn.ConvTranspose2d(16, 3, 3, stride=2, padding=1, output_padding=1),
        tnn.Tanh(),
    )
    p = avars["params"]
    convs = [m for m in tae if isinstance(m, tnn.Conv2d)]
    convts = [m for m in tae if isinstance(m, tnn.ConvTranspose2d)]
    with torch.no_grad():
        for i, m in enumerate(convs):
            pp = p[f"Conv2dTorch_{i}"]
            m.weight.copy_(to_t(np.transpose(np.asarray(pp["kernel"]), (3, 2, 0, 1))))
            m.bias.copy_(to_t(pp["bias"]))
        for i, m in enumerate(convts):
            pp = p[f"ConvTranspose2dTorch_{i}"]
            m.weight.copy_(to_t(np.transpose(np.asarray(pp["kernel"]), (2, 3, 0, 1))))
            m.bias.copy_(to_t(pp["bias"]))
    want = tae(to_t(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)
