"""ResNet18 parity vs a torch oracle (also validates the state_dict port),
plus eval-suite numerics vs scipy/sklearn."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F
import pytest

from strainer_gan_tpu.models.resnet import (
    load_torch_resnet_state_dict,
    resnet18_features,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TorchResNet18Features(tnn.Module):
    """torchvision-compatible resnet18 trunk (state_dict names match)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3))


def test_resnet18_matches_torch_via_state_dict_port():
    torch.manual_seed(0)
    oracle = TorchResNet18Features().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    model = resnet18_features(3)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    variables = load_torch_resnet_state_dict(
        variables, oracle.state_dict(), "basic", (2, 2, 2, 2)
    )
    variables = jax.tree.map(jnp.asarray, variables)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    with torch.no_grad():
        want = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    assert got.shape == want.shape == (2, 512)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_wasserstein_1d_matches_scipy(rng):
    from scipy.stats import wasserstein_distance

    from strainer_gan_tpu.eval.distances import wasserstein_1d

    u = rng.standard_normal(64).astype(np.float32)
    v = (rng.standard_normal(80) * 2 + 1).astype(np.float32)
    np.testing.assert_allclose(
        float(wasserstein_1d(jnp.asarray(u), jnp.asarray(v))),
        wasserstein_distance(u, v), rtol=1e-5,
    )
    w = rng.standard_normal(64).astype(np.float32)
    np.testing.assert_allclose(
        float(wasserstein_1d(jnp.asarray(u), jnp.asarray(w))),
        wasserstein_distance(u, w), rtol=1e-5,
    )


def test_pca_wasserstein_matches_sklearn(rng):
    from scipy.stats import wasserstein_distance
    from sklearn.decomposition import PCA

    from strainer_gan_tpu.eval.distances import pca_wasserstein_distance

    f1 = rng.standard_normal((100, 30)).astype(np.float32)
    f2 = (rng.standard_normal((90, 30)) * 1.5).astype(np.float32)
    got = float(pca_wasserstein_distance(jnp.asarray(f1), jnp.asarray(f2), 10))
    p = PCA(n_components=10)
    p1 = p.fit_transform(f1)
    p2 = p.transform(f2)
    want = np.mean([wasserstein_distance(p1[:, i], p2[:, i]) for i in range(10)])
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_frechet_distance_matches_scipy_sqrtm(rng):
    from scipy import linalg

    from strainer_gan_tpu.ops.sqrtm import frechet_distance

    d = 16
    a = rng.standard_normal((40, d)).astype(np.float64)
    b = (rng.standard_normal((40, d)) * 1.3 + 0.2).astype(np.float64)
    mu1, mu2 = a.mean(0), b.mean(0)
    s1 = np.cov(a, rowvar=False) + np.eye(d) * 1e-6
    s2 = np.cov(b, rowvar=False) + np.eye(d) * 1e-6
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    want = ((mu1 - mu2) ** 2).sum() + np.trace(s1) + np.trace(s2) - 2 * np.trace(
        covmean.real
    )
    got = float(
        frechet_distance(
            jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
            jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_resize_matches_torch_interpolate(rng):
    from strainer_gan_tpu.models.inception import resize_bilinear_299

    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_299(jnp.asarray(x)))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(299, 299),
            mode="bilinear", align_corners=False,
        )
        .numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inception_features_shape():
    from strainer_gan_tpu.models.features import build_feature_fn

    f = build_feature_fn("inception_v3")
    x = jnp.zeros((2, 299, 299, 3), jnp.float32)
    assert f(x).shape == (2, 2048)


def test_trace_sqrtm_ns_matches_eigh(rng):
    """Newton–Schulz trace (the TPU-fast FID path) vs the eigh path on an
    anisotropic well-conditioned covariance pair (the FID@50k regime)."""
    from strainer_gan_tpu.ops.sqrtm import (
        trace_sqrtm_product,
        trace_sqrtm_product_ns,
    )

    d = 256
    a = (rng.standard_normal((2048, d)) * np.exp(rng.standard_normal(d)))
    b = rng.standard_normal((2048, d)) * 1.3 + 0.2
    s1 = jnp.asarray(np.cov(a, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    s2 = jnp.asarray(np.cov(b, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    t_eigh = float(trace_sqrtm_product(s1, s2))
    t_ns = float(trace_sqrtm_product_ns(s1, s2))
    np.testing.assert_allclose(t_ns, t_eigh, rtol=1e-3)


def test_frechet_ns_fallback_rank_deficient(rng):
    """Severely rank-deficient covariances (n << d, spectrum floored at the
    1e-6 regularizer) can overrun f32 in the NS iterate; frechet_distance
    must stay finite (in-graph eigh fallback) and agree with the eigh path."""
    from strainer_gan_tpu.ops.sqrtm import frechet_distance

    d, n = 512, 60
    a = rng.standard_normal((n, d)) * np.exp(rng.standard_normal(d))
    b = rng.standard_normal((n, d)) * 1.3 + 0.2
    mu1 = jnp.asarray(a.mean(0), jnp.float32)
    mu2 = jnp.asarray(b.mean(0), jnp.float32)
    s1 = jnp.asarray(np.cov(a, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    s2 = jnp.asarray(np.cov(b, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    got = float(frechet_distance(mu1, s1, mu2, s2))
    want = float(frechet_distance(mu1, s1, mu2, s2, method="eigh"))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-3)
