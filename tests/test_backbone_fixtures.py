"""Committed torch-oracle golden fixtures for the backbone ports (C22/C23).

tests/fixtures/backbones.npz was generated ONCE by
scripts/make_backbone_fixtures.py with torch: synthetic state_dicts (a pure
function of torchvision parameter names — models/synth_weights.py) were fed
to hand-built torchvision-architecture oracles and the activations + one
full-chain FID value recorded.  This module regenerates the SAME weights,
loads them through our ``load_torch_*_state_dict`` ports, and must reproduce
the fixtures — WITHOUT torch.  Any drift in the port mapping, conv/BN
translation, 299 resize, or FID math fails here even in a torch-less env.

Reference chains locked: ResNet18 z-score features (`#z_score.py:270-294`),
ResNet50 eval features (`#strainer gan.py:474-486`), InceptionV3 FID
(`#strainer gan.py:396-468`).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "backbones.npz")


@pytest.fixture(scope="module")
def fx():
    # fixture-dependent tests skip without the npz; the validator-script test
    # below fabricates its own checkpoint and runs regardless
    if not os.path.exists(FIXTURE):
        pytest.skip("fixtures/backbones.npz not generated")
    return np.load(FIXTURE)


def _normalize(u8):
    return ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5


def _resnet_acts(fx, name):
    from strainer_gan_tpu.models.resnet import (
        load_torch_resnet_state_dict,
        resnet18_features,
        resnet50_features,
    )
    from strainer_gan_tpu.models.synth_weights import synth_resnet_state_dict

    block = "basic" if name == "resnet18" else "bottleneck"
    stages = (2, 2, 2, 2) if name == "resnet18" else (3, 4, 6, 3)
    model = (resnet18_features if name == "resnet18" else resnet50_features)(3)
    x = _normalize(fx["resnet_input_u8"])
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    synth = synth_resnet_state_dict(variables, block, stages)
    variables = load_torch_resnet_state_dict(variables, synth, block, stages)
    variables = jax.tree.map(jnp.asarray, variables)
    return np.asarray(model.apply(variables, jnp.asarray(x), train=False))


def test_resnet18_fixture(fx):
    got = _resnet_acts(fx, "resnet18")
    want = fx["resnet18_features"]
    assert got.shape == want.shape == (4, 512)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_resnet50_fixture(fx):
    got = _resnet_acts(fx, "resnet50")
    want = fx["resnet50_features"]
    assert got.shape == want.shape == (4, 2048)
    # synthetic He weights give activations at scale ~8e2 through 50 layers;
    # measured f32 reassoc noise: max abs 4.9e-3, max rel 7.4e-3 (tiny values)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


@pytest.fixture(scope="module")
def inception_feature_fn(fx):
    from strainer_gan_tpu.models.inception import (
        InceptionV3Features,
        load_torch_inception_state_dict,
    )
    from strainer_gan_tpu.models.synth_weights import synth_inception_state_dict

    model = InceptionV3Features()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 299, 299, 3))
    )
    variables = load_torch_inception_state_dict(
        variables, synth_inception_state_dict(variables)
    )
    variables = jax.tree.map(jnp.asarray, variables)
    return jax.jit(lambda x: model.apply(variables, x))


def test_inception_activations_fixture(fx, inception_feature_fn):
    from strainer_gan_tpu.eval.fid import get_activations

    imgs = jnp.asarray(_normalize(fx["fid_a_u8"]))
    got = np.asarray(
        get_activations(imgs, inception_feature_fn, batch_size=16)
    )
    want = fx["inception_acts_a"]
    assert got.shape == want.shape == (16, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fid_full_chain_fixture(fx, inception_feature_fn):
    """Our whole FID path (resize -> inception -> eigh-sqrtm Frechet) must
    match the torch+scipy oracle value recorded in the fixture."""
    from strainer_gan_tpu.eval.fid import calculate_fid

    got = calculate_fid(
        jnp.asarray(_normalize(fx["fid_a_u8"])),
        jnp.asarray(_normalize(fx["fid_b_u8"])),
        inception_feature_fn, batch_size=16,
    )
    want = float(fx["fid_value"])
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_validate_staged_weights_script(tmp_path):
    """scripts/validate_staged_weights.py: a staged synthetic resnet18
    checkpoint validates (rc 0, coverage+finiteness+forward checks), and a
    missing file fails cleanly (rc 1)."""
    import subprocess
    import sys

    torch = pytest.importorskip("torch")
    from strainer_gan_tpu.models.resnet import resnet18_features
    from strainer_gan_tpu.models.synth_weights import synth_resnet_state_dict

    m = resnet18_features(3)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    sd = {k: torch.from_numpy(x) for k, x in synth_resnet_state_dict(v).items()}
    torch.save(sd, tmp_path / "resnet18.pt")

    script = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts",
        "validate_staged_weights.py",
    )
    env = dict(os.environ, STRAINER_WEIGHTS_DIR=str(tmp_path),
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    ok = subprocess.run(
        [sys.executable, script, "resnet18"],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert ok.returncode == 0, ok.stderr
    assert "loaded 100 tensors" in ok.stdout

    # missing-file path: run from tmp_path so the ./weights fallback cannot
    # resolve to a production-staged checkpoint; skip the assertion if the
    # absolute fallback dir actually has one staged
    if os.path.exists("/root/data/weights/resnet50.pt"):
        pytest.skip("production resnet50 weights staged on this machine")
    missing = subprocess.run(
        [sys.executable, script, "resnet50"],
        capture_output=True, text=True, env=env, timeout=500,
        cwd=str(tmp_path),
    )
    assert missing.returncode == 1
    assert "no staged file" in missing.stderr
