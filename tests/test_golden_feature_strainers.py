"""Cross-framework golden tests for the FEATURE-space strainers (VERDICT #2).

Completes the golden standard `# final.py` already has for the loss-space
paths: export OUR ResNet18 backbone weights into a torch model
(models.resnet.export_torch_resnet_state_dict, the inverse of the
state_dict port), run the REFERENCE's torch/numpy scoring + threshold logic
verbatim, and assert >= 99% mask agreement against the device-side
StrainerEngine over the same dataset:

* `#z_score.py:276-294` — detect_outliers: batch-64 feature pass, per-dim
  z-score with torch std (Bessel), max over dims, keep ``< threshold``;
* `# z_score + DBSCAN.py:272-326` — StandardScaler + sklearn DBSCAN
  clean-ratio, then ``torch.quantile(max_z, ratio)``, keep ``<=``.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.data import DeviceDataset, build_mixture
from strainer_gan_tpu.models.resnet import (
    export_torch_resnet_state_dict,
    resnet18_features,
)
from strainer_gan_tpu.parity import oracle
from strainer_gan_tpu.strain.engine import StrainerEngine

from test_backbones import TorchResNet18Features

pytestmark = pytest.mark.slow  # multi-minute; inner loop runs -m 'not slow'

N_SYNTH = 2048


@pytest.fixture(scope="module")
def backbone():
    """(jax feature_fn, torch model) carrying IDENTICAL weights, loaded
    through the PRODUCTION weight on-ramp: a deterministic torchvision-named
    state_dict (models.synth_weights — the stand-in for staged pretrained
    weights) ported via ``load_torch_resnet_state_dict``, exactly the code
    path ``scripts/validate_staged_weights.py`` drives for real checkpoints.
    The torch side loads the SAME state_dict, so the golden chain exercises
    forward parity + the port itself + scoring + thresholds end-to-end.
    """
    from strainer_gan_tpu.models.resnet import load_torch_resnet_state_dict
    from strainer_gan_tpu.models.synth_weights import synth_resnet_state_dict

    model = resnet18_features(3)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    sd = synth_resnet_state_dict(variables)
    variables = load_torch_resnet_state_dict(variables, sd)

    @jax.jit
    def feature_fn(x):
        return model.apply(variables, x, train=False)

    td = TorchResNet18Features().eval()
    res = td.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not res.unexpected_keys
    # only BN num_batches_tracked may be missing
    assert all("num_batches_tracked" in k for k in res.missing_keys)
    # round-trip sanity: exporting our ported variables reproduces the
    # state_dict we loaded (the port is bijective on these weights)
    back = export_torch_resnet_state_dict(jax.tree.map(np.asarray, variables))
    np.testing.assert_allclose(back["conv1.weight"], sd["conv1.weight"],
                               rtol=0, atol=0)
    return feature_fn, td


@pytest.fixture(scope="module")
def dataset():
    cfg = get_preset("zscore")
    return DeviceDataset(build_mixture(cfg.data, max_synth=N_SYNTH))


def torch_features_loader_order(td, dataset) -> torch.Tensor:
    """The reference's feature pass (`#z_score.py:279-283`): batch-64 loop,
    eval mode, Normalize(0.5, 0.5) inputs."""
    imgs = np.asarray(dataset.images)
    x = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    outs = []
    with torch.no_grad():
        for i in range(0, len(xt), 64):
            outs.append(td(xt[i : i + 64]))
    return torch.cat(outs)


def torch_max_z(feats: torch.Tensor) -> torch.Tensor:
    """`#z_score.py:286-291`: per-dim z with torch std (Bessel), max over
    dims.

    Random-init backbones leave a handful of post-ReLU dims identically zero
    (std 0), which the reference would turn into 0/0 = NaN — it never hits
    this because pretrained features always vary.  Our device impl
    (strain.thresholds._masked_max_abs_z) defines those dims as z = 0, which
    can never be the max; taking the torch max over LIVE dims only is the
    same semantics, keeping the comparison meaningful."""
    mean = feats.mean(dim=0)
    std = feats.std(dim=0)
    live = std > 0
    assert float(live.float().mean()) > 0.9, "mostly-dead features"
    z = (feats[:, live] - mean[live]).abs() / std[live]
    return z.max(dim=1).values


def test_zscore_fixed_mask_agreement(backbone, dataset):
    """`#z_score.py` end-to-end: our engine's once-at-epoch-3 z-score strain
    vs the reference chain run in torch."""
    feature_fn, td = backbone
    cfg = get_preset("zscore")
    engine = StrainerEngine(
        cfg, disc=None, dataset=dataset, feature_fn=feature_fn, score_batch=64,
    )
    active = engine.on_epoch_start(
        cfg.strain.start_epoch, None, jax.random.PRNGKey(1)
    )
    ours = np.asarray(active)

    feats = torch_features_loader_order(td, dataset)
    max_z = torch_max_z(feats)
    ref = (max_z < cfg.strain.z_threshold).numpy()  # `<`, threshold 5.0

    assert oracle.mask_agreement(ours, ref) >= 0.99
    # and the scores themselves agree tightly (forward-parity check)
    np.testing.assert_allclose(
        np.asarray(engine.last_scores), max_z.numpy(), atol=5e-3
    )


def test_zscore_threshold_sweep_nontrivial(backbone, dataset):
    """Same chain at data-driven thresholds guaranteed to SPLIT the dataset
    (the fixed 5.0 can be all-keep on synthetic data, which would make
    agreement vacuous)."""
    from strainer_gan_tpu.strain.thresholds import zscore_fixed_mask

    feature_fn, td = backbone
    feats = torch_features_loader_order(td, dataset)
    max_z = torch_max_z(feats)

    from strainer_gan_tpu.strain.score import score_features

    ours_feats = score_features(feature_fn, dataset, 64)

    for q in (0.25, 0.5, 0.9):
        thr = float(np.quantile(max_z.numpy(), q))
        ref = (max_z < thr).numpy()
        assert 0 < ref.sum() < len(ref)  # both sides populated
        our_mask, _ = zscore_fixed_mask(ours_feats, thr, "torch", True)
        assert oracle.mask_agreement(np.asarray(our_mask), ref) >= 0.99, q


def test_zscore_dbscan_mask_agreement(backbone, dataset):
    """`# z_score + DBSCAN.py` end-to-end with sklearn DBSCAN in the loop."""
    from sklearn.cluster import DBSCAN
    from sklearn.preprocessing import StandardScaler

    feature_fn, td = backbone
    feats = torch_features_loader_order(td, dataset)
    f_np = feats.numpy()

    # pick eps from the data so the clean ratio is interior (the reference's
    # eps=20 is tuned to pretrained-feature scales; a degenerate all-noise /
    # all-core ratio would make the agreement vacuous)
    scaled = StandardScaler().fit_transform(f_np)
    d = np.sqrt(
        np.maximum(
            (scaled**2).sum(1)[:, None] - 2 * scaled @ scaled.T
            + (scaled**2).sum(1)[None, :], 0,
        )
    )
    eps = float(np.quantile(d[np.triu_indices(len(d), 1)], 0.2))

    # reference chain (`# z_score + DBSCAN.py:272-326`)
    labels = DBSCAN(eps=eps, min_samples=3).fit(scaled).labels_
    ratio = float((labels != -1).mean())
    assert 0.05 < ratio < 1.0, ratio
    max_z = torch_max_z(feats)
    thr = torch.quantile(max_z, ratio)
    ref = (max_z <= thr).numpy()  # inclusive (`:325`)
    assert 0 < ref.sum() < len(ref)

    # our engine, same eps
    base = get_preset("zscore_dbscan")
    cfg = base.replace(
        strain=dataclasses.replace(base.strain, dbscan_eps=eps)
    )
    engine = StrainerEngine(
        cfg, disc=None, dataset=dataset, feature_fn=feature_fn, score_batch=64,
    )
    ours = np.asarray(engine.prefilter(jax.random.PRNGKey(1)))

    assert oracle.mask_agreement(ours, ref) >= 0.99


def test_dead_dim_deviation_measured():
    """PARITY.md dead-dim ledger row, MEASURED instead of designed around:
    torch's z-score on a zero-variance feature dim is 0/0 = NaN, `NaN < thr`
    is False, so the reference drops EVERY sample (`#z_score.py:286-293`
    semantics; unreachable with pretrained weights).  Our device impl
    (strain/thresholds._masked_max_abs_z) maps dead dims to z = 0 so the
    live dims still decide.  This test quantifies the divergence on a
    feature matrix with one dead dim."""
    from strainer_gan_tpu.strain.thresholds import zscore_fixed_mask

    rng = np.random.default_rng(0)
    n = 2000
    feats = rng.normal(0.0, 1.0, (n, 32)).astype(np.float32)
    feats[:, 7] = 0.5  # exactly-representable constant -> torch std == 0.0

    # reference semantics, run verbatim in torch
    ft = torch.from_numpy(feats)
    z_ref = (ft - ft.mean(dim=0)).abs() / ft.std(dim=0)  # dim 7 -> 0/0 = NaN
    assert torch.isnan(z_ref[:, 7]).all()
    ref = (z_ref.max(dim=1).values < 3.0).numpy()
    assert not ref.any(), "torch NaN semantics must drop everything"

    # ours: dead dim contributes z = 0; live dims decide
    ours, _ = zscore_fixed_mask(jnp.asarray(feats), 3.0, "torch", True)
    ours = np.asarray(ours)

    # oracle over live dims only
    live = np.delete(feats, 7, axis=1)
    z_live = np.abs(live - live.mean(0)) / live.std(0, ddof=1)
    expected = z_live.max(1) < 3.0
    np.testing.assert_array_equal(ours, expected)

    # the measured deviation: every sample we keep is a disagreement with
    # the reference's (degenerate) all-drop mask
    deviation = float((ours != ref).mean())
    assert deviation == pytest.approx(float(ours.mean()))
    assert 0.1 < deviation < 1.0  # non-vacuous: the masks genuinely diverge
