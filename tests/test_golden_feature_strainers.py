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

N_SYNTH = 160


@pytest.fixture(scope="module")
def backbone():
    """(jax feature_fn, torch model) carrying IDENTICAL weights.

    He-init + zeroed BN affine leaves some post-ReLU feature dims dead for
    every input, and a dead dim makes the reference's z-score 0/0 = NaN
    (pretrained torchvision weights never have this).  Seeded-randomizing
    the BN parameters/stats — exactly like test_backbones does for its
    oracle — revives every dim; the cross-framework chain under test
    (forward parity + scoring + threshold) is weight-provenance-agnostic.
    """
    model = resnet18_features(3)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)

    def randomize(tree, spec):
        def visit(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            parent = str(path[-2]) if len(path) > 1 else ""
            if "MaskedBatchNorm" in parent and name in spec:
                mu, sigma = spec[name]
                import zlib

                k = jax.random.fold_in(
                    jax.random.PRNGKey(42),
                    zlib.crc32(str(path).encode()) % (2**31),
                )
                return mu + sigma * jax.random.normal(k, leaf.shape, leaf.dtype)
            return leaf
        return jax.tree_util.tree_map_with_path(visit, tree)

    variables = {
        "params": randomize(
            variables["params"], {"scale": (1.0, 0.1), "bias": (0.2, 0.1)}
        ),
        "batch_stats": randomize(
            variables["batch_stats"], {"mean": (0.0, 0.05), "var": (1.0, 0.1)}
        ),
    }

    @jax.jit
    def feature_fn(x):
        return model.apply(variables, x, train=False)

    sd = export_torch_resnet_state_dict(jax.tree.map(np.asarray, variables))
    td = TorchResNet18Features().eval()
    res = td.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not res.unexpected_keys
    # only BN num_batches_tracked may be missing
    assert all("num_batches_tracked" in k for k in res.missing_keys)
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
