"""Golden end-to-end filter-mask agreement (SURVEY §4; BASELINE >= 99%).

The strongest cross-framework check available without the reference's
datasets: train our jax D for a few steps, export its weights into a
torch-implemented discriminator, then run the REFERENCE's scoring+threshold
logic in torch/numpy (per-sample BCELoss over the dataset in loader order,
np.percentile refinement / quantile mask) and compare the resulting masks
against our device-side engine masks sample-for-sample.

This exercises the full chain the BASELINE metric cares about: forward parity
(conv/BN translations), loss-value parity (sigmoid+clamped BCE rounding), and
threshold parity — not just each stage in isolation.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.data.pipeline import normalize_u8
from strainer_gan_tpu.parity import oracle
from strainer_gan_tpu.strain.score import score_d_losses
from strainer_gan_tpu.strain.thresholds import (
    percentile_refine_mask,
    zscore_quantile_mask,
)
from strainer_gan_tpu.train.loop import Trainer

from test_models_parity import copy_d_params, torch_discriminator64

pytestmark = pytest.mark.slow  # multi-minute; inner loop runs -m 'not slow'


@pytest.fixture(scope="module")
def trained():
    """A briefly-trained DCGAN trainer on contaminated synthetic data."""
    cfg = get_preset("final")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, epochs=2, log_every=0),
        strain=dataclasses.replace(cfg.strain, prefilter=False, start_epoch=99),
    )
    tr = Trainer(cfg, max_synth=48)
    tr.run()
    return tr


def torch_reference_losses(trained) -> np.ndarray:
    """The reference's `refine_dataset_by_loss` scoring loop
    (`# final.py:343-356`): batch-64 loader order, D.eval(), BCELoss vs 1."""
    td = torch_discriminator64().eval()
    copy_d_params(jax.tree.map(np.asarray, trained.state.d_params), td)
    # load running BN stats (our scoring path uses eval-mode BN)
    bns = [m for m in td.modules() if isinstance(m, tnn.BatchNorm2d)]
    stats = jax.tree.map(np.asarray, trained.state.d_stats)
    with torch.no_grad():
        for i, m in enumerate(bns):
            m.running_mean.copy_(torch.from_numpy(stats[f"MaskedBatchNorm_{i}"]["mean"]))
            m.running_var.copy_(torch.from_numpy(stats[f"MaskedBatchNorm_{i}"]["var"]))

    imgs = np.asarray(trained.dataset.images)
    x = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    losses = []
    crit = tnn.BCELoss(reduction="none")
    with torch.no_grad():
        for i in range(0, len(xt), 64):
            out = torch.sigmoid(td(xt[i : i + 64])).view(-1)
            losses.extend(crit(out, torch.ones_like(out)).numpy())
    return np.asarray(losses)


def test_loss_scores_cross_framework(trained):
    ours = np.asarray(
        score_d_losses(
            trained.disc, trained.state.d_params, trained.state.d_stats,
            trained.dataset, real_label=1.0,
        )
    )
    theirs = torch_reference_losses(trained)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_percentile_refine_mask_agreement(trained):
    """`# final.py` per-epoch refinement: >= 99% agreement end-to-end."""
    ours_scores = score_d_losses(
        trained.disc, trained.state.d_params, trained.state.d_stats,
        trained.dataset, real_label=1.0,
    )
    for loss_ratio in (0.2, 0.5, 0.8):
        our_mask, _ = percentile_refine_mask(ours_scores, loss_ratio)
        ref_mask, _ = oracle.percentile_refine_mask(
            torch_reference_losses(trained), loss_ratio
        )
        agree = oracle.mask_agreement(np.asarray(our_mask), ref_mask)
        assert agree >= 0.99, (loss_ratio, agree)


def test_batch_quantile_mask_agreement(trained):
    """`# 상위 10%...X.py` per-batch mask vs torch quantile on D scores."""
    td = torch_discriminator64().eval()
    copy_d_params(jax.tree.map(np.asarray, trained.state.d_params), td)
    bns = [m for m in td.modules() if isinstance(m, tnn.BatchNorm2d)]
    stats = jax.tree.map(np.asarray, trained.state.d_stats)
    with torch.no_grad():
        for i, m in enumerate(bns):
            m.running_mean.copy_(torch.from_numpy(stats[f"MaskedBatchNorm_{i}"]["mean"]))
            m.running_var.copy_(torch.from_numpy(stats[f"MaskedBatchNorm_{i}"]["var"]))

    batch = np.asarray(trained.dataset.images[:16])
    x = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        scores_t = torch.sigmoid(
            td(torch.from_numpy(x).permute(0, 3, 1, 2))
        ).view(-1)
        thr_t = torch.quantile(scores_t, 0.1)
        ref_keep = (scores_t >= thr_t).numpy()

    logits = trained.disc.apply(
        {"params": trained.state.d_params, "batch_stats": trained.state.d_stats},
        jnp.asarray(x), train=False,
    )
    probs = jax.nn.sigmoid(logits)
    from strainer_gan_tpu.ops import stats as S

    thr = S.quantile(probs, 0.1)
    our_keep = np.asarray(probs >= thr)
    assert oracle.mask_agreement(our_keep, ref_keep) >= 0.99


def test_agreement_report_api():
    """parity.agreement.agreement_report: the headline metric as an API."""
    import dataclasses

    from strainer_gan_tpu.parity.agreement import agreement_report

    cfg = get_preset("final")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, epochs=4, log_every=0),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    key = jax.random.PRNGKey(3)

    def feat(x):
        flat = x.reshape(x.shape[0], -1)
        return flat @ jax.random.normal(key, (flat.shape[1], 16))

    tr = Trainer(cfg, feature_fn=feat, max_synth=40)
    tr.run()
    rep = agreement_report(tr, epoch=3)
    assert rep and rep["agreement"] >= 0.99, rep


def test_agreement_report_batch_mask():
    """agreement_report on the in-step quantile mask: the device mask's
    recorded scores re-thresholded with numpy quantile (torch semantics,
    `# 상위 10%...X.py:283-284`) must agree >= 99%."""
    import dataclasses

    from strainer_gan_tpu.parity.agreement import agreement_report

    cfg = get_preset("batch_mask")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=16),
        train=dataclasses.replace(cfg.train, epochs=2, log_every=0),
        strain=dataclasses.replace(cfg.strain, mask_start_epoch=1),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    tr = Trainer(cfg, max_synth=64)
    tr.run()
    rep = agreement_report(tr, epoch=1)
    assert rep and rep["method"] == "batch_quantile_mask", rep
    # the batch_mask preset keeps torch's drop_last=False (`#%basic.py:76`),
    # so the epoch's LAST step — the one the report records — is the partial
    # tail: 70 samples (64 primary + 6 contaminant) at batch 16 -> 6 valid
    # lanes, and the oracle quantiles exactly that smaller final batch
    assert rep["n"] == tr.dataset.n % 16 == 6
    assert rep["agreement"] >= 0.99, rep

    # full-batch case: drop_last=True makes the last step a full batch
    cfg_dl = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=16,
                                                  drop_last=True))
    tr_dl = Trainer(cfg_dl, max_synth=64)
    tr_dl.run()
    rep_dl = agreement_report(tr_dl, epoch=1)
    assert rep_dl and rep_dl["n"] == 16
    assert rep_dl["agreement"] >= 0.99, rep_dl


def test_agreement_report_dbscan_runs_sklearn():
    """agreement_report's zscore_dbscan branch runs the REAL sklearn
    DBSCAN chain on the cached features (not derived from our own mask)."""
    import dataclasses

    from strainer_gan_tpu.parity.agreement import agreement_report

    cfg = get_preset("zscore_dbscan")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, epochs=1, log_every=0),
        model=dataclasses.replace(cfg.model, compute_dtype="float32"),
    )
    key = jax.random.PRNGKey(11)

    def feat(x):
        flat = x.reshape(x.shape[0], -1)
        return flat @ jax.random.normal(key, (flat.shape[1], 8))

    tr = Trainer(cfg, feature_fn=feat, max_synth=48)
    tr.run()
    rep = agreement_report(tr, epoch=0)
    assert rep and rep["method"] == "zscore_dbscan", rep
    assert rep["agreement"] >= 0.99, rep
