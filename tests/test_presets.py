"""Preset registry encodes each reference script's hyperparameters
(SURVEY §2.1 per-file inventory)."""
import pytest

from strainer_gan_tpu.config import PRESETS, ExperimentConfig, get_preset


def test_all_reference_scripts_have_presets():
    # 21 reference files -> 19 presets (#celeba.py == #%basic.py + prints;
    # `# strainer gan + concate` vs `# loss만 + concate` are both present)
    assert len(PRESETS) >= 18


@pytest.mark.parametrize(
    "name,epochs,lr_d,lr_g,method",
    [
        ("basic", 5, 2e-4, 2e-4, "none"),                    # #%basic.py
        ("mnist8", 300, 2e-4, 2e-4, "none"),                 # #8.py
        ("zscore", 10, 2e-4, 2e-4, "zscore_fixed"),          # #z_score.py
        ("zscore_elbow", 10, 2e-4, 2e-4, "zscore_elbow"),
        ("zscore_dbscan", 10, 2e-4, 2e-4, "zscore_dbscan"),
        ("loss_gmm", 10, 2e-4, 2e-4, "loss_gmm"),
        ("loss_ensemble", 10, 2e-4, 2e-4, "loss_ensemble"),
        ("strainer_gan", 10, 1e-4, 2e-4, "loss_percentile"),  # TTUR
        ("fake_concat", 10, 1e-4, 2e-4, "loss_percentile"),
        ("final", 10, 1e-4, 2e-4, "loss_percentile"),
        ("batch_mask", 20, 2e-4, 2e-4, "batch_quantile_mask"),
        ("mnist_full", 300, 2e-4, 2e-4, "zscore_fixed"),
    ],
)
def test_preset_hyperparams(name, epochs, lr_d, lr_g, method):
    cfg = get_preset(name)
    assert cfg.train.epochs == epochs
    assert cfg.train.lr_d == lr_d
    assert cfg.train.lr_g == lr_g
    assert cfg.strain.method == method


def test_final_preset_quirks():
    """`# final.py` live-section specifics (SURVEY §2.4 quirk #1)."""
    cfg = get_preset("final")
    assert cfg.strain.final_py_ratio_inversion
    assert cfg.strain.prefilter and cfg.strain.z_threshold == 5.0
    assert cfg.strain.clean_ratio_schedule == ((0, 1.0), (3, 0.8), (5, 0.6), (7, 0.5))
    assert cfg.train.lr_decay_epoch == 3
    assert cfg.strain.bn_eval_after_score


def test_mnist_full_quirks():
    """`# 1,2,8.py`: smoothed labels, numpy-std z4 prefilter, refinement no-op."""
    cfg = get_preset("mnist_full")
    assert cfg.train.real_label == 0.9 and cfg.train.fake_label == 0.1
    assert cfg.strain.z_threshold == 4.0
    assert cfg.strain.z_std_mode == "numpy_eps"
    assert cfg.strain.prefilter and not cfg.strain.every_epoch  # quirk #3
    assert cfg.eval.fid_normalize_activations


def test_dbscan_preset_inclusive_threshold():
    cfg = get_preset("zscore_dbscan")
    assert not cfg.strain.strict_less  # `<=` (`# z_score + DBSCAN.py:325`)
    assert cfg.strain.dbscan_eps == 20.0 and cfg.strain.dbscan_min_samples == 3


def test_config_json_roundtrip():
    cfg = get_preset("final")
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.strain == cfg.strain
    assert cfg2.train == cfg.train
    assert cfg2.data.sources == cfg.data.sources


def test_drop_last_per_preset():
    """DataLoader tail semantics per script: every CelebA-family loader keeps
    torch's default drop_last=False (`#%basic.py:76`); the MNIST loaders pass
    drop_last=True (`#8.py:50`, `Untitled-2.py:67`, `Untitled-3.py:84`,
    `# 1,2,8.py:79`)."""
    mnist = {"mnist8", "mnist_8_2", "mnist_1_2_8_baseline", "mnist_full"}
    for name, cfg in PRESETS.items():
        want = name in mnist
        assert cfg.data.drop_last == want, (name, cfg.data.drop_last)


def test_mixers_per_preset():
    assert get_preset("zscore").data.mixer == "shuffled_combined"
    assert get_preset("strainer_gan").data.mixer == "combined"
    assert get_preset("batch_mask").data.mixer == "labeled"
    assert get_preset("mnist_full").data.mixer == "concat"
