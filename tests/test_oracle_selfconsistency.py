"""Fast oracle/config edge-case coverage (no jax compiles)."""
import numpy as np
import pytest

from strainer_gan_tpu.config import (
    DataConfig,
    ExperimentConfig,
    SourceSpec,
    StrainConfig,
)
from strainer_gan_tpu.parity import oracle


def test_oracle_percentile_refine_keeps_bottom(rng):
    losses = rng.random(100).astype(np.float32)
    mask, thr = oracle.percentile_refine_mask(losses, 0.3)
    # keeps strictly-below-threshold samples; threshold at the 70th percentile
    assert np.isclose(thr, np.percentile(losses, 70))
    assert mask.sum() == (losses < thr).sum()
    # kept losses are all smaller than any dropped loss (contiguous bottom)
    assert losses[mask].max() < losses[~mask].min()


def test_oracle_batch_quantile_keep_fraction(rng):
    scores = rng.random(128).astype(np.float32)
    keep, thr = oracle.batch_quantile_keep(scores, 0.1)
    # linear-interpolation quantile keeps ceil(0.9*(n-1)) + 1-ish samples
    assert 114 <= keep.sum() <= 116


def test_oracle_mask_agreement_symmetry(rng):
    a = rng.random(50) > 0.5
    b = rng.random(50) > 0.5
    assert oracle.mask_agreement(a, b) == oracle.mask_agreement(b, a)
    assert oracle.mask_agreement(a, a) == 1.0


def test_oracle_ae_mask_uses_bessel_std(rng):
    e = rng.random(40).astype(np.float32)
    _, thr = oracle.ae_error_mask(e, 2.0)
    assert np.isclose(thr, e.mean() + 2.0 * e.std(ddof=1))


def test_config_json_handles_nested_sources():
    cfg = ExperimentConfig(
        name="x",
        data=DataConfig(
            sources=(SourceSpec("mnist", class_filter=(1, 2), class_fraction=0.1),),
            image_size=28,
        ),
        strain=StrainConfig(clean_ratio_schedule=((0, 1.0), (3, 0.5))),
    )
    rt = ExperimentConfig.from_json(cfg.to_json())
    assert rt.data.sources[0].class_filter == (1, 2)
    assert rt.strain.clean_ratio_schedule == ((0, 1.0), (3, 0.5))


def test_unknown_mixer_and_source_raise():
    from strainer_gan_tpu.data.mixers import build_mixture

    with pytest.raises(ValueError, match="unknown mixer"):
        build_mixture(
            DataConfig(sources=(SourceSpec("synthetic_faces"),), image_size=16,
                       mixer="nope"),
            max_synth=8,
        )
    from strainer_gan_tpu.data.datasets import load_source

    with pytest.raises(ValueError, match="unknown source"):
        load_source(SourceSpec("nope"), 16, 3, seed=0)
