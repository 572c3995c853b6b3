"""Device-resident input pipeline semantics (component C2/C3)."""
import numpy as np
import jax
import jax.numpy as jnp

from strainer_gan_tpu.config import DataConfig, SourceSpec
from strainer_gan_tpu.data import (
    DeviceDataset,
    build_mixture,
    epoch_batch_indices,
    normalize_u8,
)


def test_epoch_batch_indices_properties():
    n = 100
    active = np.zeros(n, bool)
    active[: 37] = True
    key = jax.random.PRNGKey(0)
    idx = epoch_batch_indices(key, jnp.asarray(active), num=4, batch_size=8)
    flat = np.asarray(idx).reshape(-1)
    assert idx.shape == (4, 8)
    # only active samples, each at most once
    assert active[flat].all()
    assert len(set(flat.tolist())) == len(flat)
    # different key -> different order
    idx2 = epoch_batch_indices(jax.random.PRNGKey(1), jnp.asarray(active), 4, 8)
    assert not np.array_equal(np.asarray(idx2), np.asarray(idx))


def test_normalize_u8_range():
    x = jnp.asarray(np.array([0, 127, 255], np.uint8))
    y = np.asarray(normalize_u8(x, jnp.float32))
    np.testing.assert_allclose(y, [-1.0, 127 * 2 / 255 - 1, 1.0], atol=1e-6)


def test_mixture_source_ids_and_order():
    cfg = DataConfig(
        sources=(SourceSpec("synthetic_faces"), SourceSpec("synthetic_objects")),
        image_size=16, batch_size=4, mixer="shuffled_combined", seed=3,
    )
    mix = build_mixture(cfg, max_synth=50)
    assert len(mix) == 100
    assert (mix.source_id == 0).sum() == 50
    assert (mix.source_id == 1).sum() == 50
    # shuffled: source ids interleaved (not a contiguous block)
    assert mix.source_id[:50].sum() > 0
    # deterministic given the seed
    mix2 = build_mixture(cfg, max_synth=50)
    np.testing.assert_array_equal(mix.source_id, mix2.source_id)
    np.testing.assert_array_equal(mix.images, mix2.images)

    cfg_c = DataConfig(
        sources=(SourceSpec("synthetic_faces"), SourceSpec("synthetic_objects")),
        image_size=16, mixer="combined", seed=3,
    )
    mix_c = build_mixture(cfg_c, max_synth=50)
    # combined: contaminant strictly appended (`#strainer gan.py:122-137`)
    np.testing.assert_array_equal(
        mix_c.source_id, np.r_[np.zeros(50, np.int32), np.ones(50, np.int32)]
    )


def test_fraction_of_primary_sizing():
    cfg = DataConfig(
        sources=(SourceSpec("synthetic_faces"),
                 SourceSpec("synthetic_objects", fraction_of_primary=0.1)),
        image_size=16, mixer="labeled", seed=0,
    )
    mix = build_mixture(cfg, max_synth=60)
    assert (mix.source_id == 1).sum() == 6  # 10% of primary size


def test_device_dataset_steps_and_gather():
    cfg = DataConfig(sources=(SourceSpec("synthetic_faces"),), image_size=16,
                     batch_size=8)
    ds = DeviceDataset(build_mixture(cfg, max_synth=30))
    active = jnp.asarray(np.r_[np.ones(20, bool), np.zeros(10, bool)])
    assert ds.steps_per_epoch(active, 8) == 2
    idx = ds.epoch_indices(jax.random.PRNGKey(0), active, 8)
    batch = ds.gather(idx[0])
    assert batch.shape == (8, 16, 16, 3)
    assert batch.dtype == jnp.uint8


def test_epoch_batch_indices_drop_last_false_wraps():
    # 40 active of 80, batch 16, ceil -> 3 batches of 16 = 48 slots: the tail
    # wraps into the shuffled actives instead of touching inactive samples
    n = 80
    active = np.zeros(n, bool)
    active[:40] = True
    idx = epoch_batch_indices(jax.random.PRNGKey(0), jnp.asarray(active),
                              num=3, batch_size=16)
    flat = np.asarray(idx).reshape(-1)
    assert idx.shape == (3, 16)
    assert active[flat].all()
    # first 40 slots are distinct actives; the extra 8 repeat from the start
    assert len(set(flat[:40].tolist())) == 40
