"""id()-keyed jit-program caches must survive module garbage collection
(round-3 VERDICT weak #6).

The scoring caches key on ``id(module)``; CPython reuses ids after GC, so a
cache that does not hold a strong reference can serve a STALE closure (built
for a different architecture) to a brand-new module that landed on the same
id.  The fix stores the module alongside the compiled program (the pattern
``eval/fid.py`` already used); this test builds/scores/drops/rebuilds modules
of DIFFERENT architectures in a tight loop and checks every result against a
directly-computed oracle.
"""
import gc

import numpy as np
import jax
import jax.numpy as jnp

from strainer_gan_tpu.models.mlp_gan import MLPDiscriminator
from strainer_gan_tpu.ops.losses import bce_from_logits
from strainer_gan_tpu.strain.score import _D_SCORE_CACHE, score_d_losses


class _TinyDataset:
    def __init__(self, images):
        self.images = images
        self.source_id = jnp.zeros((images.shape[0],), jnp.int32)
        self.labels = self.source_id
        self.n = images.shape[0]
        self.image_shape = images.shape[1:]


def test_score_cache_survives_module_gc():
    key = jax.random.PRNGKey(0)
    images = jax.random.randint(key, (20, 28, 28, 1), 0, 256).astype(jnp.uint8)
    ds = _TinyDataset(images)
    x = (images.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    x_flat = x.reshape(20, -1)

    # alternate architectures so a stale closure (wrong widths) would either
    # crash on shapes or produce wrong scores
    widths = [(8,), (16,), (8,), (24,), (16,), (8,)]
    for i, hidden in enumerate(widths):
        disc = MLPDiscriminator(
            img_size=784, hidden=hidden, compute_dtype=jnp.float32
        )
        params = disc.init(
            {"params": jax.random.PRNGKey(i)}, x_flat, train=False
        )["params"]
        got = np.asarray(
            score_d_losses(disc, params, {}, ds, real_label=1.0,
                           batch_size=8, flatten=True)
        )
        logits = disc.apply({"params": params}, x_flat, train=False)
        want = np.asarray(bce_from_logits(logits, 1.0))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # every cache entry holds a strong ref to its module, so the id the
        # key was built from can never be reused while the entry lives
        for cache_key, entry in _D_SCORE_CACHE.items():
            if isinstance(cache_key, tuple) and cache_key:
                assert any(
                    obj is not None and id(obj) == cache_key[0]
                    for obj in entry[1:]
                ), "cache entry lost the module its id-key refers to"
        del disc, params
        gc.collect()
