"""Round-3 probes for the `final` flagship scoring pass (VERDICT r2 #1).

Times, with the fetch-flush methodology from bench.py, every piece of the
per-epoch percentile scoring budget on the live TPU:
  1. bf16 bulk scoring scan at batch 512/1024/2048/4096 (66k dataset)
  2. f32 scoring scan at the same batch sizes
  3. one 66k f32 argsort (the threshold/rank machinery's unit cost)
  4. the full fused_percentile_refine dispatch at eps {0.05, 0.01} and
     batch {512, 1024, 2048}

Usage: python scripts/score_probe.py [bulk|sort|fused|all]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

N = 66_000


def flush(x):
    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    flush(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    flush(out)
    return (time.perf_counter() - t0) / iters


def setup():
    from strainer_gan_tpu.data.pipeline import DeviceDataset
    from strainer_gan_tpu.data.mixers import Mixture
    from strainer_gan_tpu.models.dcgan import Discriminator64
    import numpy as np

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (N, 64, 64, 3), np.uint8)
    ds = DeviceDataset(Mixture(
        images=imgs, source_id=np.zeros((N,), np.int32),
        labels=np.zeros((N,), np.int64)))
    disc = Discriminator64()
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vs = disc.init(jax.random.PRNGKey(1), x0, train=False)
    # a freshly-initialized D emits logits ~0 -> every BCE score is ~ln2 and
    # the band holds the whole dataset (the overflow path).  Scaling the
    # conv weights spreads the logits so the fused probe can time the BAND
    # path (the steady state of a trained D); scale=1 times the overflow path.
    scale = float(__import__("os").environ.get("PROBE_W_SCALE", "2.0"))
    params = jax.tree.map(lambda p: p * scale, vs["params"])
    return disc, params, vs["batch_stats"], ds


def probe_bulk(disc, params, stats, ds):
    from strainer_gan_tpu.strain import score as SC

    for dtype_name, dt_ in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        dc = disc.clone(compute_dtype=dt_)
        for bs, unroll in ((512, 1), (512, 2), (512, 4), (1024, 1),
                           (1024, 2), (2048, 1), (4096, 1)):
            def apply_fn(batch_u8, dc=dc):
                from strainer_gan_tpu.data.pipeline import normalize_u8
                from strainer_gan_tpu.ops import losses as L
                x = normalize_u8(batch_u8, dc.compute_dtype)
                logits = dc.apply(
                    {"params": params, "batch_stats": stats}, x, train=False)
                return L.bce_from_logits(logits, 1.0)

            @jax.jit
            def scan(images, bs=bs, unroll=unroll, apply_fn=apply_fn):
                return SC._scan_batches(apply_fn, images, bs, unroll=unroll)

            t = timeit(scan, ds.images)
            print(f"bulk {dtype_name} b{bs} u{unroll}: {t*1e3:7.2f} ms "
                  f"({N/t/1e3:.0f}k img/s)")


def probe_sort(ds):
    x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)

    @jax.jit
    def srt(x):
        return jnp.argsort(x)

    @jax.jit
    def srt_take(x):
        o = jnp.argsort(x)
        return o, jnp.take(x, o)

    print(f"argsort 66k: {timeit(srt, x)*1e3:.2f} ms")
    print(f"argsort+take 66k: {timeit(srt_take, x)*1e3:.2f} ms")


def probe_fused(disc, params, stats, ds):
    from strainer_gan_tpu.strain import score as SC

    valid = jnp.ones((N,), bool)
    for eps in (0.05, 0.01):
        for bs in (512, 1024, 2048):
            def call(images_unused, eps=eps, bs=bs):
                return SC.fused_percentile_refine(
                    disc, params, stats, ds, 0.8, valid,
                    batch_size=bs, band_eps=eps)

            t = timeit(call, None, iters=5, warmup=2)
            m, thr, s, bstats = call(None)
            b = [float(v) for v in jax.device_get(bstats)]
            print(f"fused eps={eps} b{bs}: {t*1e3:7.2f} ms  "
                  f"n_band={b[0]:.0f} overflow={b[1]:.0f} drift={b[2]:.2e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    parts = setup()
    if which in ("all", "bulk"):
        probe_bulk(*parts)
    if which in ("all", "sort"):
        probe_sort(parts[3])
    if which in ("all", "fused"):
        probe_fused(*parts)
