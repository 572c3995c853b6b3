"""Eval-suite perf probe: inception activation extraction + 2048^2 sqrtm.

The FID pipeline's two costs are (1) the InceptionV3 forward over N samples
(`#strainer gan.py:398-422`, reference batch 50) and (2) the 2048x2048
trace-sqrtm (`:424-445`).  This probe measures, fetch-flushed (bench.py
methodology):

  1. get_activations throughput at batch {50, 64, 128, 256} x {f32, bf16}
     (5,120 synthetic 64x64 images; the resize-to-299 runs in-scan)
  2. trace_sqrtm_product (eigh) vs trace_sqrtm_product_ns (Newton-Schulz)
     at d=2048, plus their agreement on a well-conditioned FID-like pair.

Usage: python scripts/eval_probe.py [act|sqrtm|all]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def timeit(fn, *args, iters=4, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe_act(dtype: str = "float32", bs: int = 50):
    # one (dtype, batch) config per invocation: the InceptionV3 graph takes
    # minutes to compile through the remote-compile path, so sweeping in-
    # process would conflate compile and run time across configs
    from strainer_gan_tpu.eval.fid import get_activations
    from strainer_gan_tpu.models.features import build_feature_fn

    n = 2560
    imgs = jax.random.uniform(
        jax.random.PRNGKey(0), (n, 64, 64, 3), jnp.float32, -1.0, 1.0
    )
    fn = build_feature_fn("inception_v3", compute_dtype=dtype)
    t0 = time.perf_counter()
    jax.block_until_ready(get_activations(imgs, fn, batch_size=bs))
    compile_s = time.perf_counter() - t0
    t = timeit(lambda: get_activations(imgs, fn, batch_size=bs),
               iters=2, warmup=0)
    used = n // bs * bs
    print(f"activations {dtype} b{bs}: {t*1e3:8.1f} ms "
          f"({used/t:,.0f} img/s; first call incl compile {compile_s:.0f} s)",
          flush=True)


def probe_parts(dtype: str = "float32", bs: int = 256):
    """Split the per-batch cost: resize-to-299 alone vs inception fwd alone."""
    from strainer_gan_tpu.models.features import build_feature_fn
    from strainer_gan_tpu.models.inception import resize_bilinear_299

    imgs = jax.random.uniform(
        jax.random.PRNGKey(0), (bs, 64, 64, 3), jnp.float32, -1.0, 1.0
    )
    big = jax.random.uniform(
        jax.random.PRNGKey(1), (bs, 299, 299, 3), jnp.float32, -1.0, 1.0
    )
    rs = jax.jit(resize_bilinear_299)
    t_r = timeit(rs, imgs, iters=8, warmup=2)
    print(f"resize 64->299 b{bs}: {t_r*1e3:8.1f} ms", flush=True)
    fn = build_feature_fn("inception_v3", compute_dtype=dtype)
    t_f = timeit(fn, big, iters=4, warmup=1)
    print(f"inception fwd {dtype} b{bs}: {t_f*1e3:8.1f} ms "
          f"({bs/t_f:,.0f} img/s)", flush=True)


def probe_pool(bs: int = 256):
    """Suspect hunt: reduce_window pools at inception shapes, vs a
    depthwise-conv formulation of the same 3x3 s1 'same' average pool."""
    from strainer_gan_tpu.models import inception as I

    shapes = [(bs, 35, 35, 288), (bs, 17, 17, 768), (bs, 8, 8, 1280)]
    for shp in shapes:
        x = jax.random.uniform(jax.random.PRNGKey(0), shp, jnp.float32)
        avg = jax.jit(I._avgpool_3x3_s1_p1)
        t = timeit(avg, x, iters=6, warmup=2)
        print(f"avgpool rw  {shp}: {t*1e3:8.1f} ms", flush=True)

        def avg_dw(x):
            c = x.shape[-1]
            k = jnp.full((3, 3, 1, 1), 1.0 / 9.0, x.dtype)
            k = jnp.tile(k, (1, 1, 1, c))
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )

        t = timeit(jax.jit(avg_dw), x, iters=6, warmup=2)
        print(f"avgpool dw  {shp}: {t*1e3:8.1f} ms", flush=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (bs, 147, 147, 64),
                           jnp.float32)
    t = timeit(jax.jit(I._maxpool), x, iters=6, warmup=2)
    print(f"maxpool rw  {(bs,147,147,64)}: {t*1e3:8.1f} ms", flush=True)


def probe_sqrtm():
    import numpy as np

    from strainer_gan_tpu.ops.sqrtm import (
        trace_sqrtm_product,
        trace_sqrtm_product_ns,
    )

    d = 2048
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4096, d)).astype(np.float32) * np.exp(
        rng.standard_normal(d).astype(np.float32)
    )
    b = rng.standard_normal((4096, d)).astype(np.float32) * 1.3 + 0.2
    s1 = jnp.asarray(np.cov(a, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    s2 = jnp.asarray(np.cov(b, rowvar=False) + np.eye(d) * 1e-6, jnp.float32)
    eigh = jax.jit(trace_sqrtm_product)
    ns = jax.jit(trace_sqrtm_product_ns)
    t_e = timeit(eigh, s1, s2, iters=2)
    t_n = timeit(ns, s1, s2, iters=4)
    v_e, v_n = float(eigh(s1, s2)), float(ns(s1, s2))
    print(f"sqrtm eigh d=2048: {t_e*1e3:9.1f} ms  trace={v_e:.4f}")
    print(f"sqrtm NS   d=2048: {t_n*1e3:9.1f} ms  trace={v_n:.4f} "
          f"(rel err {abs(v_n-v_e)/abs(v_e):.2e}, speedup {t_e/t_n:.0f}x)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "act":
        probe_act(sys.argv[2] if len(sys.argv) > 2 else "float32",
                  int(sys.argv[3]) if len(sys.argv) > 3 else 50)
    if which == "parts":
        probe_parts(sys.argv[2] if len(sys.argv) > 2 else "float32",
                    int(sys.argv[3]) if len(sys.argv) > 3 else 256)
    if which == "pool":
        probe_pool(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
    if which in ("all", "sqrtm"):
        probe_sqrtm()
