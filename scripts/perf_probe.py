"""Round-2 perf probes on the live TPU.

Measures, with the fetch-flush methodology from bench.py:
  1. G forward alone (is the input-dilated convT efficient on the MXU?)
  2. G forward with a depth-to-space convT rewrite
  3. D forward alone
  4. full step at batch 512/1024/2048
Prints one line per probe.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def probe_g_forward(b=1024):
    from strainer_gan_tpu.models.dcgan import Generator64

    gen = Generator64()
    z = jax.random.normal(jax.random.PRNGKey(0), (b, 100), jnp.float32)
    vs = gen.init(jax.random.PRNGKey(1), z, train=False)

    @jax.jit
    def fwd(params, stats, z):
        return gen.apply({"params": params, "batch_stats": stats}, z, train=False)

    dt = timeit(fwd, vs["params"], vs["batch_stats"], z)
    eff_gf = 0.2338 * b  # efficient convT count, GF
    naive_gf = 0.855 * b
    print(
        f"G fwd b{b}: {dt*1e3:.2f} ms  -> {eff_gf/dt/1e3:.1f} TF/s (eff count) "
        f"/ {naive_gf/dt/1e3:.1f} TF/s (naive count)"
    )
    return dt


def probe_g_forward_d2s(b=1024):
    """ConvT as 2x2-subpixel stride-1 conv + depth-to-space."""

    def convt_d2s(x, w):
        # w: (4,4,in,out) torch-semantics convT kernel (we use the conv
        # identity kernel here; only throughput matters for the probe)
        kin, kout = w.shape[2], w.shape[3]
        # output pixel (2i+di, 2j+dj) = sum_{a,b in 0..1} x[i+?,j+?] * slice
        # Build a (2,2,in, 4*out) stride-1 kernel.
        w4 = (
            w.reshape(2, 2, 2, 2, kin, kout)
            .transpose(1, 3, 4, 0, 2, 5)
            .reshape(2, 2, kin, 4 * kout)
        )
        xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        n, h, wdt, _ = y.shape
        y = y.reshape(n, h, wdt, 2, 2, kout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wdt, kout)
        return y

    key = jax.random.PRNGKey(0)
    ws = []
    chans = [(100, 512, 1), (512, 256, 2), (256, 128, 2), (128, 64, 2), (64, 3, 2)]
    for i, (ci, co, s) in enumerate(chans):
        ws.append(
            jax.random.normal(jax.random.fold_in(key, i), (4, 4, ci, co), jnp.bfloat16)
            * 0.02
        )

    @jax.jit
    def fwd(ws, z):
        x = z.reshape(-1, 1, 1, 100).astype(jnp.bfloat16)
        # first: stride1 pad0 direct (out 4x4)
        x = jax.lax.conv_general_dilated(
            x, ws[0], (1, 1), [(3, 3), (3, 3)],
            lhs_dilation=(1, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
        for w in ws[1:4]:
            x = convt_d2s(x, w)
            x = jax.nn.relu(x)
        x = convt_d2s(x, ws[4])
        return jnp.tanh(x)

    b = 1024
    z = jax.random.normal(jax.random.PRNGKey(9), (b, 100), jnp.float32)
    dt = timeit(fwd, ws, z)
    eff_gf = 0.2338 * b
    print(f"G fwd d2s b{b}: {dt*1e3:.2f} ms -> {eff_gf/dt/1e3:.1f} TF/s (eff count)")
    return dt


def probe_d_forward(b=1024):
    from strainer_gan_tpu.models.dcgan import Discriminator64

    disc = Discriminator64()
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 3), jnp.bfloat16)
    vs = disc.init(jax.random.PRNGKey(1), x, train=False)

    @jax.jit
    def fwd(params, stats, x):
        return disc.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )

    dt = timeit(fwd, vs["params"], vs["batch_stats"], x)
    gf = 0.2076 * b
    print(f"D fwd b{b}: {dt*1e3:.2f} ms -> {gf/dt/1e3:.1f} TF/s")
    return dt


def probe_full_step(b):
    from bench import bench

    ips = bench(batch_size=b, iters=20, warmup=5)
    print(f"full step b{b}: {ips:.0f} img/s")
    return ips


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "g"):
        probe_g_forward()
    if which in ("all", "g2"):
        probe_g_forward_d2s()
    if which in ("all", "d"):
        probe_d_forward()
    if which in ("all", "step"):
        for b in (1024, 2048):
            probe_full_step(b)
