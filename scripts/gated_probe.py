"""A/B: ungated vs device-gated chunked executor cost on the live TPU.

Times (fetch-flushed, bench.py methodology):
  1. ungated chunk-32 dispatch (the bench.py headline config)
  2. gated chunk-32, all 32 steps live
  3. gated chunk-32, fully dead (the deferred path's trailing chunk)
  4. the strain scoring dispatch + stats fetch + gated dispatch sequence, to
     see how much of the deferred epoch's overhead is dispatch latency.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import (
        make_chunked_train_step,
        make_gated_chunked_train_step,
    )

    cfg = get_preset("final")
    gen, disc = build_models(cfg.model)
    state = create_state(cfg, gen, disc, jax.random.PRNGKey(0))
    scfg = step_config_from(cfg)
    ung = make_chunked_train_step(gen, disc, scfg, donate=True)
    gat = make_gated_chunked_train_step(gen, disc, scfg, donate=True)

    bsz, chunk, n = 1024, 32, 66000
    data = jax.random.randint(
        jax.random.PRNGKey(1), (n, 64, 64, 3), 0, 256, jnp.uint8
    )
    src = jnp.zeros((n,), jnp.int32)
    lr = jnp.float32(2e-4)
    feeds = []
    for i in range(10):
        k_idx, k_steps = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(2), i)
        )
        idx = jax.random.randint(k_idx, (chunk, bsz), 0, n, jnp.int32)
        feeds.append((idx, jax.random.split(k_steps, chunk)))

    def timeit(run, iters=6, warm=2):
        nonlocal state
        for _ in range(warm):
            m = run()
        _ = float(m["errD"][-1])
        t0 = time.perf_counter()
        for _ in range(iters):
            m = run()
        _ = float(m["errD"][-1])
        return (time.perf_counter() - t0) / iters

    i_feed = [0]

    def next_feed():
        i_feed[0] = (i_feed[0] + 1) % len(feeds)
        return feeds[i_feed[0]]

    def run_ung():
        nonlocal state
        idx, ks = next_feed()
        state, m = ung(state, data, src, idx, ks, lr, lr,
                       False, jnp.asarray(False), None)
        return m

    def run_gated(n_valid):
        def f():
            nonlocal state
            idx, ks = next_feed()
            state, m = gat(state, data, src, idx, ks, 0, jnp.int32(n_valid),
                           lr, lr, False, jnp.asarray(False), None)
            return m
        return f

    t1 = timeit(run_ung)
    print(f"ungated chunk32:        {t1*1e3:7.2f} ms ({chunk*bsz/t1/1e3:.1f}k img/s)")
    t2 = timeit(run_gated(chunk))
    print(f"gated all-live:         {t2*1e3:7.2f} ms ({chunk*bsz/t2/1e3:.1f}k img/s)")
    t3 = timeit(run_gated(0))
    print(f"gated fully dead:       {t3*1e3:7.2f} ms")
    print(f"cond overhead/step:     {(t2-t1)/chunk*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
