"""Headline benchmark: CelebA-64 images/sec/chip for a full G+D+strain step.

Runs on the default backend (the real TPU under the driver).  The step is the
complete training step — per-batch strain scoring + quantile mask + masked D
update + G update + Adam + BatchNorm stats — i.e. the `# 상위 10% loss값...X.py`
pipeline with the strainer *engaged*, which is the BASELINE.json definition
("full G+D+strain step", strain stage included and on-device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 50_000 (the BASELINE.json target).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 50_000.0


def bench(batch_size: int = 1024, iters: int = 96, warmup: int = 32,
          chunk: int = 32, unroll: int = 1) -> float:
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import make_chunked_train_step

    cfg = get_preset("batch_mask")
    gen, disc = build_models(cfg.model)
    key = jax.random.PRNGKey(0)
    state = create_state(cfg, gen, disc, key)
    scfg = step_config_from(cfg)
    # scan-chunked executor: `chunk` steps per device dispatch, batches
    # gathered on-device from the HBM-resident dataset — the same executor
    # Trainer.run_epoch drives (train/loop.py), at the same chunk size as
    # TrainConfig.steps_per_dispatch's default (32), not a bench-only
    # shortcut.
    step = make_chunked_train_step(gen, disc, scfg, donate=True, unroll=unroll)

    n_data = 4 * batch_size  # HBM-resident dataset the chunk gathers from
    data = jax.random.randint(
        jax.random.PRNGKey(1), (n_data, 64, 64, 3), 0, 256, jnp.uint8
    )
    src = jnp.zeros((n_data,), jnp.int32)
    lr = jnp.float32(2e-4)
    mask_on = True  # strain engaged (static: weighted full-shape lanes)
    concat_on = jnp.asarray(False)

    # pre-stage all per-chunk index matrices and PRNG keys OUTSIDE the timed
    # region: tiny aux dispatches interleaved with the step would serialize
    # against it on the remote dispatch queue (~1 ms each, a measured ~5%
    # throughput hit).  The Trainer pre-splits per-epoch the same way.
    n_warm = max(warmup // chunk, 1)
    n_chunks = max(iters // chunk, 1)
    feeds = []
    for i in range(n_warm + n_chunks):
        k_idx, k_steps = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(2), i)
        )
        idx = jax.random.randint(k_idx, (chunk, batch_size), 0, n_data, jnp.int32)
        feeds.append((idx, jax.random.split(k_steps, chunk)))

    def run(state, chunk_feeds):
        for idx, keys in chunk_feeds:
            state, metrics = step(
                state, data, src, idx, keys, lr, lr, mask_on, concat_on, None
            )
        return state, metrics

    state, metrics = run(state, feeds[:n_warm])
    # force a full pipeline flush with a scalar fetch — on remote-attached
    # backends block_until_ready alone can return before the dispatch queue
    # has drained, inflating throughput ~20x.
    _ = float(metrics["errD"][-1])

    t0 = time.perf_counter()
    state, metrics = run(state, feeds[n_warm:])
    _ = float(metrics["errD"][-1])
    dt = time.perf_counter() - t0
    return batch_size * n_chunks * chunk / dt


def main():
    if len(sys.argv) > 1:
        ips = bench(batch_size=int(sys.argv[1]))
    else:
        # ONE declared config for the headline: batch 256, chunk 64, scan
        # unroll 4 — the steady-state winner of the round-5 sweep on the
        # attached v5e (b256 measured 54.7-55.3k over 4 chunk/unroll combos
        # and 3 repeat runs; b1024/chunk32 control re-measured 50.8-50.9k in
        # the same session; full sweep table in STATUS.md).  No per-run
        # best-of-N selection — rerun with an explicit batch size to probe
        # other points: `python bench.py 1024`.
        ips = bench(batch_size=256, iters=256, warmup=64, chunk=64, unroll=4)
    print(
        json.dumps(
            dict(
                metric="celeba64_images_per_sec_per_chip",
                value=round(ips, 1),
                unit="img/s/chip (full G+D+strain step)",
                vs_baseline=round(ips / BASELINE_IMG_PER_SEC, 4),
            )
        )
    )


if __name__ == "__main__":
    main()
