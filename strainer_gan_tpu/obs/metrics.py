"""Metrics & logging (component C24).

Keeps the reference's console formats for parity debugging:
* DCGAN scripts: ``[e/E][i/I]\tLoss_D: %.4f\tLoss_G: %.4f\tD(x): %.4f\t
  D(G(z)): %.4f / %.4f`` every 50 iters (`#%basic.py:291-294`),
* MNIST scripts: ``Epoch [..] Step [..] d_loss: %.5f g_loss: %.5f`` every 10
  (`#8.py:140-141`),
* strain reports: ``Removed N outliers`` (`#z_score.py:321`), contamination
  counters (`# 상위 10%...X.py:335-337`).

Loss histories (G_losses/D_losses, `#%basic.py:296-298`) are retained as
DEVICE arrays and only materialized to host floats on first read (one fused
fetch), so collection never blocks the train loop: on a remote-attached TPU
a per-step ``float()`` costs a ~28 ms round trip and would make the Trainer
dispatch-bound (the round-1 bench sidestepped the Trainer for exactly this
reason).  The only in-loop host syncs left are the bounded ``log_every``
console prints — the same cadence at which the reference itself calls
``.item()``.
"""
from __future__ import annotations

import sys
import time
from typing import Dict, List

import numpy as np


class MetricsLogger:
    """Step/chunk logger with device-buffered loss histories.

    ``G_losses`` / ``D_losses`` / ``step_times`` are READ-ONLY views: each
    access returns a freshly-built list materialized from the device buffers
    (mutating or caching the returned list has no effect on the logger, and
    each property read re-runs a fused device fetch — hold the result in a
    local if you need it more than once).
    """

    def __init__(self, log_every: int = 50, style: str = "dcgan",
                 stream=None, collect: bool = True):
        self.log_every = log_every
        self.style = style
        self.stream = stream or sys.stdout
        self.collect = collect
        # device-side buffers: scalars (per-step) or (chunk,) arrays
        self._g_parts: List = []
        self._d_parts: List = []
        self._cache = None  # (n_parts, g_floats, d_floats)
        # (wall seconds, steps covered) per timed call
        self._timings: List = []
        self._last = time.perf_counter()

    # ------------------------------------------------------------ collection
    def _materialize(self):
        if self._cache is not None and self._cache[0] == len(self._g_parts):
            return self._cache[1], self._cache[2]
        if not self._g_parts:
            return [], []
        import jax.numpy as jnp

        # one concatenated device fetch per loss series, not one per step
        g = np.asarray(
            jnp.concatenate([jnp.atleast_1d(jnp.asarray(p, jnp.float32))
                             for p in self._g_parts])
        ).tolist()
        d = np.asarray(
            jnp.concatenate([jnp.atleast_1d(jnp.asarray(p, jnp.float32))
                             for p in self._d_parts])
        ).tolist()
        self._cache = (len(self._g_parts), g, d)
        return g, d

    @property
    def G_losses(self) -> List[float]:
        return self._materialize()[0]

    @property
    def D_losses(self) -> List[float]:
        return self._materialize()[1]

    @property
    def step_times(self) -> List[float]:
        return [dt / n for dt, n in self._timings for _ in range(n)]

    # --------------------------------------------------------------- logging
    def _print_step(self, epoch, num_epochs, it, steps, errD, errG,
                    d_x=None, d_g_z1=None, d_g_z2=None):
        if self.style == "dcgan":
            self.stream.write(
                "[%d/%d][%d/%d]\tLoss_D: %.4f\tLoss_G: %.4f\t"
                "D(x): %.4f\tD(G(z)): %.4f / %.4f\n"
                % (epoch, num_epochs, it, steps,
                   errD, errG, d_x, d_g_z1, d_g_z2)
            )
        else:
            self.stream.write(
                "Epoch [%d/%d] Step [%d/%d] d_loss: %.5f g_loss: %.5f\n"
                % (epoch + 1, num_epochs, it + 1, steps, errD, errG)
            )

    def log_step(self, epoch, num_epochs, it, steps, metrics: Dict):
        """Record one step.  Appends device scalars without fetching; only a
        ``log_every`` console print forces a (bounded) scalar fetch."""
        if self.collect:
            self._g_parts.append(metrics["errG"])
            self._d_parts.append(metrics["errD"])
        now = time.perf_counter()
        self._timings.append((now - self._last, 1))
        self._last = now
        if self.log_every and it % self.log_every == 0:
            # mnist-style prints use only errD/errG — don't pay 3 extra
            # ~28 ms remote fetches for scalars the format never shows
            dcgan = self.style == "dcgan"
            self._print_step(
                epoch, num_epochs, it, steps,
                float(metrics["errD"]), float(metrics["errG"]),
                float(metrics["D_x"]) if dcgan else None,
                float(metrics["D_G_z1"]) if dcgan else None,
                float(metrics["D_G_z2"]) if dcgan else None,
            )

    def log_chunk(self, epoch, num_epochs, it0, steps, metrics: Dict, n: int):
        """Record a scan-chunk of ``n`` steps whose stacked metrics arrived in
        one dispatch (train/steps.py make_chunked_train_step)."""
        if self.collect:
            self._g_parts.append(metrics["errG"])
            self._d_parts.append(metrics["errD"])
        now = time.perf_counter()
        self._timings.append((now - self._last, n))
        self._last = now
        if self.log_every:
            dcgan = self.style == "dcgan"
            for j in range(n):
                if (it0 + j) % self.log_every == 0:
                    self._print_step(
                        epoch, num_epochs, it0 + j, steps,
                        float(metrics["errD"][j]), float(metrics["errG"][j]),
                        float(metrics["D_x"][j]) if dcgan else None,
                        float(metrics["D_G_z1"][j]) if dcgan else None,
                        float(metrics["D_G_z2"][j]) if dcgan else None,
                    )

    def log_strain(self, epoch: int, removed: int, remaining: int):
        self.stream.write(
            f"Epoch {epoch}: Removed {removed} outliers. "
            f"{remaining} samples remaining.\n"
        )

    def log_contamination(self, epoch: int, filtered: int, total: int):
        # `# 상위 10%...X.py:335-337`
        self.stream.write(
            f"Epoch {epoch}: Filtered CIFAR-10 images: {filtered}/{total}\n"
        )

    def summary(self) -> Dict:
        g, d = self._materialize()
        n_steps = sum(n for _, n in self._timings)
        # skip compile/pipeline-fill warmup: two timed calls when there are
        # enough, degrading gracefully for short/chunked runs (a "call" may
        # now cover a whole steps_per_dispatch chunk)
        k = 2 if len(self._timings) > 2 else max(len(self._timings) - 1, 0)
        tail = self._timings[k:]
        mean_t = (
            sum(dt for dt, _ in tail) / max(sum(n for _, n in tail), 1)
            if tail else 0.0
        )
        return dict(
            steps=len(g) if g else n_steps,
            mean_step_time=mean_t,
            last_G_loss=g[-1] if g else None,
            last_D_loss=d[-1] if d else None,
        )
