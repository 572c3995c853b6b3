"""Metrics & logging (component C24).

Keeps the reference's console formats for parity debugging:
* DCGAN scripts: ``[e/E][i/I]\tLoss_D: %.4f\tLoss_G: %.4f\tD(x): %.4f\t
  D(G(z)): %.4f / %.4f`` every 50 iters (`#%basic.py:291-294`),
* MNIST scripts: ``Epoch [..] Step [..] d_loss: %.5f g_loss: %.5f`` every 10
  (`#8.py:140-141`),
* strain reports: ``Removed N outliers`` (`#z_score.py:321`), contamination
  counters (`# 상위 10%...X.py:335-337`).

Loss histories (G_losses/D_losses, `#%basic.py:296-298`) are retained in
memory; scalar fetches are batched per logging interval so the device never
syncs more often than the reference printed.
"""
from __future__ import annotations

import sys
import time
from typing import Dict, List

import numpy as np


class MetricsLogger:
    def __init__(self, log_every: int = 50, style: str = "dcgan",
                 stream=None, collect: bool = True):
        self.log_every = log_every
        self.style = style
        self.stream = stream or sys.stdout
        self.collect = collect
        self.G_losses: List[float] = []
        self.D_losses: List[float] = []
        self.step_times: List[float] = []
        self._last = time.perf_counter()

    def log_step(self, epoch, num_epochs, it, steps, metrics: Dict):
        if self.collect:
            self.G_losses.append(float(metrics["errG"]))
            self.D_losses.append(float(metrics["errD"]))
        now = time.perf_counter()
        self.step_times.append(now - self._last)
        self._last = now
        if self.log_every and it % self.log_every == 0:
            if self.style == "dcgan":
                self.stream.write(
                    "[%d/%d][%d/%d]\tLoss_D: %.4f\tLoss_G: %.4f\t"
                    "D(x): %.4f\tD(G(z)): %.4f / %.4f\n"
                    % (epoch, num_epochs, it, steps,
                       float(metrics["errD"]), float(metrics["errG"]),
                       float(metrics["D_x"]), float(metrics["D_G_z1"]),
                       float(metrics["D_G_z2"]))
                )
            else:
                self.stream.write(
                    "Epoch [%d/%d] Step [%d/%d] d_loss: %.5f g_loss: %.5f\n"
                    % (epoch + 1, num_epochs, it + 1, steps,
                       float(metrics["errD"]), float(metrics["errG"]))
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
        st = np.asarray(self.step_times[2:]) if len(self.step_times) > 2 else np.asarray([0.0])
        return dict(
            steps=len(self.G_losses),
            mean_step_time=float(st.mean()) if st.size else 0.0,
            last_G_loss=self.G_losses[-1] if self.G_losses else None,
            last_D_loss=self.D_losses[-1] if self.D_losses else None,
        )
