"""Epoch-level schedules (component C21)."""
from __future__ import annotations

from typing import Optional, Tuple

from ..config import TrainConfig


def clean_ratio_at(epoch: int, schedule: Optional[Tuple[Tuple[int, float], ...]]) -> float:
    """Piecewise-constant keep-ratio schedule.

    Encodes `get_clean_ratio` (`# final.py:383-390`: 1.0/0.8/0.6/0.5 at
    epochs <3/<5/<7/>=7; `# 종합 loss.py:333-341`: 1.0/0.9/0.8/0.7)."""
    if schedule is None:
        return 1.0
    ratio = schedule[0][1]
    for start, r in schedule:
        if epoch >= start:
            ratio = r
    return ratio


def lr_at(base_lr: float, epoch: int, cfg: TrainConfig) -> float:
    """`adjust_learning_rate` (`# final.py:377-380`): lr*factor from
    ``lr_decay_epoch`` on (a flat cut, not compounding)."""
    if cfg.lr_decay_epoch is not None and epoch >= cfg.lr_decay_epoch:
        return base_lr * cfg.lr_decay_factor
    return base_lr
