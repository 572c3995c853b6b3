"""Contamination mixers (component C3).

The reference combines a primary ("clean") dataset with contaminant sources in
four ways; all reduce to index arithmetic over concatenated arrays, so here a
mixture is just ``images`` + per-sample ``source_id`` (0 = primary, i>0 = i-th
contaminant — the ground-truth oracle the reference carries explicitly only in
`LabeledDataset`, `# 상위 10% loss값...X.py:71-110`) + an ``order`` permutation:

* ``shuffled_combined`` — `ShuffledCombinedDataset` (`#z_score.py:98-114`):
  np.random.shuffle over the concatenated index space, applied once at build.
* ``combined`` — `CombinedDataset` (`#strainer gan.py:122-137`): plain
  concatenation, contaminant appended after primary (order = identity).
* ``labeled`` — `LabeledDataset`: concatenation with source tags (identity).
* ``concat`` — `ConcatDataset` of subsets (`# 1,2,8.py:60-65`): identity.

Keeping ``source_id`` device-resident lets every strainer report
precision/recall against ground truth without host transfers (the
"filter-mask agreement" metric's numerator).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import DataConfig
from .datasets import ArrayDataset, load_source


@dataclass
class Mixture:
    images: np.ndarray  # uint8 NHWC, already in mixer order
    source_id: np.ndarray  # int32 (N,), 0 = primary/clean
    labels: np.ndarray  # int32 class labels where meaningful

    def __len__(self):
        return self.images.shape[0]

    @property
    def contaminated(self) -> np.ndarray:
        return self.source_id != 0


def build_mixture(cfg: DataConfig, max_synth: Optional[int] = None) -> Mixture:
    rng = np.random.default_rng(cfg.seed)
    datasets = []
    primary_len = None
    for i, spec in enumerate(cfg.sources):
        ds = load_source(spec, cfg.image_size, cfg.channels, cfg.seed + i,
                         max_synth=max_synth)
        if i == 0:
            primary_len = len(ds)
        if spec.fraction_of_primary is not None:
            # "10% of CelebA size" sizing (`# 상위 10%...X.py:71-79`)
            k = int(primary_len * spec.fraction_of_primary)
            idx = rng.choice(len(ds), size=min(k, len(ds)), replace=False)
            ds = ArrayDataset(ds.images[idx], ds.labels[idx])
        datasets.append(ds)

    images = np.concatenate([d.images for d in datasets], axis=0)
    labels = np.concatenate([d.labels for d in datasets], axis=0)
    source_id = np.concatenate(
        [np.full(len(d), i, np.int32) for i, d in enumerate(datasets)]
    )

    if cfg.mixer == "shuffled_combined":
        order = np.arange(len(images))
        rng.shuffle(order)  # `#z_score.py:104-105`
    elif cfg.mixer in ("combined", "labeled", "concat"):
        order = np.arange(len(images))
    else:
        raise ValueError(f"unknown mixer {cfg.mixer!r}")

    from .. import native

    gathered = native.gather_u8(images, order)
    if gathered is None:
        gathered = images[order]
    return Mixture(gathered, source_id[order], labels[order])
