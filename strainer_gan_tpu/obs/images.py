"""Sample-grid image output (component C24).

Replicates ``vutils.make_grid(fake, padding=2, normalize=True)`` +
``save_image`` (`#%basic.py:301-304`, `#8.py:144-147`) on NHWC arrays.
"""
from __future__ import annotations

import os

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              normalize: bool = True) -> np.ndarray:
    """images: (N, H, W, C) float -> (H', W', C) uint8 grid."""
    imgs = np.asarray(images, np.float32)
    if normalize:
        lo, hi = imgs.min(), imgs.max()
        imgs = (imgs - lo) / max(hi - lo, 1e-5)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.ones(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = imgs[i]
    return (grid * 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    padding: int = 2) -> None:
    grid = make_grid(images, nrow=nrow, padding=padding)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from PIL import Image

    if grid.shape[2] == 1:
        Image.fromarray(grid[:, :, 0], mode="L").save(path)
    else:
        Image.fromarray(grid).save(path)
