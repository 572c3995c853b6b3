"""Array-backed datasets (component C2).

The reference streams JPEG folders / torchvision datasets through per-batch
PIL worker processes (`#%basic.py:68-77`).  TPU-first redesign: every dataset
is materialized ONCE into a uint8 NHWC array (CelebA-64 is ~3 GB — HBM
resident), decode/resize/crop happen at build time on the host, and
normalization ((x/255 - 0.5)/0.5, `#%basic.py:73`) is fused into the jitted
train step.  After build there are no per-batch host hops.

Real data is loaded when present on disk (IMAGE folders, MNIST idx files,
CIFAR-10 pickle batches — never downloaded; this environment has no egress);
otherwise deterministic synthetic generators with per-source distribution
signatures stand in, preserving the contamination-detection problem structure
(clean vs off-distribution sources remain separable in feature space).
"""
from __future__ import annotations

import gzip
import os
import pickle
import random as _pyrandom
import struct
import zlib
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import SourceSpec

DATA_ROOTS = [
    os.environ.get("STRAINER_DATA_ROOT", ""),
    "/root/data",
    "./data",
]


@dataclass
class ArrayDataset:
    """images: uint8 NHWC; labels: int32 (class labels where applicable)."""

    images: np.ndarray
    labels: np.ndarray

    def __len__(self):
        return self.images.shape[0]


# ---------------------------------------------------------------------------
# host-side transforms (build-time only)


def resize_bilinear_u8(images: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize matching torchvision Resize semantics closely enough
    for build-time use.  Fast path: the native C++ staging runtime
    (multithreaded PIL-compatible triangle filter, strainer_gan_tpu.native);
    fallback: PIL per image, then numpy."""
    if images.shape[1] == size and images.shape[2] == size:
        return images
    from .. import native

    out = native.resize_bilinear_u8(images, size)
    if out is not None:
        return out
    try:
        from PIL import Image

        out = np.empty((images.shape[0], size, size, images.shape[3]), np.uint8)
        for i in range(images.shape[0]):
            im = images[i]
            if im.shape[2] == 1:
                pim = Image.fromarray(im[:, :, 0], mode="L")
                out[i, :, :, 0] = np.asarray(pim.resize((size, size), Image.BILINEAR))
            else:
                pim = Image.fromarray(im)
                out[i] = np.asarray(pim.resize((size, size), Image.BILINEAR))
        return out
    except ImportError:  # pragma: no cover - PIL is in the image
        idx = (np.arange(size) + 0.5) * images.shape[1] / size - 0.5
        i0 = np.clip(np.floor(idx).astype(int), 0, images.shape[1] - 1)
        return images[:, i0][:, :, i0]


def center_crop(images: np.ndarray, size: int) -> np.ndarray:
    h, w = images.shape[1:3]
    if images.dtype == np.uint8 and size <= h and size <= w:
        from .. import native

        out = native.center_crop_u8(images, size)
        if out is not None:
            return out
    top = (h - size) // 2
    left = (w - size) // 2
    return images[:, top : top + size, left : left + size]


def resize_shorter_then_crop(images: np.ndarray, size: int) -> np.ndarray:
    """transforms.Resize(size) (shorter side) + CenterCrop(size)
    (`#%basic.py:69-72`).  Build-time arrays here are square, so this reduces
    to a square resize; kept separate for folder-loaded non-square images."""
    h, w = images.shape[1:3]
    if h == w:
        return resize_bilinear_u8(images, size)
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    from PIL import Image

    out = np.empty((images.shape[0], nh, nw, images.shape[3]), np.uint8)
    for i in range(images.shape[0]):
        out[i] = np.asarray(Image.fromarray(images[i]).resize((nw, nh), Image.BILINEAR))
    return center_crop(out, size)


# ---------------------------------------------------------------------------
# real loaders (disk only, no downloads)


def _find(relpaths) -> Optional[str]:
    for root in DATA_ROOTS:
        if not root:
            continue
        for rel in relpaths:
            p = os.path.join(root, rel)
            if os.path.exists(p):
                return p
    return None


def _load_mnist_disk() -> Optional[ArrayDataset]:
    img_p = _find(
        [
            "MNIST/raw/train-images-idx3-ubyte",
            "MNIST/raw/train-images-idx3-ubyte.gz",
            "mnist/train-images-idx3-ubyte",
        ]
    )
    if img_p is None:
        return None
    lbl_p = img_p.replace("images-idx3", "labels-idx1")

    def _read(path):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as f:
            return f.read()

    raw = _read(img_p)
    _, n, h, w = struct.unpack(">IIII", raw[:16])
    images = np.frombuffer(raw, np.uint8, offset=16).reshape(n, h, w, 1)
    lraw = _read(lbl_p)
    labels = np.frombuffer(lraw, np.uint8, offset=8).astype(np.int32)
    return ArrayDataset(images.copy(), labels)


def _load_cifar10_disk() -> Optional[ArrayDataset]:
    p = _find(["cifar-10/cifar-10-batches-py", "cifar-10-batches-py"])
    if p is None:
        return None
    imgs, labels = [], []
    for i in range(1, 6):
        with open(os.path.join(p, f"data_batch_{i}"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labels.extend(d[b"labels"])
    return ArrayDataset(np.concatenate(imgs), np.asarray(labels, np.int32))


def _load_image_folder(names) -> Optional[ArrayDataset]:
    p = _find(names)
    if p is None:
        return None
    from PIL import Image

    paths = []
    for root, _, files in os.walk(p):
        for f in sorted(files):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                paths.append(os.path.join(root, f))
    paths.sort()

    def decode(fp):
        try:  # corrupt-image skip, like the anime loader (#strainer gan.py:100-104)
            return np.asarray(Image.open(fp).convert("RGB"))
        except Exception:
            return None

    # PIL releases the GIL during decode, so a thread pool gives near-linear
    # staging speedup on a 200k-image CelebA directory; order is preserved
    # (map) so dataset composition matches the serial loader exactly.
    from concurrent.futures import ThreadPoolExecutor

    workers = min(os.cpu_count() or 1, 16)
    if len(paths) > 64 and workers > 1:
        with ThreadPoolExecutor(workers) as pool:
            decoded = list(pool.map(decode, paths))
    else:
        decoded = [decode(fp) for fp in paths]
    imgs = [im for im in decoded if im is not None]
    if not imgs:
        return None
    # images may be ragged; resize each to its shorter-side-64 crop later.
    shapes = {im.shape for im in imgs}
    if len(shapes) == 1:
        return ArrayDataset(np.stack(imgs), np.zeros(len(imgs), np.int32))
    from PIL import Image as PImage

    out = np.stack(
        [np.asarray(PImage.fromarray(im).resize((64, 64), PImage.BILINEAR)) for im in imgs]
    )
    return ArrayDataset(out, np.zeros(len(out), np.int32))


# ---------------------------------------------------------------------------
# synthetic generators — deterministic, distribution-distinct per source


def _smooth_field(rng, n, size, ch, octaves=3):
    """Low-frequency smooth images (stand-in for faces: strong spatial
    correlation, narrow channel statistics)."""
    img = np.zeros((n, size, size, ch), np.float32)
    for o in range(octaves):
        res = 2 ** (o + 2)
        coarse = rng.standard_normal((n, res, res, ch)).astype(np.float32)
        reps = size // res
        up = np.kron(coarse, np.ones((1, reps, reps, 1), np.float32))
        img += up / (2.0**o)
    img = img / np.abs(img).max(axis=(1, 2, 3), keepdims=True).clip(1e-6)
    return img


def _synthetic(kind: str, n: int, size: int, ch: int, seed: int) -> ArrayDataset:
    rng = np.random.default_rng(seed)
    if kind == "faces":  # smooth, warm-tinted
        x = _smooth_field(rng, n, size, ch)
        bias = np.array([0.25, 0.05, -0.05])[:ch].reshape(1, 1, 1, ch)
        img = np.clip((x * 0.5 + 0.5) * 0.8 + bias + 0.1, 0, 1)
        labels = np.zeros(n, np.int32)
    elif kind == "objects":  # high-frequency texture (CIFAR-like)
        fine = rng.standard_normal((n, size, size, ch)).astype(np.float32)
        coarse = _smooth_field(rng, n, size, ch, octaves=2)
        img = np.clip(0.5 + 0.25 * fine + 0.25 * coarse, 0, 1)
        labels = rng.integers(0, 10, n).astype(np.int32)
    elif kind == "anime":  # flat saturated patches
        base = _smooth_field(rng, n, size, ch, octaves=2)
        img = np.clip(np.round(base * 2.0) / 2.0 * 0.5 + 0.5, 0, 1)
        labels = np.zeros(n, np.int32)
    elif kind == "digits":  # sparse strokes on black (MNIST-like)
        img = np.zeros((n, size, size, ch), np.float32)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size - 0.5
        labels = rng.integers(0, 10, n).astype(np.int32)
        for i in range(n):
            d = labels[i]
            cx, cy = rng.uniform(-0.1, 0.1, 2)
            r = 0.25 + 0.02 * d
            ring = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) ** 0.5 - r) ** 2 / 0.004)
            if d % 2:
                ring *= (xx > cx - 0.05).astype(np.float32)
            img[i, :, :, 0] = np.clip(ring + rng.normal(0, 0.05, (size, size)), 0, 1)
    else:
        raise ValueError(f"unknown synthetic kind {kind!r}")
    return ArrayDataset((img * 255).astype(np.uint8), labels)


_SYNTH_SIZES = {"faces": 20000, "objects": 50000, "anime": 6000, "digits": 60000}


# ---------------------------------------------------------------------------
# public entry


def load_source(
    spec: SourceSpec, image_size: int, channels: int, seed: int, max_synth: Optional[int] = None
) -> ArrayDataset:
    """Resolve one SourceSpec to a uint8 array dataset at target resolution.

    Transform parity: CelebA/anime use Resize(shorter)+CenterCrop
    (`#%basic.py:69-72`); CIFAR-10 uses Resize only (`#z_score.py:84-89`);
    MNIST is used at native 28x28 (`# 1,2,8.py:31-34`).
    """
    name = spec.name
    ds: Optional[ArrayDataset] = None
    if name == "mnist":
        ds = _load_mnist_disk()
        kind = "digits"
    elif name == "cifar10":
        ds = _load_cifar10_disk()
        kind = "objects"
    elif name == "celeba":
        ds = _load_image_folder(["celeba", "img_align_celeba"])
        kind = "faces"
    elif name == "anime":
        ds = _load_image_folder(["anime"])
        kind = "anime"
    elif name.startswith("synthetic_"):
        kind = name[len("synthetic_") :]
    else:
        raise ValueError(f"unknown source {name!r}")

    if ds is None:
        n = max_synth or _SYNTH_SIZES.get(kind, 20000)
        base = 32 if kind == "objects" else (28 if kind == "digits" else image_size)
        # stable per-source seed offset: python's hash() is randomized per
        # process (PYTHONHASHSEED), which would make the synthetic stand-in
        # (and any checkpoint --resume against it) differ run to run.
        ds = _synthetic(
            kind, n, base, channels,
            seed=seed + zlib.crc32(name.encode()) % 10000,
        )

    imgs = ds.images
    if imgs.shape[3] != channels:
        if channels == 1:
            imgs = imgs.mean(axis=3, keepdims=True).astype(np.uint8)
        else:
            imgs = np.repeat(imgs, channels, axis=3)
    if imgs.shape[1] != image_size or imgs.shape[2] != image_size:
        if imgs.shape[1] == imgs.shape[2]:
            imgs = resize_bilinear_u8(imgs, image_size)
        else:
            imgs = resize_shorter_then_crop(imgs, image_size)
    ds = ArrayDataset(imgs, ds.labels)

    # class filtering (`#8.py:33-36`; `# 1,2,8.py:42-55`)
    rng = np.random.default_rng(seed)
    if spec.class_filter is not None:
        sel = np.isin(ds.labels, np.asarray(spec.class_filter))
        idx = np.nonzero(sel)[0]
        if spec.class_fraction is not None:
            k = int(len(idx) * spec.class_fraction)
            idx = rng.choice(idx, size=k, replace=False)
        ds = ArrayDataset(ds.images[idx], ds.labels[idx])
    if spec.count is not None and spec.count < len(ds):
        idx = count_subset_indices(len(ds), spec.count, seed)
        ds = ArrayDataset(ds.images[idx], ds.labels[idx])
    return ds


def count_subset_indices(n: int, count: int, seed: int) -> np.ndarray:
    """Sample-for-sample replica of the reference's ``count``-limited subset:
    ``random.seed(999); random.sample(range(len(cifar10)), 20000)``
    (`#z_score.py:89-91` after the seed at `:23`) — the sample is the first
    consumption of the seeded python RNG stream, so ``random.Random(seed)``
    reproduces the exact indices *in the reference's order* (the order is the
    Subset's composition order and feeds the mixer offsets)."""
    return np.asarray(_pyrandom.Random(seed).sample(range(n), count), np.int64)
