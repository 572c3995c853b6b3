"""Disk-format loaders (MNIST idx, CIFAR-10 pickle batches, image folders)
exercised against fabricated files — the real-data path the reference uses
(`dset.MNIST`, `dset.CIFAR10`, `dset.ImageFolder`)."""
import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from strainer_gan_tpu.config import SourceSpec
from strainer_gan_tpu.data import datasets as D


@pytest.fixture()
def data_root(tmp_path, monkeypatch, rng):
    root = tmp_path / "data"
    root.mkdir()
    monkeypatch.setenv("STRAINER_DATA_ROOT", str(root))
    monkeypatch.setattr(D, "DATA_ROOTS", [str(root)])
    return root, rng


def write_mnist(root, rng, n=50):
    d = root / "MNIST" / "raw"
    d.mkdir(parents=True)
    imgs = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.uint8)
    with open(d / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(imgs.tobytes())
    with open(d / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    return imgs, labels


def write_cifar(root, rng, per_batch=10):
    d = root / "cifar-10-batches-py"
    d.mkdir()
    all_imgs, all_labels = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (per_batch, 3 * 32 * 32), dtype=np.uint8)
        labels = rng.integers(0, 10, per_batch).tolist()
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_imgs.append(data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        all_labels.extend(labels)
    return np.concatenate(all_imgs), np.asarray(all_labels)


def write_image_folder(root, rng, name="celeba", n=6, size=(80, 64)):
    from PIL import Image

    d = root / name / "images"
    d.mkdir(parents=True)
    for i in range(n):
        arr = rng.integers(0, 256, (size[0], size[1], 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i:03d}.png")
    # one corrupt file: must be skipped (`#strainer gan.py:100-104`)
    with open(d / "zzz_corrupt.jpg", "wb") as f:
        f.write(b"not an image")
    return n


def test_mnist_idx_loader(data_root):
    root, rng = data_root
    imgs, labels = write_mnist(root, rng)
    ds = D.load_source(SourceSpec("mnist", class_filter=(3,)), 28, 1, seed=0)
    want = (labels == 3).sum()
    assert len(ds) == want
    np.testing.assert_array_equal(ds.labels, np.full(want, 3))
    np.testing.assert_array_equal(ds.images[..., 0], imgs[labels == 3])


def test_cifar_pickle_loader(data_root):
    root, rng = data_root
    imgs, labels = write_cifar(root, rng)
    ds = D.load_source(SourceSpec("cifar10"), 64, 3, seed=0)
    assert len(ds) == 50
    assert ds.images.shape == (50, 64, 64, 3)  # Resize-only path
    np.testing.assert_array_equal(ds.labels, labels)


def test_cifar_class_filter(data_root):
    root, rng = data_root
    imgs, labels = write_cifar(root, rng)
    ds = D.load_source(SourceSpec("cifar10", class_filter=(5,)), 32, 3, seed=0)
    assert len(ds) == (labels == 5).sum()


def test_image_folder_loader_skips_corrupt(data_root):
    root, rng = data_root
    n = write_image_folder(root, rng)
    ds = D.load_source(SourceSpec("celeba"), 64, 3, seed=0)
    assert len(ds) == n  # the corrupt file was skipped
    # Resize(shorter=64) + CenterCrop(64) of 80x64 -> 64x64
    assert ds.images.shape == (n, 64, 64, 3)


def test_image_folder_threaded_matches_serial_order(data_root):
    """>64 files takes the thread-pool decode branch; composition and order
    must be identical to the serial path (pool.map preserves order, corrupt
    files skipped in place)."""
    root, rng = data_root
    n = write_image_folder(root, rng, n=70, size=(64, 64))
    ds = D.load_source(SourceSpec("celeba"), 64, 3, seed=0)
    assert len(ds) == n
    assert ds.images.shape == (n, 64, 64, 3)
    # spot-check order: file i must land at row i (sorted path order)
    from PIL import Image

    p = root / "celeba" / "images" / "007.png"
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(ds.images[7], want)
