"""Native C++ host-staging runtime vs PIL/numpy references."""
import numpy as np
import pytest

from strainer_gan_tpu import native


@pytest.fixture(scope="module")
def L():
    lib = native.lib()
    if lib is None:
        pytest.skip("no g++ / native build failed")
    return lib


def test_resize_matches_pil(L, rng):
    from PIL import Image

    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    got = native.resize_bilinear_u8(imgs, 64)
    want = np.stack([
        np.asarray(Image.fromarray(im).resize((64, 64), Image.BILINEAR))
        for im in imgs
    ])
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # PIL's fixed-point vs our float rounding only
    assert diff.mean() < 0.5


def test_resize_downscale_matches_pil(L, rng):
    from PIL import Image

    imgs = rng.integers(0, 256, (3, 96, 96, 3), dtype=np.uint8)
    got = native.resize_bilinear_u8(imgs, 64)
    want = np.stack([
        np.asarray(Image.fromarray(im).resize((64, 64), Image.BILINEAR))
        for im in imgs
    ])
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert diff.mean() < 0.5


def test_center_crop(L, rng):
    imgs = rng.integers(0, 256, (2, 80, 70, 3), dtype=np.uint8)
    got = native.center_crop_u8(imgs, 64)
    np.testing.assert_array_equal(got, imgs[:, 8:72, 3:67])


def test_gather(L, rng):
    src = rng.integers(0, 256, (50, 8, 8, 3), dtype=np.uint8)
    idx = rng.permutation(50)[:30]
    got = native.gather_u8(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_grayscale_resize(L, rng):
    from PIL import Image

    imgs = rng.integers(0, 256, (2, 28, 28, 1), dtype=np.uint8)
    got = native.resize_bilinear_u8(imgs, 64)
    want = np.stack([
        np.asarray(
            Image.fromarray(im[:, :, 0], mode="L").resize((64, 64), Image.BILINEAR)
        )[..., None]
        for im in imgs
    ])
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
