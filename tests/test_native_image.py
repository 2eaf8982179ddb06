"""Native C++ image preprocessing vs numpy bilinear oracle + PIL path."""

import numpy as np
import pytest
from PIL import Image

from setok_tpu.data.image_processing import (GeneratorImageProcessor,
                                             ImageProcessor)
from setok_tpu.data.native import get_lib, resize_normalize


def numpy_bilinear(img, dh, dw):
    """Half-pixel-centered bilinear, matching the C++ kernel."""
    sh, sw, _ = img.shape
    ys = (np.arange(dh) + 0.5) * sh / dh - 0.5
    xs = (np.arange(dw) + 0.5) * sw / dw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, sh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, sw - 1)
    wy = np.clip(ys - np.floor(ys), 0, 1)
    wx = np.clip(xs - np.floor(xs), 0, 1)
    # replicate the kernel's clamping: y0 floor may be -1 → clamp, weight
    wy = ys - np.floor(ys)
    y1 = np.clip(np.floor(ys).astype(int) + 1, 0, sh - 1)
    x1 = np.clip(np.floor(xs).astype(int) + 1, 0, sw - 1)
    a = img[y0][:, x0].astype(np.float64)
    b = img[y0][:, x1].astype(np.float64)
    c = img[y1][:, x0].astype(np.float64)
    d = img[y1][:, x1].astype(np.float64)
    top = a + (b - a) * wx[None, :, None]
    bot = c + (d - c) * wx[None, :, None]
    return top + (bot - top) * wy[:, None, None]


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="no C++ toolchain")


@needs_native
def test_native_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    img = (rs.rand(37, 53, 3) * 255).astype(np.uint8)
    out = resize_normalize(img, 32)
    want = numpy_bilinear(img, 32, 32) / 255.0
    np.testing.assert_allclose(out, want, atol=2e-3)


@needs_native
def test_native_normalization_modes():
    img = np.full((16, 16, 3), 255, np.uint8)
    # processor mode: (1.0 - 0.5)/0.5 = 1.0
    out = resize_normalize(img, 8, mean=(0.5, 0.5, 0.5),
                           std=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)
    # generator mode: 1.0*2 - 1 = 1.0
    out = resize_normalize(img, 8, scale=2.0, offset=-1.0)
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


@needs_native
def test_processors_native_path_close_to_pil():
    rs = np.random.RandomState(1)
    pil = Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8))
    a = ImageProcessor(size=32, use_native=True)(pil)
    b = ImageProcessor(size=32, use_native=False)(pil)
    assert a.shape == b.shape == (32, 32, 3)
    # bilinear vs bicubic differ but must agree to ~0.1 in normalized units
    assert np.abs(a - b).mean() < 0.1
    g = GeneratorImageProcessor(size=32, use_native=True)(pil)
    assert g.min() >= -1.0001 and g.max() <= 1.0001


def test_assemble_batch_matches_per_image():
    """Threaded native batch assembly == per-image native calls, for
    variably-sized inputs (csrc assemble_batch)."""
    import numpy as np
    from setok_tpu.data.native import assemble_batch, resize_normalize

    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (h, w, 3), np.uint8)
            for h, w in [(37, 53), (224, 224), (101, 67), (16, 300)]]
    out = assemble_batch(imgs, 32, scale=2.0, offset=-1.0, num_threads=3)
    if out is None:                      # no compiler in env
        import pytest
        pytest.skip("native library unavailable")
    ref = np.stack([resize_normalize(im, 32, scale=2.0, offset=-1.0)
                    for im in imgs])
    assert np.array_equal(out, ref)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.float32


def test_processor_batch_native_path():
    import numpy as np
    from PIL import Image
    from setok_tpu.data.image_processing import ImageProcessor

    rs = np.random.RandomState(1)
    pils = [Image.fromarray(rs.randint(0, 255, (40, 60, 3), np.uint8))
            for _ in range(3)]
    p_nat = ImageProcessor(size=32, use_native=True)
    p_ref = ImageProcessor(size=32, use_native=True)
    batch = p_nat.preprocess_batch(pils)
    singles = np.stack([p_ref(im) for im in pils])
    assert batch.shape == singles.shape
    assert np.allclose(batch, singles)
