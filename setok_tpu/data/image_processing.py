"""Host-side image preprocessing (numpy/PIL) feeding the jitted steps.

Parity: the reference leans on HF `CLIPImageProcessor` plus the
`expand2square` pad helper (pairDataset.py:404-415 / base_dataset.py:497-509)
and the generator-side [-1, 1] scaling (editDataset.py:22-31
`load_img_for_generator`). Native equivalents here, NHWC throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:                  # pragma: no cover
    Image = None

# SigLIP normalization (mean/std 0.5), the reference's default tower
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def expand2square(img: "Image.Image",
                  background_color: Tuple[int, ...]) -> "Image.Image":
    """Pad to square with the processor mean color (pairDataset.py:404-415)."""
    width, height = img.size
    if width == height:
        return img
    side = max(width, height)
    result = Image.new(img.mode, (side, side), background_color)
    if width > height:
        result.paste(img, (0, (side - height) // 2))
    else:
        result.paste(img, ((side - width) // 2, 0))
    return result


@dataclasses.dataclass
class ImageProcessor:
    """Resize + normalize → float32 (H, W, 3) NHWC.

    `use_native=True` routes through the C++ fused resize+normalize
    (csrc/fast_image.cpp, bilinear); otherwise PIL bicubic.
    """

    size: int = 256
    mean: Sequence[float] = SIGLIP_MEAN
    std: Sequence[float] = SIGLIP_STD
    pad_to_square: bool = False
    use_native: bool = False

    @property
    def image_mean(self):
        return tuple(self.mean)

    def preprocess(self, img) -> np.ndarray:
        if self.pad_to_square:
            img = expand2square(
                img, tuple(int(x * 255) for x in self.mean))
        if self.use_native:
            from setok_tpu.data.native import resize_normalize
            arr = np.asarray(img.convert("RGB"), np.uint8)
            out = resize_normalize(arr, self.size, self.mean, self.std)
            if out is not None:
                return out
        img = img.convert("RGB").resize((self.size, self.size),
                                        Image.BICUBIC)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return ((arr - np.asarray(self.mean, np.float32))
                / np.asarray(self.std, np.float32))

    def __call__(self, img) -> np.ndarray:
        return self.preprocess(img)

    def preprocess_batch(self, imgs) -> np.ndarray:
        """Assemble N PIL/array images into one (N, size, size, 3) float
        batch. With `use_native`, a single GIL-free C++ call fans the
        per-image work over a thread team (csrc `assemble_batch` — the
        single-process equivalent of the reference's DataLoader worker
        processes); otherwise a per-image loop."""
        if self.use_native and not self.pad_to_square:
            from setok_tpu.data.native import assemble_batch
            arrs = [np.asarray(im.convert("RGB"), np.uint8)
                    if not isinstance(im, np.ndarray) else im
                    for im in imgs]
            out = assemble_batch(arrs, self.size, self.mean, self.std)
            if out is not None:
                return out
        return np.stack([self.preprocess(im) for im in imgs])


@dataclasses.dataclass
class GeneratorImageProcessor:
    """[-1, 1] scaling for generation targets (editDataset.py:22-31)."""

    size: int = 256
    use_native: bool = False

    def __call__(self, img) -> np.ndarray:
        if self.use_native:
            from setok_tpu.data.native import resize_normalize
            arr = np.asarray(img.convert("RGB"), np.uint8)
            out = resize_normalize(arr, self.size, scale=2.0, offset=-1.0)
            if out is not None:
                return out
        img = img.convert("RGB").resize((self.size, self.size),
                                        Image.BICUBIC)
        return np.asarray(img, dtype=np.float32) / 127.5 - 1.0
