"""Host-side image transforms (PIL + NumPy), channels-last output.

Reproduces the reference preprocessing exactly (verified semantics from
`src/open_clip/transform.py`):
  - det transform = ResizeLongest(det_size) with bottom-right padding
    (`transform.py:169-191`) + OpenAI normalize
  - crop transform = ResizeMaxSize(crop_size) with CENTER padding
    (`transform.py:26-49`) + OpenAI normalize
  - `get_scale` = min(new/old) ratio (`transform.py:194-207`)
All resizes are PIL bicubic, matching torchvision's PIL backend.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from clipself_tpu.core.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

_MEAN = np.asarray(OPENAI_DATASET_MEAN, np.float32)
_STD = np.asarray(OPENAI_DATASET_STD, np.float32)


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """RGB PIL -> float32 [H, W, 3], OpenAI-normalized."""
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - _MEAN) / _STD


def resize_longest(img: Image.Image, max_size: int, fill: int = 0) -> Image.Image:
    """Scale so the longest side == max_size; pad bottom-right to square."""
    w, h = img.size
    scale = max_size / float(max(h, w))
    nh, nw = round(h * scale), round(w * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    if (nw, nh) == (max_size, max_size):
        return img
    canvas = Image.new(img.mode, (max_size, max_size), fill)
    canvas.paste(img, (0, 0))
    return canvas


def resize_max_center(img: Image.Image, max_size: int, fill: int = 0) -> Image.Image:
    """Scale so the longest side == max_size; pad symmetrically (center)."""
    w, h = img.size
    scale = max_size / float(max(h, w))
    nh, nw = round(h * scale), round(w * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    if (nw, nh) == (max_size, max_size):
        return img
    pad_w, pad_h = max_size - nw, max_size - nh
    canvas = Image.new(img.mode, (max_size, max_size), fill)
    canvas.paste(img, (pad_w // 2, pad_h // 2))
    return canvas


def det_transform(img: Image.Image, det_size: int) -> np.ndarray:
    return to_normalized_array(resize_longest(img.convert("RGB"), det_size))


def crop_transform(img: Image.Image, crop_size: int) -> np.ndarray:
    return to_normalized_array(resize_max_center(img.convert("RGB"), crop_size))


def get_scale(old_wh: tuple[int, int], new_size: int) -> float:
    """Scale factor from original (w, h) to the padded new_size square
    (reference get_scale: min over axes of new/old == new_size / max(w, h))."""
    w, h = old_wh
    return new_size / float(max(w, h))


def resize_mask_longest(mask: np.ndarray, max_size: int) -> np.ndarray:
    """Downsample a binary [H, W] mask with the ResizeLongest geometry
    (bilinear > 0 thresholding, reference data.py:308-309,374-375)."""
    h, w = mask.shape
    scale = max_size / float(max(h, w))
    nh, nw = round(h * scale), round(w * scale)
    img = Image.fromarray(mask.astype(np.float32))
    resized = np.asarray(img.resize((nw, nh), Image.BILINEAR))
    out = np.zeros((max_size, max_size), np.float32)
    out[:nh, :nw] = (resized > 0.0).astype(np.float32)
    return out


class RandomResize:
    """Random rescale by a factor in [lo, hi] (reference
    `CustomRandomResize`, `custom_transforms.py:8-24`)."""

    def __init__(self, scale=(0.5, 2.0)):
        self.lo, self.hi = scale

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        s = rng.uniform(self.lo, self.hi)
        w, h = img.size
        return img.resize((max(1, round(w * s)), max(1, round(h * s))), Image.BICUBIC)


class RandomCrop:
    """Random crop bounded to the image (reference `CustomRandomCrop`,
    `custom_transforms.py:27-44`): crop size = min(size, image dims)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        w, h = img.size
        cw, ch = min(self.size, w), min(self.size, h)
        x0 = int(rng.integers(0, w - cw + 1))
        y0 = int(rng.integers(0, h - ch + 1))
        return img.crop((x0, y0, x0 + cw, y0 + ch))


class RandomHFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        if rng.uniform() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img
