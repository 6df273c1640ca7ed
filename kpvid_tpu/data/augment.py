"""Host-side augmentation utilities (PIL/numpy).

Counterpart of reference utils/data.py. The crop-box math replicates the
reference exactly, INCLUDING quirk Q8: the reference's portrait-orientation
branches top-align the vertical crop in the image-pair loader
(reference data/image_pair_dataloader.py:121-128,150-157 use
`(ox - half, 0, ox + half, target)` for BOTH orientations), while the
sequence/keypoint loaders use utils/data.py:39-59's proper center box.
Both behaviors are provided so data distributions match the reference.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def resize_short_side(image: Image.Image, target: int) -> tuple[Image.Image, float]:
    """Resize so the SHORT side is `target` px, keeping aspect; returns
    (resized, ratio) with the reference's int() dims
    (reference data/image_pair_dataloader.py:99-133)."""
    w, h = image.size
    ratio = (h if w > h else w) / float(target)
    return image.resize((int(w / ratio), int(h / ratio))), ratio


def center_crop_box(size_wh: tuple[int, int], target: int) -> tuple[tuple, float]:
    """The reference center-crop box (utils/data.py:39-59): short side
    scaled to target, long side center-cropped."""
    w, h = size_wh
    half = target // 2
    if w > h:
        ratio = h / float(target)
        ox = int(w / ratio) / 2.0
        box = (ox - half, 0, ox + half, target)
    else:
        ratio = w / float(target)
        oy = int(h / ratio) / 2.0
        box = (0, oy - half, target, oy + half)
    return box, ratio


def pair_test_crop_box(size_wh: tuple[int, int], target: int) -> tuple[tuple, float]:
    """Quirk-Q8 box used by the image-pair loader's test path: x is
    centered, y is ALWAYS 0..target (top-aligned for portrait inputs;
    reference data/image_pair_dataloader.py:121-128,150-157)."""
    w, h = size_wh
    half = target // 2
    ratio = (h if w > h else w) / float(target)
    ox = int(w / ratio) / 2.0
    return (ox - half, 0, ox + half, target), ratio


def apply_random_filter(
    images: list[Image.Image], rng: np.random.Generator
) -> list[Image.Image]:
    """One of 10 PIL filter/enhance branches, same set and parameter ranges
    as reference utils/data.py:8-36."""
    r = int(rng.integers(0, 10))
    if r < 6:
        filt = [
            ImageFilter.DETAIL,
            ImageFilter.EDGE_ENHANCE,
            ImageFilter.SMOOTH,
            ImageFilter.SMOOTH_MORE,
            ImageFilter.EDGE_ENHANCE_MORE,
            ImageFilter.BLUR,
        ][r]
        return [im.filter(filt) for im in images]
    if r == 6:
        v = int(rng.integers(0, 51)) * 0.1
        return [ImageEnhance.Sharpness(im).enhance(v) for im in images]
    if r == 7:
        v = int(rng.integers(7, 21)) * 0.1
        return [ImageEnhance.Brightness(im).enhance(v) for im in images]
    if r == 8:
        v = int(rng.integers(0, 51)) * 0.1
        return [ImageEnhance.Color(im).enhance(v) for im in images]
    v = int(rng.integers(7, 31)) * 0.1
    return [ImageEnhance.Contrast(im).enhance(v) for im in images]


def rotate_keypoints(keypoints: np.ndarray, degrees: float) -> np.ndarray:
    """Rotate normalized keypoints about the origin (= image center in
    [-1,1] coords), matching PIL's counterclockwise image rotation
    (reference utils/data.py:62-70: rotation by -degrees in math coords,
    which matches PIL's y-down raster frame)."""
    rad = np.radians(-degrees)
    c, s = np.cos(rad), np.sin(rad)
    x, y = keypoints[..., 0], keypoints[..., 1]
    qx = c * x - s * y
    qy = s * x + c * y
    return np.stack([qx, qy], axis=-1)


def one_hot(n_classes: int, idx: int) -> np.ndarray:
    label = np.zeros((n_classes,), np.float32)
    label[int(idx)] = 1.0
    return label


def to_unit_float(image: Image.Image) -> np.ndarray:
    return np.asarray(image, np.float32) / 255.0
