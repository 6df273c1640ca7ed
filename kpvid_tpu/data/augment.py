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


# --------------------------------------------------------------------------
# FrameOps: the per-frame geometry chain with two byte-identical backends.
#
# 'pil' is the reference-parity implementation above (PIL end to end, like
# reference utils/data.py / data/*_dataloader.py). 'native' routes the
# rotate / bicubic-resize / to-float hot ops (docs/PERF.md "Host input
# pipeline") through the C++ kernels in kpvid_tpu/native, carrying frames
# as uint8 numpy arrays; the PIL filter/enhance branches round-trip through
# PIL at the cropped 128^2 size where the conversion is ~free. The two
# backends produce BYTE-IDENTICAL samples (kernel-level and dataset-level
# equality asserted in tests/test_native.py; kpvid_tpu.native also
# self-checks against the running PIL at import). Selection:
# DataConfig.native_ops 'auto' (native when it builds+verifies) | 'on' |
# 'off'.
# --------------------------------------------------------------------------


def resolve_frame_ops(mode: str = "auto") -> "FrameOps":
    """Map a DataConfig.native_ops value to a FrameOps instance."""
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"native_ops must be auto|on|off, got {mode!r}")
    if mode == "off":
        return FrameOps(use_native=False)
    from kpvid_tpu import native

    ok = native.available()
    if mode == "on" and not ok:
        raise RuntimeError(
            "data.native_ops='on' but the native kernels are unavailable "
            "(no host compiler, build failure, or PIL mismatch)"
        )
    return FrameOps(use_native=ok)


class FrameOps:
    """Backend-dispatched frame ops. Frames are PIL Images ('pil') or uint8
    HWC arrays ('native'); callers treat them as opaque between prepare()
    and the to_*() exits."""

    def __init__(self, use_native: bool):
        self.native = bool(use_native)
        if self.native:
            from kpvid_tpu import native as _native

            self._n = _native

    def prepare(self, im: Image.Image):
        return np.asarray(im, np.uint8) if self.native else im

    def size(self, frame) -> tuple[int, int]:
        if self.native:
            return frame.shape[1], frame.shape[0]
        return frame.size

    def rotate(self, frame, angle: float):
        if self.native:
            return self._n.rotate_nearest(frame, angle)
        return frame.rotate(angle)

    def resize(self, frame, size_wh: tuple[int, int]):
        if self.native:
            return self._n.resize_bicubic(frame, size_wh)
        return frame.resize(size_wh)

    def resize_short_side(self, frame, target: int):
        """resize_short_side() over either backend (same int() dims)."""
        w, h = self.size(frame)
        ratio = (h if w > h else w) / float(target)
        return self.resize(frame, (int(w / ratio), int(h / ratio))), ratio

    def crop(self, frame, box):
        if not self.native:
            return frame.crop(box)
        # PIL Image.crop semantics: round() the box (banker's, like
        # CPython), clamp degenerate boxes, zero-fill out-of-bounds
        x0, y0, x1, y1 = (int(round(v)) for v in box)
        x1, y1 = max(x1, x0), max(y1, y0)
        h, w = frame.shape[:2]
        sy0, sy1 = max(y0, 0), min(y1, h)
        sx0, sx1 = max(x0, 0), min(x1, w)
        if sy0 == y0 and sy1 == y1 and sx0 == x0 and sx1 == x1:
            return frame[y0:y1, x0:x1]
        out = np.zeros((y1 - y0, x1 - x0, frame.shape[2]), frame.dtype)
        if sy1 > sy0 and sx1 > sx0:
            out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = frame[
                sy0:sy1, sx0:sx1
            ]
        return out

    def hflip(self, frame):
        if self.native:
            return np.ascontiguousarray(frame[:, ::-1])
        return frame.transpose(Image.FLIP_LEFT_RIGHT)

    def random_filter(self, frames: list, rng: np.random.Generator) -> list:
        if not self.native:
            return apply_random_filter(frames, rng)
        ims = [Image.fromarray(np.ascontiguousarray(f)) for f in frames]
        return [
            np.asarray(im, np.uint8) for im in apply_random_filter(ims, rng)
        ]

    def to_pm1(self, frame) -> np.ndarray:
        """float32 in [-1,1]: to_unit_float(frame) * 2 - 1."""
        if self.native:
            return self._n.to_f32(frame, pm1=True)
        return to_unit_float(frame) * 2.0 - 1.0

    def to_unit(self, frame) -> np.ndarray:
        """float32 in [0,1]: to_unit_float(frame)."""
        if self.native:
            return self._n.to_f32(frame, pm1=False)
        return to_unit_float(frame)

    def to_u8(self, frame) -> np.ndarray:
        return frame if self.native else np.asarray(frame, np.uint8)
