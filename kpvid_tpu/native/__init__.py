"""Native (C++) host-side image kernels for the data pipeline.

The reference's input pipeline is PIL-based Python (reference
data/image_pair_dataloader.py:85-133, utils/data.py:8-70); on few-core
hosts its per-frame cost (bicubic short-side resize + rotate; measured in
docs/PERF.md "Host input pipeline") is what bounds stage-1 training and
pseudo-labeling throughput. This package provides bit-exact C++
replacements, compiled on first use with the host toolchain and bound via
ctypes (which releases the GIL for the call, so pipeline worker threads
scale with cores just like PIL's C loops).

Numerical contract: BYTE-IDENTICAL to PIL. Every kernel is asserted
against PIL in tests/test_native.py, and `available()` runs a small
runtime self-check against PIL the first time it is consulted — if the
host compiler is missing, the build fails, or the self-check mismatches
(e.g. an exotic Pillow build), the pipeline silently keeps its PIL path.
Use is governed by `DataConfig.native_ops` ('auto' | 'on' | 'off').
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import math
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger("kpvid_tpu")

_SRC = Path(__file__).parent / "fastimage.cpp"
_lib: ctypes.CDLL | None = None
_state: str | None = None  # None = unprobed; 'ok' | 'unavailable'


def _cache_dir() -> Path:
    root = os.environ.get("KPVID_NATIVE_CACHE")
    if root:
        return Path(root)
    return Path.home() / ".cache" / "kpvid_tpu_native"


def _build() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"fastimage-{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    # write to a temp name then rename: concurrent workers/processes race
    with tempfile.NamedTemporaryFile(
        dir=out.parent, suffix=".so", delete=False
    ) as tf:
        tmp = Path(tf.name)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native fastimage build failed (%s); using PIL", e)
        tmp.unlink(missing_ok=True)
        return None
    os.replace(tmp, out)
    return out


def _bind(path: Path) -> ctypes.CDLL:
    lib = ctypes.CDLL(str(path))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    ci = ctypes.c_int
    lib.ki_resize_bicubic_u8.argtypes = [u8p, ci, ci, u8p, ci, ci, ci]
    lib.ki_resize_bicubic_u8.restype = ci
    lib.ki_affine_nearest_u8.argtypes = [u8p, ci, ci, u8p, dp, ci]
    lib.ki_affine_nearest_u8.restype = ci
    lib.ki_u8_to_f32.argtypes = [u8p, f32p, ci, ci, ci, ci, ci]
    lib.ki_u8_to_f32.restype = ci
    return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rotate_matrix(w: int, h: int, angle_degrees: float) -> np.ndarray:
    """The exact output->input affine matrix PIL Image.rotate builds
    (including its round(.., 15) of the trig terms), so the C kernel and
    PIL truncate identical double coordinates."""
    angle = -math.radians(angle_degrees % 360.0)
    a = round(math.cos(angle), 15)
    b = round(math.sin(angle), 15)
    cx, cy = w / 2.0, h / 2.0
    # transform(-center) then shift back (PIL Image.rotate)
    c = a * -cx + b * -cy + cx
    f = -b * -cx + a * -cy + cy
    return np.array([a, b, c, -b, a, f], np.float64)


def resize_bicubic(src: np.ndarray, size_wh: tuple[int, int]) -> np.ndarray:
    """PIL im.resize((dw, dh)) (default BICUBIC) on a u8 HWC array."""
    dw, dh = int(size_wh[0]), int(size_wh[1])
    src = np.ascontiguousarray(src)
    sh, sw, ch = src.shape
    dst = np.empty((dh, dw, ch), np.uint8)
    rc = _lib.ki_resize_bicubic_u8(_u8ptr(src), sw, sh, _u8ptr(dst), dw, dh, ch)
    if rc != 0:
        raise ValueError(f"ki_resize_bicubic_u8 failed ({rc})")
    return dst


def rotate_nearest(src: np.ndarray, angle_degrees: float) -> np.ndarray:
    """PIL im.rotate(angle) (NEAREST, expand=False, zero fill) on u8 HWC."""
    src = np.ascontiguousarray(src)
    h, w, ch = src.shape
    if angle_degrees % 360.0 == 0.0:
        return src.copy()
    m = rotate_matrix(w, h, angle_degrees)
    dst = np.empty_like(src)
    rc = _lib.ki_affine_nearest_u8(
        _u8ptr(src), w, h, _u8ptr(dst),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ch,
    )
    if rc != 0:
        raise ValueError(f"ki_affine_nearest_u8 failed ({rc})")
    return dst


def to_f32(src: np.ndarray, flip: bool = False, pm1: bool = True) -> np.ndarray:
    """np.asarray(im, f32)/255 (pm1=False) or the same *2-1 (pm1=True),
    with an optional fused horizontal flip — exact same f32 arithmetic as
    the numpy expressions."""
    src = np.ascontiguousarray(src)
    h, w, ch = src.shape
    dst = np.empty((h, w, ch), np.float32)
    rc = _lib.ki_u8_to_f32(
        _u8ptr(src), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h, ch, int(bool(flip)), int(bool(pm1)),
    )
    if rc != 0:
        raise ValueError(f"ki_u8_to_f32 failed ({rc})")
    return dst


def _self_check() -> bool:
    """One small randomized comparison against PIL per kernel. Belt and
    braces on top of tests/test_native.py: catches exotic Pillow builds or
    a miscompiled .so at runtime and falls back to PIL."""
    from PIL import Image

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (37, 53, 3), np.uint8)
    im = Image.fromarray(src)
    if not np.array_equal(
        np.asarray(im.resize((21, 29))), resize_bicubic(src, (21, 29))
    ):
        return False
    if not np.array_equal(np.asarray(im.rotate(7)), rotate_nearest(src, 7)):
        return False
    want = (np.asarray(src[:, ::-1], np.float32) / 255.0) * 2.0 - 1.0
    if not np.array_equal(want, to_f32(src, flip=True)):
        return False
    return np.array_equal(
        np.asarray(src, np.float32) / 255.0, to_f32(src, pm1=False)
    )


def available() -> bool:
    """Build (cached), bind, and self-check the native kernels; False means
    callers must use the PIL path. Never raises."""
    global _lib, _state
    if _state is not None:
        return _state == "ok"
    try:
        path = _build()
        if path is None:
            _state = "unavailable"
            return False
        _lib = _bind(path)
        if not _self_check():
            logger.warning(
                "native fastimage kernels disagree with this PIL build; "
                "falling back to PIL"
            )
            _lib = None
            _state = "unavailable"
            return False
        _state = "ok"
        return True
    except Exception as e:  # noqa: BLE001 - availability probe must not raise
        logger.info("native fastimage unavailable (%s); using PIL", e)
        _lib = None
        _state = "unavailable"
        return False
