"""Native (C++) fastimage kernels: byte-identity against PIL.

The contract of kpvid_tpu/native is BYTE-IDENTICAL output to the PIL
reference path (reference data/image_pair_dataloader.py:99-133,
utils/data.py:39-70 are PIL-based, so PIL == parity). These tests assert
equality at three levels: raw kernels vs PIL primitives, FrameOps ops vs
PIL semantics (crop rounding / padding), and whole dataset samples with
native on vs off.
"""

import numpy as np
import pytest
from PIL import Image

from kpvid_tpu import native
from kpvid_tpu.data import ImagePairDataset, SequenceDataset, VideoFramesDataset
from kpvid_tpu.data.augment import FrameOps, resolve_frame_ops
from kpvid_tpu.data.synthetic import (
    make_synthetic_penn_tree,
    make_synthetic_pseudo_labels,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels unavailable on this host"
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("penn_native")
    make_synthetic_penn_tree(root, n_train=3, n_test=2, frames_per_video=40)
    make_synthetic_pseudo_labels(root, n_pts=6)
    return str(root)


class TestKernels:
    def test_resize_bicubic_matches_pil(self):
        rng = np.random.default_rng(0)
        for _ in range(25):
            h, w = int(rng.integers(16, 640)), int(rng.integers(16, 900))
            src = rng.integers(0, 256, (h, w, 3), np.uint8)
            target = int(rng.integers(32, 257))
            ratio = (h if w > h else w) / float(target)
            dw, dh = max(1, int(w / ratio)), max(1, int(h / ratio))
            want = np.asarray(Image.fromarray(src).resize((dw, dh)))
            got = native.resize_bicubic(src, (dw, dh))
            np.testing.assert_array_equal(want, got)

    def test_resize_upscale_matches_pil(self):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 256, (40, 55, 3), np.uint8)
        want = np.asarray(Image.fromarray(src).resize((160, 130)))
        np.testing.assert_array_equal(want, native.resize_bicubic(src, (160, 130)))

    def test_rotate_matches_pil(self):
        rng = np.random.default_rng(2)
        for trial in range(25):
            h, w = int(rng.integers(16, 500)), int(rng.integers(16, 700))
            src = rng.integers(0, 256, (h, w, 3), np.uint8)
            # the pipelines use integer degrees; also cover arbitrary floats
            ang = (
                int(rng.integers(-15, 16))
                if trial % 2
                else float(rng.uniform(-360, 360))
            )
            want = np.asarray(Image.fromarray(src).rotate(ang))
            np.testing.assert_array_equal(want, native.rotate_nearest(src, ang))

    def test_rotate_zero_is_identity(self):
        src = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
        np.testing.assert_array_equal(src, native.rotate_nearest(src, 0))
        np.testing.assert_array_equal(src, native.rotate_nearest(src, 360))

    def test_to_f32_matches_numpy(self):
        rng = np.random.default_rng(3)
        src = rng.integers(0, 256, (33, 47, 3), np.uint8)
        unit = np.asarray(src, np.float32) / 255.0
        np.testing.assert_array_equal(unit, native.to_f32(src, pm1=False))
        np.testing.assert_array_equal(unit * 2.0 - 1.0, native.to_f32(src))
        np.testing.assert_array_equal(
            (np.asarray(src[:, ::-1], np.float32) / 255.0) * 2.0 - 1.0,
            native.to_f32(src, flip=True),
        )


class TestFrameOps:
    def test_crop_matches_pil_semantics(self):
        """Float boxes (banker's rounding) and out-of-bounds zero padding."""
        rng = np.random.default_rng(4)
        src = rng.integers(0, 256, (60, 80, 3), np.uint8)
        im = Image.fromarray(src)
        ops = FrameOps(use_native=True)
        boxes = [
            (10, 5, 50, 45),
            (10.5, 4.5, 50.5, 44.5),   # .5 edges: round-half-even
            (11.5, 3.5, 51.5, 43.5),
            (-8, -4, 30, 20),           # out of bounds: zero fill
            (60, 40, 100, 90),
            (79.6, 59.6, 120.2, 80.2),
        ]
        for box in boxes:
            want = np.asarray(im.crop(box))
            got = ops.crop(src, box)
            np.testing.assert_array_equal(want, got, err_msg=f"box={box}")

    def test_resize_short_side_dims_match(self):
        rng = np.random.default_rng(5)
        src = rng.integers(0, 256, (150, 200, 3), np.uint8)
        pil_ops = FrameOps(use_native=False)
        nat_ops = FrameOps(use_native=True)
        a, ra = pil_ops.resize_short_side(Image.fromarray(src), 128)
        b, rb = nat_ops.resize_short_side(src, 128)
        assert ra == rb
        np.testing.assert_array_equal(np.asarray(a), b)

    def test_random_filter_matches_pil(self):
        """All 10 filter/enhance branches through the native round-trip."""
        rng_img = np.random.default_rng(6)
        src = rng_img.integers(0, 256, (128, 128, 3), np.uint8)
        pil_ops = FrameOps(use_native=False)
        nat_ops = FrameOps(use_native=True)
        for seed in range(20):  # 20 seeds cover every branch of r in [0,10)
            a = pil_ops.random_filter(
                [Image.fromarray(src)], np.random.default_rng(seed)
            )[0]
            b = nat_ops.random_filter([src], np.random.default_rng(seed))[0]
            np.testing.assert_array_equal(np.asarray(a, np.uint8), b)

    def test_on_mode_raises_when_unavailable(self, monkeypatch):
        monkeypatch.setattr(native, "available", lambda: False)
        with pytest.raises(RuntimeError, match="native_ops"):
            resolve_frame_ops("on")
        assert resolve_frame_ops("auto").native is False
        assert resolve_frame_ops("off").native is False


class TestDatasetsByteIdentical:
    """Whole samples with native on vs off — the shipped contract."""

    def test_image_pair_train_and_test(self, tree):
        for subset in ("train", "test"):
            a_ds = ImagePairDataset(tree, subset, native_ops="off")
            b_ds = ImagePairDataset(tree, subset, native_ops="on")
            for idx in range(min(len(a_ds), 3)):
                for seed in range(4):
                    a = a_ds.sample(idx, np.random.default_rng(seed))
                    b = b_ds.sample(idx, np.random.default_rng(seed))
                    np.testing.assert_array_equal(a["image"], b["image"])
                    np.testing.assert_array_equal(
                        a["future_image"], b["future_image"]
                    )

    def test_sequence_train_and_eval(self, tree):
        kw = dict(n_pts=6, n_action=9, image_size=128)
        for subset, wis in (("train", False), ("test", True)):
            a_ds = SequenceDataset(tree, subset, native_ops="off",
                                   with_image_seq=wis, **kw)
            b_ds = SequenceDataset(tree, subset, native_ops="on",
                                   with_image_seq=wis, **kw)
            for seed in range(4):
                a = a_ds.sample(0, np.random.default_rng(seed))
                b = b_ds.sample(0, np.random.default_rng(seed))
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_labeler_video_frames(self, tree):
        for as_u8 in (False, True):
            a = VideoFramesDataset(tree, "train", as_uint8=as_u8,
                                   native_ops="off").load_video(0)
            b = VideoFramesDataset(tree, "train", as_uint8=as_u8,
                                   native_ops="on").load_video(0)
            np.testing.assert_array_equal(a, b)
