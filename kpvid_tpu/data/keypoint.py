"""Pseudo-labeling dataset: whole videos, streamed as fixed-size chunks.

Counterpart of reference data/keypoint_dataloader.py, REDESIGNED for TPU:
the reference zero-pads every video to 663 frames and feeds batch-1 tensors
of [663,128,128,3] (~130 MB/sample; reference :77-80). Fixed-shape XLA
programs want constant chunk shapes instead: `iter_videos` yields
(video_id, n_frames, frames[len,H,W,3]) and `chunk_frames` re-blocks any
length into [chunk, H, W, 3] slabs (last one zero-padded), so the pose
encoder compiles exactly once and videos of any length stream through.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from . import augment
from .image_pair import load_frame, read_split, video_frame_count


class VideoFramesDataset:
    def __init__(self, data_dir: str, subset: str, image_size: int = 128):
        self.data_dir = data_dir
        self.image_size = image_size
        self.videos = read_split(data_dir, subset)

    def __len__(self) -> int:
        return len(self.videos)

    def video_id(self, idx: int) -> int:
        rel, _ = self.videos[idx]
        return int(rel.split("/")[-1])

    def load_video(self, idx: int) -> np.ndarray:
        """All frames, center-cropped to image_size, in [-1, 1]."""
        rel, _ = self.videos[idx]
        n = video_frame_count(self.data_dir, rel)
        first = load_frame(self.data_dir, rel, 0).convert("RGB")
        box, ratio = augment.center_crop_box(first.size, self.image_size)
        w, h = first.size
        frames = np.empty((n, self.image_size, self.image_size, 3), np.float32)
        for i in range(n):
            im = load_frame(self.data_dir, rel, i).convert("RGB")
            im = im.resize((int(w / ratio), int(h / ratio))).crop(box)
            frames[i] = augment.to_unit_float(im)
        return frames * 2.0 - 1.0

    def iter_videos(self) -> Iterator[tuple[int, int, np.ndarray]]:
        for idx in range(len(self.videos)):
            frames = self.load_video(idx)
            yield self.video_id(idx), frames.shape[0], frames


def chunk_frames(frames: np.ndarray, chunk: int) -> Iterator[np.ndarray]:
    """Re-block [N, ...] into fixed [chunk, ...] slabs, zero-padding the
    tail so every slab has identical shape (one XLA compilation)."""
    n = frames.shape[0]
    for start in range(0, n, chunk):
        slab = frames[start : start + chunk]
        if slab.shape[0] < chunk:
            pad = np.zeros((chunk - slab.shape[0],) + frames.shape[1:], frames.dtype)
            slab = np.concatenate([slab, pad], axis=0)
        yield slab
