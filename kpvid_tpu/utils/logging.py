"""Training observability: console lines, JSONL metrics, image dumps,
optional TensorBoard.

Counterpart of the reference's tf.logging lines + TensorBoard FileWriters
(reference models/base_model.py:62-75, detector_translator_model.py:92-157).
Primary sink here is JSONL ({log_dir}/{name}/{train,test}_metrics.jsonl) —
machine-readable and dependency-free; the console line format mirrors the
reference ('step N, loss_D = x, loss_G = y (E examples/sec) S sec/batch').
TensorBoard event files are written too when `tensorboard=True` (uses
torch.utils.tensorboard, already in the image). Image summaries are saved
as PNG grids under {log_dir}/{name}/{split}_images/.
"""

from __future__ import annotations

import json
import logging
import time
from datetime import datetime
from pathlib import Path

import numpy as np

logger = logging.getLogger("kpvid_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger


def _to_scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


class MetricLogger:
    def __init__(self, log_dir: str | Path, name: str, tensorboard: bool = False,
                 enabled: bool = True):
        """enabled=False turns every method into a no-op — used on
        non-primary processes in multi-host runs so only one host writes
        logs (kpvid_tpu.parallel.is_primary)."""
        self.enabled = enabled
        self.root = Path(log_dir) / name
        if enabled:
            self.root.mkdir(parents=True, exist_ok=True)
        self._files = {}
        self._tb = {}
        self._use_tb = tensorboard and enabled

    def _jsonl(self, split: str):
        if split not in self._files:
            self._files[split] = open(self.root / f"{split}_metrics.jsonl", "a")
        return self._files[split]

    def _tb_writer(self, split: str):
        if not self._use_tb:
            return None
        if split not in self._tb:
            from torch.utils.tensorboard import SummaryWriter  # lazy: heavy import

            self._tb[split] = SummaryWriter(str(self.root / split))
        return self._tb[split]

    def log_metrics(self, split: str, step: int, metrics: dict) -> None:
        if not self.enabled:
            return
        scalars = {k: _to_scalar(v) for k, v in metrics.items()}
        scalars = {k: v for k, v in scalars.items() if v is not None}
        rec = {"step": int(step), "time": time.time(), **scalars}
        f = self._jsonl(split)
        f.write(json.dumps(rec) + "\n")
        f.flush()
        tb = self._tb_writer(split)
        if tb is not None:
            for k, v in scalars.items():
                tb.add_scalar(k, v, int(step))

    def log_console(
        self, step: int, loss_d: float, loss_g: float, examples_per_sec: float,
        sec_per_batch: float, prefix: str = "",
    ) -> None:
        if not self.enabled:
            return
        logger.info(
            "%s%s: step %d, loss_D = %.4f, loss_G = %.4f (%.1f examples/sec) %.3f sec/batch",
            prefix, datetime.now(), step, loss_d, loss_g, examples_per_sec, sec_per_batch,
        )

    def log_images(self, split: str, step: int, images: dict[str, np.ndarray],
                   max_outputs: int = 2) -> None:
        """images: name -> [B,H,W,C] float arrays in [-1,1], [0,1] or
        [0,255]; saved as PNGs, and — when tensorboard is on — written as TB
        image summaries too, matching the reference's primary visual channel
        (reference detector_translator_model.py:205-244, max_outputs=2)."""
        if not self.enabled:
            return
        from PIL import Image

        out_dir = self.root / f"{split}_images"
        out_dir.mkdir(exist_ok=True)
        tb = self._tb_writer(split)
        for name, arr in images.items():
            arr = np.asarray(arr)[:max_outputs]
            for b in range(arr.shape[0]):
                img = arr[b]
                if img.min() < -0.01:  # [-1,1] -> [0,1]
                    img = (img + 1.0) / 2.0
                if img.max() <= 1.001:
                    img = img * 255.0
                img = np.clip(img, 0, 255).astype(np.uint8)
                if img.shape[-1] == 1:
                    img = img[..., 0]
                Image.fromarray(img).save(out_dir / f"{name}_{step:08d}_{b}.png")
                if tb is not None:
                    hwc = img if img.ndim == 3 else img[..., None]
                    tb.add_image(f"{name}/{b}", hwc, int(step), dataformats="HWC")

    def close(self) -> None:
        for f in self._files.values():
            f.close()
        for tb in self._tb.values():
            tb.close()


class Throughput:
    """examples/sec + sec/batch tracker (the reference logs both per
    log_interval; detector_translator_model.py:98-107)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._examples = 0
        self._batches = 0

    def update(self, batch_size: int):
        self._examples += batch_size
        self._batches += 1

    def rates(self) -> tuple[float, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._examples / dt, dt / max(self._batches, 1)
