#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (stage-1 production config).

Answers "can the host feed the device?" (device stage-1 rate: 24 steps/s
x batch 16 = 384 examples/s on one v5e chip; docs/PERF.md). Builds a
synthetic Penn-sized tree (480px frames, the real dataset's scale —
reference prepare_penn_dataset.sh downloads ~480p Penn Action), then
measures samples/s across worker counts with and without the decoded-frame
cache. Results table lives in docs/PERF.md "Host input pipeline".

Usage: python tools/bench_host_pipeline.py [--root DIR] [--batches N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from PIL import Image, ImageDraw  # noqa: E402


def build_tree(root: Path, n_videos: int = 16, frames: int = 60) -> None:
    from kpvid_tpu.data.synthetic import _draw_figure

    if (root / ".penn_sized").exists():
        return
    rng = np.random.default_rng(0)
    (root / "frames").mkdir(parents=True, exist_ok=True)
    lines = []
    for vid in range(1, n_videos + 1):
        action = int(rng.integers(0, 9))
        w, h = (480, 270) if vid % 2 else (270, 480)
        vdir = root / "frames" / f"{vid:04d}"
        vdir.mkdir(parents=True, exist_ok=True)
        for f in range(frames):
            im = Image.new("RGB", (w, h), (30, 40, 55))
            _draw_figure(ImageDraw.Draw(im), w, h, f / 8.0, action, vid)
            im.save(vdir / f"{f + 1:06d}.jpg", quality=85)
        lines.append(f"frames/{vid:04d} {action}")
    (root / "train_set.txt").write_text("\n".join(lines) + "\n")
    (root / ".penn_sized").write_text("ok")


def measure(ds, batch_size: int, num_workers, n_batches: int) -> float:
    from kpvid_tpu.data import HostDataPipeline

    pipe = HostDataPipeline(
        ds, batch_size, shuffle=True, repeat=True, num_workers=num_workers, seed=0
    )
    it = pipe.batches()
    next(it)  # warm up threads (and, with the cache, prime a first pass)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    return batch_size * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/kpvid_hostbench")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--native", default="auto", choices=["auto", "on", "off"],
                    help="C++ geometry backend (DataConfig.native_ops)")
    args = ap.parse_args()

    from kpvid_tpu.data import ImagePairDataset

    root = Path(args.root)
    build_tree(root)
    print(f"host: {os.cpu_count()} cpu core(s); batch {args.batch}; "
          f"native={args.native}; "
          f"device demand: 384 examples/s (24 steps/s x 16, v5e stage-1)")
    for cache_mb in (0, 1024):
        for nw in (1, 2, 4, None):
            ds = ImagePairDataset(str(root), "train", 128, decode_cache_mb=cache_mb,
                                  native_ops=args.native)
            if ds.cache is not None:
                # prime to full residency -> steady-state (all-hit) rate,
                # the regime a budget >= decoded-dataset-size converges to
                for rel, _ in ds.videos:
                    for t in range(ds._n_frames(rel)):
                        ds._load(rel, t)
                hits0, miss0 = ds.cache.hits, ds.cache.misses
            sps = measure(ds, args.batch, nw, args.batches)
            tag = "auto" if nw is None else nw
            extra = ""
            if ds.cache is not None:
                s = ds.cache.stats()
                dh, dm = s["hits"] - hits0, s["misses"] - miss0
                extra = (f"  (cache {s['bytes'] / 2**20:.0f} MB resident, "
                         f"hit rate {dh / max(dh + dm, 1):.0%})")
            print(f"cache={cache_mb:>5} MB workers={tag:>4}: {sps:7.1f} examples/s{extra}")


if __name__ == "__main__":
    main()
