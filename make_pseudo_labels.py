#!/usr/bin/env python
"""Extract per-frame keypoint pseudo-labels with a trained stage-1 model.

CLI parity with reference make_pseudo_labels.py:
    python make_pseudo_labels.py --config ... --checkpoint <stage1 ckpt dir>

Output parity: `<data_dir>/pseudo_labels/{video_id:04d}.npy` of shape
[n_frames, K, 2] for every train+test video (reference :98-101).

TPU redesign: instead of batch-1 [663,128,128,3] zero-padded videos
(reference data/keypoint_dataloader.py:77-80), frames stream through the
jitted pose encoder in fixed-size chunks (one XLA compilation, any video
length) while the NEXT video decodes on the host in parallel.
"""

from __future__ import annotations

from argparse import ArgumentParser
from os import path as osp
from pathlib import Path

import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="stage-1 checkpoint directory (ckpt-N) or its parent")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--chunk", type=int, default=None,
                        help="frames per device chunk (default: config data.labeler_chunk)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import load_config
    from kpvid_tpu.data import VideoFramesDataset
    from kpvid_tpu.data.keypoint import chunk_frames
    from kpvid_tpu.models import Stage1Generator
    from kpvid_tpu.utils import touch_dir
    from kpvid_tpu.utils.checkpoint import (
        latest_checkpoint,
        merge_restore,
        restore_checkpoint,
    )
    from kpvid_tpu.utils.logging import logger

    config = load_config(args.config)
    m_cfg = config.model
    data_dir = config.paths.data_dir
    if args.synthetic:
        from kpvid_tpu.data import make_synthetic_penn_tree

        make_synthetic_penn_tree(data_dir)
    chunk = args.chunk or config.data.labeler_chunk
    out_dir = touch_dir(osp.join(data_dir, "pseudo_labels"))

    # ------------------------------------------------------------ model
    dtype = jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else jnp.float32
    gen = Stage1Generator(
        n_pts=m_cfg.n_pts,
        heatmap_size=m_cfg.heatmap_size,
        heatmap_inv_std=m_cfg.heatmap_inv_std,
        dtype=dtype,
    )
    dummy = jnp.zeros((1, m_cfg.image_size, m_cfg.image_size, 3), jnp.float32)
    # jitted init: one compiled program, fast cold start
    variables = jax.jit(lambda r: gen.init(r, dummy, dummy, train=False))(
        jax.random.PRNGKey(0)
    )

    ckpt = Path(args.checkpoint)
    if not ckpt.exists():
        raise FileNotFoundError(f"checkpoint not found at {ckpt}")
    if not ckpt.name.startswith("ckpt-"):
        resolved = latest_checkpoint(ckpt)
        if resolved is None:
            raise FileNotFoundError(f"no ckpt-N directories under {ckpt}")
        ckpt = resolved
    restored = restore_checkpoint(ckpt)
    # the stage-1 checkpoint stores a full GANTrainState; graft its
    # generator params + BN stats into the inference variables
    target = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    source = {
        "params": restored.get("g_params", restored.get("params", {})),
        "batch_stats": restored.get("batch_stats", {}),
    }
    merged, n = merge_restore(target, source)
    if n == 0:
        raise ValueError(f"checkpoint at {ckpt} matched 0 tensors")
    variables = merged
    logger.info("restored %d tensors from %s", n, ckpt)

    detect = jax.jit(lambda v, im: gen.apply(v, im, method=gen.detect))

    # ------------------------------------------------------------ stream
    for subset in ("train", "test"):
        ds = VideoFramesDataset(data_dir, subset, image_size=m_cfg.image_size)
        n_videos = len(ds)
        for vid, n_frames, frames in ds.iter_videos():
            parts = [
                np.asarray(detect(variables, jnp.asarray(slab)))
                for slab in chunk_frames(frames, chunk)
            ]
            pts = np.concatenate(parts, axis=0)[:n_frames]  # [len, K, 2]
            np.save(osp.join(out_dir, f"{vid:04d}.npy"), pts.astype(np.float32))
        logger.info("%s set: %d videos labeled", subset, n_videos)


if __name__ == "__main__":
    main()
