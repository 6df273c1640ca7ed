#!/usr/bin/env python
"""Extract per-frame keypoint pseudo-labels with a trained stage-1 model.

CLI parity with reference make_pseudo_labels.py:
    python make_pseudo_labels.py --config ... --checkpoint <stage1 ckpt dir>

Output parity: `<data_dir>/pseudo_labels/{video_id:04d}.npy` of shape
[n_frames, K, 2] for every train+test video (reference :98-101).

TPU redesign: instead of batch-1 [663,128,128,3] zero-padded videos
(reference data/keypoint_dataloader.py:77-80), the whole job runs as one
frame stream: a background thread decodes upcoming videos while the device
labels the current slab; frames pack into fixed-size chunks ACROSS video
boundaries (short videos share slabs — zero padding only in the very last
slab of the run); and device dispatches stay 2 deep so H2D, pose-encoder
compute, and the host-side result scatter/save all overlap. One XLA
compilation for any video length.
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

    # multi-host: shard videos across processes (the job is embarrassingly
    # parallel — each host labels its stride of the video list on its own
    # chip(s) and writes to the shared pseudo_labels/ dir; no collectives)
    from kpvid_tpu.parallel import barrier, is_primary, maybe_initialize

    multiproc = maybe_initialize()

    import jax
    import jax.numpy as jnp

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import load_config
    from kpvid_tpu.data import VideoFramesDataset
    from kpvid_tpu.data.keypoint import pack_chunks, prefetch_videos
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

        if is_primary():  # one writer on a shared filesystem
            make_synthetic_penn_tree(data_dir)
        if multiproc:
            barrier("kpvid_labeler_synthetic")
    chunk = args.chunk or config.data.labeler_chunk
    out_dir = touch_dir(osp.join(data_dir, "pseudo_labels"))

    # ------------------------------------------------------------ model
    dtype = jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else jnp.float32
    gen = Stage1Generator(
        n_pts=m_cfg.n_pts,
        heatmap_size=m_cfg.heatmap_size,
        heatmap_inv_std=m_cfg.heatmap_inv_std,
        encoder_filters=m_cfg.encoder_filters,
        translator_filters=m_cfg.translator_filters,
        pose_decoder_filters=m_cfg.pose_decoder_filters,
        dtype=dtype,
        # inference-only job: fold the pose decoder's upsamples into their
        # following convs (exact; same params/checkpoints — docs/PERF.md)
        upsample_mode="fused",
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
    if multiproc:
        # orbax's restore runs a cross-process sync — the process group's
        # FIRST collective, whose Gloo context init has a hardcoded ~30s
        # window, less than process-start skew on busy hosts. Re-sync
        # through the coordination service (generous timeout) first so all
        # processes enter the restore together.
        barrier("kpvid_labeler_restore")
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

    # slabs travel host->device as uint8 (4x fewer bytes — the stream's
    # bottleneck on slow links); the [-1,1] f32 mapping runs on device
    # with the exact formula the host loader otherwise applies
    detect = jax.jit(
        lambda v, im: gen.apply(
            v, im.astype(jnp.float32) / 255.0 * 2.0 - 1.0, method=gen.detect
        )
    )

    # ------------------------------------------------------------ stream
    import collections
    import time

    def all_videos():
        for subset in ("train", "test"):
            ds = VideoFramesDataset(
                data_dir, subset, image_size=m_cfg.image_size, as_uint8=True,
                native_ops=config.data.native_ops,
            )
            if is_primary():
                logger.info("%s set: %d videos", subset, len(ds))
            # multi-host: this process decodes+labels only its video stride
            yield from ds.iter_videos(
                shard_id=jax.process_index(), num_shards=jax.process_count()
            )

    buffers: dict[int, np.ndarray] = {}
    remaining: dict[int, int] = {}
    n_done = 0
    n_frames_total = 0
    t0 = time.perf_counter()

    def drain(inflight):
        """Read back the oldest dispatched slab (np.asarray is the hard
        sync) and scatter its rows into per-video buffers; save completed
        videos."""
        nonlocal n_done, n_frames_total
        out, segs = inflight.popleft()
        pts = np.asarray(out)  # [chunk, K, 2]
        for vid, n, v_off, s_off, count in segs:
            if vid not in buffers:
                buffers[vid] = np.empty((n, m_cfg.n_pts, 2), np.float32)
                remaining[vid] = n
            buffers[vid][v_off : v_off + count] = pts[s_off : s_off + count]
            remaining[vid] -= count
            if remaining[vid] == 0:
                np.save(osp.join(out_dir, f"{vid:04d}.npy"), buffers.pop(vid))
                del remaining[vid]
                n_done += 1
                n_frames_total += n

    inflight: collections.deque = collections.deque()
    for slab, segs in pack_chunks(prefetch_videos(all_videos(), depth=2), chunk):
        inflight.append((detect(variables, jnp.asarray(slab)), segs))
        if len(inflight) > 2:  # keep 2 device dispatches in flight
            drain(inflight)
    while inflight:
        drain(inflight)
    assert not remaining, f"incomplete videos: {sorted(remaining)}"
    dt = time.perf_counter() - t0
    logger.info(
        "labeled %d videos / %d frames in %.1fs (%.1f frames/s)%s",
        n_done, n_frames_total, dt, n_frames_total / max(dt, 1e-9),
        f" [process {jax.process_index()}/{jax.process_count()}]" if multiproc else "",
    )
    if multiproc:
        # all shards complete before anyone (e.g. a chained stage-2 train)
        # reads the label dir
        barrier("kpvid_labeler_done")


if __name__ == "__main__":
    main()
