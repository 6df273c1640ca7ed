#!/usr/bin/env python
"""End-to-end generation: 1 image + action class -> 32-frame video.

CLI parity with reference evaluate.py:
    python evaluate.py --config ... --checkpoint_stage1 ... \
                       --checkpoint_stage2 ... --save_dir results/eval

Per-sample output layout matches the reference (:100-131): input_im.png,
current_points.png, and PNG dirs real_seq/ pred_seq/ mask/ crude/
pred_points/. (The reference saved crude/ twice, unscaled then rescaled —
quirk Q10; only the rescaled version is written here, which is what
survived in the reference output too.) Both checkpoint_stage1/2 paths are
validated (fixing quirk Q4, which checked stage1 twice).
"""

from __future__ import annotations

from argparse import ArgumentParser
from os import path as osp
from pathlib import Path

import numpy as np


def _resolve_ckpt(path_str: str, flag: str):
    from kpvid_tpu.utils.checkpoint import latest_checkpoint

    p = Path(path_str)
    if not p.exists():
        raise FileNotFoundError(f"{flag}: checkpoint not found at {p}")
    if not p.name.startswith("ckpt-"):
        resolved = latest_checkpoint(p)
        if resolved is None:
            raise FileNotFoundError(f"{flag}: no ckpt-N directories under {p}")
        return resolved
    return p


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint_stage1", type=str, required=True)
    parser.add_argument("--checkpoint_stage2", type=str, required=True)
    parser.add_argument("--save_dir", type=str, default="results/eval")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0,
                        help="z-noise seed; batch b draws fold_in(seed, b), "
                             "independent of how batches are distributed "
                             "across processes")
    parser.add_argument("--gif", action="store_true",
                        help="additionally write pred.gif/real.gif per sample")
    parser.add_argument("--png-workers", type=int, default=None,
                        help="threads for PNG encoding (default: min(8, "
                             "2 x cores)). Each sample writes ~160 PNGs; "
                             "PIL releases the GIL in its encoder, so the "
                             "host-bound write stage scales with cores. "
                             "Output bytes are identical at any setting.")
    parser.add_argument("--mesh", action="store_true",
                        help="serve batch-parallel over a pure-DP ('data') "
                             "mesh spanning all visible devices (params "
                             "replicated, batch sharded over 'data'; exact — "
                             "equivalence-tested in tests/test_parallel.py::"
                             "test_serving_generate_dp). Ragged tail batches "
                             "fall back to replicated compute.")
    args = parser.parse_args()

    # multi-host: shard the test sweep across processes (embarrassingly
    # parallel — each host generates+writes its stride of the BATCH list
    # into the shared save_dir; byte-identical to a single-host run)
    from kpvid_tpu.parallel import barrier, is_primary, maybe_initialize

    multiproc = maybe_initialize()

    import jax
    import jax.numpy as jnp

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import load_config
    from kpvid_tpu.data import HostDataPipeline, SequenceDataset
    from kpvid_tpu.eval import FinalGenerator
    from kpvid_tpu.utils import get_n_colors, touch_dir
    from kpvid_tpu.utils.checkpoint import merge_restore, restore_checkpoint
    from kpvid_tpu.utils.logging import logger

    config = load_config(args.config)
    m_cfg = config.model
    data_dir = config.paths.data_dir
    batch_size = args.batch_size or config.data.eval_batch_size

    if args.synthetic:
        from kpvid_tpu.data import make_synthetic_penn_tree
        from kpvid_tpu.data.synthetic import make_synthetic_pseudo_labels

        if is_primary():  # one writer on a shared filesystem
            make_synthetic_penn_tree(data_dir)
            make_synthetic_pseudo_labels(data_dir, n_pts=m_cfg.n_pts)
        if multiproc:
            barrier("kpvid_eval_synthetic")

    ck1 = _resolve_ckpt(args.checkpoint_stage1, "--checkpoint_stage1")
    ck2 = _resolve_ckpt(args.checkpoint_stage2, "--checkpoint_stage2")

    # ----------------------------------------------------------- model init
    final = FinalGenerator(config)
    s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))

    # two-checkpoint composition via name-filtered merge (reference
    # restores both ckpts into one graph; evaluate.py:76-77)
    if multiproc:
        # orbax's restore runs a cross-process sync — the process group's
        # FIRST collective, whose Gloo context init has a hardcoded ~30s
        # window, less than process-start skew on busy hosts. Re-sync
        # through the coordination service (generous timeout) first so all
        # processes enter the restore together.
        barrier("kpvid_eval_restore")
    r1 = restore_checkpoint(ck1)
    s1_target = {"params": s1_vars["params"], "batch_stats": s1_vars["batch_stats"]}
    s1_merged, n1 = merge_restore(
        s1_target,
        {"params": r1.get("g_params", {}), "batch_stats": r1.get("batch_stats", {})},
    )
    r2 = restore_checkpoint(ck2)
    s2_params, n2 = merge_restore(s2_vars["params"], r2.get("g_params", {}))
    if n1 == 0 or n2 == 0:
        raise ValueError(f"checkpoint merge matched 0 tensors (stage1={n1}, stage2={n2})")
    logger.info("restored stage1=%d tensors from %s; stage2=%d from %s", n1, ck1, n2, ck2)

    mesh = batch_sh = None
    if args.mesh:
        if multiproc:
            # the two scaling modes are redundant: under multi-host each
            # process already keeps its own chip(s) busy on its batch shard
            raise ValueError(
                "--mesh shards one batch over a global mesh; under "
                "multi-process execution use the per-host batch sharding "
                "instead (drop --mesh)"
            )
        from kpvid_tpu.parallel import batch_sharding, make_mesh, replicate

        mesh = make_mesh(n_model=1)
        s1_merged = replicate(mesh, s1_merged)
        s2_params = replicate(mesh, s2_params)
        batch_sh = batch_sharding(mesh)
        logger.info("serving over %d-device 'data' mesh", mesh.shape["data"])

    colors = get_n_colors(m_cfg.n_pts)
    generate = final.jitted_generate
    render_points = jax.jit(lambda mu: final.render_point_images(mu, colors))

    # --------------------------------------------------------------- data
    test_ds = SequenceDataset(
        data_dir, "test",
        n_pts=m_cfg.n_pts, n_action=m_cfg.n_action,
        sequence_len=config.data.sequence_len, image_size=m_cfg.image_size,
        with_image_seq=True, native_ops=config.data.native_ops,
    )
    # multi-host: batch-aligned shard — this process produces EXACTLY the
    # batches a single-host run would see at global batch indices
    # process_index, process_index + process_count, …
    pipe = HostDataPipeline(
        test_ds, batch_size, num_workers=config.data.num_workers,
        seed=0, drop_remainder=False,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
        shard_granularity="batch",
    )

    # per-batch keys are derived by fold_in(seed, global_batch_index), so
    # any process can compute batch b's z-noise independently and the
    # sharded sweep is byte-identical to the single-host one
    # threaded PNG writer: the host-side encoder is evaluate's wall-clock
    # bottleneck (~160 PNGs per sample vs ~1.7 ms/frame device generation);
    # PIL's C encoder releases the GIL so threads scale with cores. Writes
    # for sample N never interleave within a file and the tree is identical
    # to the serial one; pending futures are bounded to cap live batches.
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    n_png_workers = args.png_workers or min(8, 2 * (_os.cpu_count() or 1))
    pool = ThreadPoolExecutor(max_workers=n_png_workers) if n_png_workers > 1 else None
    pending: list = []

    def submit(fn, *fn_args):
        if pool is None:
            fn(*fn_args)
            return
        pending.append(pool.submit(fn, *fn_args))
        if len(pending) > 4 * n_png_workers:
            pending.pop(0).result()

    rng = jax.random.PRNGKey(args.seed)
    n_written = 0
    for k, batch in enumerate(pipe.batches()):
        global_b = jax.process_index() + k * jax.process_count()
        sample_idx = global_b * batch_size
        bs = batch["image"].shape[0]
        if mesh is not None and bs % mesh.shape["data"] == 0:
            # one H2D transfer straight into the target layout (no staging
            # copy through the default device)
            im = jax.device_put(batch["image"], batch_sh)
            act = jax.device_put(batch["action_code"], batch_sh)
        else:
            # ragged tail (or no mesh): single-device-committed; XLA re-lays
            # them out against the replicated params — exact, just unsharded
            im = jnp.asarray(batch["image"])
            act = jnp.asarray(batch["action_code"])
        gen_rng = jax.random.fold_in(rng, global_b)
        out = generate(s1_merged, s2_params, im, act, gen_rng)
        cur_pts_img = np.asarray(render_points(out["current_points"]))
        fut_pts_img = np.asarray(
            render_points(out["future_points"].reshape(-1, m_cfg.n_pts, 2))
        ).reshape(bs, m_cfg.n_future_frames, m_cfg.image_size, m_cfg.image_size, 3)

        out_np = {key: np.asarray(v) for key, v in out.items()}
        for b in range(bs):
            d = touch_dir(osp.join(args.save_dir, f"{sample_idx:04d}"))
            submit(_save_img, d / "input_im.png", out_np["im"][b], True)
            submit(_save_img, d / "current_points.png", cur_pts_img[b], False)
            submit(_save_seq, d / "real_seq", batch["real_im_seq"][b], True)
            submit(_save_seq, d / "pred_seq", out_np["pred_im_seq"][b], True)
            submit(_save_seq, d / "mask", out_np["mask"][b], False)
            submit(_save_seq, d / "crude", out_np["pred_im_crude"][b], True)
            submit(_save_seq, d / "pred_points", fut_pts_img[b], False)
            if args.gif:
                submit(_save_gif, d / "pred.gif", out_np["pred_im_seq"][b], True)
                submit(_save_gif, d / "real.gif", batch["real_im_seq"][b], True)
            sample_idx += 1
            n_written += 1
    for f in pending:  # surface any writer exception; all files on disk
        f.result()
    if pool is not None:
        pool.shutdown()
    logger.info(
        "wrote %d samples to %s%s", n_written, args.save_dir,
        f" [process {jax.process_index()}/{jax.process_count()}]" if multiproc else "",
    )
    if multiproc:
        # every shard's PNGs land before anyone reads the tree
        barrier("kpvid_eval_done")


def _save_gif(file_path, seq: np.ndarray, rescale: bool, fps: int = 8):
    """Animated GIF of a [T, H, W, 3] sequence (the reference README's
    presentation format)."""
    from PIL import Image

    if rescale:
        seq = 0.5 * (seq + 1.0)
    frames = [
        Image.fromarray((np.clip(f, 0.0, 1.0) * 255).astype(np.uint8)) for f in seq
    ]
    frames[0].save(
        file_path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )


def _save_img(file_path, img: np.ndarray, rescale: bool):
    from PIL import Image

    mode = None
    if img.shape[-1] <= 2:
        img, mode = img[..., 0], "L"
    if rescale:
        img = 0.5 * (img + 1.0)
    img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(img, mode=mode).save(file_path)


def _save_seq(out_dir, seq: np.ndarray, rescale: bool):
    from kpvid_tpu.utils import touch_dir

    touch_dir(out_dir)
    for i in range(seq.shape[0]):
        _save_img(Path(out_dir) / f"{i:06d}.png", seq[i], rescale)


if __name__ == "__main__":
    main()
