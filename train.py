#!/usr/bin/env python
"""Train stage-1 (detector_translator) or stage-2 (motion_generator).

CLI parity with reference train.py:
    python train.py --mode {detector_translator,motion_generator} \
                    --config kpvid_tpu/configs/penn.yaml

Additions over the reference:
    --synthetic      generate + use a synthetic Penn-style dataset
    --max-steps N    stop after N steps (overrides training.n_steps)
    --tensorboard    also write TB event files (JSONL metrics always on)
Resume actually works (reference quirk Q3: it read global_step but never
restored; reference train.py:81): if a checkpoint exists under
{log_dir}/{mode}/ and training.resume is true, training continues from it.
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser
from pathlib import Path

import jax


def main():
    parser = ArgumentParser()
    parser.add_argument(
        "--mode",
        type=str,
        required=True,
        choices=["detector_translator", "motion_generator"],
        help="which stage to train",
    )
    parser.add_argument("--config", type=str, required=True, help="YAML config path")
    parser.add_argument("--synthetic", action="store_true", help="use synthetic data")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 10-14 here")
    parser.add_argument("--no-images", action="store_true",
                        help="skip image summaries at summary_interval")
    parser.add_argument("--mesh-data", type=int, default=None,
                        help="size of the 'data' mesh axis (overrides "
                             "config parallel.mesh_data; default: all "
                             "visible devices / mesh-model)")
    parser.add_argument("--mesh-model", type=int, default=None,
                        help="size of the 'model' (tensor-parallel) mesh "
                             "axis (overrides config parallel.mesh_model)")
    args = parser.parse_args()

    # multi-host wiring: must happen before any other jax backend use.
    # No-op unless KPVID_COORDINATOR/KPVID_NUM_PROCESSES/KPVID_PROCESS_ID
    # or KPVID_MULTIHOST=auto are set (see kpvid_tpu/parallel/distributed.py).
    from kpvid_tpu.parallel import (
        barrier,
        is_primary,
        local_batch_size,
        maybe_initialize,
        synced_compile,
    )

    multiproc = maybe_initialize()

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import load_config
    from kpvid_tpu.data import HostDataPipeline, ImagePairDataset, SequenceDataset
    from kpvid_tpu.losses import load_vgg19_params, synthesize_vgg19_params
    from kpvid_tpu.utils.checkpoint import (
        AsyncCheckpointManager,
        latest_checkpoint,
        merge_restore,
        restore_checkpoint,
    )
    from kpvid_tpu.utils.logging import MetricLogger, Throughput, logger

    config = load_config(args.config)
    t_cfg, m_cfg = config.training, config.model
    data_dir = config.paths.data_dir

    if args.synthetic:
        from kpvid_tpu.data import make_synthetic_penn_tree
        from kpvid_tpu.data.synthetic import make_synthetic_pseudo_labels

        if is_primary():  # one writer on a shared filesystem
            make_synthetic_penn_tree(data_dir)
            if args.mode == "motion_generator":
                make_synthetic_pseudo_labels(data_dir, n_pts=m_cfg.n_pts)
        if multiproc:
            # coordination-service barrier, NOT a device collective: the
            # process group's first collective execution must not happen
            # before compiles are synced (see parallel.synced_compile)
            barrier("kpvid_synthetic_data")

    # ------------------------------------------------------------ datasets
    if args.mode == "detector_translator":
        train_ds = ImagePairDataset(
            data_dir, "train", image_size=m_cfg.image_size,
            decode_cache_mb=config.data.decode_cache_mb,
            native_ops=config.data.native_ops,
        )
        test_ds = ImagePairDataset(
            data_dir, "test", image_size=m_cfg.image_size,
            native_ops=config.data.native_ops,
        )
    else:
        kw = dict(
            n_pts=m_cfg.n_pts,
            n_action=m_cfg.n_action,
            sequence_len=config.data.sequence_len,
            image_size=m_cfg.image_size,
            native_ops=config.data.native_ops,
        )
        train_ds = SequenceDataset(data_dir, "train", **kw)
        test_ds = SequenceDataset(data_dir, "test", **kw)

    # ------------------------------------------------------------- trainer
    if args.mode == "detector_translator":
        from kpvid_tpu.train.stage1 import Stage1Trainer

        vgg_path = Path(config.paths.vggnet)
        if vgg_path.exists():
            vgg_params = load_vgg19_params(str(vgg_path))
        else:
            logger.warning(
                "vgg19.npy not found at %s - using synthesized frozen weights "
                "(fine for smoke tests, NOT for real training)", vgg_path
            )
            # KPVID_SYNTH_VGG_WIDTH clamps the synthesized tower's channel
            # widths — smoke/CI runs on slow hosts set it (e.g. 16) to cut
            # the perceptual loss FLOPs; unset = exact VGG19 shapes
            width = int(os.environ.get("KPVID_SYNTH_VGG_WIDTH", "0"))
            vgg_params = synthesize_vgg19_params(max_width=width or None)
        trainer = Stage1Trainer(config, vgg_params)
    else:
        from kpvid_tpu.train.stage2 import Stage2Trainer

        trainer = Stage2Trainer(config)

    rng = jax.random.PRNGKey(t_cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = trainer.init_state(init_rng)

    # resume (fixes reference quirk Q3)
    ckpt_dir = Path(config.paths.log_dir) / args.mode
    if t_cfg.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            if multiproc:
                # orbax's restore runs a cross-process sync; enter it
                # together (Gloo's first-collective window is ~30s)
                barrier("kpvid_train_restore")
            restored = restore_checkpoint(latest)
            state, n = merge_restore(state, restored)
            if n == 0:
                raise RuntimeError(
                    f"resume from {latest} matched 0 tensors - checkpoint is "
                    "incompatible with this config"
                )
            logger.info("resumed %d tensors from %s (step %d)", n, latest, int(state.step))

    # ------------------------------------------------- multi-chip mesh
    # (the reference is strictly single-device, train.py:25-29; this is the
    # TPU rebuild's own scaling axis: DP over 'data', TP over 'model')
    from kpvid_tpu.parallel import batch_sharding, make_mesh, shard_state

    p_cfg = config.parallel
    n_model = args.mesh_model if args.mesh_model is not None else p_cfg.mesh_model
    n_data = args.mesh_data if args.mesh_data is not None else p_cfg.mesh_data
    n_devices = len(jax.devices())
    mesh = None
    if n_devices > 1 or n_model > 1 or (n_data or 1) > 1:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        n_data = mesh.shape["data"]
        if t_cfg.batch_size % n_data:
            raise ValueError(
                f"batch_size {t_cfg.batch_size} must be divisible by the "
                f"'data' mesh axis ({n_data})"
            )
        if t_cfg.grad_accum > 1 and (t_cfg.batch_size // n_data) % t_cfg.grad_accum:
            raise ValueError(
                f"per-shard batch ({t_cfg.batch_size}/{n_data}="
                f"{t_cfg.batch_size // n_data}) must be divisible by "
                f"grad_accum ({t_cfg.grad_accum}): accumulation splits "
                "each shard's rows"
            )
        state = shard_state(mesh, state, min_shard_dim=p_cfg.min_shard_dim)
        logger.info(
            "mesh: data=%d x model=%d over %d devices on %d processes "
            "(per-device batch %d)",
            n_data, mesh.shape["model"], n_devices, jax.process_count(),
            t_cfg.batch_size // n_data,
        )
    elif multiproc:
        raise RuntimeError("multi-process run found no multi-device mesh")

    metric_logger = MetricLogger(
        config.paths.log_dir, args.mode, tensorboard=args.tensorboard,
        enabled=is_primary(),
    )
    ckpt_manager = AsyncCheckpointManager(
        config.paths.log_dir, args.mode, keep=t_cfg.keep_checkpoints
    )
    throughput = Throughput()

    n_steps = args.max_steps if args.max_steps is not None else t_cfg.n_steps
    two_batch = t_cfg.gan_step_mode == "two_batch"
    fused_dg = t_cfg.gan_step_mode == "fused_dg"
    start_step = int(state.step)

    # comm-efficient DP (training.dp_grad_dtype='bfloat16'): swap the
    # jit-SPMD step for the shard_map step with explicit bf16 gradient
    # all-reduce — HALF the ICI bytes per step; sync-BN and a global-batch
    # noise stream keep the semantics (kpvid_tpu/parallel/dp_step.py,
    # docs/PERF.md "Multi-chip scaling"). Same state pytree/checkpoints.
    base_train_step = None
    if mesh is not None and t_cfg.dp_grad_dtype == "bfloat16":
        if mesh.shape["model"] != 1:
            raise ValueError(
                "training.dp_grad_dtype='bfloat16' is pure-DP only; got a "
                f"'model' axis of size {mesh.shape['model']}"
            )
        from kpvid_tpu.parallel import make_dp_reduce_step

        if args.mode == "detector_translator":
            base_train_step = make_dp_reduce_step(
                config, mesh, stage=1, vgg_params=vgg_params
            )
        else:
            base_train_step = make_dp_reduce_step(config, mesh, stage=2)
        logger.info(
            "dp_grad_dtype=bfloat16: shard_map DP step, bf16 grad all-reduce"
        )

    # multi-process: AOT-compile each step program and re-sync all
    # processes before its first execution, so cross-host compile skew
    # can't trip the backend's first-collective rendezvous window
    # (parallel.synced_compile; identity when single-process)
    train_step = synced_compile(
        base_train_step if base_train_step is not None
        else trainer.jitted_train_step_two_batch if two_batch
        else trainer.jitted_train_step_dg if fused_dg
        # grad_accum > 1: K-microbatch accumulation of the fused update
        # (config.validate pins it to 'fused' mode; the dp path above
        # routes to it inside make_dp_reduce_step)
        else trainer.jitted_train_step_accum if t_cfg.grad_accum > 1
        else trainer.jitted_train_step,
        f"{args.mode}_train",
    )
    eval_step = synced_compile(trainer.jitted_eval_step, f"{args.mode}_eval")

    # Multi-host data parallelism: each host assembles LOCAL batches of
    # batch_size/process_count examples from its strided index shard;
    # parallel.put_batch stitches them into global arrays downstream
    # (see kpvid_tpu/parallel/distributed.py).
    local_bs = local_batch_size(t_cfg.batch_size)
    train_pipe = HostDataPipeline(
        train_ds,
        local_bs,
        shuffle=True,
        repeat=True,
        num_workers=config.data.num_workers,
        prefetch=config.data.prefetch,
        seed=t_cfg.seed,
        # per-host shard for multi-host data parallelism
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
        # resume continues the exact data stream the interrupted run would
        # have produced (two_batch pulls two batches per step)
        start_sample=start_step * local_bs * (2 if two_batch else 1),
    )
    logger.info("training %s from step %d to %d on %s", args.mode, start_step, n_steps,
                jax.devices()[0])

    from kpvid_tpu.data.base import device_prefetch

    train_iter = device_prefetch(
        train_pipe.batches(),
        size=config.data.prefetch,
        sharding=batch_sharding(mesh) if mesh is not None else None,
    )

    def next_batch():
        return next(train_iter)

    from kpvid_tpu.utils import get_n_colors

    colors = get_n_colors(m_cfg.n_pts)
    last_d = last_g = float("nan")
    batch = None
    for step in range(start_step, n_steps):
        if args.profile_dir:
            if step == start_step + 10:
                jax.profiler.start_trace(args.profile_dir)
            elif step == start_step + 15:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", args.profile_dir)
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        batch = next_batch()
        if args.mode == "detector_translator":
            if two_batch:
                state, metrics = train_step(state, batch, next_batch())
            else:
                state, metrics = train_step(state, batch)
        else:
            if two_batch:
                state, metrics = train_step(state, batch, next_batch(), step_rng)
            else:
                state, metrics = train_step(state, batch, step_rng)
        throughput.update(t_cfg.batch_size)

        if step % t_cfg.log_interval == 0:
            # sync once per log interval only: keeps the device queue full
            last_d, last_g = float(metrics["loss_D"]), float(metrics["loss_G"])
            ex_s, s_b = throughput.rates()
            if step == start_step:  # first batch includes compile time
                s_b = time.perf_counter() - t0
            metric_logger.log_console(step, last_d, last_g, ex_s, s_b)
            throughput.reset()

        if step % t_cfg.summary_interval == 0:
            metric_logger.log_metrics("train", step, metrics)
            # (multi-process: image summaries would slice a globally-sharded
            # batch from one host — skipped; scalar metrics still logged)
            if not args.no_images and not multiproc:
                from kpvid_tpu.eval.visualize import (
                    stage1_summary_images,
                    stage2_summary_images,
                )

                if args.mode == "detector_translator":
                    images = stage1_summary_images(trainer, state, batch, colors)
                else:
                    rng, viz_rng = jax.random.split(rng)
                    images = stage2_summary_images(trainer, state, batch, colors, viz_rng)
                metric_logger.log_images("train", step, images)

        if step % t_cfg.checkpoint_interval == 0 and step > start_step:
            # async: snapshot on device, transfer/write in the background
            ckpt_manager.save(step, state)

        if step % t_cfg.test_interval == 0:
            _run_test_sweep(
                args.mode, eval_step, state, test_ds, config, step, metric_logger, rng,
                mesh=mesh, multiproc=multiproc,
            )

    ckpt_manager.save(n_steps, state)
    ckpt_manager.wait()
    metric_logger.close()
    logger.info("done at step %d", n_steps)


def _run_test_sweep(mode, eval_step, state, test_ds, config, step, metric_logger, rng,
                    mesh=None, multiproc=False):
    """Average eval metrics over the full test split, weighted by true
    example counts (reference train.py:98-111 sweeps the ragged tail batch
    unpadded; so do we — at most one extra compiled shape, cached). On a
    mesh, full batches shard over 'data'; a ragged tail that doesn't divide
    the data axis replicates instead (exact, just redundant compute).
    Multi-process: every host draws the SAME deterministic test stream and
    every batch replicates (exact and simple; each host computes the full
    sweep redundantly — only the primary logs). eval_step is the trainer's
    jitted_eval_step, wrapped by parallel.synced_compile in main() so each
    new batch shape AOT-compiles + re-syncs before executing."""
    from kpvid_tpu.data import HostDataPipeline

    if mesh is not None:
        from kpvid_tpu.parallel import replicate, shard_batch

    t_cfg = config.training
    pipe = HostDataPipeline(
        test_ds, t_cfg.batch_size, num_workers=config.data.num_workers,
        seed=0, drop_remainder=False,
    )
    totals: dict[str, float] = {}
    n_batches = 0
    n_examples = 0
    t0 = time.perf_counter()
    for batch in pipe.batches():
        bs = batch["image"].shape[0]
        if mesh is not None:
            if multiproc or bs % mesh.shape["data"] != 0:
                batch = replicate(mesh, batch)
            else:
                batch = shard_batch(mesh, batch)
        if mode == "detector_translator":
            metrics = eval_step(state, batch)
        else:
            rng, eval_rng = jax.random.split(rng)
            metrics = eval_step(state, batch, eval_rng)
        for k, v in metrics.items():
            # per-batch means weighted by true counts -> exact per-example mean
            totals[k] = totals.get(k, 0.0) + float(v) * bs
        n_batches += 1
        n_examples += bs
    duration = time.perf_counter() - t0
    avg = {k: v / max(n_examples, 1) for k, v in totals.items()}
    metric_logger.log_metrics("test", step, avg)
    metric_logger.log_console(
        step, avg.get("loss_D", float("nan")), avg.get("loss_G", float("nan")),
        n_examples / max(duration, 1e-9), duration / max(n_batches, 1), prefix="test: ",
    )


if __name__ == "__main__":
    main()
