#!/usr/bin/env python
"""Training batch sweep + MFU on the real TPU chip.

Brings training to the serving section's evidentiary standard
(docs/PERF.md "Training throughput"): for each stage and batch size
16/32/64 —

- ms/step, steps/s, examples/s/chip (device-resident batches, 20-step
  windows, scalar-readback hard sync; the axon-tunnel discipline from
  CLAUDE.md),
- compiled FLOPs/step (XLA cost analysis) -> model FLOPs utilization
  against the v5e bf16 peak (197 TFLOP/s, same convention as the serving
  MFU figure),
- peak temp memory (XLA memory analysis).

Also runs the remat experiment: training.remat_vgg=True recomputes the
frozen-VGG tower in the backward (memory for FLOPs) — accepted or
rejected on measured ms/step + temp bytes.

Usage: python tools/profile_train_sweep.py [--batches 16,32,64]
       [--skip-stage1|--skip-stage2|--skip-remat]
"""

from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.cache import enable_compilation_cache

V5E_BF16_PEAK = 197e12  # FLOP/s, same peak the serving MFU uses


@partial(jax.jit, static_argnums=(1,))
def _rand(key, shape):
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def _flops_and_temp(compiled) -> tuple[float, float]:
    flops = 0.0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    temp = 0.0
    try:
        ma = compiled.memory_analysis()
        temp = float(getattr(ma, "temp_size_in_bytes", 0.0))
    except Exception:
        pass
    return flops, temp


def time_compiled(compiled, state, batches, extra=(), iters=20):
    for _ in range(2):
        state, metrics = compiled(state, batches[0], *extra)
        sync(metrics)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = compiled(state, batches[i % len(batches)], *extra)
    sync(metrics)
    return (time.perf_counter() - t0) / iters


def stage1_batches(m, bs, keys):
    out = []
    for i in range(3):
        b = {
            "image": _rand(keys[2 * i], (bs, m.image_size, m.image_size, 3)),
            "future_image": _rand(keys[2 * i + 1], (bs, m.image_size, m.image_size, 3)),
        }
        sync(b)
        out.append(b)
    return out


def stage2_batches(m, bs, keys):
    out = []
    for i in range(3):
        b = {
            "image": _rand(keys[i], (bs, m.image_size, m.image_size, 3)),
            "keypoints": _rand(keys[i + 3], (bs, m.n_pts, 2)),
            "real_seq": _rand(keys[i + 6], (bs, m.n_future_frames, m.n_pts, 2)),
            "action_code": jax.nn.one_hot(jnp.zeros((bs,), jnp.int32), m.n_action),
        }
        sync(b)
        out.append(b)
    return out


def report(tag, dt, flops, temp, bs):
    mfu = flops / dt / V5E_BF16_PEAK if flops else float("nan")
    print(
        f"{tag}: {dt * 1e3:7.1f} ms/step  {1 / dt:6.1f} steps/s  "
        f"{bs / dt:7.0f} ex/s  {flops / 1e12:5.2f} TFLOP/step  "
        f"MFU {100 * mfu:4.1f}%  temp {temp / 2**30:5.2f} GiB",
        flush=True,
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="16,32,64")
    ap.add_argument("--upsample", type=str, default=None,
                    help="override model.upsample_mode (tf1/matmul/fused)")
    ap.add_argument("--skip-stage1", action="store_true")
    ap.add_argument("--skip-stage2", action="store_true")
    ap.add_argument("--skip-remat", action="store_true")
    args = ap.parse_args()
    batch_sizes = [int(b) for b in args.batches.split(",")]

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.train.stage1 import Stage1Trainer
    from kpvid_tpu.train.stage2 import Stage2Trainer

    base = Config()  # production: 128^2, K=40, bf16
    if args.upsample:
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model, upsample_mode=args.upsample)
        ).validate()
    m = base.model
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    print(
        f"production config: {m.image_size}^2, K={m.n_pts}, "
        f"{base.training.compute_dtype}, upsample {m.upsample_mode}; "
        f"device {jax.devices()[0]}",
        flush=True,
    )

    if not args.skip_stage1:
        s1 = Stage1Trainer(base, synthesize_vgg19_params())
        state = s1.init_state(jax.random.PRNGKey(1))
        sync(state.g_params)
        for bs in batch_sizes:
            batches = stage1_batches(m, bs, keys)
            compiled = jax.jit(s1.train_step).lower(state, batches[0]).compile()
            flops, temp = _flops_and_temp(compiled)
            dt = time_compiled(compiled, state, batches)
            report(f"stage-1 b{bs:2d}", dt, flops, temp, bs)
        del s1, state

    if not args.skip_remat:
        for bs in dict.fromkeys((batch_sizes[0], batch_sizes[-1])):
            for remat in (False, True):
                cfg = dataclasses.replace(
                    base,
                    training=dataclasses.replace(base.training, remat_vgg=remat),
                ).validate()
                s1 = Stage1Trainer(cfg, synthesize_vgg19_params())
                state = s1.init_state(jax.random.PRNGKey(1))
                sync(state.g_params)
                batches = stage1_batches(m, bs, keys)
                compiled = jax.jit(s1.train_step).lower(state, batches[0]).compile()
                flops, temp = _flops_and_temp(compiled)
                dt = time_compiled(compiled, state, batches)
                report(f"stage-1 b{bs:2d} remat={int(remat)}", dt, flops, temp, bs)
                del s1, state

    if not args.skip_stage2:
        s2 = Stage2Trainer(base)
        state2 = s2.init_state(jax.random.PRNGKey(2))
        sync(state2.g_params)
        step_key = jax.random.PRNGKey(9)
        for bs in batch_sizes:
            batches = stage2_batches(m, bs, keys)
            compiled = (
                jax.jit(s2.train_step).lower(state2, batches[0], step_key).compile()
            )
            flops, temp = _flops_and_temp(compiled)
            dt = time_compiled(compiled, state2, batches, extra=(step_key,))
            report(f"stage-2 b{bs:2d}", dt, flops, temp, bs)


if __name__ == "__main__":
    main()
