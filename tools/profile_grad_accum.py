#!/usr/bin/env python
"""Gradient-accumulation cost on the chip (training.grad_accum).

Times the stage-1 throughput config (batch 128, 'fused' upsample) and
stage-2 (batch 64) at K in {1, 2, 4} microbatches, and reads the
compiled programs' XLA memory analysis — the knob's point is the
activation-memory of a K-times-smaller forward at the same global batch,
so temp bytes should FALL with K while ms/step measures the overhead
(extra scan sequencing; smaller per-micro MXU batches).

Device-resident random batches, scalar-readback sync (axon tunnel).
Results: docs/PERF.md "Gradient accumulation".
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.cache import enable_compilation_cache


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def time_steps(step_fn, state, batches, extra=(), iters=20):
    for _ in range(2):
        state, metrics = step_fn(state, batches[0], *extra)
        sync(metrics)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batches[i % len(batches)], *extra)
    sync(metrics)
    return (time.perf_counter() - t0) / iters, state


def mem_gb(compiled):
    try:
        ma = compiled.memory_analysis()
        return ma.temp_size_in_bytes / 1e9
    except Exception:
        return float("nan")


def main():
    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.train.stage1 import Stage1Trainer
    from kpvid_tpu.train.stage2 import Stage2Trainer

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)

    # ---- stage 1, throughput config (b128, fused upsample)
    b1 = 128
    vgg = synthesize_vgg19_params()
    rows = []
    state1 = None
    for K in (1, 2, 4):
        cfg = Config()
        cfg.model.upsample_mode = "fused"
        cfg.training.batch_size = b1
        cfg.training.grad_accum = K
        cfg.validate()
        t = Stage1Trainer(cfg, vgg)
        if state1 is None:
            state1 = t.init_state(key)
        state = jax.tree.map(jnp.copy, state1)
        mk = jax.jit(
            lambda k: {
                n: jax.random.uniform(jax.random.fold_in(k, i), (b1, 128, 128, 3),
                                      jnp.float32, -1.0, 1.0)
                for i, n in enumerate(("image", "future_image"))
            }
        )
        batches = [jax.device_put(mk(jax.random.PRNGKey(100 + i))) for i in range(3)]
        step = t.jitted_train_step if K == 1 else t.jitted_train_step_accum
        compiled = step.lower(state, batches[0]).compile()
        temp_gb = mem_gb(compiled)
        dt, state = time_steps(step, state, batches)
        rows.append((f"stage1 b{b1} K={K}", dt * 1e3, b1 / dt, temp_gb))
        print(f"stage1 K={K}: {dt*1e3:7.1f} ms/step  {b1/dt:7.1f} ex/s  "
              f"temp {temp_gb:.2f} GB", flush=True)

    # ---- stage 2 (b64)
    b2 = 64
    m = Config().model
    state2 = None
    for K in (1, 4):
        cfg = Config()
        cfg.training.batch_size = b2
        cfg.training.grad_accum = K
        cfg.validate()
        t2 = Stage2Trainer(cfg)
        if state2 is None:
            state2 = t2.init_state(key)
        state = jax.tree.map(jnp.copy, state2)
        mk2 = jax.jit(
            lambda k: {
                "keypoints": jax.random.uniform(jax.random.fold_in(k, 0),
                                                (b2, m.n_pts, 2), jnp.float32, -1, 1),
                "real_seq": jax.random.uniform(jax.random.fold_in(k, 1),
                                               (b2, m.n_future_frames, m.n_pts, 2),
                                               jnp.float32, -1, 1),
                "action_code": jax.nn.one_hot(
                    jax.random.randint(jax.random.fold_in(k, 2), (b2,), 0, m.n_action),
                    m.n_action),
            }
        )
        batches = [jax.device_put(mk2(jax.random.PRNGKey(200 + i))) for i in range(3)]
        rng = jax.random.PRNGKey(7)
        step = t2.jitted_train_step if K == 1 else t2.jitted_train_step_accum
        compiled = step.lower(state, batches[0], rng).compile()
        temp_gb = mem_gb(compiled)
        dt, state = time_steps(step, state, batches, extra=(rng,))
        rows.append((f"stage2 b{b2} K={K}", dt * 1e3, b2 / dt, temp_gb))
        print(f"stage2 K={K}: {dt*1e3:7.1f} ms/step  {b2/dt:7.1f} ex/s  "
              f"temp {temp_gb:.2f} GB", flush=True)

    print("\n| config | ms/step | examples/s | XLA temp GB |")
    print("|---|---|---|---|")
    for name, ms, exs, gb in rows:
        print(f"| {name} | {ms:.1f} | {exs:.1f} | {gb:.2f} |")


if __name__ == "__main__":
    main()
