#!/usr/bin/env python
"""Stage-1 / stage-2 train-step timing at production config (TPU).

Measures ms/step and examples/s for the jitted train steps at the penn
production scale (128^2, K=40, batch 16, bf16), for each translator
upsample formulation (model.upsample_mode: 'tf1' interleave vs 'matmul'
MXU form — within 1 bf16 ulp of tf1, see ops/resize.py). Feeds random
device-resident batches (the axon tunnel is too slow for host batches;
host-pipeline throughput is measured separately by bench_host_pipeline).

Results table lives in docs/PERF.md "Training throughput".
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.cache import enable_compilation_cache


@partial(jax.jit, static_argnums=(1, 2))
def _rand(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0).astype(dtype)


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def time_steps(step_fn, state, batches, iters=20):
    for _ in range(2):
        state, metrics = step_fn(state, batches[0])
        sync(metrics)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batches[i % len(batches)])
    sync(metrics)
    return (time.perf_counter() - t0) / iters, state


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-stage1", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.train.stage1 import Stage1Trainer
    from kpvid_tpu.train.stage2 import Stage2Trainer
    import dataclasses

    base = Config()  # production: 128^2, K=40, batch 16
    bs = base.training.batch_size
    m = base.model
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    print(f"production config: {m.image_size}^2, K={m.n_pts}, batch {bs}, "
          f"{base.training.compute_dtype}", flush=True)

    for mode in () if args.skip_stage1 else ("tf1", "matmul", "fused"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, upsample_mode=mode)
        ).validate()
        s1 = Stage1Trainer(cfg, synthesize_vgg19_params())
        state = s1.init_state(jax.random.PRNGKey(1))
        sync(state.g_params)
        batches = []
        for i in range(4):
            b = {
                "image": _rand(ks[2 * i], (bs, m.image_size, m.image_size, 3)),
                "future_image": _rand(ks[2 * i + 1], (bs, m.image_size, m.image_size, 3)),
            }
            sync(b)
            batches.append(b)
        dt, state = time_steps(s1.jitted_train_step, state, batches)
        print(f"stage-1 upsample_mode={mode:7s}: {dt*1e3:6.1f} ms/step  "
              f"{1/dt:5.1f} steps/s  {bs/dt:6.0f} examples/s", flush=True)
        del state, s1

    # stage-2: sweep the LSTM scan unroll factor (no upsample in its graph)
    batches2 = []
    for i in range(4):
        b = {
            "image": _rand(ks[i], (bs, m.image_size, m.image_size, 3)),
            "keypoints": _rand(ks[i + 4], (bs, m.n_pts, 2)),
            "real_seq": _rand(ks[i + 8], (bs, m.n_future_frames, m.n_pts, 2)),
            "action_code": jax.nn.one_hot(jnp.zeros((bs,), jnp.int32), m.n_action),
        }
        sync(b)
        batches2.append(b)
    for unroll in (1, 4, 8, 32):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, lstm_unroll=unroll)
        ).validate()
        s2 = Stage2Trainer(cfg)
        state2 = s2.init_state(jax.random.PRNGKey(2))
        sync(state2.g_params)

        def step2(state, batch, _s2=s2, _k=jax.random.PRNGKey(9)):
            return _s2.jitted_train_step(state, batch, _k)

        dt, _ = time_steps(step2, state2, batches2)
        print(f"stage-2 lstm_unroll={unroll:2d}     : {dt*1e3:6.1f} ms/step  "
              f"{1/dt:5.1f} steps/s  {bs/dt:6.0f} examples/s", flush=True)
        del s2, state2


if __name__ == "__main__":
    main()
