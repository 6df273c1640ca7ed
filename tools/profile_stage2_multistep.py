#!/usr/bin/env python
"""Stage-2 dispatch-amortization experiment (real TPU).

Stage-2 training is latency-bound (sequential LSTM matmul chain, <1% MFU;
docs/PERF.md "Training throughput") — per-step dispatch/readback is a real
fraction of step time. This measures `Stage2Trainer.train_step_multi`
(`lax.scan` of K fused steps per dispatch, numerics identical to K single
steps — tests/test_train.py::test_multi_step_matches_sequential) against
the single-step program at the same batch sizes, and prints one JSON line
per configuration for docs/PERF.md's "stage-2 multi-step" row.

Usage: python tools/profile_stage2_multistep.py [--batches 16,64]
       [--ks 1,4,16] [--iters 20]
"""

from __future__ import annotations

import json
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kpvid_tpu.utils.cache import enable_compilation_cache


def sync(tree):
    # scalar readback = the only hard sync under the axon tunnel (CLAUDE.md)
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def stacked_batches(m, k, bs, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.uniform(-1, 1, (k, bs, m.image_size, m.image_size, 3)), jnp.float32
        ),
        "keypoints": jnp.asarray(rng.uniform(-1, 1, (k, bs, m.n_pts, 2)), jnp.float32),
        "real_seq": jnp.asarray(
            rng.uniform(-1, 1, (k, bs, m.n_future_frames, m.n_pts, 2)), jnp.float32
        ),
        "action_code": jnp.asarray(
            np.eye(m.n_action, dtype=np.float32)[
                rng.integers(0, m.n_action, (k, bs))
            ]
        ),
    }


def main():
    ap = ArgumentParser()
    ap.add_argument("--batches", type=str, default="16,64")
    ap.add_argument("--ks", type=str, default="1,4,16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.train.stage2 import Stage2Trainer

    cfg = Config()  # production penn defaults: K=40 pts, LSTM 1024x2, T=32
    m = cfg.model
    print(json.dumps({"device": str(jax.devices()[0]), "config": "penn-defaults"}))

    for bs in [int(b) for b in args.batches.split(",")]:
        trainer = Stage2Trainer(cfg)
        state0 = trainer.init_state(jax.random.PRNGKey(0))
        for k in [int(x) for x in args.ks.split(",")]:
            batches = stacked_batches(m, k, bs)
            keys = jax.random.split(jax.random.PRNGKey(1), k)
            if k == 1:
                squeezed = jax.tree.map(lambda x: x[0], batches)
                compiled = (
                    jax.jit(trainer.train_step)
                    .lower(state0, squeezed, keys[0])
                    .compile()
                )
                call = lambda st: compiled(st, squeezed, keys[0])  # noqa: E731
            else:
                compiled = (
                    jax.jit(trainer.train_step_multi)
                    .lower(state0, batches, keys)
                    .compile()
                )
                call = lambda st: compiled(st, batches, keys)  # noqa: E731
            # warmup + timed window; one scalar readback at the end
            state, metrics = call(state0)
            sync(metrics)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, metrics = call(state0)
            sync(metrics)
            dt = (time.perf_counter() - t0) / (args.iters * k)
            print(json.dumps({
                "stage2_multistep": {"batch": bs, "k": k},
                "ms_per_step": round(dt * 1e3, 3),
                "steps_per_s": round(1.0 / dt, 2),
                "examples_per_s": round(bs / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
