#!/usr/bin/env python
"""Stage-1 dispatch-amortization experiment (real TPU).

The stage-1 step is compute-bound (39-170 ms at production widths vs
~1.3 ms dispatch overhead; docs/PERF.md "Training throughput"), so the
multi-step win should be small — this measures it rather than assumes it.
`Stage1Trainer.train_step_multi` (`lax.scan` of K fused D+G steps per
dispatch; equivalent to K sequential steps up to fusion reassociation —
tests/test_train.py::TestStage1::test_multi_step_matches_sequential) vs
the single-step program, one JSON line per configuration for docs/PERF.md
"stage-1 multi-step".

Usage: python tools/profile_stage1_multistep.py [--batches 16,128]
       [--ks 1,4,16] [--iters 10] [--upsample tf1|fused]
"""

from __future__ import annotations

import dataclasses
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
    shape = (k, bs, m.image_size, m.image_size, 3)
    return {
        "image": jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32),
        "future_image": jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32),
    }


def main():
    ap = ArgumentParser()
    ap.add_argument("--batches", type=str, default="16,128")
    ap.add_argument("--ks", type=str, default="1,4,16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--upsample", type=str, default=None,
                    help="override model.upsample_mode (default: tf1 at "
                         "b16, fused at b128 — the two tracked operating "
                         "points of docs/PERF.md)")
    args = ap.parse_args()

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.train.stage1 import Stage1Trainer

    base = Config()  # production penn defaults: 128^2, K=40 pts, bf16
    print(json.dumps({"device": str(jax.devices()[0]), "config": "penn-defaults"}))

    for bs in [int(b) for b in args.batches.split(",")]:
        upsample = args.upsample or ("fused" if bs >= 64 else "tf1")
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, upsample_mode=upsample)
        )
        trainer = Stage1Trainer(cfg, synthesize_vgg19_params())
        state0 = trainer.init_state(jax.random.PRNGKey(0))
        m = cfg.model
        for k in [int(x) for x in args.ks.split(",")]:
            batches = stacked_batches(m, k, bs)
            if k == 1:
                squeezed = jax.tree.map(lambda x: x[0], batches)
                compiled = (
                    jax.jit(trainer.train_step).lower(state0, squeezed).compile()
                )
                call = lambda st: compiled(st, squeezed)  # noqa: E731
            else:
                compiled = (
                    jax.jit(trainer.train_step_multi)
                    .lower(state0, batches)
                    .compile()
                )
                call = lambda st: compiled(st, batches)  # noqa: E731
            # warmup + timed window; one scalar readback at the end
            state, metrics = call(state0)
            sync(metrics)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, metrics = call(state0)
            sync(metrics)
            dt = (time.perf_counter() - t0) / (args.iters * k)
            print(json.dumps({
                "stage1_multistep": {"batch": bs, "k": k, "upsample": upsample},
                "ms_per_step": round(dt * 1e3, 3),
                "steps_per_s": round(1.0 / dt, 2),
                "examples_per_s": round(bs / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
