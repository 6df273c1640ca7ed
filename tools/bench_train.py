#!/usr/bin/env python
"""Scripted training-throughput benchmark — ONE JSON line, diffable across
rounds (the training counterpart of bench.py; VERDICT r4 directive #5).

Measures, on the real chip, the production-width (Config(): 128^2, K=40,
bf16) train steps at the three tracked operating points:

- stage-1 PARITY config: batch 16, upsample 'tf1' (reference-faithful
  training dynamics; reference configs/penn.yaml:12 batch_size, the
  examples/sec line of detector_translator_model.py:98-107),
- stage-1 THROUGHPUT config: batch 128, upsample 'fused' (the measured
  peak of the round-3 sweep, docs/PERF.md "Training throughput"),
- stage-2: batch 64.

vs_baseline for each point is the ratio to the round-3 sweep measurements
(410 / 755 / 4612 examples/s — the values in docs/PERF.md), so a training
regression surfaces as vs_r3 < 1 in the round artifact. The headline
"value" is the stage-1 throughput-config examples/s.

Usage: python tools/bench_train.py [--out BENCH_TRAIN.json] [--iters 20]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# round-3 sweep measurements (docs/PERF.md "Training throughput") — the
# regression baseline this artifact diffs against
R3_EX_PER_S = {"stage1_parity": 410.0, "stage1_throughput": 755.0, "stage2": 4612.0}


def main() -> int:
    ap = ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.train.stage1 import Stage1Trainer
    from kpvid_tpu.train.stage2 import Stage2Trainer

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])

    def rand(key, shape):
        out = jax.jit(
            lambda k: jax.random.uniform(k, shape, jnp.float32, -1.0, 1.0)
        )(key)
        sync(out)
        return out

    def time_step(compiled, state, batches, extra=(), iters=args.iters):
        """Best of 3 short windows; scalar-readback hard sync (axon tunnel:
        block_until_ready is unreliable — CLAUDE.md)."""
        for _ in range(2):
            state, metrics = compiled(state, batches[0], *extra)
            sync(metrics)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                state, metrics = compiled(state, batches[(r + i) % len(batches)], *extra)
            sync(metrics)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    base = Config()  # production widths
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    results = {}

    # ---- stage-1: parity (b16,'tf1') and throughput (b128,'fused') points
    for tag, bs, upsample in (
        ("stage1_parity", 16, "tf1"),
        ("stage1_throughput", 128, "fused"),
    ):
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, upsample_mode=upsample),
            training=dataclasses.replace(base.training, batch_size=bs),
        ).validate()
        m = cfg.model
        s1 = Stage1Trainer(cfg, synthesize_vgg19_params())
        state = s1.init_state(jax.random.PRNGKey(1))
        sync(state.g_params)
        batches = [
            {
                "image": rand(keys[2 * i], (bs, m.image_size, m.image_size, 3)),
                "future_image": rand(keys[2 * i + 1], (bs, m.image_size, m.image_size, 3)),
            }
            for i in range(2)
        ]
        compiled = jax.jit(s1.train_step).lower(state, batches[0]).compile()
        dt = time_step(compiled, state, batches)
        results[tag] = {
            "batch": bs,
            "upsample": upsample,
            "ms_per_step": round(dt * 1e3, 1),
            "steps_per_s": round(1 / dt, 2),
            "examples_per_s": round(bs / dt, 1),
            "vs_r3": round(bs / dt / R3_EX_PER_S[tag], 3),
        }
        del s1, state, batches, compiled

    # ---- stage-2 at batch 64
    bs = 64
    cfg = dataclasses.replace(
        base, training=dataclasses.replace(base.training, batch_size=bs)
    ).validate()
    m = cfg.model
    s2 = Stage2Trainer(cfg)
    state2 = s2.init_state(jax.random.PRNGKey(2))
    sync(state2.g_params)
    step_key = jax.random.PRNGKey(9)
    batches2 = [
        {
            "image": rand(keys[i], (bs, m.image_size, m.image_size, 3)),
            "keypoints": rand(keys[i + 3], (bs, m.n_pts, 2)),
            "real_seq": rand(keys[i + 6], (bs, m.n_future_frames, m.n_pts, 2)),
            "action_code": jax.nn.one_hot(jnp.zeros((bs,), jnp.int32), m.n_action),
        }
        for i in range(2)
    ]
    compiled2 = jax.jit(s2.train_step).lower(state2, batches2[0], step_key).compile()
    dt = time_step(compiled2, state2, batches2, extra=(step_key,))
    results["stage2"] = {
        "batch": bs,
        "ms_per_step": round(dt * 1e3, 1),
        "steps_per_s": round(1 / dt, 2),
        "examples_per_s": round(bs / dt, 1),
        "vs_r3": round(bs / dt / R3_EX_PER_S["stage2"], 3),
    }

    line = {
        "metric": "stage1_train_examples_per_sec_per_chip",
        "value": results["stage1_throughput"]["examples_per_s"],
        "unit": "examples/s",
        "vs_baseline": results["stage1_throughput"]["vs_r3"],
        "detail": results,
    }
    print(json.dumps(line))
    if args.out:
        Path(args.out).write_text(json.dumps(line, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
